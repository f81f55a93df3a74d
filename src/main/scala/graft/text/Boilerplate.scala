package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level boilerplate removal (CCNet's repeated-paragraph rule,
  * Raffel et al.'s C4 line dedup): a segment of text that recurs across
  * `minDocs` DISTINCT documents is boilerplate — navigation chrome,
  * cookie banners, license footers — and is struck from every document
  * it appears in, keeping the rest of the document intact. This is the
  * sub-document complement of the whole-document dedup family
  * ([[MinHashDedup]] et al.): those drop copies of a document, this
  * strips the shared furniture from documents that are otherwise unique.
  *
  * Segmentation is caller-pluggable: [[segmentsByDelimiter]] splits on a
  * regex (newline paragraphs, sentence-ish punctuation) — the real-world
  * mode; [[segmentsByWords]] windows a continuous word stream into
  * fixed-width pseudo-paragraphs for corpora with no line structure.
  *
  * Scale shape (the CCNet two-pass, as one declarative plan):
  *
  *  1. one explode of (doc, position, segment) — no shuffle;
  *  2. the repeated-segment set via `groupBy(hash).countDistinct(doc)`
  *     — the ONLY pass that sees every segment instance, shuffling
  *     16-byte (hash, id) pairs with map-side partial aggregation, never
  *     full segment strings;
  *  3. an anti-join of the exploded segments against that set (AQE
  *     broadcasts it when it is small — for real boilerplate,
  *     post-filter it is tiny relative to the corpus);
  *  4. per-document reassembly in original order (`groupBy` doc id),
  *     then a join back to the input so untouched and fully-stripped
  *     documents both survive with their other columns intact.
  *
  * Segments are keyed by `xxhash64` — at 10¹² segments the collision
  * expectation is ~2⁻²⁴ of one false strike, the standard trade for not
  * shuffling strings (CCNet itself dedups on paragraph hashes).
  */
object Boilerplate {

  /** Segments of `text` split by `delimiterRegex`, empties dropped
    * (blank lines between paragraphs are structure, not content).
    */
  def segmentsByDelimiter(text: Column, delimiterRegex: String = "\n"): Column =
    filter(split(text, delimiterRegex), s => length(s) > 0)

  /** Fixed-`width` word windows of `text` (whitespace-tokenized; the
    * last window may be shorter). The pseudo-paragraph mode for corpora
    * whose text carries no delimiter structure.
    */
  def segmentsByWords(text: Column, width: Int): Column = {
    require(width > 0, s"window width must be positive, got $width")
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    // ceil-div: Column `/` is fractional, so floor the quotient back to int
    val n = ((size(toks) + lit(width - 1)) / lit(width)).cast("int")
    // sequence(0, -1) DESCENDS in Spark — guard the token-less doc
    when(size(toks) === 0,
        array().cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
      .otherwise(transform(sequence(lit(0), n - 1),
        g => array_join(slice(toks, g * width + 1, lit(width)), " ")))
  }

  /** Strip segments appearing in >= `minDocs` distinct documents.
    * `segments` is the per-row segment array (one of the builders
    * above, or any expression over the row). Returns one row per input
    * document: every input column, `textCol` REPLACED by the cleaned
    * text (surviving segments re-joined with `joinSep`, "" when
    * everything was boilerplate), plus `n_segments` / `n_removed`.
    */
  def removeRepeated(df: DataFrame, idCol: String, textCol: String,
                     segments: Column, minDocs: Int = 2,
                     joinSep: String = " "): DataFrame = {
    require(minDocs >= 2, s"minDocs < 2 strips every segment, got $minDocs")
    // a NULL text propagates NULL through the segmenter; treat it as an
    // empty document (0 segments, "" out) instead of NULL-count rows
    val segsCol = coalesce(segments,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
    val segs = df
      .select(col(idCol), posexplode(segsCol).as(Seq("__pos", "__seg")))
      .withColumn("__h", xxhash64(col("__seg")))
    val repeated = segs
      .groupBy("__h").agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__h")
    val kept = segs.join(repeated, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__seg")))),
            s => s("__seg")),
          joinSep).as("__clean"),
        count(lit(1)).as("__kept"))
    val others = df.columns.filter(c => c != idCol && c != textCol)
    df.withColumn("__total", size(segsCol))
      .join(kept, Seq(idCol), "left")
      .select(
        col(idCol) +:
          coalesce(col("__clean"), lit("")).as(textCol) +:
          others.map(col) :+
          col("__total").cast("long").as("n_segments") :+
          (col("__total") - coalesce(col("__kept"), lit(0L)))
            .cast("long").as("n_removed"): _*)
  }

  /** GLOBAL keep-first segment dedup (the RefinedWeb / MassiveText
    * sub-document recipe): every distinct segment keeps exactly its
    * FIRST corpus-wide occurrence — minimum (document id, position) —
    * and every later occurrence is struck, including repeats within one
    * document. Complements [[removeRepeated]]: that strips boilerplate
    * from ALL documents it infects; this preserves one canonical copy
    * of each segment, so corpus token mass is deduplicated without
    * destroying unique content that merely got syndicated.
    *
    * Same output contract as [[removeRepeated]]: every input column,
    * `textCol` replaced by the re-joined survivors, plus
    * `n_segments` / `n_removed`.
    *
    * Scale shape — document text never shuffles:
    *
    *  1. occurrences project to 24-byte (id, pos, xxhash64) rows at the
    *     scan (segment strings stay behind);
    *  2. `groupBy(hash)` with map-side partials finds each hash's count
    *     and min (id, pos) — only hashes with count > 1 survive;
    *  3. occurrences join that (typically small, AQE-broadcastable)
    *     set on hash; non-first occurrences reduce to per-document
    *     struck-position lists;
    *  4. the struck positions join back to the input by id and the
    *     cleaned text rebuilds MAP-SIDE with an index-aware array
    *     filter over the re-derived segment array.
    */
  def dedupKeepFirst(df: DataFrame, idCol: String, textCol: String,
                     segments: Column, joinSep: String = " "): DataFrame = {
    val segsCol = coalesce(segments,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)))
    val occ = df
      .select(col(idCol), posexplode(segsCol).as(Seq("__pos", "__seg")))
      .select(col(idCol), col("__pos"), xxhash64(col("__seg")).as("__h"))
    val dupFirst = occ
      .groupBy("__h")
      .agg(count(lit(1)).as("__n"),
        min(struct(col(idCol), col("__pos"))).as("__first"))
      .filter(col("__n") > 1)
      .select(col("__h"), col("__first"))
    val struck = occ.join(dupFirst, Seq("__h"))
      .filter(struct(col(idCol), col("__pos")) =!= col("__first"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__pos")).as("__struck"))
    val others = df.columns.filter(c => c != idCol && c != textCol)
    df.join(struck, Seq(idCol), "left")
      .withColumn("__segs", segsCol)
      .select(
        col(idCol) +:
          array_join(
            filter(col("__segs"), (s, i) =>
              !coalesce(array_contains(col("__struck"), i), lit(false))),
            joinSep).as(textCol) +:
          others.map(col) :+
          size(col("__segs")).cast("long").as("n_segments") :+
          coalesce(size(col("__struck")), lit(0)).cast("long")
            .as("n_removed"): _*)
  }
}
