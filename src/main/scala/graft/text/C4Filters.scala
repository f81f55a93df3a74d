package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 line-level cleaning (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — the rules behind the C4 corpus): lines
  * must end in terminal punctuation, carry at least `minLineWords`
  * words, and not mention javascript; a PAGE survives only if it has at
  * least `minKeptLines` surviving lines, no curly brace, and no "lorem
  * ipsum". The famous web-text cleanup stage between raw extraction and
  * dedup.
  *
  * Scale shape: every rule is a pure Column expression over the row's
  * own text (split / filter / array_join HOFs — whole-stage codegen, no
  * UDFs), so cleaning is a map-only pass at scan speed: no shuffle, no
  * driver work, trivially parallel at any corpus size.
  */
object C4Filters {

  private val TerminalPunct = Seq(".", "!", "?", "\"")

  /** The lines of `text` that survive C4's line rules. */
  def keptLines(text: Column, minLineWords: Int = 5): Column =
    filter(split(text, "\n"), l => {
      val t = trim(l)
      val words = size(filter(split(t, " "), w => length(w) > 0))
      substring(t, -1, 1).isin(TerminalPunct: _*) &&
        words >= minLineWords &&
        !contains(lower(t), lit("javascript"))
    })

  /** Page-level verdict over the already-filtered lines. */
  def pageKept(text: Column, kept: Column, minKeptLines: Int = 3): Column =
    size(kept) >= minKeptLines &&
      !contains(text, lit("{")) &&
      !contains(lower(text), lit("lorem ipsum"))

  /** Case-insensitive hit count against a badwords list (C4's page
    * blocklist rule, Raffel 2020 §2.2: any page containing a listed
    * word is removed; the paper uses the public "List of Dirty,
    * Naughty, Obscene…" list, which the CALLER supplies — this corpus
    * ships none). Entries are word sequences: single words match whole
    * `[a-z0-9_]` tokens, multi-word entries match with `\b…\b`
    * boundary semantics. One fused codegen pass
    * ([[graft.plans.BlocklistHits]]); the list rides codegen as a
    * pre-lowercased reference object — map-only, scan speed.
    */
  def blocklistHits(text: Column, words: Seq[String]): Column =
    graft.plans.expressions.blocklist_hits(text, words)

  /** C4's page verdict for the blocklist rule: zero hits. */
  def keepPageBlocklist(text: Column, words: Seq[String]): Column =
    blocklistHits(text, words) === 0L

  /** Sentences of `text`: maximal runs ending in `.`/`!`/`?` (the run
    * keeps its terminators), plus a trailing terminator-less remainder;
    * edge whitespace stripped, empties dropped. Expressed without
    * lookarounds, and trimmed via an explicit `[ \t\n\r]` class rather
    * than `trim`/`\s` (whose char sets differ between engines), so RE2
    * engines split identically.
    */
  def sentences(text: Column): Column =
    filter(transform(
        regexp_extract_all(text, lit("[^.!?]*[.!?]+|[^.!?]+"), lit(0)),
        s => regexp_replace(s, "^[ \\t\\n\\r]+|[ \\t\\n\\r]+$", "")),
      s => length(s) > 0)

  /** C4's three-sentence-span deduplication (Raffel 2020 §2.2: "we
    * discarded all but one of any three-sentence span occurring more
    * than once in the data set") — the C4 pipeline stage between the
    * line rules and tokenization. Every `width`-sentence sliding window
    * is keyed corpus-wide; the globally FIRST occurrence (min
    * `(id, position)` — deterministic, engine-independent) survives,
    * and every other occurrence has its sentences struck from its
    * document, the rest of the document kept intact. Overlapping struck
    * spans union their sentence indices.
    *
    * Returns one row per input document: every input column, `textCol`
    * replaced by the surviving sentences re-joined with `joinSep`, plus
    * `n_sentences` / `n_removed`. Documents with fewer than `width`
    * sentences have no spans and pass through (whole-document dedup is
    * [[MinHashDedup]] et al.'s job).
    *
    * Scale shape: spans are keyed by `xxhash64` over the window, so the
    * global first-occurrence pass shuffles 20-byte `(hash, id, pos)`
    * tuples with map-side `min` partials — never sentence strings; the
    * struck-occurrence set (small at real duplication rates) joins back
    * and AQE broadcasts it; reassembly is map-side from each document's
    * own sentence array. Document text is never shuffled.
    */
  def dropRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                        width: Int = 3, joinSep: String = " "): DataFrame = {
    require(width >= 1, s"span width must be positive, got $width")
    val strType = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType)
    // every input column rides along, so the rebuild needs NO join back
    // to the input (which would shuffle document text on the id) — the
    // only join against the struck set stays broadcast-small.
    // NULL text = empty document, like Boilerplate.removeRepeated
    val base = df.withColumn("__ss",
      coalesce(sentences(col(textCol)), array().cast(strType)))
    val spans = base.select(col(idCol), posexplode(
        when(size(col("__ss")) >= width,
          transform(sequence(lit(0), size(col("__ss")) - width), i =>
            xxhash64(concat_ws("\u0001",
              slice(col("__ss"), i + 1, lit(width))))))
          .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))))
        .as(Seq("__pos", "__h")))
    val first = spans.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
    val struck = spans.join(first, Seq("__h"))
      .filter(col("__first")(idCol) =!= col(idCol) ||
        col("__first")("__pos") =!= col("__pos"))
      .select(col(idCol), explode(sequence(col("__pos"),
        col("__pos") + lit(width - 1))).as("__j"))
      .groupBy(col(idCol)).agg(collect_set(col("__j")).as("__js"))
    val others = df.columns.filter(c => c != idCol && c != textCol)
    base.join(struck, Seq(idCol), "left")
      .select(
        col(idCol) +:
          array_join(filter(col("__ss"), (s, i) =>
            !array_contains(coalesce(col("__js"),
              array().cast(org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.IntegerType))), i)),
            joinSep).as(textCol) +:
          others.map(col) :+
          size(col("__ss")).cast("long").as("n_sentences") :+
          coalesce(size(col("__js")), lit(0)).cast("long").as("n_removed"): _*)
  }

  /** Per-document C4 cleaning: `idCol`, `page_kept`, `n_lines`,
    * `n_kept`, and `clean` (surviving lines re-joined; empty when the
    * page is dropped). Downstream stages filter on `page_kept` and feed
    * `clean` to dedup/tokenization.
    */
  def clean(df: DataFrame, idCol: String, textCol: String,
            minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val kept = keptLines(col(textCol), minLineWords)
    val page = pageKept(col(textCol), kept, minKeptLines)
    df.select(col(idCol),
      page.as("page_kept"),
      size(split(col(textCol), "\n")).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      when(page, concat_ws("\n", kept)).otherwise(lit("")).as("clean"))
  }
}
