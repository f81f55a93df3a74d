package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}

import graft.plans.expressions.{coalesce_spans, kgram_hashes, kgram_hashes_ints}

/** Cross-document EXACT substring deduplication (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better" —
  * ExactSubstr): a span that occurs verbatim elsewhere in the corpus
  * (in another document, or again in the same one) is marked and can be
  * surgically removed, keeping the rest of the document intact. This is
  * the finest-grained member of the dedup family: whole-document
  * ([[MinHashDedup]] et al.) drops copies of a document,
  * [[Boilerplate]] strips repeated SEGMENTS (paragraph/window
  * granularity), this strips repeated RAW SPANS with no segmentation
  * assumption at all — the memorization-risk case the paper measures.
  * Two granularities: characters ([[markSpans]]/[[strip]] over a text
  * column) and token ids ([[markSpansIds]]/[[stripIds]] over an
  * `array<int>` column, e.g. [[Gpt2Bpe]] output — the unit the paper
  * actually dedups at, 50-token threshold).
  *
  * The paper builds a corpus-wide suffix array; that is a sequential
  * O(total-bytes) data structure with no good distributed analog. The
  * Spark-first equivalent marks the union of duplicated k-windows:
  * every k-unit window is hashed positionally
  * ([[graft.plans.KgramHashes]] / [[graft.plans.KgramHashesInts]],
  * rolling O(1)/position), windows whose hash occurs >= minCount times
  * corpus-wide are "covered", and overlapping/touching covered windows
  * coalesce into maximal spans ([[graft.plans.CoalesceSpans]]). Every
  * unit of a marked span lies in at least one k-window that occurs >=
  * minCount times — for minSpan = k this finds exactly the duplicated
  * substrings of length >= k (a span of length >= k is duplicated iff
  * each of its k-windows is, up to 2⁻⁶⁴ hash collisions); the paper's
  * length threshold is the `minSpan` knob (unions below it survive).
  *
  * Scale shape (document payloads never shuffle):
  *
  *  1. one codegen'd scan hashes all windows (rolling, O(units));
  *  2. the covered-window set via `groupBy(hash).count` — the only
  *     all-instances pass, shuffling 8-byte hashes with map-side
  *     partial aggregation;
  *  3. a semi-join of (doc, pos, hash) against that set (AQE broadcasts
  *     it — post-filter it is the duplicated residue, small relative to
  *     the corpus);
  *  4. span coalescing per document: ONE `groupBy(doc)` shuffle of the
  *     covered offsets, then the one-pass [[graft.plans.CoalesceSpans]]
  *     kernel per document (no window functions, no second exchange);
  *  5. [[strip]]/[[stripIds]] left-join the bounded span lists (spans
  *     are disjoint, so <= len/k per doc; only documents that HAVE
  *     spans carry a row, so AQE broadcasts the list for real-corpus
  *     duplication rates) back to the input and rebuild the payload
  *     map-side — each document's bytes are touched exactly twice
  *     (hash scan, rebuild).
  */
object SubstrDedup {

  private val emptySpans = array().cast(ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))), containsNull = false))

  /** Span lists for documents that have at least one: idCol, `spans`
    * (sorted disjoint (start, end) offsets), `n_spans`, `dup_units`.
    * `hashes` is the positional window-hash expression (char or token).
    */
  private def spansFor(df: DataFrame, idCol: String, hashes: Column,
                       k: Int, minCount: Int, minSpan: Int): DataFrame = {
    require(minCount >= 2, s"minCount < 2 marks every span, got $minCount")
    val grams = df
      .select(col(idCol), posexplode(hashes).as(Seq("__pos", "__h")))
    val covered = grams
      .groupBy("__h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select("__h")
    grams.join(covered, Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__ps"))
      .select(col(idCol),
        coalesce_spans(col("__ps"), k, minSpan).as("spans"))
      .filter(size(col("spans")) > 0)
      .select(col(idCol), col("spans"),
        size(col("spans")).cast("long").as("n_spans"),
        aggregate(col("spans"), lit(0L),
          (a, sp) => a + sp("end") - sp("start")).as("dup_units"))
  }

  /** One row per input row: idCol, spans (empty default), renamed unit
    * count — the shared markSpans/markSpansIds tail.
    */
  private def markTail(df: DataFrame, idCol: String, marked: DataFrame,
                       unitsName: String): DataFrame =
    df.select(col(idCol))
      .join(marked, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("spans"), emptySpans).as("spans"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_units"), lit(0L)).as(unitsName))

  /** Per-document duplicated spans over a TEXT column: one row per
    * input row with `idCol`, `spans` (sorted, disjoint
    * `array<struct<start,end>>` of 0-based Unicode CODE-POINT offsets —
    * the unit Spark's `substring`/`length` count, so [[strip]] applies
    * them exactly even past supplementary characters — end exclusive;
    * empty when nothing is duplicated), `n_spans`, and `dup_chars`
    * (total chars covered). A span is the maximal union of k-char
    * windows whose window occurs >= `minCount` times in the corpus
    * (all occurrences count, so a string repeated within one document
    * is a duplicate of itself — the paper's self-repeat case); unions
    * shorter than `minSpan` chars are NOT marked (the paper's length
    * threshold; 0 marks every union). NULL text carries empty spans.
    */
  def markSpans(df: DataFrame, idCol: String, textCol: String, k: Int,
                minCount: Int = 2, minSpan: Int = 0): DataFrame =
    markTail(df, idCol,
      spansFor(df, idCol, kgram_hashes(col(textCol), k), k, minCount, minSpan),
      "dup_chars")

  /** [[markSpans]] at TOKEN granularity: `idsCol` is `array<int>` (e.g.
    * [[Gpt2Bpe.encode]] output), offsets are token indices, the unit
    * count column is `dup_tokens`. The paper's configuration is
    * k = minSpan = 50 tokens.
    */
  def markSpansIds(df: DataFrame, idCol: String, idsCol: String, k: Int,
                   minCount: Int = 2, minSpan: Int = 0): DataFrame =
    markTail(df, idCol,
      spansFor(df, idCol, kgram_hashes_ints(col(idsCol), k), k, minCount,
        minSpan),
      "dup_tokens")

  /** Strip every duplicated span: one row per input row with all input
    * columns, `textCol` REPLACED by the text with marked spans removed
    * (characters outside spans, original order; "" when everything was
    * duplicated; NULL text stays NULL), plus `n_spans` / `dup_chars`.
    */
  def strip(df: DataFrame, idCol: String, textCol: String, k: Int,
            minCount: Int = 2, minSpan: Int = 0): DataFrame = {
    // fold over the (sorted, disjoint) spans: emit [cursor, start), jump
    // the cursor to end; finish with the tail. Driver-free map-side pass;
    // span lists are bounded (<= len/k entries) so the interpreted HOF
    // fold is noise next to the hash scan.
    val t = col(textCol)
    val clean = aggregate(
      coalesce(col("spans"), emptySpans),
      struct(lit("").as("acc"), lit(0).as("cursor")),
      (a, sp) => struct(
        concat(a("acc"), t.substr(a("cursor") + 1, sp("start") - a("cursor")))
          .as("acc"),
        sp("end").as("cursor")),
      a => concat(a("acc"), t.substr(a("cursor") + 1, length(t) - a("cursor"))))
    stripTail(df, idCol, textCol,
      spansFor(df, idCol, kgram_hashes(t, k), k, minCount, minSpan),
      clean, "dup_chars")
  }

  /** [[strip]] at TOKEN granularity: `idsCol` (`array<int>`) is
    * REPLACED by the sequence with marked token spans removed (empty
    * array when everything was duplicated; NULL stays NULL), plus
    * `n_spans` / `dup_tokens`.
    */
  def stripIds(df: DataFrame, idCol: String, idsCol: String, k: Int,
               minCount: Int = 2, minSpan: Int = 0): DataFrame = {
    val ids = col(idsCol)
    val empty = array().cast(df.schema(idsCol).dataType)
    val clean = aggregate(
      coalesce(col("spans"), emptySpans),
      struct(empty.as("acc"), lit(0).as("cursor")),
      (a, sp) => struct(
        concat(a("acc"), slice(ids, a("cursor") + 1, sp("start") - a("cursor")))
          .as("acc"),
        sp("end").as("cursor")),
      a => concat(a("acc"), slice(ids, a("cursor") + 1, size(ids) - a("cursor"))))
    stripTail(df, idCol, idsCol,
      spansFor(df, idCol, kgram_hashes_ints(ids, k), k, minCount, minSpan),
      clean, "dup_tokens")
  }

  private def stripTail(df: DataFrame, idCol: String, payloadCol: String,
                        marked: DataFrame, clean: Column,
                        unitsName: String): DataFrame = {
    val others = df.columns.filter(c => c != idCol && c != payloadCol)
    df.join(marked, Seq(idCol), "left")
      .select(
        col(idCol) +:
          clean.as(payloadCol) +:
          others.map(col) :+
          coalesce(col("n_spans"), lit(0L)).as("n_spans") :+
          coalesce(col("dup_units"), lit(0L)).as(unitsName): _*)
  }
}
