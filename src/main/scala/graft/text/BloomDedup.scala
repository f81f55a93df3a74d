package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.plans.BloomRef

/** Bloom-prefiltered dedup against a REFERENCE key set — the Dolma-style
  * "have we seen this before" gate for continuous ingestion, where the
  * reference is yesterday's corpus, a crawl frontier, or a benchmark
  * blocklist.
  *
  * The naive formulation is one big `left_anti` join: EVERY incoming row
  * shuffles on the key even though, in the steady state, almost all of
  * them are new. The Bloom shape splits the work:
  *
  *  1. build a Bloom filter over the reference keys (one distributed
  *     aggregation; the filter, not the keys, comes back to the driver);
  *  2. probe every incoming key against the broadcast filter AT SCAN
  *     SPEED ([[graft.plans.BloomMightContain]], whole-stage codegen) —
  *     rows the filter rejects are DEFINITELY new (no false negatives)
  *     and never enter a shuffle;
  *  3. only the `might_contain` survivors — true duplicates plus an
  *     fpp-bounded sliver of false positives — flow into the exact
  *     anti-join that confirms them.
  *
  * The anti-join input shrinks from |incoming| to
  * |dups| + fpp·|incoming|, which is the whole point: at a 1% fpp the
  * shuffle is ~1% of the naive plan's when the stream is mostly novel.
  * The result is EXACT (the filter only routes rows; the join decides),
  * which is also what makes the operator oracle-checkable.
  *
  * Sizing honesty (see [[graft.plans.BloomRef]]): bits = -n·ln(fpp)/ln²2
  * ≈ 1.2 MB per million reference keys at 1% — a driver-built,
  * task-broadcast filter is the right call up to ~10⁸ keys. Past that,
  * shard the reference (one filter per key range) or use the plain
  * anti-join; [[newRows]] takes the built filter so callers control that
  * trade.
  *
  * Reference behavior: MrPowers/mack `append_without_duplicates`
  * (mack/__init__.py:441) is the same contract served by a bare
  * anti-join; this is its high-throughput form.
  */
object BloomDedup {

  /** Build a Bloom filter over `ref`'s `keyCol` (bigint or string).
    * `expectedItems <= 0` counts the reference first — one cheap
    * count-star job — so the filter is sized to the actual key cardinality
    * instead of a guess (an undersized filter degrades fpp, never
    * correctness).
    */
  def buildFilter(ref: DataFrame, keyCol: String, expectedItems: Long = 0L,
                  fpp: Double = 0.01): BloomRef = {
    require(fpp > 0.0 && fpp < 1.0, s"need 0 < fpp < 1, got $fpp")
    // the count also guards the empty reference: Spark's stat.bloomFilter
    // NPEs on an empty frame (its aggregate returns null bytes), and an
    // empty reference legitimately means "everything is new"
    val actual = ref.count()
    val bf: BloomFilter =
      if (actual == 0L) BloomFilter.create(1L, fpp)
      else ref.stat.bloomFilter(keyCol,
        if (expectedItems > 0L) expectedItems else actual, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    new BloomRef(bos.toByteArray)
  }

  /** Scan-speed membership probe column (true ⇒ MAYBE in the reference,
    * false ⇒ definitely not).
    */
  def mightContain(key: Column, filter: BloomRef): Column =
    graft.plans.expressions.bloom_might_contain(key, filter)

  /** EXACT new-rows: incoming rows whose `keyCol` is not present in
    * `ref` — equal to `incoming LEFT ANTI JOIN ref ON key`, computed as
    * prefilter + confirm (see the object doc). The definite-new branch
    * re-scans `incoming` instead of caching it: at the scale this
    * operator targets, a second columnar scan is cheaper than
    * materializing the batch.
    */
  def newRows(incoming: DataFrame, ref: DataFrame, keyCol: String,
              fpp: Double = 0.01,
              filter: Option[BloomRef] = None): DataFrame = {
    val bf = filter.getOrElse(buildFilter(ref, keyCol, fpp = fpp))
    val probe = mightContain(col(keyCol), bf)
    val definiteNew = incoming.filter(!probe)
    val confirmed = incoming.filter(probe)
      .join(ref.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    definiteNew.unionByName(confirmed)
  }

  /** APPROXIMATE new-rows: drop every `might_contain` hit outright — no
    * join at all, one scan, the exact shape Dolma's Bloom dedup runs. A
    * false positive here LOSES a novel row (bounded by fpp); use
    * [[newRows]] when loss is unacceptable.
    */
  def newRowsApprox(incoming: DataFrame, ref: DataFrame, keyCol: String,
                    fpp: Double = 0.01,
                    filter: Option[BloomRef] = None): DataFrame = {
    val bf = filter.getOrElse(buildFilter(ref, keyCol, fpp = fpp))
    incoming.filter(!mightContain(col(keyCol), bf))
  }
}
