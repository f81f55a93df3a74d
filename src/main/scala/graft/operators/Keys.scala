package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftTypeError, GraftValueError, errors}

/** Key-discovery operators (reference: is_composite_key_candidate
  * mack/__init__.py:415-456, find_composite_key_candidates :558-586).
  */
object Keys {

  /** True iff `cols` uniquely identify every row. Implemented as the
    * reference does conceptually — existence of any group with count > 1 —
    * but as a groupBy + early-exit `isEmpty` probe (one map-side-combined
    * shuffle on `cols`, stops at the first duplicate found) rather than a
    * full window materialization.
    */
  def isCompositeKeyCandidate(df: DataFrame, cols: Seq[String]): Boolean = {
    if (cols.isEmpty)
      throw new GraftTypeError("At least one column must be specified.")
    val dfCols = df.columns.toSeq
    cols.foreach { c =>
      if (!dfCols.contains(c))
        throw new GraftTypeError(
          s"The base table has these columns ${errors.pyRepr(dfCols)}, " +
          s"but these columns are required ${errors.pyRepr(cols)}")
    }
    df.groupBy(cols.map(col): _*).count()
      .filter(col("count") > 1)
      .isEmpty
  }

  /** Smallest column combination (ascending size, positional order — the
    * reference's `itertools.combinations` order, :581-582) whose distinct
    * count equals the full distinct row count. Raises when only the complete
    * column set qualifies (:584-585).
    *
    * Scale note vs the reference's O(2^n) exact-count jobs: an
    * `approx_count_distinct` prefilter skips combinations whose approximate
    * cardinality is far below the target before paying for an exact count —
    * at 100 TB only the few plausible candidates run the exact aggregation.
    */
  def findCompositeKeyCandidates(df: DataFrame,
                                 excludeCols: Seq[String] = Nil): Seq[String] = {
    val base = df.drop(excludeCols: _*)
    val columns = base.columns.toSeq
    val totalCols = columns.length
    val totalRowCount = base.distinct().count()

    // The reference launches one exact count job PER combination (O(2^n)
    // jobs over the full table, mack/__init__.py:580-583). Instead: for
    // each combination size, ONE aggregation computes approx_count_distinct
    // for every combination of that size in a single scan; only plausible
    // candidates (within HLL error of the target) pay for an exact count.
    // The default-rsd (0.05) sketch is within ±20% of the true cardinality
    // with overwhelming probability (4σ), so a genuine key clears the
    // 0.6 prefilter with margin to spare. Survivors are exact-checked in
    // POSITIONAL order across the whole band — find() short-circuits on
    // the first verified combo, so the only exact counts paid are for
    // near-threshold non-keys that PRECEDE the true key, and the result
    // is deterministic: the positionally-first exactly-unique combination
    // (a two-tier 0.8-then-0.6 scheme could return a LATER column when
    // the sketch underestimated the first one into the lower band).
    // (A tighter rsd is NOT worth it: HLL cost grows ~1/rsd², and the
    // exact check already carries correctness.)
    def exactlyUnique(c: Seq[String]): Boolean =
      base.select(c.map(col): _*).distinct().count() == totalRowCount
    for (n <- 1 to totalCols) {
      val combos = columns.combinations(n).toSeq
      val approxRow = base.select(combos.zipWithIndex.map { case (c, i) =>
        approx_count_distinct(struct(c.map(col): _*)).as(s"a$i")
      }: _*).head()
      def inBand(i: Int, lo: Double): Boolean =
        approxRow.getLong(i) >= totalRowCount * lo
      val plausible = combos.zipWithIndex.filter { case (_, i) => inBand(i, 0.6) }
      val verified = plausible.map(_._1).find(exactlyUnique)
      verified.foreach { c =>
        if (c.length == totalCols)
          throw new GraftValueError("No composite key candidates could be identified.")
        return c
      }
    }
    throw new GraftValueError("No composite key candidates could be identified.")
  }
}
