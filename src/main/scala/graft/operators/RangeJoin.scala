package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join: each point row matched to the interval
  * rows of the same key whose `[start, end)` contains its timestamp.
  *
  * Scale shape: Catalyst executes a raw inequality join as
  * broadcast-nested-loop (quadratic per key). This implementation bins
  * time instead: intervals explode to the bins they overlap, points map
  * to exactly one bin, and the join is a plain EQUI-join on (keys, bin)
  * followed by the precise range filter — shuffle on (keys, bin), no
  * pairwise scan. Each point carries one bin, so no post-join dedup is
  * needed. Bin truncation is downward on both sides, so coverage is
  * exact for half-open intervals.
  *
  * `binSeconds` trades explode factor against bucket selectivity: pick
  * it near the TYPICAL interval length (a 30-minute-session workload
  * with 1-hour bins explodes intervals ≤ 2×).
  *
  * `maxBinsPerInterval` makes a mis-sized `binSeconds` fail LOUD: one
  * year-long interval at the default 1-hour bin would explode 8,760× —
  * silently, into a shuffle 4 orders of magnitude bigger than the input.
  * The guard is an in-plan assertion (evaluated distributed, riding a
  * filter so column pruning can't drop it) that names the fix.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   pointTime: String, startCol: String, endCol: String,
                   binSeconds: Long = 3600L,
                   maxBinsPerInterval: Int = 1000): DataFrame = {
    require(keys.nonEmpty, "interval join requires at least one key column")
    require(binSeconds > 0)
    require(maxBinsPerInterval >= 1)
    val bin = "__graft_bin"
    val p = points.withColumn(bin,
      floor(col(pointTime).cast("long") / binSeconds))
    val startBin = floor(col(startCol).cast("long") / binSeconds)
    val endBin = floor(col(endCol).cast("long") / binSeconds)
    // NULL start/end must stay a silent drop (explode(sequence(null, _))
    // yields no rows — the pre-guard behavior), not an assertion failure:
    // assert_true raises on a NULL condition, so the guard coalesces NULL
    // span to true and only a PROVEN-too-wide interval trips it.
    val iv = intervals
      .filter(assert_true(
        coalesce(endBin - startBin < lit(maxBinsPerInterval.toLong), lit(true)),
        lit(s"intervalJoin: an interval spans >= $maxBinsPerInterval bins " +
          s"of $binSeconds s; raise binSeconds (or maxBinsPerInterval) " +
          "instead of exploding the interval side")).isNull)
      .withColumn(bin, explode(sequence(startBin, endBin)))
    p.join(iv, keys :+ bin)
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .drop(bin)
  }
}
