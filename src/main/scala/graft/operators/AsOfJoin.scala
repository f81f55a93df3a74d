package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join: for every left row, the LATEST right
  * row with `rightTime <= leftTime` within the same key group — the
  * point-in-time feature-lookup primitive (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`) that relational Spark lacks.
  *
  * Execution shape (the part that matters at 100 TB): a naive
  * formulation is a range join — `left.join(right, keys && r.ts <= l.ts)`
  * explodes to every (left, earlier-right) pair before aggregating the
  * max, which is quadratic per key. This implementation uses the
  * union + window trick instead: both sides are tagged and unioned, ONE
  * shuffle hash-partitions on the keys, and within each key group a
  * running `last(right-payload, ignoreNulls)` ordered by (time, side)
  * carries the most recent right row forward onto each left row. Cost is
  * one shuffle + one sort of |L|+|R| rows — no pair explosion, skew
  * handled the same way any window on the key is.
  *
  * Semantics: inclusive (`rightTime == leftTime` matches, right sorts
  * first on ties); left rows with no earlier right row keep NULLs (left
  * join); an optional `tolerance` (seconds) voids matches older than
  * `leftTime - tolerance`. Right-side duplicate timestamps within a key
  * are resolved by the LAST row in (time, tie-break) order — pass a
  * pre-deduplicated right side for full determinism.
  *
  * NULL times: right rows with a NULL `rightTime` never match (they are
  * dropped before the union — a NULL time would sort nulls-first and be
  * carried onto every left row), and left rows with a NULL `leftTime`
  * come out unmatched; both match DuckDB ASOF / pandas `merge_asof`.
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPrefix: String = "right_",
               toleranceSeconds: Option[Long] = None,
               direction: String = "backward"): DataFrame = direction match {
    case "backward" =>
      directional(left, right, keys, leftTime, rightTime, rightPrefix,
        toleranceSeconds, forward = false)
    case "forward" =>
      directional(left, right, keys, leftTime, rightTime, rightPrefix,
        toleranceSeconds, forward = true)
    case "nearest" =>
      nearest(left, right, keys, leftTime, rightTime, rightPrefix,
        toleranceSeconds)
    case other => throw new IllegalArgumentException(
      s"unknown as-of direction '$other' (backward | forward | nearest)")
  }

  /** Nearest direction: the smaller |Δt| wins, ties go BACKWARD (the
    * pandas `merge_asof` rule). ONE union + ONE shuffle: the backward
    * and forward candidates come from two window frames over the same
    * hash partitioning — an ascending and a descending intra-partition
    * sort — then a row-local µs-exact pick. No join-back and no row tag:
    * an earlier formulation tagged left rows with
    * `monotonically_increasing_id()` and joined two directional passes
    * on the tag, but that expression is nondeterministic and each pass
    * re-evaluated it independently — a shuffled/AQE-replanned left input
    * could re-order between passes and silently mis-pair rows. Two
    * frames over one Exchange is both deterministic and cheaper (the
    * old shape shuffled the left side three times).
    */
  private def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      rightPrefix: String,
                      toleranceSeconds: Option[Long]): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(!keys.contains(rightTime),
      "rightTime must be a payload column, not a join key")
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    val t = "__asof_t"
    val side = "__asof_side"
    val payload = "__asof_payload"
    val bp = "__asof_back"
    val fp = "__asof_fwd"
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))

    val leftCols = left.columns.toSeq
    val lAligned = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(payload, lit(null).cast(payloadType))
    val rAligned = right.filter(col(rightTime).isNotNull).select(
        keys.map(col) ++ Seq(
          col(rightTime).as(t), lit(0).as(side),
          struct(rightPayload.map(col): _*).as(payload)): _*)
      .select(
        leftCols.map(c => if (keys.contains(c)) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(col(t), col(side), col(payload)): _*)

    // same tie rule both directions: right (side 0) sorts before left at
    // equal time, so equal-time right rows are visible to both frames.
    // NULL left times sort FIRST in both orders (explicitly — desc
    // defaults to nulls-last, which would hand a NULL-time left row the
    // earliest right payload) so they carry nothing and come out
    // unmatched, matching DuckDB ASOF / pandas.
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc_nulls_first, col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t).desc_nulls_first, col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val both = lAligned.unionByName(rAligned)
      .withColumn(bp, last(col(payload), ignoreNulls = true).over(wB))
      .withColumn(fp, last(col(payload), ignoreNulls = true).over(wF))
      .filter(col(side) === 1)

    // µs-exact tolerance bounds (tol is whole seconds, so scale it to
    // µs rather than truncating the timestamps to seconds — a cast("long")
    // here would let a right row up to ~1s OUTSIDE the tolerance pass,
    // the same truncation trap the gap comparison below avoids)
    val withTol = toleranceSeconds match {
      case Some(tol) =>
        val ltMicros = unix_micros(col(t))
        val tolMicros = tol * 1000000L
        both
          .withColumn(bp, when(
            unix_micros(col(s"$bp.$rightTime")) >= ltMicros - tolMicros,
            col(bp)))
          .withColumn(fp, when(
            unix_micros(col(s"$fp.$rightTime")) <= ltMicros + tolMicros,
            col(fp)))
      case None => both
    }

    // µs-exact gap comparison (a seconds cast would truncate and
    // misdecide sub-second ties — the sessionize µs lesson)
    val bt = unix_micros(col(s"$bp.$rightTime"))
    val ft = unix_micros(col(s"$fp.$rightTime"))
    val lt = unix_micros(col(t))
    val useBack = col(s"$bp.$rightTime").isNotNull &&
      (col(s"$fp.$rightTime").isNull || (lt - bt) <= (ft - lt))
    val chosen = when(useBack, col(bp)).otherwise(col(fp))
    withTol.select(leftCols.map(col) ++ rightPayload.map(c =>
      chosen.getField(c).as(s"$rightPrefix$c")): _*)
  }

  /** The directional core: backward = most recent right row at-or-before
    * each left time (the classic as-of); forward = the FIRST right row
    * at-or-after (pandas `direction="forward"`). Forward is the same
    * union + window machinery run over DESCENDING time — the running
    * `last(payload)` then carries the nearest FOLLOWING right row, with
    * the identical tie rule (equal times match, right sorts first).
    * Tolerance bounds the match window on the matching side.
    */
  private def directional(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTime: String,
                          rightTime: String, rightPrefix: String,
                          toleranceSeconds: Option[Long],
                          forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(!keys.contains(rightTime),
      "rightTime must be a payload column, not a join key")
    val rightPayload = right.columns.filterNot(c => keys.contains(c)).toSeq
    val t = "__asof_t"
    val side = "__asof_side" // right=0 sorts before left=1 at equal time
    val payload = "__asof_payload"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(payload, lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.schema.fields.filterNot(f => keys.contains(f.name)))))
    // NULL-time right rows would sort first in the (time, side) window and
    // their payload would be carried onto every left row — exclude them
    // (a NULL left time then naturally yields no match: nothing precedes it)
    val r = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTime).as(t), lit(0).as(side),
        struct(rightPayload.map(col): _*).as(payload)): _*)
    // align: union needs identical columns; left keeps its own columns
    val leftCols = left.columns.toSeq
    val lAligned = l.select((leftCols ++ Seq(t, side, payload)).map(col): _*)
    val rAligned = r.select(
      leftCols.map(c => if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(t), col(side), col(payload)): _*)

    // NULL left times must sort FIRST in both directions (desc defaults
    // to nulls-last, which would hand a NULL-time left row the earliest
    // right payload in the forward pass) so they carry nothing
    val timeOrder =
      if (forward) col(t).desc_nulls_first else col(t).asc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lAligned.unionByName(rAligned)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    // µs-exact tolerance (see nearest: cast("long") truncates to whole
    // seconds and misjudges sub-second boundary rows)
    val withTolerance = toleranceSeconds match {
      case Some(tol) =>
        val rt = unix_micros(col(s"$payload.$rightTime"))
        val lt = unix_micros(col(t))
        val tolMicros = tol * 1000000L
        val inWindow =
          if (forward) rt <= lt + tolMicros else rt >= lt - tolMicros
        joined.withColumn(payload,
          when(col(s"$payload.$rightTime").isNotNull && inWindow,
            col(payload)).otherwise(lit(null).cast(joined.schema(payload).dataType)))
      case None => joined
    }

    val projected = leftCols.map(col) ++ rightPayload.map(c =>
      col(s"$payload.$c").as(s"$rightPrefix$c"))
    withTolerance.select(projected: _*)
  }

  /** Skew-safe as-of join for POWER-LAW keys: [[asOfJoin]]'s window puts
    * each key's entire L+R history in one task — correct, but a hot key
    * (one user with 10⁹ events) serializes on one core. This variant
    * bounds per-task input by TIME-BUCKETING the window:
    *
    *  1. rows bucket by `floor(time / bucketSeconds)`; the running-last
    *     window partitions by (key, bucket) — task input is one key's
    *     rows in ONE bucket, however hot the key;
    *  2. a per-(key, bucket) summary (the bucket's last right payload,
    *     one row per key×bucket) feeds a second window over the bucket
    *     SPINE — |buckets| rows per key, not |events| — computing each
    *     bucket's carry-in: the last right row of any earlier bucket;
    *  3. left rows with no within-bucket match coalesce to the carry-in.
    *
    * Same semantics as [[asOfJoin]] (inclusive ties, NULL-time rules,
    * tolerance); cost is one extra small aggregation + spine window.
    * Pick `bucketSeconds` so a hot key's densest bucket fits a task —
    * the per-task bound is (hot-key rows) × (bucketSeconds / key's time
    * span) instead of all of them.
    */
  def asOfJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       bucketSeconds: Long = 3600L,
                       rightPrefix: String = "right_",
                       toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    require(bucketSeconds > 0)
    require(!keys.contains(rightTime),
      "rightTime must be a payload column, not a join key")
    val rightPayload = right.columns.filterNot(c => keys.contains(c)).toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(f => keys.contains(f.name)))
    val t = "__asof_t"
    val side = "__asof_side"
    val payload = "__asof_payload"
    val bucket = "__asof_bucket"
    val lastIn = "__asof_last_in_bucket"
    val carryIn = "__asof_carry_in"

    val r = right.filter(col(rightTime).isNotNull).select(
        keys.map(col) ++ Seq(
          col(rightTime).as(t), lit(0).as(side),
          struct(rightPayload.map(col): _*).as(payload)): _*)
      .withColumn(bucket, floor(col(t).cast("long") / bucketSeconds))

    // one row per (key, bucket): the bucket's most recent right payload
    val summaries = r.groupBy((keys :+ bucket).map(col): _*)
      .agg(max_by(col(payload), col(t)).as(lastIn))

    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(bucket, floor(col(t).cast("long") / bucketSeconds))

    // bucket spine = every (key, bucket) either side touches; the carry-in
    // window runs over it ordered by bucket, STRICTLY-preceding frame
    val spine = l.select((keys :+ bucket).map(col): _*)
      .unionByName(summaries.select((keys :+ bucket).map(col): _*))
      .distinct()
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col(bucket))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.join(summaries, keys :+ bucket, "left")
      .withColumn(carryIn, last(col(lastIn), ignoreNulls = true).over(wCarry))
      .select((keys :+ bucket).map(col) :+ col(carryIn): _*)

    // within-bucket running last — the per-task-bounded window
    val lAligned = l.select(
      (leftCols ++ Seq(t, side, bucket)).map(col) :+
        lit(null).cast(payloadType).as(payload): _*)
    val rAligned = r.select(
      leftCols.map(c => if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(t), col(side), col(bucket), col(payload)): _*)
    val wIn = Window.partitionBy((keys :+ bucket).map(col): _*)
      .orderBy(col(t), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lAligned.unionByName(rAligned)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(wIn))
      .filter(col(side) === 1)

    val merged = joined.join(carry, keys :+ bucket, "left")
      .withColumn(payload, coalesce(col(payload), col(carryIn)))

    // µs-exact tolerance like the unbucketed paths (cast("long")
    // truncates to whole seconds and misjudges sub-second boundary rows)
    val withTolerance = toleranceSeconds match {
      case Some(tol) => merged.withColumn(payload,
        when(col(s"$payload.$rightTime").isNotNull &&
          unix_micros(col(s"$payload.$rightTime")) >=
            unix_micros(col(t)) - tol * 1000000L,
          col(payload)).otherwise(lit(null).cast(merged.schema(payload).dataType)))
      case None => merged
    }

    val projected = leftCols.map(col) ++ rightPayload.map(c =>
      col(s"$payload.$c").as(s"$rightPrefix$c"))
    withTolerance.select(projected: _*)
  }
}
