package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream — the classic product
  * analytics operator ("view → click → purchase within an hour"):
  * for each user that ENTERED the funnel (has step 1 at all), the
  * earliest greedy completion times of each subsequent step strictly
  * after the previous one.
  *
  * Greedy-earliest is COMPLETE for existence: if any ordered tuple of
  * step events exists for a user, anchoring at the earliest step-1 time
  * and taking each step's minimum later time also reaches the end (each
  * greedy time is ≤ the witness tuple's), so "reached step k" is
  * exists-exact. The `within` horizon is anchored at the FIRST step-1
  * event — the convention funnel tools report — not the sliding-window
  * optimum over all anchors (a user whose only fast run starts at their
  * second entry counts as not-within; documented, deterministic).
  *
  * Scale shape: one scan projects `(user, ts)` per step (16-byte rows);
  * each of the k−1 chaining rounds is a groupBy(user) partial-min
  * aggregation plus an equi-join on the user key — k is config-sized,
  * events never shuffle wider than their per-step projections, and no
  * per-user window materializes the full event history.
  */
object Funnel {

  /** Per-user greedy step times: `(user, ts1 .. tsk)` with NULL from the
    * first unreached step; users without a step-1 event are absent (the
    * funnel's population is its entrants).
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size,
      "repeated step types are ambiguous — use distinct event types")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("__t"),
      col(tsCol).as("__ts"))
    var acc = ev.filter(col("__t") === steps.head)
      .groupBy(col("user")).agg(min(col("__ts")).as("ts1"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val keys = "user" +: (1 to i).map(j => s"ts$j")
      val next = ev.filter(col("__t") === s)
        .join(acc.filter(col(s"ts$i").isNotNull), Seq("user"))
        .filter(col("__ts") > col(s"ts$i"))
        .groupBy(keys.map(col): _*)
        .agg(min(col("__ts")).as(s"ts${i + 1}"))
      acc = acc.join(next, keys, "left")
    }
    acc.withColumnRenamed("user", userCol)
  }

  /** The funnel report: per entrant, how many steps completed (greedy)
    * and whether the full funnel finished within `within` of the first
    * step-1 event. `within = None` drops the horizon (pure ordering).
    */
  def funnelReport(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String],
                   within: Option[String] = None): DataFrame = {
    val k = steps.length
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps)
    // nulls are monotone by construction (an unreached step can't chain),
    // so the non-null count IS the furthest step reached
    val reached = (1 to k).map(j =>
      when(col(s"ts$j").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    val full = col(s"ts$k").isNotNull
    val inWindow = within match {
      case Some(w) => full &&
        col(s"ts$k") <= col("ts1") + expr(s"INTERVAL $w")
      case None => full
    }
    times.select(col(userCol),
      reached.as("steps_completed"),
      coalesce(inWindow, lit(false)).as("completed"))
  }

  /** Weekly cohort retention — the other classic product-analytics
    * operator: users cohort by the ISO week of their FIRST event, and
    * each (cohort, week-offset) cell counts the distinct users active
    * that many weeks later. Offsets are exact integers (truncated weeks
    * differ by whole weeks), so the triangle is engine-portable with no
    * float anywhere.
    *
    * Scale shape: one scan feeds both the per-user first-event
    * aggregation (partial min) and the distinct (user, week) activity
    * projection; the join is user-keyed; the final cell aggregation is
    * |cohorts × offsets|-sized. Events never shuffle wider than
    * (user, week) pairs.
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val active = events
      .select(col(userCol), to_date(date_trunc("week", col(tsCol))).as("__w"))
      .distinct()
    active.join(firstWeek, Seq(userCol))
      .withColumn("week_offset",
        (datediff(col("__w"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
