package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) =
    java.sql.Timestamp.valueOf(
      f"2024-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00")

  private def ev(rows: (Long, String, Int)*) =
    rows.map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "ts")

  private val steps = Seq("view", "click", "purchase")

  test("greedy chaining is exists-exact; order is strict") {
    val d = ev(
      // u1: clean completion
      (1L, "view", 0), (1L, "click", 5), (1L, "purchase", 10),
      // u2: click BEFORE the first view only — step 2 never reached
      (2L, "click", 0), (2L, "view", 5), (2L, "purchase", 10),
      // u3: early useless click, later valid one — greedy must recover
      (3L, "click", 1), (3L, "view", 2), (3L, "click", 3),
      (3L, "purchase", 4),
      // u4: entered only
      (4L, "view", 0),
      // u5: no view at all — not an entrant, absent from the report
      (5L, "purchase", 0))
    val r = Funnel.funnelReport(d, "user_id", "event_type", "ts", steps)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
      .toMap
    assert(r(1L) == ((3L, true)))
    assert(r(2L) == ((1L, false)), "strictly-after ordering required")
    assert(r(3L) == ((3L, true)), "greedy takes the first VALID later step")
    assert(r(4L) == ((1L, false)))
    assert(!r.contains(5L), "non-entrants are absent")
  }

  test("the within horizon anchors at the first entry") {
    val d = ev(
      // completes, but 90 minutes after the FIRST view (a second view
      // at minute 80 would make a 10-minute run — not the convention)
      (1L, "view", 0), (1L, "view", 80), (1L, "click", 85),
      (1L, "purchase", 90),
      // completes within the hour
      (2L, "view", 0), (2L, "click", 30), (2L, "purchase", 59))
    val within = Funnel.funnelReport(d, "user_id", "event_type", "ts",
        steps, within = Some("1 HOUR"))
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(within(1L) == false, "horizon anchored at the first entry")
    assert(within(2L) == true)
    // without a horizon, both count as completed
    val open = Funnel.funnelReport(d, "user_id", "event_type", "ts", steps)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(open(1L) && open(2L))
  }

  test("weeklyRetention: cohorts by first-event week, whole-week offsets, " +
       "distinct users per cell") {
    def t(d: String) = java.sql.Timestamp.valueOf(s"$d 12:00:00")
    // 2024-01-01 is a Monday: week boundaries are unambiguous
    val d = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-03")), // w0 twice -> 1 cell
      (1L, t("2024-01-10")),                        // w1
      (2L, t("2024-01-02")),                        // cohort w0, w0 only
      (3L, t("2024-01-09")), (3L, t("2024-01-22"))) // cohort w1; offsets 0, 2
      .toDF("user_id", "ts")
    val cells = Funnel.weeklyRetention(d, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(cells == Map(
      ("2024-01-01", 0L) -> 2L,  // users 1 and 2 in cohort w0, active w0
      ("2024-01-01", 1L) -> 1L,  // user 1 back in w1
      ("2024-01-08", 0L) -> 1L,  // user 3's own cohort
      ("2024-01-08", 2L) -> 1L), // user 3 back two weeks later
      cells.toString)
  }

  test("repeated steps rejected; ties at the same timestamp stay strict") {
    val d = ev((1L, "view", 0), (1L, "click", 0), (1L, "purchase", 1))
    // click at the SAME instant as the view is not strictly after
    val r = Funnel.funnelReport(d, "user_id", "event_type", "ts", steps)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 1L)
    intercept[IllegalArgumentException](
      Funnel.funnelReport(d, "user_id", "event_type", "ts",
        Seq("view", "view")))
  }
}
