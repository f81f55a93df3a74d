package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.sql.Timestamp

case class Click(click_id: Long, user_id: Long, click_ts: Timestamp)
case class View(view_id: Long, user_id: Long, view_ts: Timestamp)

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // SparkSpec already provides ts(String): Timestamp

  private def run(lefts: Seq[Seq[Click]], rights: Seq[Seq[View]],
                  lookback: String = "1 hour",
                  watermark: String = "2 hours"): Set[(Long, Long)] = {
    implicit val sql = spark.sqlContext
    val lSrc = MemoryStream[Click]
    val rSrc = MemoryStream[View]
    val name = s"ssj_${System.nanoTime()}"
    val q = EventStreams.intervalJoinStreams(lSrc.toDF(), rSrc.toDF(),
        keys = Seq("user_id"), leftTime = "click_ts", rightTime = "view_ts",
        lookback = lookback, watermark = watermark)
      .select("click_id", "view_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      lefts.zipAll(rights, Seq.empty[Click], Seq.empty[View]).foreach {
        case (ls, rs) =>
          if (ls.nonEmpty) lSrc.addData(ls: _*)
          if (rs.nonEmpty) rSrc.addData(rs: _*)
          q.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("matches inside the lookback window, same key only") {
    val out = run(
      lefts = Seq(Seq(
        Click(1, 7, ts("2024-01-01 10:00:00")),
        Click(2, 8, ts("2024-01-01 10:00:00")))),
      rights = Seq(Seq(
        View(10, 7, ts("2024-01-01 09:30:00")), // in window
        View(11, 7, ts("2024-01-01 08:30:00")), // too old (> 1h before)
        View(12, 7, ts("2024-01-01 10:05:00")), // after the click
        View(13, 9, ts("2024-01-01 09:45:00"))))) // other user
    assert(out == Set((1L, 10L)))
  }

  test("bounds are inclusive on both ends") {
    val out = run(
      lefts = Seq(Seq(Click(1, 7, ts("2024-01-01 10:00:00")))),
      rights = Seq(Seq(
        View(10, 7, ts("2024-01-01 09:00:00")), // exactly lookback before
        View(11, 7, ts("2024-01-01 10:00:00"))))) // exactly at the click
    assert(out == Set((1L, 10L), (1L, 11L)))
  }

  test("cross-micro-batch: a view arriving before its click still joins") {
    val out = run(
      lefts = Seq(Seq.empty,
        Seq(Click(1, 7, ts("2024-01-01 10:30:00")))),
      rights = Seq(Seq(View(10, 7, ts("2024-01-01 10:00:00"))),
        Seq.empty))
    assert(out == Set((1L, 10L)))
  }

  test("cross-micro-batch the other way: click waits for a later view " +
      "with a later event time in a later batch") {
    // click in batch 0; the matching view arrives in batch 1 with event
    // time AFTER the click (but the join wants view <= click) — so use
    // a view between: event-time order across batches is preserved
    val out = run(
      lefts = Seq(
        Seq(Click(1, 7, ts("2024-01-01 10:00:00"))),
        Seq(Click(2, 7, ts("2024-01-01 11:00:00")))),
      rights = Seq(
        Seq.empty,
        Seq(View(10, 7, ts("2024-01-01 10:30:00")))))
    // view@10:30 joins click@11:00 (within 1h before); click@10:00 is
    // before the view, so no pair
    assert(out == Set((2L, 10L)))
  }

  test("stream equals the batch formulation on in-order batches") {
    val clicks = (0 until 40).map(i =>
      Click(i, i % 5, ts(f"2024-01-01 ${10 + i % 8}%02d:${i % 60}%02d:00")))
    val views = (0 until 40).map(i =>
      View(100 + i, i % 5, ts(f"2024-01-01 ${9 + i % 9}%02d:${(i * 7) % 60}%02d:00")))
    // feed in two event-time-ordered halves (order by ts)
    val cSorted = clicks.sortBy(_.click_ts.getTime)
    val vSorted = views.sortBy(_.view_ts.getTime)
    val streamed = run(
      lefts = Seq(cSorted.take(20), cSorted.drop(20)),
      rights = Seq(vSorted.take(20), vSorted.drop(20)),
      lookback = "1 hour", watermark = "12 hours")
    val batch = EventStreams.intervalJoinStreams(
      clicks.toDF(), views.toDF(), Seq("user_id"),
      "click_ts", "view_ts", "1 hour", "12 hours")
      .select("click_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("left_outer: matches emit eagerly, unmatched clicks emit " +
       "null-padded after the watermark passes them") {
    implicit val sql = spark.sqlContext
    val lSrc = MemoryStream[Click]
    val rSrc = MemoryStream[View]
    val name = s"ssjo_${System.nanoTime()}"
    val q = EventStreams.intervalJoinStreams(lSrc.toDF(), rSrc.toDF(),
        keys = Seq("user_id"), leftTime = "click_ts", rightTime = "view_ts",
        lookback = "1 hour", watermark = "1 hour", joinType = "left_outer")
      .select("click_id", "view_id")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      lSrc.addData(
        Click(1, 7, ts("2024-01-01 10:00:00")), // will match
        Click(2, 7, ts("2024-01-01 10:10:00"))) // will NOT match
      rSrc.addData(View(10, 7, ts("2024-01-01 09:30:00"))) // matches 1 only?
      q.processAllAvailable()
      // view@09:30 is within 1h of BOTH clicks — adjust: it matches both.
      // push the watermark far past with sentinels on both sides
      lSrc.addData(Click(90, -1, ts("2024-01-02 12:00:00")))
      rSrc.addData(View(91, -2, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      lSrc.addData(Click(92, -1, ts("2024-01-03 12:00:00")))
      rSrc.addData(View(93, -2, ts("2024-01-03 12:00:00")))
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
        .toSet
      // both real clicks match the view; the day-1 sentinel click expires
      // unmatched once the day-3 sentinel advances the watermark
      assert(out.contains((1L, Some(10L))) && out.contains((2L, Some(10L))))
      assert(out.contains((90L, None)),
        s"expired unmatched left must emit null-padded: $out")
    } finally q.stop()
    intercept[IllegalArgumentException] {
      EventStreams.intervalJoinStreams(
        Seq(Click(1, 7, ts("2024-01-01 10:00:00"))).toDF(),
        Seq(View(10, 7, ts("2024-01-01 09:30:00"))).toDF(),
        Seq("user_id"), "click_ts", "view_ts", "1 hour", "2 hours",
        joinType = "full_outer")
    }
  }

  test("output keeps left columns then right-minus-keys") {
    val cols = EventStreams.intervalJoinStreams(
      Seq(Click(1, 7, ts("2024-01-01 10:00:00"))).toDF(),
      Seq(View(10, 7, ts("2024-01-01 09:30:00"))).toDF(),
      Seq("user_id"), "click_ts", "view_ts", "1 hour", "2 hours").columns
    assert(cols.toSeq ==
      Seq("click_id", "user_id", "click_ts", "view_id", "view_ts"))
  }
}
