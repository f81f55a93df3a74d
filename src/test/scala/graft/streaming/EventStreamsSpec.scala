package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), user, typ, v)

  private val batch = Seq(
    ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
    ev(2, "2024-01-01 10:15:00", 1, "click", 2.0),
    ev(3, "2024-01-01 10:55:00", 2, "view", 3.0),
    ev(4, "2024-01-01 11:05:00", 2, "click", 4.0),
    ev(2, "2024-01-01 10:15:00", 1, "click", 2.0)) // duplicate event_id 2

  test("windowedCounts on a real stream (MemoryStream → memory sink)") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.windowedCounts(src.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    src.addData(batch.take(4): _*)
    q.processAllAvailable()
    // advance the watermark far enough to close the 10:00 and 11:00 windows
    src.addData(ev(99, "2024-01-01 15:00:00", 9, "late", 0.0))
    q.processAllAvailable()
    val rows = spark.table("wc")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "view", 1L, 3.0)))
    assert(rows.contains(("2024-01-01 11:00:00.0", "click", 1L, 4.0)))
  }

  test("windowedCounts batch/stream parity") {
    val out = EventStreams.windowedCounts(batch.take(4).toDF())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("2024-01-01 10:00:00.0", "click", 2L),
      ("2024-01-01 10:00:00.0", "view", 1L),
      ("2024-01-01 11:00:00.0", "click", 1L)))
  }

  test("streaming dedup drops duplicate event ids within watermark") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.dedupEvents(src.toDF())
      .writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    src.addData(batch: _*) // includes duplicate id 2
    q.processAllAvailable()
    val n = spark.table("dd").count()
    q.stop()
    assert(n == 4, s"expected 4 deduped events, got $n")
  }

  test("sessionize groups events by gap") {
    // batch mode: session_window works identically
    val out = EventStreams.sessionize(batch.take(4).toDF(), gap = "30 minutes")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // user 1: events at 10:05+10:15 → one session of 2
    // user 2: 10:55 and 11:05 within 30min gap → one session of 2
    assert(out.toSeq == Seq((1L, 2L), (2L, 2L)))
  }

  test("userTotals complete-mode aggregation on stream") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.userTotals(src.toDF())
      .writeStream.format("memory").queryName("ut")
      .outputMode("complete").start()
    src.addData(batch.take(4): _*)
    q.processAllAvailable()
    val totals = spark.table("ut").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    assert(totals == Map(1L -> 2L, 2L -> 2L))
  }
  test("stateful sessionizer closes sessions by gap and by event-time timeout") {
    implicit val sql = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = EventStreams.sessionizeStateful(src.toDF(),
        gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("ss")
      .outputMode("append").start()
    // session A for user 1: two events 10 minutes apart
    src.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 2.5))
    q.processAllAvailable()
    // a much later event starts session B and closes A by gap
    src.addData(ev(3, "2024-01-01 13:00:00", 1, "click", 4.0))
    q.processAllAvailable()
    // advance the watermark past B's gap horizon (13:30) in two steps so
    // the event-time timeout fires for user 1 with no new data for them
    src.addData(ev(4, "2024-01-01 20:00:00", 2, "view", 0.0))
    q.processAllAvailable()
    src.addData(ev(5, "2024-01-02 10:00:00", 3, "view", 0.0))
    q.processAllAvailable()
    val rows = spark.table("ss")
      .select("user_id", "session_start", "session_end", "n_events", "session_value")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
    q.stop()
    assert(rows.contains((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.5)),
      s"gap-closed session A missing from $rows")
    assert(rows.contains((1L, "2024-01-01 13:00:00.0", "2024-01-01 13:00:00.0", 1L, 4.0)),
      s"timeout-closed session B missing from $rows")
  }
  test("file-source stream: parquet files land in a directory, windows close downstream") {
    // the kafka-less integration path a cluster actually runs: files
    // arrive in a directory, readStream tails it
    val dir = tmpDir("stream_in")
    val ckpt = tmpDir("stream_ckpt")
    val schema = batch.take(1).toDF().schema
    batch.take(2).toDF().write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventStreams.windowedCounts(stream, "1 hour", "1 minute")
      .writeStream.format("memory").queryName("fs_wc")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable()
    // second file arrives later and advances the watermark past 10:xx
    Seq(ev(7, "2024-01-01 13:00:00", 3, "late", 0.0)).toDF()
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val rows = spark.table("fs_wc")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L)),
      s"expected closed 10:00 click window in $rows")
  }
}
