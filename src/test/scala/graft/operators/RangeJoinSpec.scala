package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, ts("2024-01-01 10:15:00")),
    (2L, 10L, ts("2024-01-01 11:00:00")), // exactly at an interval end: excluded
    (3L, 10L, ts("2024-01-01 10:00:00")), // exactly at start: included
    (4L, 20L, ts("2024-01-01 23:30:00")), // interval crossing midnight bins
    (5L, 10L, ts("2024-01-02 09:00:00"))  // no covering interval
  ).toDF("id", "k", "t")

  private lazy val intervals = Seq(
    (10L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "morning"),
    (10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"), "noon"),
    (20L, ts("2024-01-01 20:00:00"), ts("2024-01-02 02:00:00"), "overnight")
  ).toDF("k", "s", "e", "name")

  test("interval join matches half-open [start, end) semantics exactly") {
    val out = RangeJoin.intervalJoin(points, intervals, Seq("k"), "t", "s", "e")
      .select("id", "name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "morning", 2L -> "noon", 3L -> "morning",
      4L -> "overnight"))
  }

  test("binned join equals the naive inequality join on random data") {
    val rnd = new scala.util.Random(5L)
    val base = ts("2024-01-01 00:00:00").getTime
    val pts = (1 to 500).map(i =>
      (i.toLong, (i % 7).toLong,
        new Timestamp(base + rnd.nextInt(200000) * 1000L))).toDF("id", "k", "t")
    val ivs = (1 to 60).map { i =>
      val s = base + rnd.nextInt(180000) * 1000L
      (i.toLong, (i % 7).toLong, new Timestamp(s),
        new Timestamp(s + (600 + rnd.nextInt(7200)) * 1000L))
    }.toDF("iid", "k", "s", "e")
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("t") >= col("s") && col("t") < col("e"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "t", "s", "e",
        binSeconds = 900)
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive, s"diff: ${(binned diff naive) ++ (naive diff binned)}")
  }

  test("an interval exploding past maxBinsPerInterval fails loud, not 10^4x slow") {
    // one year-long interval at 1-hour bins would explode 8760x — the
    // in-plan assertion must name the problem instead
    val yearLong = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), ts("2025-01-01 00:00:00"))
    ).toDF("iid", "k", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(points.select(col("id"), col("k"), col("t")),
        yearLong, Seq("k"), "t", "s", "e").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("raise binSeconds")), s"got: $e")
    // same data passes with a bin size matched to the interval length
    val ok = RangeJoin.intervalJoin(points.select(col("id"), col("k"), col("t")),
      yearLong, Seq("k"), "t", "s", "e", binSeconds = 86400L * 30).collect()
    assert(ok.length == points.filter(col("k") === 10L).count().toInt)
  }

  test("NULL-bound intervals are silently dropped, not asserted on") {
    // pre-guard behavior: explode(sequence(null, ..)) dropped such rows;
    // the explode guard must not turn tolerated data into a crash
    val withNulls = Seq(
      (1L, 10L, Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (2L, 10L, None, Some(ts("2024-01-01 11:00:00"))),
      (3L, 10L, Some(ts("2024-01-01 10:00:00")), None),
      (4L, 10L, None, None)
    ).toDF("iid", "k", "s", "e")
    val out = RangeJoin.intervalJoin(points, withNulls, Seq("k"), "t", "s", "e")
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (3L, 1L)), s"got $out")
  }
}
