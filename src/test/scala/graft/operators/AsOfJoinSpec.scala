package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // ts(...) helper inherited from SparkSpec

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")),
    (2L, 10L, ts("2024-01-01 11:00:00")),
    (3L, 10L, ts("2024-01-01 09:00:00")), // before any right row
    (4L, 20L, ts("2024-01-01 10:30:00")),
    (5L, 30L, ts("2024-01-01 10:00:00"))  // key with no right rows
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 09:30:00"), "a"),
    (10L, ts("2024-01-01 10:00:00"), "b"), // equal-time: matches inclusively
    (10L, ts("2024-01-01 10:45:00"), "c"),
    (20L, ts("2024-01-01 08:00:00"), "x")
  ).toDF("k", "t", "v")

  test("backward as-of join picks the latest right row at-or-before each left row") {
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t")
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(out == Map(
      1L -> "b", // 10:00 matches the equal-time right row
      2L -> "c",
      3L -> null, // nothing at or before 09:00
      4L -> "x",
      5L -> null)) // key 30 has no right rows
  }

  test("forward direction picks the FIRST right row at-or-after; " +
       "nearest picks the smaller gap with ties backward") {
    val fwd = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
        direction = "forward")
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(fwd == Map(
      1L -> "b", // equal time matches inclusively in BOTH directions
      2L -> null, // nothing at or after 11:00 for key 10
      3L -> "a", // 09:00 looks forward to 09:30
      4L -> null, // key 20's only right row is earlier
      5L -> null), fwd.toString)
    // nearest: id 2 has only a backward match; id 3 only forward;
    // id 1 ties at distance 0 -> backward (same row here)
    val near = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
        direction = "nearest")
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(near == Map(
      1L -> "b", 2L -> "c", 3L -> "a", 4L -> "x", 5L -> null),
      near.toString)
    // a genuine two-sided case: 10:20 sits 20 min after "b", 25 min
    // before "c" -> nearest takes the backward "b"
    val mid = Seq((9L, 10L, ts("2024-01-01 10:20:00"))).toDF("id", "k", "t")
    val nm = AsOfJoin.asOfJoin(mid, right, Seq("k"), "t", "t",
        direction = "nearest")
      .select("right_v").head().getString(0)
    assert(nm == "b")
    // and with the forward side strictly closer, forward wins
    val mid2 = Seq((9L, 10L, ts("2024-01-01 10:40:00"))).toDF("id", "k", "t")
    val nm2 = AsOfJoin.asOfJoin(mid2, right, Seq("k"), "t", "t",
        direction = "nearest")
      .select("right_v").head().getString(0)
    assert(nm2 == "c")
    // forward tolerance bounds the window on the matching side
    val ft = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
        direction = "forward", toleranceSeconds = Some(600))
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(ft(3L) == null, "09:30 is 30 min after 09:00 — out of a 10-min window")
    assert(ft(1L) == "b")
    intercept[IllegalArgumentException](
      AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t", direction = "sideways"))
  }

  test("tolerance voids matches older than the window") {
    val out = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
        toleranceSeconds = Some(30 * 60))
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    // click 4 at 10:30 vs view at 08:00 → 2.5h old → voided
    assert(out(4L) == null)
    assert(out(1L) == "b" && out(2L) == "c")
  }

  test("tolerance bounds are µs-exact: a right row a fraction of a second " +
       "outside the window is voided (no whole-second truncation)") {
    // real gap 1.9s; truncated-to-seconds gap would be 60-59 = 1s and a
    // seconds-cast check would wrongly pass it under tol=1
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00.9"))).toDF("id", "k", "t")
    val rOut = Seq((10L, ts("2024-01-01 09:59:59.0"), "late"))
      .toDF("k", "t", "v")
    val rIn = Seq((10L, ts("2024-01-01 10:00:00.05"), "fresh"))
      .toDF("k", "t", "v")
    for (dir <- Seq("backward", "nearest")) {
      val out = AsOfJoin.asOfJoin(l, rOut, Seq("k"), "t", "t",
          toleranceSeconds = Some(1), direction = dir)
        .select("right_v").head()
      assert(out.isNullAt(0), s"$dir: 1.9s-old row must void under tol=1s")
      val in = AsOfJoin.asOfJoin(l, rIn, Seq("k"), "t", "t",
          toleranceSeconds = Some(1), direction = dir)
        .select("right_v").head()
      assert(in.getString(0) == "fresh", s"$dir: 0.85s-old row must match")
    }
    // forward mirror: right 1.9s AFTER left under tol=1 voids
    val lF = Seq((1L, 10L, ts("2024-01-01 09:59:59.0"))).toDF("id", "k", "t")
    val rF = Seq((10L, ts("2024-01-01 10:00:00.9"), "far")).toDF("k", "t", "v")
    assert(AsOfJoin.asOfJoin(lF, rF, Seq("k"), "t", "t",
        toleranceSeconds = Some(1), direction = "forward")
      .select("right_v").head().isNullAt(0))
    // bucketed variant shares the µs-exact bound
    assert(AsOfJoin.asOfJoinBucketed(l, rOut, Seq("k"), "t", "t",
        bucketSeconds = 3600, toleranceSeconds = Some(1))
      .select("right_v").head().isNullAt(0))
  }

  test("NULL right timestamps never match; NULL left timestamps stay unmatched") {
    // DuckDB ASOF / pandas merge_asof semantics: a NULL-time right row is
    // not a candidate for any left row (it would otherwise sort nulls-first
    // and be carried onto everything), and a NULL-time left row has no match
    val nullRight = Seq(
      (10L, null.asInstanceOf[Timestamp], "poison"),
      (10L, ts("2024-01-01 09:30:00"), "a")
    ).toDF("k", "t", "v")
    val nullLeft = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[Timestamp])
    ).toDF("id", "k", "t")
    val out = AsOfJoin.asOfJoin(nullLeft, nullRight, Seq("k"), "t", "t")
      .select("id", "right_v").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
    assert(out == Map(
      1L -> "a",   // the NULL-time right row must NOT shadow the real one
      2L -> null)) // NULL left time: unmatched
  }

  test("nearest runs in ONE shuffle with no join-back or row tag, and " +
       "NULL left times stay unmatched in every direction") {
    val near = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
      direction = "nearest")
    near.collect()
    val plan = near.queryExecution.executedPlan.toString
    // AQE renders shuffles as ShuffleQueryStage; non-AQE as ShuffleExchange
    val exchanges = "ShuffleQueryStage \\d|ShuffleExchange".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1,
      s"nearest must be one union + one hash exchange (two window frames " +
        s"over the same partitioning), saw $exchanges:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      "nearest must not join two directional passes back together")
    // the nondeterministic-tag hazard the old shape had: a NULL left time
    // must come out unmatched in forward AND nearest (desc ordering
    // defaults nulls-LAST, which would carry the earliest right payload)
    val nullLeft = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, null.asInstanceOf[Timestamp])
    ).toDF("id", "k", "t")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsOfJoin.asOfJoin(nullLeft, right, Seq("k"), "t", "t",
          direction = dir)
        .select("id", "right_v").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1)).orNull).toMap
      assert(out(2L) == null, s"direction=$dir must leave NULL left time unmatched")
      assert(out(1L) == "b", s"direction=$dir") // equal-time tie -> backward
    }
    // nearest tolerance bounds BOTH directions independently: at 10:20
    // the backward "b" is 20 min old (in a 25-min window) and the forward
    // "c" 25 min ahead (outside) -> backward despite forward proximity rules
    val mid = Seq((9L, 10L, ts("2024-01-01 10:21:00"))).toDF("id", "k", "t")
    val tol = AsOfJoin.asOfJoin(mid, right, Seq("k"), "t", "t",
        direction = "nearest", toleranceSeconds = Some(22 * 60))
      .select("right_v").head().getString(0)
    assert(tol == "b",
      "forward candidate (24 min ahead) must be voided by the 22-min window")
  }

  test("bucketed variant equals the plain as-of join (fixture, nulls, tolerance)") {
    for (bucketSecs <- Seq(60L, 1800L, 7 * 86400L)) {
      val plain = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t")
        .collect().map(_.toString).sorted.toSeq
      val bucketed = AsOfJoin.asOfJoinBucketed(left, right, Seq("k"), "t", "t",
          bucketSeconds = bucketSecs)
        .collect().map(_.toString).sorted.toSeq
      assert(bucketed == plain, s"bucketSeconds=$bucketSecs")
    }
    val tolPlain = AsOfJoin.asOfJoin(left, right, Seq("k"), "t", "t",
      toleranceSeconds = Some(1800)).collect().map(_.toString).sorted.toSeq
    val tolBucketed = AsOfJoin.asOfJoinBucketed(left, right, Seq("k"), "t", "t",
      bucketSeconds = 600, toleranceSeconds = Some(1800))
      .collect().map(_.toString).sorted.toSeq
    assert(tolBucketed == tolPlain)
  }

  test("bucketed variant matches plain on a HOT key holding half of all rows") {
    val rnd = new scala.util.Random(7L)
    val base = ts("2024-01-01 00:00:00").getTime
    // one key owns 50% of left and right rows — the shape that serializes
    // the plain window on one task
    def key(i: Int): Long = if (i % 2 == 0) 1L else (i % 23).toLong
    val l = (1 to 4000).map(i =>
      (i.toLong, key(i), new java.sql.Timestamp(base + rnd.nextInt(500000) * 100L)))
      .toDF("id", "k", "t")
    val r = (1 to 1000).map { i =>
      (key(i), new java.sql.Timestamp(base + rnd.nextInt(500000) * 100L), s"v$i")
    }.toDF("k", "t", "v")
      // duplicate right timestamps per key are resolved arbitrarily; dedup
      // for a deterministic comparison (as the scaladoc prescribes)
      .groupBy("k", "t").agg(max("v").as("v"))
    val plain = AsOfJoin.asOfJoin(l, r, Seq("k"), "t", "t")
      .collect().map(_.toString).sorted.toSeq
    val bucketed = AsOfJoin.asOfJoinBucketed(l, r, Seq("k"), "t", "t",
        bucketSeconds = 3600)
      .collect().map(_.toString).sorted.toSeq
    assert(bucketed == plain)
  }

  test("matches a per-pair reference computation on real events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e2 = graft.SparkEntry.normalizeEventTs(raw)
    val clicks = e2.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").limit(200)
    val views = e2.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("value").as("v"))
    val got = AsOfJoin.asOfJoin(clicks, views, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("right_ts")).collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1)).orNull).toMap
    // reference: driver-side max right ts <= left ts per user
    val vRows = views.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    clicks.collect().foreach { c =>
      val (id, u, t) = (c.getLong(0), c.getLong(1), c.getTimestamp(2))
      val expect = vRows.getOrElse(u, Seq.empty)
        .filter(!_.after(t)).sorted(Ordering.by((x: Timestamp) => x.getTime))
        .lastOption.orNull
      assert(got(id) == expect, s"event $id user $u at $t: got ${got(id)}, want $expect")
    }
  }
}
