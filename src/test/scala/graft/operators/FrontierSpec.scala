package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FrontierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val urls = Seq(
    "https://a.example.com/1", "https://b.example.com/2",
    "https://www.example.com/3", "https://example.com/4",
    "https://other.org/x", "https://other.org/y",
    "/relative/path").zipWithIndex
    .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")

  test("one lane per registrable domain; positions form a permutation; " +
       "scheduled_ms spaces by the delay") {
    val out = Frontier.schedule(urls, "url", delayMs = 500L)
      .collect().map(r => (r.getLong(0), Option(r.getString(2)).orNull,
        r.getLong(3), r.getLong(4)))
    val byDomain = out.groupBy(_._2)
    // all example.com subdomains share ONE politeness lane
    assert(byDomain("example.com").length == 4)
    assert(byDomain("other.org").length == 2)
    assert(byDomain(null).length == 1) // the relative link
    byDomain.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
      rows.foreach { case (_, _, ord, ms) => assert(ms == ord * 500L) }
    }
  }

  test("order within a lane is hash-stable across reruns and " +
       "partitionings, and not path order") {
    val many = (0 until 300).map(i =>
      (i.toLong, f"https://big.site.com/page/$i%04d")).toDF("id", "url")
    val a = Frontier.schedule(many, "url", seed = 3L)
      .select("id", "fetch_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Frontier.schedule(many.repartition(7), "url", seed = 3L)
      .select("id", "fetch_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // not path (= id) order: the sequence of ids by fetch_order is not
    // monotone
    val seq = a.toSeq.sortBy(_._2).map(_._1)
    assert(seq.zip(seq.drop(1)).count { case (x, y) => x < y } <
      seq.length * 3 / 4)
    // a different seed reorders the lane
    val c = Frontier.schedule(many, "url", seed = 4L)
      .select("id", "fetch_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c != a)
  }

  test("scheduleWithDelays spaces each lane by ITS delay (ceil(s*1000)); " +
       "null delays fall back to the default; order matches schedule") {
    val rows = Seq(
      (1L, "https://slow.org/a", Some(2.5)),
      (2L, "https://slow.org/b", Some(2.5)),
      (3L, "https://slow.org/c", Some(2.5)),
      (4L, "https://fast.org/a", Some(0.1)),
      (5L, "https://fast.org/b", Some(0.1)),
      (6L, "https://plain.org/a", None),
      (7L, "https://plain.org/b", None))
      .map { case (i, u, d) => (i, u, d.map(Double.box).orNull) }
      .toDF("id", "url", "cd")
      .select(col("id"), col("url"), col("cd").cast("double"))
    val out = Frontier.scheduleWithDelays(rows, "url", "cd",
        defaultDelayMs = 750L, seed = 5L)
      .select("id", "domain", "fetch_order", "delay_ms", "scheduled_ms")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    out.foreach { case (id, (dom, order, delay, sched)) =>
      val wantDelay = dom match {
        case "slow.org"  => 2500L
        case "fast.org"  => 100L
        case "plain.org" => 750L
      }
      assert(delay == wantDelay, s"id $id delay")
      assert(sched == order * wantDelay, s"id $id spacing")
    }
    // per-lane positions are a permutation
    Seq("slow.org" -> 3, "fast.org" -> 2, "plain.org" -> 2).foreach {
      case (d, n) =>
        val orders = out.values.filter(_._1 == d).map(_._2).toSeq.sorted
        assert(orders == (0L until n.toLong), s"$d lane")
    }
    // same hash order as the fixed-delay form
    val fixed = Frontier.schedule(rows, "url", seed = 5L)
      .select("id", "fetch_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.view.mapValues(_._2).toMap == fixed)
  }

  test("freshOrder: stalest-first within the lane, pinned as-of date, " +
       "null lastmod takes the default age, future lastmod floors at 0, " +
       "score = rank_fp x (1 + age)") {
    val rows = Seq(
      // one lane, ages 14 / 45 / default(30) / future->0
      (1L, "https://s.org/a", "s.org", "2024-02-01", 1000L),
      (2L, "https://s.org/b", "s.org", "2024-01-01", 1000L),
      (3L, "https://s.org/c", "s.org", null, 1000L),
      (4L, "https://s.org/d", "s.org", "2024-03-09", 1000L),
      // second lane with a different rank
      (5L, "https://t.org/a", "t.org", "2024-02-05", 7L))
      .toDF("id", "url", "domain", "lm", "rank_fp")
      .withColumn("lastmod", to_date(col("lm")))
    val out = Frontier.freshOrder(rows, "url", "domain", "lastmod",
        "rank_fp", asOf = "2024-02-15")
      .select("id", "age_days", "fresh_score", "fresh_order")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((14L, 15000L, 2L)))
    assert(out(2L) == ((45L, 46000L, 0L)), "stalest leads the lane")
    assert(out(3L) == ((30L, 31000L, 1L)), "null lastmod -> default 30")
    assert(out(4L) == ((0L, 1000L, 3L)), "future lastmod floors at 0")
    assert(out(5L) == ((10L, 77L, 0L)), "lanes rank independently")
    // deterministic under repartitioning (integer arithmetic + pinned
    // window tiebreak)
    val again = Frontier.freshOrder(rows.repartition(5), "url", "domain",
        "lastmod", "rank_fp", asOf = "2024-02-15")
      .select("id", "age_days", "fresh_score", "fresh_order")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(again == out)
  }

  test("dispatchOrder: the range-partitioned write-time sort equals the " +
       "global row_number total order, at the asked parallelism, " +
       "deterministically under repartitioning") {
    // unique urls make (score desc, url asc) a total order; duplicate
    // scores exercise the tiebreak across shard boundaries
    val rows = (0L until 500L).map(i =>
      (i, f"https://s-${i % 97}.org/p/$i%03d", (i % 13) * 100L))
      .toDF("id", "url", "score")
    val out = Frontier.dispatchOrder(rows, "score", "url", shards = 8)
    assert(out.rdd.getNumPartitions > 1, "must not collapse to one partition")
    val got = out.select("url", "dispatch_order").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = rows.collect().map(r => (r.getString(1), r.getLong(2)))
      .sortBy { case (u, s) => (-s, u) }
      .zipWithIndex.map { case ((u, _), i) => u -> i.toLong }.toMap
    assert(got == expect)
    // same order no matter how the input arrives
    val again = Frontier.dispatchOrder(rows.repartition(7), "score", "url",
        shards = 8)
      .select("url", "dispatch_order").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == expect)
    // a one-shard dispatch is exactly the global sort this avoids
    intercept[IllegalArgumentException] {
      Frontier.dispatchOrder(rows, "score", "url", shards = 1)
    }
  }

  test("dispatchOrder: tiny input where range sampling yields fewer " +
       "partitions than asked still orders exactly (the guard accepts " +
       "1 < nParts <= shards)") {
    // 6 rows, 8 shards asked: the range sampler cannot cut 8 ways —
    // a legitimate small dispatch, not the single-partition hazard
    val rows = Seq(
      (1L, "https://a.org/1", 300L), (2L, "https://a.org/2", 300L),
      (3L, "https://b.org/1", 200L), (4L, "https://b.org/2", 100L),
      (5L, "https://c.org/1", 100L), (6L, "https://c.org/2", 500L))
      .toDF("id", "url", "score")
    val out = Frontier.dispatchOrder(rows, "score", "url", shards = 8)
    val n = out.rdd.getNumPartitions
    assert(n > 1 && n <= 8, s"got $n partitions")
    val got = out.select("url", "dispatch_order").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = rows.collect().map(r => (r.getString(1), r.getLong(2)))
      .sortBy { case (u, s) => (-s, u) }
      .zipWithIndex.map { case ((u, _), i) => u -> i.toLong }.toMap
    assert(got == expect)
  }
}
