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
}
