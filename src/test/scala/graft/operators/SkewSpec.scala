package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // heavily skewed: 90% of rows share key 1
  private lazy val large = (1 to 2000).map { i =>
    (if (i <= 1800) 1L else (i % 50).toLong, s"payload$i")
  }.toDF("k", "payload")
  private lazy val small = (0 to 49).map(i => (i.toLong, s"dim$i")).toDF("k", "name")

  test("saltedJoin equals the plain join on skewed data (inner)") {
    val plain = large.join(small, Seq("k"), "inner")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(large, small, Seq("k"), salts = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin equals the plain join (left, incl. unmatched rows)") {
    val missing = Seq((999L, "orphan")).toDF("k", "payload")
    val l = large.unionByName(missing)
    val plain = l.join(small, Seq("k"), "left")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(l, small, Seq("k"), salts = 8, joinType = "left")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin actually scatters the hot key across salt buckets") {
    val salt = large.withColumn("__s",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salt.filter(col("k") === 1).select("__s").distinct().count()
    assert(buckets >= 6, s"hot key only landed in $buckets/8 salt buckets")
  }

  test("fully IDENTICAL hot-key rows still scatter (ordinal salt, not row hash)") {
    // the common hot-key shape: the skewed rows are byte-identical, so a
    // row-content hash would send them all to ONE salt and the skew would
    // not be mitigated at all
    val identical = (1 to 1600).map(_ => (1L, "same")).toDF("k", "payload")
    val salt = identical.withColumn("__s",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salt.select("__s").distinct().count()
    assert(buckets == 8, s"identical rows landed in only $buckets/8 salt buckets")
    // and the join result is still exactly the plain join
    val plain = identical.join(small, Seq("k"), "inner")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(identical, small, Seq("k"), salts = 8)
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("uniqueCol scatter is deterministic, spreads the hot key, and joins right") {
    // shuffle-output inputs need a content-derived salt; a unique id both
    // pins the salt across retries and spreads identical payloads
    val l = large.withColumn("rid", monotonically_increasing_id())
      .groupBy("k", "payload").agg(max("rid").as("rid")) // force a shuffle input
    val plain = l.join(small, Seq("k"), "inner")
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(l, small, Seq("k"), salts = 8,
      uniqueCol = Some("rid"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
    val buckets = l.withColumn("__s", pmod(xxhash64(col("rid")), lit(8L)))
      .filter(col("k") === 1).select("__s").distinct().count()
    assert(buckets >= 6, s"hot key only landed in $buckets/8 salt buckets")
    // agg path accepts it too
    val direct = large.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(_.toString).sorted.toSeq
    val withId = large.withColumn("rid", monotonically_increasing_id())
    val agged = Skew.saltedAgg(withId, Seq("k"), salts = 8,
      uniqueCol = Some("rid"))(
      partials = Seq((count(lit(1)), "pn")),
      finals = Seq((sum(col("pn")), "n")))
      .collect().map(_.toString).sorted.toSeq
    assert(agged == direct)
  }

  test("saltedAgg matches the direct aggregation") {
    val direct = large.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("len"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedAgg(large, Seq("k"), salts = 8)(
      partials = Seq((count(lit(1)), "pn"), (sum(length(col("payload"))), "plen")),
      finals = Seq((sum(col("pn")), "n"), (sum(col("plen")), "len")))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == direct)
  }
}
