package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every reference key probes true") {
    val ref = (0L until 1000L).map(i => s"key-$i").toDF("k")
    val bf = BloomDedup.buildFilter(ref, "k", fpp = 0.01)
    val misses = ref.filter(!BloomDedup.mightContain(col("k"), bf)).count()
    assert(misses == 0L, "a Bloom filter must never reject a member")
  }

  test("newRows equals the exact anti-join, string keys") {
    val ref = (0L until 500L).map(i => s"doc-$i").toDF("k")
    val incoming = (250L until 1500L).map(i => (s"doc-$i", i)).toDF("k", "v")
    val got = BloomDedup.newRows(incoming, ref, "k")
      .select("v").as[Long].collect().sorted
    val want = incoming.join(ref, Seq("k"), "left_anti")
      .select("v").as[Long].collect().sorted
    assert(got.sameElements(want))
    assert(got.head == 500L && got.length == 1000)
  }

  test("newRows equals the exact anti-join, long keys") {
    val ref = (0L until 300L).map(_ * 7L).toDF("k")
    val incoming = (0L until 3000L).map(i => (i, i % 13)).toDF("k", "grp")
    val got = BloomDedup.newRows(incoming, ref, "k")
      .select("k").as[Long].collect().toSet
    val want = incoming.join(ref, Seq("k"), "left_anti")
      .select("k").as[Long].collect().toSet
    assert(got == want)
  }

  test("prefilter actually prunes: mostly-novel stream mostly skips the join") {
    val ref = (0L until 2000L).map(i => s"seen-$i").toDF("k")
    val bf = BloomDedup.buildFilter(ref, "k", fpp = 0.01)
    val novel = (0L until 10000L).map(i => s"new-$i").toDF("k")
    val maybe = novel.filter(BloomDedup.mightContain(col("k"), bf)).count()
    // fpp 1%: expect ~100 of 10000 to leak into the confirm join; 5x
    // headroom keeps the assertion sturdy across sketch versions
    assert(maybe <= 500L,
      s"$maybe of 10000 novel keys probed true — filter not pruning")
  }

  test("approx variant loses only might_contain hits; exact keeps FP rows") {
    val ref = (0L until 4000L).map(i => s"ref-$i").toDF("k")
    val bf = BloomDedup.buildFilter(ref, "k", fpp = 0.05)
    val incoming = (3000L until 8000L).map(i => s"ref-$i").toDF("k")
    val exact = BloomDedup.newRows(incoming, ref, "k", filter = Some(bf))
      .count()
    val approx = BloomDedup.newRowsApprox(incoming, ref, "k",
      filter = Some(bf)).count()
    assert(exact == 4000L, "exact variant must keep every truly-new row")
    assert(approx <= exact, "approx can only lose rows, never add")
  }

  test("empty reference: everything is new, nothing crashes") {
    val ref = Seq.empty[String].toDF("k")
    val incoming = (0L until 100L).map(i => s"x-$i").toDF("k")
    assert(BloomDedup.newRows(incoming, ref, "k").count() == 100L)
    assert(BloomDedup.newRowsApprox(incoming, ref, "k").count() == 100L)
  }

  test("non-BMP string keys round-trip the UTF8 probe") {
    val ref = Seq("emoji-😀-key", "plain").toDF("k")
    val bf = BloomDedup.buildFilter(ref, "k")
    val probes = Seq("emoji-😀-key", "plain", "emoji--key")
      .toDF("k")
      .select(col("k"), BloomDedup.mightContain(col("k"), bf).as("m"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(probes("emoji-😀-key"), "member with non-BMP char missed")
    assert(probes("plain"))
  }

  test("sharded bank: no false negatives, routing matches SQL xxhash64, " +
       "string + long keys, empty shards tolerated") {
    val ref = (0L until 2000L).map(i => s"key-$i").toDF("k")
    val bank = BloomDedup.buildBank(ref, "k", shards = 7, fpp = 0.01)
    assert(bank.shards == 7)
    val misses = ref.filter(!BloomDedup.mightContainBank(col("k"), bank))
      .count()
    assert(misses == 0L, "a bank must never reject a member of any shard")
    // kernel routing parity with the SQL xxhash64 the build used: keys
    // the SQL routes to shard s must be members (already covered by the
    // no-false-negative check) AND non-members mostly reject
    val novel = (5000L until 6000L).map(i => s"key-$i").toDF("k")
    val fps = novel.filter(BloomDedup.mightContainBank(col("k"), bank))
      .count()
    assert(fps < 50, s"~1% fpp expected, got $fps/1000")
    // long keys and a bank with EMPTY shards (3 keys over 16 shards)
    val tiny = Seq(10L, 11L, 12L).toDF("k")
    val tinyBank = BloomDedup.buildBank(tiny, "k", shards = 16)
    assert(tiny.filter(!BloomDedup.mightContainBank(col("k"), tinyBank))
      .count() == 0L)
    assert(Seq(99L).toDF("k")
      .filter(BloomDedup.mightContainBank(col("k"), tinyBank))
      .count() == 0L, "empty/near-empty shards reject non-members")
    intercept[IllegalArgumentException](
      BloomDedup.buildBank(tiny, "k", shards = 0))
  }

  test("newRowsSharded equals the exact anti-join and the single-filter " +
       "path") {
    val ref = (0L until 500L).map(i => s"doc-$i").toDF("k")
    val incoming = (250L until 1500L).map(i => (s"doc-$i", i)).toDF("k", "v")
    val sharded = BloomDedup.newRowsSharded(incoming, ref, "k", shards = 5)
      .select("v").as[Long].collect().sorted
    val single = BloomDedup.newRows(incoming, ref, "k")
      .select("v").as[Long].collect().sorted
    val want = incoming.join(ref, Seq("k"), "left_anti")
      .select("v").as[Long].collect().sorted
    assert(sharded.sameElements(want) && single.sameElements(want))
    // empty reference through the bank path: everything is new
    val none = BloomDedup.newRowsSharded(incoming,
      ref.filter(lit(false)), "k", shards = 5)
    assert(none.count() == incoming.count())
  }
}
