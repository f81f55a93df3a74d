package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NearDupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds connected components") {
    val ids = (1L to 8L).toDF("id")
    // components: {1,2,3} (chain), {4,5}, {6}, {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val out = NearDupClusters.clusters(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L, 7L -> 7L, 8L -> 7L))
  }

  test("long chain converges to the global minimum") {
    val n = 12L
    val ids = (1L to n).toDF("id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = NearDupClusters.clusters(ids, "id", pairs)
      .select("cluster").distinct().as[Long].collect()
    assert(out.toSeq == Seq(1L))
  }

  test("transitive dedup keeps one survivor per chain") {
    // A ≈ B and B ≈ C (shifted windows) — A and C share less but must
    // land in the same cluster through B
    // distinct two-letter words (tokenizer keeps letter runs only)
    val words = (0 until 30).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val a = words.slice(0, 20).mkString(" ")
    val b = words.slice(4, 24).mkString(" ")
    val c = words.slice(8, 28).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, c),
      (4L, "entirely different text about cooking pasta with garlic and olive oil"))
      .toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)), "A and C should not pair directly at 0.5")
    val out = NearDupClusters.dedupTransitive(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 4L), s"expected chain collapsed to {1,4}, got ${out.toSeq}")
  }

  test("keep-best survivor policy keeps the highest-scoring copy, " +
      "ties break by id") {
    val words = (0 until 30).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val a = words.slice(0, 20).mkString(" ")
    val b = words.slice(4, 24).mkString(" ")
    val c = words.slice(8, 28).mkString(" ")
    val docs = Seq((1L, a, 10L), (2L, b, 99L), (3L, c, 50L),
        (4L, "entirely different text about cooking pasta with garlic", 1L))
      .toDF("doc_id", "text", "quality")
    // chain {1,2,3}: doc 2 has the best quality and must survive —
    // min-id dedup would have kept doc 1
    val out = NearDupClusters.dedupKeepBest(docs, "doc_id", "text",
        "quality", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 4L), s"expected {2,4}, got ${out.toSeq}")
    // tie on score: lower id wins
    val tied = docs.withColumn("quality", lit(7L))
    val out2 = NearDupClusters.dedupKeepBest(tied, "doc_id", "text",
        "quality", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(out2.toSeq == Seq(1L, 4L))
  }

  test("star contraction matches label propagation on random graphs") {
    // fixed-seed random pair graphs of several densities, cross-checked
    // component-for-component against the label-propagation result
    val rnd = new scala.util.Random(42)
    for (edgeCount <- Seq(0, 5, 30, 120)) {
      val n = 40L
      val ids = (0L until n).toDF("id")
      val pairRows = Seq.fill(edgeCount)(
        (rnd.nextInt(n.toInt).toLong, rnd.nextInt(n.toInt).toLong))
      val pairs = pairRows.toDF("id_a", "id_b")
      val byProp = NearDupClusters.clusters(ids, "id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byStar = NearDupClusters.clustersStar(ids, "id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byStar == byProp, s"diverged at $edgeCount edges")
    }
  }

  test("star contraction collapses a 200-node path in O(log n) rounds") {
    // a path graph has diameter 199: label propagation would need ~199
    // joins, star contraction must finish inside 12 alternations (the
    // maxIter bound below IS the assertion — convergence is required)
    val n = 200L
    val ids = (0L until n).toDF("id")
    // permute ids so the minimum sits mid-path, not at an endpoint
    val perm = new scala.util.Random(7).shuffle((0L until n).toVector)
    val pairs = (0 until n.toInt - 1)
      .map(i => (perm(i), perm(i + 1))).toDF("id_a", "id_b")
    val out = NearDupClusters.clustersStar(ids, "id", pairs, maxIter = 12)
      .select("cluster").distinct().as[Long].collect()
    assert(out.toSeq == Seq(0L))
  }

  test("star contraction handles self-loops, duplicate and reversed edges") {
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 2L), (5L, 4L))
      .toDF("id_a", "id_b")
    val out = NearDupClusters.clustersStar(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("dedupTransitive algo=star keeps the same survivors") {
    val words = (0 until 30).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val docs = Seq(
      (1L, words.slice(0, 20).mkString(" ")),
      (2L, words.slice(4, 24).mkString(" ")),
      (3L, words.slice(8, 28).mkString(" ")),
      (4L, "entirely different text about cooking pasta with garlic and olive oil"))
      .toDF("doc_id", "text")
    val out = NearDupClusters.dedupTransitive(docs, "doc_id", "text",
        threshold = 0.5, algo = "star")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 4L))
    val e = intercept[IllegalArgumentException] {
      NearDupClusters.dedupTransitive(docs, "doc_id", "text", algo = "nope")
    }
    assert(e.getMessage.contains("unknown component algo"))
  }

  test("dedupLineage maps every doc to its absorbing survivor, " +
       "consistent with dedupTransitive, total over the corpus") {
    val words = (1 to 40).map(i => s"w$i")
    val docs = Seq(
      (1L, words.slice(0, 20).mkString(" ")),   // chain 1-2-3
      (2L, words.slice(4, 24).mkString(" ")),
      (3L, words.slice(8, 28).mkString(" ")),
      (4L, "entirely different text about cooking pasta with garlic and olive oil"))
      .toDF("doc_id", "text")
    for (algo <- Seq("labelprop", "star")) {
      val lin = NearDupClusters.dedupLineage(docs, "doc_id", "text",
          threshold = 0.5, algo = algo)
        .as[(Long, Long)].collect().toMap
      assert(lin == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L),
        s"$algo: $lin")
      // agreement: survivors are exactly the self-mapped ids
      val survivors = NearDupClusters.dedupTransitive(docs, "doc_id",
          "text", threshold = 0.5, algo = algo)
        .select("doc_id").as[Long].collect().toSet
      assert(lin.filter { case (k, v) => k == v }.keySet == survivors)
    }
  }
}
