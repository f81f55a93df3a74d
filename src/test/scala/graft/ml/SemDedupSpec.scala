package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two orthogonal cluster directions with planted near-duplicates:
  //   cluster X: 1 (axis), 2 (≈1, cos .9998), 3 (tilted, cos ≈ .707)
  //   cluster Y: 10 (axis), 11 (≈10), 12 (independent-ish, cos ≈ .707)
  private def corpus = Seq(
    (1L, Array(1.0, 0.0, 0.0, 0.0)),
    (2L, Array(1.0, 0.02, 0.0, 0.0)),
    (3L, Array(1.0, 1.0, 0.0, 0.0)),
    (10L, Array(0.0, 0.0, 1.0, 0.0)),
    (11L, Array(0.0, 0.0, 1.0, 0.02)),
    (12L, Array(0.0, 0.0, 1.0, 1.0)))
    .toDF("vec_id", "embedding")

  private def centroids = Seq(
    (100L, Array(1.0, 0.0, 0.0, 0.0)),
    (200L, Array(0.0, 0.0, 1.0, 0.0)))
    .toDF("centroid_id", "centroid_vec")

  test("assignment is argmax cosine with centroid-id tiebreak") {
    val out = SemDedup.assignClusters(corpus, "vec_id", "embedding", centroids)
      .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 100L, 2L -> 100L, 3L -> 100L,
      10L -> 200L, 11L -> 200L, 12L -> 200L))
  }

  test("greedy within-cluster drop at tau") {
    // closest-first ranking: 1 and 2 are ≈identical to their centroids so
    // rank 1-2; the dup (2, 11) drops, the tilted members (3, 12) survive
    // at tau = 0.9
    val kept = SemDedup.dropSemanticDuplicates(corpus, "vec_id", "embedding",
        centroids, tau = 0.9)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 10L, 12L))
  }

  test("keepFarthest reverses the survivor priority") {
    // farthest-first in cluster X ranks 3 (cos .707), then 2 (.9998),
    // then 1 (1.0): 3's pairs stay under .9 so nothing drops against it,
    // but 2 now outranks 1 and cos(1,2) ≈ .9998 drops 1 — the mirror of
    // the closest-first outcome.
    val kept = SemDedup.dropSemanticDuplicates(corpus, "vec_id", "embedding",
        centroids, tau = 0.9, keepFarthest = true)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L, 11L, 12L))
    // at tau = 0.7 the .707 tilted-vs-axis pairs also collapse: only the
    // farthest-ranked member of each cluster survives
    val keptTight = SemDedup.dropSemanticDuplicates(corpus, "vec_id",
        "embedding", centroids, tau = 0.7, keepFarthest = true)
      .select("vec_id").as[Long].collect().sorted
    assert(keptTight.toSeq == Seq(3L, 12L))
  }

  test("drop is greedy against ranked-above members, kept or not") {
    // chain in one cluster: a (axis, rank 1), b (cos(a,b) ≈ .98 → dropped),
    // c with cos(b,c) ≈ .98 but cos(a,c) ≈ .92 — c is dropped because b
    // ranks above it, even though b itself was dropped (the documented
    // non-transitive SemDeDup approximation).
    val chain = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(1.0, 0.2, 0.0, 0.0)),
      (3L, Array(1.0, 0.4, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val oneCent = Seq((100L, Array(1.0, 0.0, 0.0, 0.0)))
      .toDF("centroid_id", "centroid_vec")
    val kept = SemDedup.dropSemanticDuplicates(chain, "vec_id", "embedding",
        oneCent, tau = 0.95)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L))
  }

  test("seed centroid pick is a deterministic md5 rank") {
    val picked = SemDedup.seedCentroids(corpus, "vec_id", "embedding", k = 2)
      .select("centroid_id").as[Long].collect().toSeq
    val expected = corpus.select($"vec_id",
        md5($"vec_id".cast("string").cast("binary")).as("h"))
      .orderBy("h", "vec_id").limit(2)
      .select("vec_id").as[Long].collect().toSeq
    assert(picked == expected)
    assert(picked.toSet.subsetOf(Set(1L, 2L, 3L, 10L, 11L, 12L)))
  }

  test("survivor output carries cluster and rounded centroid cosine") {
    val row = SemDedup.dropSemanticDuplicates(corpus, "vec_id", "embedding",
        centroids, tau = 0.9)
      .filter($"vec_id" === 3L).collect().head
    assert(row.getLong(1) == 100L)
    assert(math.abs(row.getDouble(2) - 0.7071) < 1e-9)
  }
}
