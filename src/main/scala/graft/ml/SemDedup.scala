package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column, after SemDeDup
  * (Abbas et al. 2023, arXiv:2303.09540): cluster the corpus, then within
  * each cluster drop every vector whose cosine similarity to a
  * higher-priority cluster member reaches `tau`. Complements the surface
  * dedup family (exact hash / MinHash / SimHash over TEXT) by catching
  * *semantic* duplicates — paraphrases and re-renderings that share no
  * shingles but embed near each other.
  *
  * Scale shape (the whole point of clustering first): pairwise similarity
  * is confined to a cluster, so the comparison volume is Σ|cluster|²
  * ≈ N²/K instead of N², and every cluster is an independent unit of
  * parallelism. Assignment is a map-side argmax against a broadcast
  * centroid table (K·dim doubles — kilobytes for any sane K); the only
  * corpus shuffles are the one hash partition on cluster id for the
  * within-cluster self-join and the final anti-join (AQE broadcasts the
  * dropped-id side when small). No stage ever materializes all-pairs.
  *
  * The greedy rule is the standard non-iterative SemDeDup approximation:
  * members are ranked inside their cluster (by centroid similarity,
  * id-tiebroken) and a member is dropped when ANY higher-ranked member —
  * kept or itself dropped — is within `tau`. One self-join, no
  * fixed-point iteration, deterministic output.
  */
object SemDedup {

  /** Deterministic data-derived centroid pick: the `k` corpus vectors with
    * the smallest `md5(id)` hex digests (id-tiebroken). A hash rank is a
    * seeded uniform sample that any engine reproduces bit-identically —
    * the property the correctness oracle needs — and at scale it is a
    * TABLESAMPLE-grade stand-in for a real k-means pass; production
    * callers with trained centroids (e.g. [[IvfIndex.train]]'s) pass them
    * to [[dropSemanticDuplicates]] directly instead.
    */
  def seedCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "need at least one centroid")
    corpus.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
      .orderBy(md5(col("centroid_id").cast("string").cast("binary")),
        col("centroid_id"))
      .limit(k)
  }

  /** Assign every corpus vector to its max-cosine centroid (ties to the
    * smallest centroid id). Broadcast-join + partial-agg argmax: the
    * K-way fan-out collapses map-side, so the shuffle carries one row per
    * corpus vector, not K.
    */
  def assignClusters(corpus: DataFrame, idCol: String, vecCol: String,
                     centroids: DataFrame): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(centroids))
      .withColumn("__cs", Similarity.cosine(col(vecCol), col("centroid_vec")))
    scored
      .groupBy(col(idCol))
      .agg(
        max_by(
          struct(col("centroid_id").as("cluster_id"),
            col("__cs").as("centroid_cosine")),
          // max_by on (cs, -id): highest cosine wins, smallest id on ties
          struct(col("__cs"), negate(col("centroid_id").cast("double"))))
          .as("__best"),
        first(col(vecCol)).as(vecCol))
      .select(col(idCol), col(vecCol),
        col("__best.cluster_id").as("cluster_id"),
        col("__best.centroid_cosine").as("centroid_cosine"))
  }

  /** The kept survivors: corpus minus semantic duplicates, with each
    * survivor's cluster and (4-dp rounded) centroid cosine.
    *
    * `keepFarthest = false` ranks closest-to-centroid first (dense cores
    * survive); `true` ranks farthest first — the SemDeDup paper's default,
    * which keeps cluster-edge examples for training diversity.
    */
  def dropSemanticDuplicates(corpus: DataFrame, idCol: String, vecCol: String,
                             centroids: DataFrame, tau: Double,
                             keepFarthest: Boolean = false): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau must be in (0, 1], got $tau")
    val assigned = assignClusters(corpus, idCol, vecCol, centroids)
    val order =
      if (keepFarthest) Seq(col("centroid_cosine").asc, col(idCol).asc)
      else Seq(col("centroid_cosine").desc, col(idCol).asc)
    val ranked = assigned.withColumn("__rank",
      row_number().over(Window.partitionBy("cluster_id").orderBy(order: _*)))

    val hi = ranked.select(col("cluster_id"), col("__rank").as("__rank_hi"),
      col(vecCol).as("__vec_hi"))
    val lo = ranked.select(col("cluster_id"), col("__rank").as("__rank_lo"),
      col(idCol).as("__dup_id"), col(vecCol).as("__vec_lo"))
    val dropped = hi.join(lo,
        hi("cluster_id") === lo("cluster_id") &&
          col("__rank_hi") < col("__rank_lo"))
      .filter(Similarity.cosine(col("__vec_hi"), col("__vec_lo")) >= tau)
      .select(col("__dup_id")).distinct()

    ranked
      .join(dropped, ranked(idCol) === dropped("__dup_id"), "left_anti")
      .select(col(idCol), col("cluster_id"),
        round(col("centroid_cosine"), 4).as("centroid_cosine"))
  }
}
