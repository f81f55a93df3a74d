package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph: iterative
  * min-label propagation (each node repeatedly adopts the smallest id
  * reachable through its edges) — the standard Spark-only way to turn
  * pairwise near-dup evidence into duplicate CLUSTERS, so transitive
  * chains (A≈B, B≈C but A̸≈C) dedup as one group.
  *
  * Scale shape: each iteration is one shuffle join on node id; iterations
  * needed ≈ graph diameter (near-dup cliques are shallow, typically ≤ 3).
  * Convergence is detected by an aggregate over the label frame, and each
  * iteration's result is localCheckpoint-ed so lineage doesn't grow
  * exponentially across iterations.
  */
object NearDupClusters {

  /** Assign every id its cluster representative (the minimum id reachable
    * via `pairs`). `ids` must have column `idCol`; `pairs` columns
    * `id_a`/`id_b`. Nodes with no pairs form singleton clusters.
    *
    * Scale shape: propagation runs ONLY over nodes that appear in an edge
    * — singletons are identity clusters and never enter the loop. On a
    * corpus where near-dups are a small fraction (the usual case), every
    * per-iteration join shrinks from |corpus| to ~2·|pairs| rows; the
    * full id set is joined back once at the end.
    */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame,
               maxIter: Int = 20): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint() // reused every iteration: cut the LSH lineage once

    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node's candidate label: min over neighbors' labels and its own
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("cluster", "n_cluster"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("n_cluster").as("n_min"))
      // the convergence flag rides the checkpointed frame, so detecting it
      // is a filter over cached partitions — not an extra join job
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("n_min"), col("cluster"))).as("cluster"),
          (coalesce(col("n_min"), col("cluster")) < col("cluster")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).limit(1).isEmpty
      labels = next.drop("__changed")
      iter += 1
    }
    // singletons (no edges) are their own cluster
    ids.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster"), col(idCol)).as("cluster"))
  }

  /** Transitive near-dedup: one survivor (the minimum id) per connected
    * component of the verified near-dup pair graph.
    */
  def dedupTransitive(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, numHashes: Int = 64,
                      bands: Int = 16, shingleWidth: Int = 3): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleWidth)
    val assigned = clusters(df.select(idCol), idCol, pairs)
    df.join(assigned, Seq(idCol))
      .filter(col(idCol) === col("cluster"))
      .drop("cluster")
  }

  /** [[dedupTransitive]] with a QUALITY survivor policy: instead of the
    * minimum id, each near-dup cluster keeps its best document by
    * `scoreCol` (ties break by id ascending — deterministic in any
    * engine) — the real-world resolution when duplicates differ in
    * completeness or cleanliness: keep the best copy, drop the rest.
    *
    * Scale shape: the same pair/label machinery as [[dedupTransitive]],
    * plus ONE window partitioned by cluster — near-dup clusters are
    * small and singletons are one-row partitions, so no group can
    * serialize a task.
    */
  def dedupKeepBest(df: DataFrame, idCol: String, textCol: String,
                    scoreCol: String,
                    threshold: Double = 0.8, numHashes: Int = 64,
                    bands: Int = 16, shingleWidth: Int = 3): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleWidth)
    val assigned = clusters(df.select(idCol), idCol, pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.join(assigned, Seq(idCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "cluster")
  }
}
