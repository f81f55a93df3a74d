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

  /** Connected components by alternating large-star / small-star
    * (Kiveris, Lattanzi, Mirrokni, Rastogi & Vassilvitskii, "Connected
    * Components in MapReduce and Beyond", SoCC 2014) — the O(log n)-ROUND
    * algorithm. [[clusters]]' min-label propagation needs ~diameter
    * rounds, which is fine for shallow near-dup cliques but degrades on
    * chained partial duplicates (A≈B≈C≈… paths, the shingled-document
    * worst case); star contraction halves tree heights every alternation
    * regardless of diameter.
    *
    *  - large-star(u): attach every neighbor v > u to m = min(Γ(u) ∪ {u})
    *  - small-star(u): over edges oriented big→small, attach u and its
    *    smaller neighbors to their minimum
    *
    * The unique fixpoint is the canonical star forest rooted at each
    * component's minimum id, so at convergence the edge list IS the
    * (member → cluster) map. Scale shape: every round shuffles only
    * 16-byte id pairs (never payloads), large-star emits at most one
    * edge per directed input edge so the set never blows up, and each
    * round's result is localCheckpoint-ed to cut lineage.
    */
  def clustersStar(ids: DataFrame, idCol: String, pairs: DataFrame,
                   maxIter: Int = 50): DataFrame = {
    // orient every edge downward (src > dst); self-loops drop
    var edges = pairs
      .select(greatest(col("id_a"), col("id_b")).as("src"),
        least(col("id_a"), col("id_b")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint()
    var converged = edges.limit(1).isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the symmetric view: m = min(Γ(u) ∪ {u}), emit
      // (v, m) for each neighbor v > u. Output stays big→small oriented.
      val sym = edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      // SMALL-STAR: group by the big endpoint, re-attach it and all its
      // smaller neighbors to their minimum
      val sMins = large.groupBy("src").agg(min("dst").as("m"))
      val next = large.join(sMins, Seq("src"))
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(sMins.select(col("src"), col("m").as("dst")))
        .distinct()
        .localCheckpoint()
      // fixpoint test: both frames are distinct sets, so two anti-join
      // emptiness probes (over checkpointed 16-byte rows) decide equality
      converged =
        next.join(edges, Seq("src", "dst"), "left_anti").limit(1).isEmpty &&
          edges.join(next, Seq("src", "dst"), "left_anti").limit(1).isEmpty
      edges = next
      iter += 1
    }
    require(converged,
      s"star contraction did not converge in $maxIter rounds (needs " +
        "~2·log2(n); raise maxIter)")
    val labels = edges.select(col("src").as(idCol), col("dst").as("cluster"))
    ids.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster"), col(idCol)).as("cluster"))
  }

  /** Transitive near-dedup: one survivor (the minimum id) per connected
    * component of the verified near-dup pair graph. `algo` picks the
    * component algorithm: `"labelprop"` ([[clusters]], ~diameter rounds,
    * cheapest on shallow clique graphs) or `"star"` ([[clustersStar]],
    * O(log n) rounds, the safe choice when duplicate CHAINS are possible).
    */
  def dedupTransitive(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.8, numHashes: Int = 64,
                      bands: Int = 16, shingleWidth: Int = 3,
                      algo: String = "labelprop"): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleWidth)
    val assigned = algo match {
      case "labelprop" => clusters(df.select(idCol), idCol, pairs)
      case "star" => clustersStar(df.select(idCol), idCol, pairs)
      case other => throw new IllegalArgumentException(
        s"unknown component algo '$other' (labelprop | star)")
    }
    df.join(assigned, Seq(idCol))
      .filter(col(idCol) === col("cluster"))
      .drop("cluster")
  }

  /** Dedup LINEAGE: `(id, survivor_id)` for every document — survivors
    * map to themselves, dropped documents to the min-id representative
    * of their near-dup component. The audit counterpart of
    * [[dedupTransitive]] a real pipeline has to retain: takedown and
    * consent requests propagate through it ("which kept document
    * absorbed mine"), eval-example provenance resolves through it, and
    * re-crawls consult it instead of re-clustering. Same pair/label
    * machinery, zero extra shuffles — this IS the cluster assignment,
    * published instead of discarded.
    */
  def dedupLineage(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.8, numHashes: Int = 64,
                   bands: Int = 16, shingleWidth: Int = 3,
                   algo: String = "labelprop"): DataFrame = {
    val pairs = MinHashDedup.nearDupPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleWidth)
    val assigned = algo match {
      case "labelprop" => clusters(df.select(idCol), idCol, pairs)
      case "star" => clustersStar(df.select(idCol), idCol, pairs)
      case other => throw new IllegalArgumentException(
        s"unknown component algo '$other' (labelprop | star)")
    }
    assigned.select(col(idCol), col("cluster").as("survivor_id"))
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
