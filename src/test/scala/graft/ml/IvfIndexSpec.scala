package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters in 8d: axis directions with noise. */
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f))
    (0 until 90).map { i =>
      val c = i % 3
      val v = base(c).clone()
      (0 until 8).foreach(j => v(j) = v(j) + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "true_cluster")
  }

  test("fit produces k centroids aligned with the planted clusters") {
    val df = clustered
    val model = IvfIndex.fit(df, "embedding", k = 3, seed = 42)
    assert(model.k == 3 && model.dim == 8)
    // every planted cluster maps to exactly one distinct centroid
    val assigned = df.withColumn("cell", IvfIndex.assign($"embedding", model))
      .select("true_cluster", "cell").distinct().collect()
      .map(r => r.getInt(0) -> r.getInt(1))
    assert(assigned.length == 3, s"cluster/cell mapping not 1:1: ${assigned.toSeq}")
    assert(assigned.map(_._2).distinct.length == 3)
  }

  test("assignment is deterministic") {
    val df = clustered
    val model = IvfIndex.fit(df, "embedding", k = 3)
    val a = df.select(IvfIndex.assign($"embedding", model)).as[Int].collect()
    val b = df.select(IvfIndex.assign($"embedding", model)).as[Int].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("ivf topK finds same-cluster neighbors; nprobe=k equals brute force") {
    val df = clustered
    val model = IvfIndex.fit(df, "embedding", k = 3)
    val queries = df.filter($"vec_id" < 3)
    val ivf = IvfIndex.topK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // neighbors of each query are from its own planted cluster
    val clusterOf = df.select("vec_id", "true_cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivf.foreach { case (q, n) =>
      assert(clusterOf(q) == clusterOf(n),
        s"neighbor $n of query $q crosses clusters")
    }
    // full probe == exact brute force
    val full = IvfIndex.topK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 5, nprobe = 3)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(full == exact)
  }

  test("works on the real embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = IvfIndex.fit(emb, "embedding", k = 8)
    val out = IvfIndex.topK(emb, "vec_id", "embedding",
      emb.filter($"vec_id" < 2), "vec_id", "embedding", model, k = 5, nprobe = 2)
    assert(out.count() == 10)
  }

  test("persisted index: round-trips centroids, serves through a pruned " +
      "read, and ranks exactly like the in-memory path") {
    val base = "/root/repo/target/tmp/spec_ivf_disk"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    val df = clustered
    val model = IvfIndex.fit(df, "embedding", k = 3, seed = 42)
    IvfIndex.persist(df, "vec_id", "embedding", model, base)
    val (tbl, loaded) = IvfIndex.load(spark, base)
    // centroids round-trip exactly (Double.toString is lossless)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      model.centroids.map(_.toSeq).toSeq)
    // a one-cell probe reads strictly fewer files than the table holds
    val oneCell = tbl.toDFWhere("cell IN (0)").inputFiles.length
    assert(oneCell > 0 && oneCell < tbl.detail.numFiles,
      s"pruning broken: $oneCell of ${tbl.detail.numFiles}")
    val queries = df.filter($"vec_id" < 6)
    val served = IvfIndex.topKPersisted(tbl, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inMem = IvfIndex.topK(df, "vec_id", "embedding",
        queries, "vec_id", "embedding", model, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == inMem && served.nonEmpty)
  }

  test("append routes through frozen centroids: appended index == " +
      "from-scratch build, pruning survives, cellStats is metadata-only") {
    val baseA = "/root/repo/target/tmp/spec_ivf_append_a"
    val baseB = "/root/repo/target/tmp/spec_ivf_append_b"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(baseA)); rm(new java.io.File(baseB))
    val df = clustered
    val model = IvfIndex.fit(df, "embedding", k = 3, seed = 42)
    // incremental: 2/3 at build time, 1/3 appended later
    val tblA = IvfIndex.persist(df.filter($"vec_id" % 3 =!= 0),
      "vec_id", "embedding", model, baseA)
    IvfIndex.append(tblA, "vec_id", "embedding",
      df.filter($"vec_id" % 3 === 0).select("vec_id", "embedding"))
    // from-scratch build over the union, same frozen model
    IvfIndex.persist(df, "vec_id", "embedding", model, baseB)
    val (tblB, _) = IvfIndex.load(spark, baseB)
    def rows(t: graft.tables.ManagedTable) =
      t.toDF.select("vec_id", "cell").as[(Long, Int)].collect().toSet
    assert(rows(tblA) == rows(tblB),
      "appended rows must land in exactly the cells a full build assigns")
    // metadata-only per-cell counts account for every row
    val stats = IvfIndex.cellStats(tblA)
    assert(stats.values.sum == 90L && stats.keySet == Set(0, 1, 2),
      stats.toString)
    assert(stats == IvfIndex.cellStats(tblB))
    // pruning still skips unprobed cells after the append
    val oneCell = tblA.toDFWhere("cell IN (0)").inputFiles.length
    assert(oneCell > 0 && oneCell < tblA.detail.numFiles)
    // serving equality on the appended table
    val queries = df.filter($"vec_id" < 6)
    val servedA = IvfIndex.topKPersisted(tblA, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val servedB = IvfIndex.topKPersisted(tblB, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(servedA == servedB && servedA.nonEmpty)
  }

  test("partitionRowCounts: per-partition live counts from the log, " +
      "DV-aware, empty key for unpartitioned tables") {
    val base = "/root/repo/target/tmp/spec_partcounts"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base)); rm(new java.io.File(base + "_u"))
    val t = graft.tables.ManagedTable.create(
      (1L to 20L).map(i => (i, (i % 4).toInt, s"v$i"))
        .toDF("id", "p", "v"),
      base, partitionBy = Seq("p"))
    val counts = t.partitionRowCounts
    assert(counts == Map(
      Seq("p" -> "0") -> 5L, Seq("p" -> "1") -> 5L,
      Seq("p" -> "2") -> 5L, Seq("p" -> "3") -> 5L), counts.toString)
    // a DV delete shows up in the metadata count without any data scan
    // (p=2 holds ids 2,6,10,14,18 — the predicate deletes 2 and 6)
    t.delete("p = 2 AND id <= 6")
    val after = t.partitionRowCounts
    assert(after(Seq("p" -> "2")) == 3L, after.toString)
    // unpartitioned: single empty key totalling numRows
    val u = graft.tables.ManagedTable.create(
      (1L to 7L).toDF("id"), base + "_u")
    assert(u.partitionRowCounts == Map(Seq.empty -> 7L))
  }

  test("load rejects a table that is not an IVF index") {
    val base = "/root/repo/target/tmp/spec_ivf_notindex"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    graft.tables.ManagedTable.create(
      Seq((1L, "x")).toDF("id", "v"), base)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.load(spark, base)
    }
    assert(e.getMessage.contains("not an IVF index"))
  }
}
