package graft.tables

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import scala.jdk.CollectionConverters._

/** Merge-on-read DELETE via deletion vectors
  * (`graft.enableDeletionVectors`): deletes record (file, position)
  * coordinates instead of rewriting files, reads apply them, rewrites
  * materialize them, vacuum reclaims them, and concurrent vector updates
  * on one file conflict.
  */
class DvSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): ManagedTable = {
    val t = ManagedTable.create(
      spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("v")),
      tmpDir(name),
      properties = Map(
        ManagedTable.dvPropKey -> "true",
        ManagedTable.cdfPropKey -> "true"))
    t.optimize(targetFileSizeBytes = 2 * 1024, sortBy = Seq("k"))
    t
  }

  private def dataFiles(t: ManagedTable): Seq[String] =
    t.fileStats.map(_.path).sorted

  test("DV delete removes rows without rewriting any data file") {
    val t = fixture("dv1")
    val before = dataFiles(t)
    assert(before.size >= 4, s"setup: multi-file table, got ${before.size}")
    assert(t.delete("k >= 100 AND k < 150") == 50)
    assert(dataFiles(t) == before, "no data file may be added or removed")
    assert(t.toDF.count() == 950)
    assert(t.toDF.filter("k >= 100 AND k < 150").count() == 0)
    // only bounds-touched files carry a vector
    val withDv = t.fileStats.filter(_.dv.isDefined)
    assert(withDv.nonEmpty && withDv.size < before.size,
      s"only touched files get vectors, got ${withDv.size}/${before.size}")
    // time travel: the pre-delete snapshot still shows every row
    assert(t.toDF(t.latestVersion - 1).count() == 1000)
  }

  test("a second delete on the same file carries the prior vector forward") {
    val t = fixture("dv2")
    assert(t.delete("k BETWEEN 10 AND 19") == 10)
    assert(t.delete("k BETWEEN 20 AND 29") == 10) // same leading file
    assert(t.toDF.count() == 980)
    assert(t.toDF.filter("k < 30 AND k >= 10").count() == 0)
    // already-deleted rows never re-match
    assert(t.delete("k BETWEEN 10 AND 29") == 0)
    assert(t.toDF.count() == 980)
  }

  test("numRows answers from metadata through every DV state") {
    val t = fixture("dvNumRows")
    assert(t.numRows == 1000)
    assert(t.delete("k < 100") == 100)
    assert(t.numRows == 900, "recorded dvRows must subtract")
    assert(t.delete("k >= 100 AND k < 120") == 20) // second vector, same file
    assert(t.numRows == 880)
    // UPDATE: old positions vector out, post-images append
    assert(t.update(Map("v" -> "v + 1"), Some("k >= 900")) == 100)
    assert(t.numRows == 880)
    assert(t.numRows == t.toDF.count(), "metadata and scan must agree")
    // OPTIMIZE materializes vectors; plain footer counts take over
    t.optimize(targetFileSizeBytes = Long.MaxValue)
    assert(t.fileStats.forall(_.dv.isEmpty))
    assert(t.numRows == 880)
    // append keeps counting
    t.append(spark.range(5000, 5010).select(col("id").as("k"),
      (col("id") * 3).as("v")))
    assert(t.numRows == 890)
  }

  test("DV deletes feed CDC (sidecar) and the bounds still prune reads") {
    val t = fixture("dv3")
    val v0 = t.latestVersion
    assert(t.delete("k < 25") == 25)
    val ch = t.changes(v0)
    assert(ch.filter(col("_change_type") === "delete").count() == 25)
    assert(ch.count() == 25)
    // file skipping keeps working on a DV'd table
    val probe = t.toDFWhere("k BETWEEN 500 AND 520")
    assert(probe.inputFiles.length < t.fileStats.size)
    assert(probe.count() == 21)
  }

  test("OPTIMIZE materializes vectors away; vacuum reclaims them") {
    val t = fixture("dv4")
    assert(t.delete("k < 100") == 100)
    assert(t.fileStats.exists(_.dv.isDefined))
    t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
    assert(t.fileStats.forall(_.dv.isEmpty),
      "compaction must rewrite DV'd files without their deleted rows")
    assert(t.toDF.count() == 900)
    val dvDir = java.nio.file.Paths.get(t.location, "_graft_dv")
    def dvCount: Long = {
      val s = java.nio.file.Files.list(dvDir); try s.count() finally s.close()
    }
    assert(dvCount == 1)
    t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(dvCount == 0, "unreferenced vector must be reclaimed")
    assert(t.toDF.count() == 900)
  }

  test("merge-on-read UPDATE vectors out old positions and appends post-images") {
    val t = fixture("dvu")
    val before = dataFiles(t)
    assert(t.update(Map("v" -> "v + 100"), Some("k BETWEEN 40 AND 49")) == 10)
    // the touched files survive untouched; only NEW post-image files land
    assert(dataFiles(t).toSet.intersect(before.toSet) == before.toSet,
      "no pre-existing data file may be rewritten")
    assert(t.fileStats.size == before.size + 1, "post-images land as one new file")
    assert(t.toDF.count() == 1000, "update must not change the row count")
    assert(t.toDF.filter("k BETWEEN 40 AND 49 AND v = k * 3 + 100").count() == 10)
    assert(t.toDF.filter("k BETWEEN 40 AND 49 AND v = k * 3").count() == 0)
    // CDC carries the net pre/post pair per updated row
    val ch = t.changes(t.latestVersion - 1)
    assert(ch.filter(col("_change_type") === "update_preimage").count() == 10)
    assert(ch.filter(col("_change_type") === "update_postimage").count() == 10)
    // updating an already-updated row hits its post-image file next time
    assert(t.update(Map("v" -> "v + 1"), Some("k = 45")) == 1)
    assert(t.toDF.filter("k = 45").head().getLong(1) == 45 * 3 + 101)
    assert(t.toDF.count() == 1000)
  }

  test("MERGE and UPDATE on a DV'd table respect prior deletes") {
    val t = fixture("dv5")
    assert(t.delete("k < 10") == 10)
    // merge-on-read update: deleted rows must not match
    assert(t.update(Map("v" -> "v + 1"), Some("k BETWEEN 5 AND 14")) == 5,
      "deleted rows must not match the update")
    assert(t.toDF.filter("k < 10").count() == 0)
    assert(t.toDF.filter("k BETWEEN 10 AND 14 AND v = k * 3 + 1").count() == 5)
    val merged = Merge.into(t.toDF, "base")
      .using(Seq((3L, 0L), (500L, 0L)).toDF("k", "v"), "src", "base.k = src.k")
      .whenMatchedUpdate(Map("v" -> "src.v"))
      .result()
    assert(merged.filter("k = 3").count() == 0, "deleted row must not resurrect")
    assert(merged.filter("k = 500 AND v = 0").count() == 1)
  }

  test("concurrent vector updates on the same file serialize or raise; " +
       "disjoint files commute") {
    val t = fixture("dv6")
    // staged same-file race: plan both from v_base, commit one, then the
    // other must raise (its vector would drop the first's rows)
    val raced = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    @volatile var aOk = false
    @volatile var bOk = false
    val ta = new Thread(() => {
      try { gate.await(); t.delete("k BETWEEN 0 AND 4"); aOk = true }
      catch { case e: Throwable => raced.add(e); () }
    })
    val tb = new Thread(() => {
      try { gate.await(); t.delete("k BETWEEN 5 AND 9"); bOk = true }
      catch { case e: Throwable => raced.add(e); () }
    })
    ta.start(); tb.start(); gate.countDown()
    ta.join(120000); tb.join(120000)
    raced.forEach(e => assert(e.isInstanceOf[ConcurrentCommitException],
      s"only a clean conflict raise is legal, got $e"))
    assert(aOk || bOk)
    val expected = 1000 - (if (aOk) 5 else 0) - (if (bOk) 5 else 0)
    assert(t.toDF.count() == expected,
      "exactly the committed deletes' rows disappear — none lost, none doubled")

    // bounds-disjoint deletes (different files) must BOTH commit
    val t2 = fixture("dv7")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val g2 = new java.util.concurrent.CountDownLatch(1)
    val d1 = new Thread(() => {
      try { g2.await(); assert(t2.delete("k < 5") == 5) }
      catch { case e: Throwable => errs.add(e); () }
    })
    val d2 = new Thread(() => {
      try { g2.await(); assert(t2.delete("k >= 995") == 5) }
      catch { case e: Throwable => errs.add(e); () }
    })
    d1.start(); d2.start(); g2.countDown()
    d1.join(120000); d2.join(120000)
    assert(errs.isEmpty,
      s"disjoint DV deletes must commute: ${Option(errs.peek()).map(_.toString)}")
    assert(t2.toDF.count() == 990)
  }

  test("an over-threshold DV mask anti-joins without the forced broadcast") {
    val t = fixture("dvgate")
    assert(t.delete("k < 50") == 50)
    def executedPlan(df: DataFrame): String = {
      df.count(); df.queryExecution.executedPlan.toString
    }
    // default: tiny vector set, the hint broadcasts
    assert(executedPlan(t.toDF).contains("BroadcastHashJoin"),
      "an under-threshold mask must keep the broadcast hint")
    // past the footprint threshold the hint must NOT be emitted; with
    // auto-broadcast off (AQE included) the join degrades to a shuffle,
    // proving no hint forces it — and the rows are identical
    spark.conf.set("spark.graft.dv.broadcastThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = t.toDF
      assert(df.count() == 950)
      assert(df.filter("k < 50").count() == 0)
      assert(!executedPlan(t.toDF).contains("BroadcastHashJoin"),
        "an over-threshold mask must not force a broadcast")
    } finally {
      spark.conf.unset("spark.graft.dv.broadcastThreshold")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("OPTIMIZE materializes vectors on right-sized files too") {
    val t = fixture("dvmat")
    assert(t.delete("k BETWEEN 0 AND 9") == 10)
    assert(t.fileStats.exists(_.dv.isDefined))
    // a 1-byte target makes every file "right-sized" — before the fix
    // this OPTIMIZE was a no-op and exportDelta's "optimize() first"
    // advice was a dead end
    t.optimize(targetFileSizeBytes = 1)
    assert(t.fileStats.forall(_.dv.isEmpty),
      "dv-bearing files must compact regardless of size")
    assert(t.toDF.count() == 990)
    assert(t.toDF.filter("k < 10").count() == 0)
  }

  test("non-CDF DV table skips the sidecar; changes() derives the feed") {
    // DV without change-data capture: DML must not pay the sidecar write
    // (the UPDATE capture alone is four exceptAll shuffles), and
    // changes() must fall back to diffing the vector-swapped files
    val t = ManagedTable.create(
      spark.range(100).select(col("id").as("k"), (col("id") * 3).as("v")),
      tmpDir("dvnocdf"),
      properties = Map(ManagedTable.dvPropKey -> "true"))
    t.optimize(targetFileSizeBytes = 2 * 1024, sortBy = Seq("k"))
    assert(t.delete("k < 10") == 10)
    assert(t.update(Map("v" -> "v + 1000"), Some("k >= 90")) == 10)
    assert(!java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(t.location, "_graft_cdc")),
      "a non-CDF table must not accumulate change sidecars")
    val feed = t.changes(t.latestVersion - 2).select("k", "v", "_change_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val expected =
      (0L until 10L).map(k => (k, k * 3, "delete")).toSet ++
      (90L until 100L).flatMap(k => Seq(
        (k, k * 3, "update_preimage"), (k, k * 3 + 1000, "update_postimage"))).toSet
    assert(feed == expected, "derived DV feed must match the DML semantics")
  }

  test("vacuumed vector fails loud on time travel; rename keeps vectors valid") {
    val t = fixture("dv8")
    assert(t.delete("k < 50") == 50)
    val vDel = t.latestVersion
    t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
    t.vacuum(retainVersions = 1, minAgeMillis = 0)
    val e = intercept[IllegalStateException](t.toDF(vDel).count())
    assert(e.getMessage.contains("vacuumed"))

    // vectors use snapshot-RELATIVE coordinates: a directory move (the
    // reference's rename) must not invalidate them
    val t2 = fixture("dv9")
    assert(t2.delete("k < 7") == 7)
    val renamed = t2.rename(t2.location + "_moved")
    assert(renamed.toDF.count() == 993)
    assert(renamed.toDF.filter("k < 7").count() == 0)
  }

  private def sidecarParts(t: ManagedTable, ref: String): Seq[String] = {
    val dir = java.nio.file.Paths.get(t.location, "_graft_dv", ref)
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSeq.sorted
    finally s.close()
  }

  test("a BULK delete writes its sidecar SHARDED (many files, >1 task) " +
       "and every DV path — reads, carry-forward, OPTIMIZE, vacuum — " +
       "is layout-blind") {
    val t = fixture("dvshard")
    val prev = spark.conf.getOption("spark.graft.dv.rowsPerShard")
    // shard target far below the mask size so the bulk path engages at
    // fixture scale (production default is 4M rows/shard)
    spark.conf.set("spark.graft.dv.rowsPerShard", "50")
    try {
      assert(t.delete("k % 2 = 0") == 500)
      val refs1 = t.fileStats.flatMap(_.dv).distinct
      assert(refs1.size == 1)
      val parts1 = sidecarParts(t, refs1.head)
      assert(parts1.size > 1,
        s"a 500-row mask at 50 rows/shard must shard, got ${parts1.size} file(s)")
      assert(t.toDF.count() == 500)
      assert(t.toDF.filter("k % 2 = 0").count() == 0)
      // a second DML carries the sharded prior vectors forward intact
      assert(t.delete("k = 1") == 1)
      assert(t.toDF.count() == 499)
      assert(t.toDF.filter("k % 2 = 0 OR k = 1").count() == 0)
      // CDC off the sharded mask still matches the DML semantics
      val feed = t.changes(t.latestVersion - 1).select("k")
        .collect().map(_.getLong(0)).toSeq
      assert(feed == Seq(1L))
      // OPTIMIZE materializes the sharded vectors away; vacuum reclaims
      t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
      assert(t.fileStats.forall(_.dv.isEmpty))
      t.vacuum(retainVersions = 1, minAgeMillis = 0)
      assert(!java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(t.location, "_graft_dv", refs1.head)),
        "vacuum must reclaim the sharded sidecar dir whole")
      assert(t.toDF.count() == 499)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.dv.rowsPerShard", v)
      case None => spark.conf.unset("spark.graft.dv.rowsPerShard")
    }
  }

  test("a bulk delete whose mask lands in ONE data file still shards " +
       "(pos-bucket salt — path alone would funnel the skewed mask " +
       "through a single task)") {
    // single-file table: every masked (path, pos) row shares the path
    val t = ManagedTable.create(
      spark.range(1000).coalesce(1)
        .select(col("id").as("k"), (col("id") * 3).as("v")),
      tmpDir("dvshard_skew"),
      properties = Map(ManagedTable.dvPropKey -> "true"))
    assert(t.fileStats.size == 1, "setup: one data file")
    val prev = spark.conf.getOption("spark.graft.dv.rowsPerShard")
    spark.conf.set("spark.graft.dv.rowsPerShard", "50")
    try {
      assert(t.delete("k % 2 = 0") == 500)
      val refs = t.fileStats.flatMap(_.dv).distinct
      assert(refs.size == 1)
      val parts = sidecarParts(t, refs.head)
      assert(parts.size > 1,
        s"a 500-row single-file mask at 50 rows/shard must shard, " +
          s"got ${parts.size} file(s)")
      // per-shard mass bounded: the pos buckets spread the one path's
      // rows, so no shard may hold the whole mask
      val dir = java.nio.file.Paths.get(t.location, "_graft_dv", refs.head)
      val perShard = spark.read.schema(ManagedTable.dvSchema)
        .parquet(dir.toString)
        .withColumn("__f", input_file_name())
        .groupBy("__f").count().collect().map(_.getLong(1))
      assert(perShard.max < 500,
        s"one shard holds the entire mask: ${perShard.mkString(",")}")
      // reads stay layout-blind
      assert(t.toDF.count() == 500)
      assert(t.toDF.filter("k % 2 = 0").count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.graft.dv.rowsPerShard", v)
      case None => spark.conf.unset("spark.graft.dv.rowsPerShard")
    }
  }

  test("a point delete keeps the single-file sidecar form (no sharding " +
       "overhead below one shard)") {
    val t = fixture("dvpoint")
    assert(t.delete("k = 3") == 1)
    val refs = t.fileStats.flatMap(_.dv).distinct
    assert(refs.size == 1)
    assert(sidecarParts(t, refs.head).size == 1)
  }
}
