package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{GraftTypeError, SparkSpec}
import java.nio.file.{Files, Paths}

/** Storage-engine behavior added in round 2: vacuum retention,
  * concurrent-append rebase, schema-merge conflict errors, and
  * partition-scoped MERGE/overwrite.
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("col1", IntegerType),
    StructField("col2", StringType)))

  import scala.jdk.CollectionConverters._

  private def dataSize(loc: String): Long = {
    val root = Paths.get(loc, "data")
    val s = Files.walk(root)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size(_)).sum
    finally s.close()
  }

  test("vacuum reclaims overwritten snapshots; retention window stays readable") {
    val loc = tmpDir("vac")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"), Row(2, "b"))), loc)
    t.overwrite(df(schema, Seq(Row(3, "c"))))           // v1
    t.overwrite(df(schema, Seq(Row(4, "d"))))           // v2
    t.overwrite(df(schema, Seq(Row(5, "e"))))           // v3
    val before = dataSize(loc)
    val (dirs, bytes) = t.vacuum(retainVersions = 2, minAgeMillis = 0)
    assert(dirs == 2, s"expected v0+v1 snapshots deleted, got $dirs")
    assert(bytes > 0 && dataSize(loc) == before - bytes)
    // within retention: latest and latest-1 still readable
    assertDfEquality(t.toDF, df(schema, Seq(Row(5, "e"))))
    assertDfEquality(t.toDF(2), df(schema, Seq(Row(4, "d"))))
    // history survives vacuum; pre-retention data reads fail loudly
    assert(t.history.count() == 4)
    val e = intercept[IllegalStateException](t.toDF(1).collect())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("time-based vacuum retains the window (plus its anchor version), " +
       "reclaims past it, and respects the age floor") {
    val loc = tmpDir("vachrs")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc) // v0
    t.overwrite(df(schema, Seq(Row(2, "b"))))                      // v1
    Thread.sleep(40)
    val windowOpen = System.currentTimeMillis()
    Thread.sleep(40)
    t.overwrite(df(schema, Seq(Row(3, "c"))))                      // v2
    // a window opening between v1 and v2: v2 is inside it and v1 was
    // current as it opened (the anchor) — only v0 is reclaimable
    val hours = (System.currentTimeMillis() - windowOpen) / 3600000.0
    // age floor first: everything is younger than an hour, so nothing goes
    val (f0, _) = t.vacuum(hours, ManagedTable.defaultVacuumMinAgeMillis)
    assert(f0 == 0L, "retention-time floor must protect young data")
    val (dirs, bytes) = t.vacuum(hours, 0L)
    assert(dirs == 1L && bytes > 0, s"only v0's snapshot is past retention, got $dirs")
    assertDfEquality(t.toDF(1), df(schema, Seq(Row(2, "b"))))
    assertDfEquality(t.toDF, df(schema, Seq(Row(3, "c"))))
    assert(intercept[IllegalStateException](t.toDF(0).collect())
      .getMessage.contains("vacuumed"))
    // a window wider than the table's whole history reclaims nothing more
    assert(t.vacuum(24.0, 0L)._1 == 0L)
  }

  test("vacuum keeps directories shared between retained versions") {
    val loc = tmpDir("vac2")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc) // v0
    t.append(df(schema, Seq(Row(2, "b"))))                         // v1 (shares v0's dir)
    t.overwrite(df(schema, Seq(Row(9, "z"))))                      // v2
    val (dirs, _) = t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(dirs == 2, "v0 and v1's append dir are unreferenced by v2")
    assertDfEquality(t.toDF, df(schema, Seq(Row(9, "z"))))
  }

  test("concurrent appends rebase and both commit (no lost update)") {
    val loc = tmpDir("race")
    val t = ManagedTable.create(df(schema, Seq(Row(0, "base"))), loc)
    // two writers race on the same table path
    val writers = (1 to 4).map { i =>
      new Thread(() => {
        val w = ManagedTable.forPath(spark, loc)
        w.append(df(schema, Seq(Row(i, s"w$i"))))
      })
    }
    writers.foreach(_.start()); writers.foreach(_.join())
    assert(t.latestVersion == 4, "each append must land as its own version")
    assert(t.toDF.count() == 5, "no append may be lost")
    assert(t.toDF.select("col2").as[String].collect().toSet ==
      Set("base", "w1", "w2", "w3", "w4"))
  }

  test("overwrite does NOT retry a concurrent-commit conflict") {
    val loc = tmpDir("race2")
    val t = ManagedTable.create(df(schema, Seq(Row(0, "base"))), loc)
    // simulate a competing writer landing v1 first
    val racer = ManagedTable.forPath(spark, loc)
    racer.append(df(schema, Seq(Row(1, "racer"))))
    // stale handle computed against v0 → its commit of v1 must fail…
    // (drive commit directly: overwrite re-reads latest, so fake the race
    // by pre-creating the NEXT version file the overwrite will claim)
    val log = Paths.get(loc, "_graft_log", "v2.json")
    Files.writeString(log, Files.readString(Paths.get(loc, "_graft_log", "v1.json")))
    intercept[ConcurrentCommitException] {
      t.overwrite(df(schema, Seq(Row(9, "mine"))))
    }
  }

  test("mergeSchema append with a conflicting column type raises") {
    val loc = tmpDir("conflict")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    val bad = StructType(Seq(StructField("col1", StringType)))
    val e = intercept[GraftTypeError] {
      t.append(df(bad, Seq(Row("not-an-int"))), mergeSchema = true)
    }
    assert(e.getMessage.contains("col1"))
    assert(e.getMessage.contains("incompatible"))
    assert(t.latestVersion == 0, "failed append must not commit")
  }

  // ---- partition-scoped writes ----------------------------------------

  private val pSchema = StructType(Seq(
    StructField("pk", IntegerType),
    StructField("part", StringType),
    StructField("v", IntegerType)))

  private def partRows = Seq(
    Row(1, "a", 10), Row(2, "a", 20),
    Row(3, "b", 30), Row(4, "b", 40),
    Row(5, "c", 50))

  test("overwritePartitions replaces only the named partitions") {
    val loc = tmpDir("op")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    val dirsBefore = t.latestEntry.dirs
    t.overwritePartitions(
      df(pSchema, Seq(Row(1, "a", 11))), Seq(Map("part" -> "a")))
    val dirsAfter = t.latestEntry.dirs
    // b and c leaf dirs are carried over verbatim — no rewrite
    assert(dirsBefore.filter(_.endsWith("part=b")).toSet ==
      dirsAfter.filter(_.endsWith("part=b")).toSet)
    assert(dirsBefore.filter(_.endsWith("part=c")).toSet ==
      dirsAfter.filter(_.endsWith("part=c")).toSet)
    assert(dirsBefore.filter(_.endsWith("part=a")).toSet !=
      dirsAfter.filter(_.endsWith("part=a")).toSet)
    assertDfEquality(t.toDF, df(pSchema,
      Seq(Row(1, "a", 11), Row(3, "b", 30), Row(4, "b", 40), Row(5, "c", 50))))
  }

  test("overwritePartitions empties a partition whose replacement has no rows") {
    val loc = tmpDir("op2")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    t.overwritePartitions(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], pSchema),
      Seq(Map("part" -> "c")))
    assert(t.toDF.filter(col("part") === "c").isEmpty)
    assert(t.toDF.count() == 4)
  }

  test("overwritePartitions rejects rows outside the replaced scope") {
    val loc = tmpDir("op3")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    val e = intercept[IllegalArgumentException] {
      t.overwritePartitions(
        df(pSchema, Seq(Row(1, "a", 11), Row(9, "zz", 99))), Seq(Map("part" -> "a")))
    }
    assert(e.getMessage.contains("outside"))
  }

  test("partition-bound MERGE rewrites only touched partitions") {
    val loc = tmpDir("pm")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    val dirsBefore = t.latestEntry.dirs
    val updates = df(pSchema, Seq(Row(1, "a", 111), Row(6, "a", 60)))
    Merge.into(t.toDF, "base")
      .using(updates, "src", expr("base.pk = src.pk AND base.part = src.part"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute(t)
    val dirsAfter = t.latestEntry.dirs
    val entry = t.latestEntry
    assert(entry.operation == "MERGE")
    // untouched partitions keep their files
    assert(dirsBefore.filter(_.endsWith("part=b")).toSet ==
      dirsAfter.filter(_.endsWith("part=b")).toSet,
      "partition b must not be rewritten by a merge touching only a")
    assert(dirsBefore.filter(_.endsWith("part=c")).toSet ==
      dirsAfter.filter(_.endsWith("part=c")).toSet)
    assertDfEquality(t.toDF, df(pSchema, Seq(
      Row(1, "a", 111), Row(2, "a", 20), Row(6, "a", 60),
      Row(3, "b", 30), Row(4, "b", 40), Row(5, "c", 50))))
  }

  test("MERGE without a partition binding file-prunes instead of a full overwrite") {
    val loc = tmpDir("pm2")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    val filesBefore = t.fileStats.map(_.path).toSet
    val updates = df(pSchema, Seq(Row(1, "a", 111)))
    Merge.into(t.toDF, "base")
      .using(updates, "src", expr("base.pk = src.pk")) // part NOT bound
      .whenMatchedUpdate(Map("v" -> "src.v"))
      .execute(t)
    // pk bounds locate the touched file; the other partitions' files
    // survive by path (this used to be a full-table rewrite)
    val survivors = filesBefore.intersect(t.fileStats.map(_.path).toSet)
    assert(survivors.nonEmpty,
      "pk-disjoint files of unbound partitions must be kept verbatim")
    assert(survivors.size < filesBefore.size, "the touched file must rewrite")
    assert(t.toDF.filter(col("pk") === 1).select("v").as[Int].head() == 111)
    assert(t.toDF.count() == partRows.size)
  }

  test("partition-bound MERGE delete empties the partition's rows") {
    val loc = tmpDir("pm3")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    val doomed = df(pSchema, Seq(Row(5, "c", 0)))
    Merge.into(t.toDF, "base")
      .using(doomed, "src", expr("base.pk = src.pk AND base.part = src.part"))
      .whenMatchedDelete()
      .execute(t)
    assert(t.toDF.filter(col("part") === "c").isEmpty)
    assert(t.toDF.count() == 4)
  }

  // ---- optimize (compaction) ------------------------------------------

  test("optimize compacts an append-fragmented table; vacuum reclaims fragments") {
    val loc = tmpDir("opt")
    val t = ManagedTable.create(df(schema, Seq(Row(0, "r0"))), loc)
    (1 to 5).foreach(i => t.append(df(schema, Seq(Row(i, s"r$i")))))
    val before = t.detail
    assert(before.numFiles >= 6, "each append contributes at least one file")
    val expected = t.toDF.collect().toSet
    t.optimize()
    assert(t.latestEntry.operation == "OPTIMIZE")
    val after = t.detail
    assert(after.numFiles < before.numFiles,
      s"expected fewer files after optimize, ${before.numFiles} -> ${after.numFiles}")
    assert(t.toDF.collect().toSet == expected, "optimize must not change contents")
    val (dirs, bytes) = t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(dirs >= 6 && bytes > 0, "fragments must be reclaimable after optimize")
    assert(t.toDF.collect().toSet == expected)
  }

  test("optimize is incremental: right-sized files survive verbatim, " +
       "small ones bin-pack, a compacted table no-ops") {
    val loc = tmpDir("optinc")
    // one big file (500 rows) + several tiny append fragments — built
    // from single-partition frames so each commit is exactly one file
    def df1(rows: Seq[Row]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val t = ManagedTable.create(df1((1 to 500).map(i => Row(i, s"v$i"))), loc)
    val bigPath = t.fileStats.head.path
    val bigBytes = t.fileStats.head.bytes
    (1 to 4).foreach(i => t.append(df1(Seq(Row(1000 + i, "frag")))))
    assert(t.fileStats.size == 5)
    // target = the big file's size: the big file is not sub-target
    // (strict <), the four fragments are, and their bytes sum below one
    // target so they bin-pack into exactly one file
    val target = bigBytes
    assert(t.fileStats.count(_.bytes < target) == 4, "setup: 4 small files")
    val vBefore = t.latestVersion
    t.optimize(targetFileSizeBytes = target)
    assert(t.latestVersion == vBefore + 1)
    val after = t.fileStats
    assert(after.exists(f => f.path == bigPath && f.bytes == bigBytes),
      "the right-sized file must survive byte-identical, not rewritten")
    assert(after.size == 2, s"4 fragments bin-pack into 1, got ${after.size}")
    assert(t.toDF.count() == 504)
    // second optimize: everything may exceed or equal... the compacted
    // fragment file is tiny, so exclude it with a smaller target — with
    // no two sub-target files left, OPTIMIZE commits nothing
    val smallest = after.map(_.bytes).min
    val vAfter = t.latestVersion
    t.optimize(targetFileSizeBytes = math.max(1, smallest / 2))
    assert(t.latestVersion == vAfter, "no-op compaction must not burn a version")
  }

  test("optimize keeps partitioned layout and per-partition readability") {
    val loc = tmpDir("opt2")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    t.append(df(pSchema, Seq(Row(6, "a", 60), Row(7, "b", 70))))
    val expected = t.toDF.collect().toSet
    t.optimize()
    assert(t.latestEntry.dirs.forall(_.contains("part=")),
      "optimized commit must keep leaf partition dirs")
    assert(t.toDF.collect().toSet == expected)
    // partition-scoped rewrite still works on the compacted table
    t.overwritePartitions(df(pSchema, Seq(Row(1, "a", 11))), Seq(Map("part" -> "a")))
    assert(t.toDF.filter(col("part") === "a").count() == 1)
  }
  test("partition-scoped optimize compacts only the named partition") {
    val loc = tmpDir("optw")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    // fragment both partitions with small appends
    (0 until 4).foreach { i =>
      t.append(df(pSchema, Seq(Row(10 + i, "a", i), Row(20 + i, "b", i))))
    }
    val before = t.latestEntry.files
    val bBefore = before.filter(_.path.contains("part=b")).map(_.path).toSet
    val aBefore = before.count(_.path.contains("part=a"))
    val expected = t.toDF.collect().toSet
    t.optimize(partitions = Seq(Map("part" -> "a")))
    val after = t.latestEntry.files
    assert(after.filter(_.path.contains("part=b")).map(_.path).toSet == bBefore,
      "out-of-scope partition files must survive verbatim")
    assert(after.count(_.path.contains("part=a")) < aBefore,
      "in-scope partition must compact")
    assert(t.toDF.collect().toSet == expected, "rows unchanged")
    // no-match spec commits nothing
    val v = t.latestVersion
    t.optimize(partitions = Seq(Map("part" -> "zzz")))
    assert(t.latestVersion == v, "no matching files -> no commit")
    // non-partition column fails loud
    intercept[IllegalArgumentException] {
      t.optimize(partitions = Seq(Map("pk" -> "1")))
    }
  }

  test("partition-scoped ZORDER rewrites only the named partition") {
    val loc = tmpDir("optwz")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    (0 until 3).foreach { i =>
      t.append(df(pSchema, Seq(Row(50 + i, "a", i), Row(60 + i, "b", i))))
    }
    val bBefore = t.latestEntry.files.filter(_.path.contains("part=b")).map(_.path).toSet
    val expected = t.toDF.collect().toSet
    t.optimize(zorderBy = Seq("pk", "v"), partitions = Seq(Map("part" -> "a")))
    val after = t.latestEntry.files
    assert(after.filter(_.path.contains("part=b")).map(_.path).toSet == bBefore,
      "out-of-scope partition untouched by the zorder rewrite")
    assert(t.toDF.collect().toSet == expected, "rows unchanged")
    assert(t.history.filter(col("operation") === "OPTIMIZE").count() == 1)
  }

  test("SQL OPTIMIZE WHERE routes the partition spec") {
    val loc = tmpDir("optsql")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    (0 until 3).foreach { i =>
      t.append(df(pSchema, Seq(Row(30 + i, "a", i), Row(40 + i, "c", i))))
    }
    val cBefore = t.latestEntry.files.filter(_.path.contains("part=c")).map(_.path).toSet
    val expected = t.toDF.collect().toSet
    spark.sql(s"OPTIMIZE graft.`$loc` WHERE part = 'a'").collect()
    val t2 = ManagedTable.forPath(spark, loc)
    assert(t2.latestEntry.files.filter(_.path.contains("part=c")).map(_.path).toSet == cBefore)
    assert(t2.toDF.collect().toSet == expected)
    // beyond-equality predicates are refused, not silently full-table
    intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$loc` WHERE part > 'a'").collect()
    }
    // conflicting equalities on one column refuse (Map last-wins would
    // rewrite partitions the predicate excludes)
    intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$loc` WHERE part = 'a' AND part = 'c'").collect()
    }
    // trailing SQL in the value refuses loud instead of matching nothing
    intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE graft.`$loc` WHERE part = 'a' ORDER BY part").collect()
    }
  }

  test("optimize(sortBy) clusters rows so filtered scans can skip row groups") {
    val loc = tmpDir("opt3")
    val rows = (1 to 1000).map(i => Row(i, s"v${i % 7}"))
    val t = ManagedTable.create(df(schema, scala.util.Random.shuffle(rows)), loc)
    t.optimize(sortBy = Seq("col1"))
    assert(t.latestEntry.operation == "OPTIMIZE")
    // contents unchanged
    assert(t.toDF.count() == 1000)
    assert(t.toDF.agg(min(col("col1")), max(col("col1"))).head().toSeq == Seq(1, 1000))
    // rows inside each written file are ordered by the sort key
    import scala.jdk.CollectionConverters._
    val files = { val s = Files.walk(Paths.get(loc, "data"))
      try s.iterator().asScala.filter(f => f.toString.endsWith(".parquet")).toSeq
      finally s.close() }
    val latestDirs = t.latestEntry.dirs.toSet
    val kept = files.filter(f => latestDirs.exists(d => f.toString.contains(d)))
    kept.foreach { f =>
      val vals = spark.read.parquet(f.toString).select("col1")
        .collect().map(_.getInt(0))
      assert(vals.sameElements(vals.sorted), s"file $f not sorted on col1")
    }
  }
  test("vacuum prunes unreferenced leaves of a partially-referenced commit") {
    val loc = tmpDir("vac3")
    val t = ManagedTable.create(df(pSchema, partRows), loc, partitionBy = Seq("part"))
    // v1 replaces partition a: v0's part=a leaf becomes unreferenced by v1,
    // but v0's b/c leaves are still part of the latest snapshot
    t.overwritePartitions(df(pSchema, Seq(Row(1, "a", 11))), Seq(Map("part" -> "a")))
    val (dirs, bytes) = t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(dirs == 1 && bytes > 0, s"exactly v0's part=a leaf should go, got $dirs")
    // the shared b/c leaves survived inside the same commit uuid
    assertDfEquality(t.toDF, df(pSchema,
      Seq(Row(1, "a", 11), Row(3, "b", 30), Row(4, "b", 40), Row(5, "c", 50))))
    // time travel to v0 now fails loudly (its part=a data is gone)
    val e = intercept[IllegalStateException](t.toDF(0).collect())
    assert(e.getMessage.contains("vacuumed"))
  }
  test("vacuum retention floor protects young unreferenced dirs (staged writes)") {
    val loc = tmpDir("vacfloor")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    t.overwrite(df(schema, Seq(Row(2, "b")))) // v0's dir now unreferenced by v1
    // default floor (1 h): the just-written v0 dir is younger than the
    // floor, so a racing vacuum must NOT delete it — this is exactly the
    // window where a concurrent writer's staged-but-uncommitted data lives
    val (dirs, bytes) = t.vacuum(retainVersions = 1)
    assert(dirs == 0 && bytes == 0, "young unreferenced dirs must survive")
    assertDfEquality(t.toDF(0), df(schema, Seq(Row(1, "a"))))
    // with the floor waived, the same dir is reclaimed
    val (dirs2, _) = t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(dirs2 == 1)
  }

  test("partition-bound MERGE handles a NULL partition value without dropping rows") {
    val loc = tmpDir("pmnull")
    val rows = partRows :+ Row(8, null, 80) :+ Row(9, null, 90)
    val t = ManagedTable.create(df(pSchema, rows), loc, partitionBy = Seq("part"))
    // source touches the NULL partition (updates pk=8) and partition a
    val updates = df(pSchema, Seq(Row(8, null, 888), Row(1, "a", 111)))
    val dirsBefore = t.latestEntry.dirs
    Merge.into(t.toDF, "base")
      .using(updates, "src", expr("base.pk = src.pk AND base.part <=> src.part"))
      .whenMatchedUpdate(Map("v" -> "src.v"))
      .execute(t)
    // the PRUNED path must fire (<=> binds): untouched partitions keep files
    assert(t.latestEntry.dirs.filter(_.endsWith("part=b")).toSet ==
      dirsBefore.filter(_.endsWith("part=b")).toSet,
      "null-safe-bound merge must not rewrite untouched partitions")
    // pk=9 (unmatched row of the NULL partition) must survive the rewrite
    assertDfEquality(t.toDF, df(pSchema, Seq(
      Row(1, "a", 111), Row(2, "a", 20), Row(3, "b", 30), Row(4, "b", 40),
      Row(5, "c", 50), Row(8, null, 888), Row(9, null, 90))))
  }

  test("txn append: a replayed (appId, version) is a no-op; writers are independent") {
    val loc = tmpDir("txn")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    t.append(df(schema, Seq(Row(2, "b"))), txn = Some(("w1", 0L)))
    assert(t.txnVersion("w1").contains(0L))
    val v = t.latestVersion
    // exact replay: no commit, no rows
    t.append(df(schema, Seq(Row(2, "b"))), txn = Some(("w1", 0L)))
    assert(t.latestVersion == v, "a replayed txn append must commit nothing")
    assert(t.toDF.count() == 2)
    // stale (lower) version replays are no-ops too
    t.append(df(schema, Seq(Row(9, "stale"))), txn = Some(("w1", -1L)))
    assert(t.latestVersion == v)
    // the writer's NEXT version lands, and records itself
    t.append(df(schema, Seq(Row(3, "c"))), txn = Some(("w1", 1L)))
    assert(t.txnVersion("w1").contains(1L) && t.toDF.count() == 3)
    // a different appId has its own version space
    assert(t.txnVersion("w2").isEmpty)
    t.append(df(schema, Seq(Row(4, "d"))), txn = Some(("w2", 0L)))
    assert(t.toDF.count() == 4 && t.txnVersion("w2").contains(0L))
    // txn markers ride the snapshot properties through unrelated commits
    t.overwrite(t.toDF.filter(col("col1") =!= 1).toDF())
    assert(t.txnVersion("w1").contains(1L))
  }

  test("sorted writes (graft.write.sortBy): every append's files are " +
       "bound-disjoint on the sort key, so probes skip fresh commits") {
    import org.apache.spark.sql.functions._
    val loc = tmpDir("sortedwrites")
    val t = ManagedTable.create(
      spark.range(0).selectExpr("id AS k", "id AS v"), loc,
      properties = Map(ManagedTable.writeSortPropKey -> "k"))
    // unsorted multi-task appends: without sorted writes every file
    // would span the full key range and probes would read all of them
    (0 until 3).foreach { i =>
      t.append(spark.range(10000)
        .selectExpr(s"(id * 37 + $i) % 10000 AS k", "id AS v")
        .repartition(4))
    }
    val total = t.detail.numFiles
    assert(total >= 12, s"3 appends x 4 tasks, got $total files")
    val probe = t.toDFWhere("k BETWEEN 100 AND 600")
    val read = probe.inputFiles.length
    assert(read * 2 <= total,
      s"a 5% key-range probe must skip most files: read $read of $total")
    // contents survive the re-range
    assert(t.toDF.count() == 30000)
    assert(probe.count() ==
      t.toDF.filter(col("k").between(100, 600)).count())
    // a table WITHOUT the property keeps reading everything (sanity the
    // probe is meaningful, not an artifact of the data)
    val plainLoc = tmpDir("unsortedwrites")
    val p2 = ManagedTable.create(
      spark.range(0).selectExpr("id AS k", "id AS v"), plainLoc)
    (0 until 3).foreach { i =>
      p2.append(spark.range(10000)
        .selectExpr(s"(id * 37 + $i) % 10000 AS k", "id AS v")
        .repartition(4))
    }
    val plainRead = p2.toDFWhere("k BETWEEN 100 AND 600").inputFiles.length
    assert(plainRead.toLong == p2.detail.numFiles,
      "unsorted appends have no skippable bounds on this data")
  }

  test("sorted writes do NOT re-stage an OPTIMIZE ZORDER rewrite: the " +
       "multi-dimensional clustering survives on a sortBy table") {
    import org.apache.spark.sql.functions._
    val n = 40000
    val loc = tmpDir("sortzorder")
    // sortBy=payload is UNRELATED to the zorder columns: if writeData's
    // sorted-writes staging ran on the OPTIMIZE rewrite, the files would
    // be range-partitioned by payload and the x/y clustering destroyed
    val t = ManagedTable.create(
      spark.range(n.toLong).select(
        (col("id") % 200).cast("int").as("x"),
        (col("id") / 200).cast("int").as("y"),
        col("id").as("payload")),
      loc, properties = Map(ManagedTable.writeSortPropKey -> "payload"))
    t.optimize(targetFileSizeBytes = 6 * 1024, zorderBy = Seq("x", "y"))
    val total = t.detail.numFiles
    assert(total >= 20, s"need a multi-file table, got $total")
    val fx = t.toDFWhere("x BETWEEN 20 AND 39").inputFiles.length
    val fy = t.toDFWhere("y BETWEEN 20 AND 39").inputFiles.length
    assert(fx * 2 <= total,
      s"x probe reads $fx of $total — zorder clustering was destroyed")
    assert(fy * 2 <= total,
      s"y probe reads $fy of $total — zorder clustering was destroyed")
    assert(t.toDF.count() == n)
    // ordinary appends on the same table still get the sorted-writes
    // staging (the flag only bypasses pre-ordered OPTIMIZE frames):
    // the fresh files' payload bounds must be pairwise disjoint
    val before = t.fileStats.map(_.path).toSet
    t.append(spark.range(10000).selectExpr(
      "cast(id % 200 AS int) AS x", "cast(id / 200 AS int) AS y",
      "(id * 37) % 10000 AS payload").repartition(4))
    val fresh = t.fileStats.filterNot(f => before(f.path))
      .map(f => (f.min("payload").toLong, f.max("payload").toLong))
      .sortBy(_._1)
    assert(fresh.size >= 2, s"multi-task append, got ${fresh.size} files")
    fresh.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi <= lo,
        s"append files overlap on payload ($fresh) — sorted writes " +
          "stopped applying to ordinary appends")
    case _ => ()
    }
  }

  test("VACUUM DRY RUN reports the reclaim without deleting; the wet run " +
       "then reclaims exactly that") {
    import org.apache.spark.sql.functions._
    val loc = tmpDir("vacdry")
    val t = ManagedTable.create(
      spark.range(2000).selectExpr("id AS k", "id AS v"), loc)
    t.overwrite(spark.range(500).selectExpr("id AS k", "id AS v").toDF())
    val before = dataFileCount(loc)
    val (dryN, dryB) = t.vacuum(retainVersions = 1, minAgeMillis = 0,
      dryRun = true)
    assert(dryN > 0 && dryB > 0, "v0's files are reclaimable")
    assert(dataFileCount(loc) == before, "dry run must not delete anything")
    assert(t.toDF(0).count() == 2000, "v0 still readable after dry run")
    val (wetN, wetB) = t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert((wetN, wetB) == ((dryN, dryB)),
      s"wet run must reclaim exactly the dry report: ($wetN,$wetB) vs ($dryN,$dryB)")
    // SQL form (age floor applies, so nothing younger than 1h reclaims —
    // the point here is the statement parses and returns the shape)
    graft.plans.GraftFunctions.register(spark)
    val row = spark.sql(s"VACUUM graft.`$loc` RETAIN 0 HOURS DRY RUN").head()
    assert(row.getLong(0) == 0L, "everything is younger than the age floor")
  }

  private def dataFileCount(loc: String): Long = {
    val p = java.nio.file.Paths.get(loc, "data")
    val s = java.nio.file.Files.walk(p)
    try s.iterator().asScala.count(f =>
      java.nio.file.Files.isRegularFile(f)).toLong
    finally s.close()
  }
}
