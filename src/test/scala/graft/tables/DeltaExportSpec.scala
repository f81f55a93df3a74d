package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.DeltaImport

/** [[ManagedTable.exportDelta]]: the snapshot round-trips through a real
  * `_delta_log` (export → [[DeltaImport]] → identical contents), the log
  * carries skippable per-file stats, partitioned tables export hive
  * layout + partitionValues, and DV-carrying snapshots refuse loud.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  test("post-DML snapshot round-trips export → import, bit-identical") {
    val t = ManagedTable.create(
      spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("v"),
        concat(lit("row-"), col("id")).as("s")),
      tmpDir("dxp1"))
    t.optimize(targetFileSizeBytes = 4 * 1024, sortBy = Seq("k"))
    t.delete("k < 100")
    t.update(Map("v" -> "v + 1"), Some("k >= 990"))
    val target = tmpDir("dxp1_delta")
    val nFiles = t.exportDelta(target)
    assert(nFiles == t.detail.numFiles)

    val snap = DeltaImport.snapshot(target)
    assert(snap.version == 0 && snap.files.size == nFiles)
    val back = DeltaImport.toDF(spark, target)
    // importer null-fills through casts, so fields come back nullable;
    // names and types must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      t.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(t.toDF).isEmpty && t.toDF.exceptAll(back).isEmpty,
      "imported contents must equal the exported snapshot exactly")
  }

  test("exported add actions carry numRecords and min/max stats") {
    val t = ManagedTable.create(
      spark.range(500).select(col("id").as("k"), concat(lit("v"), col("id")).as("s")),
      tmpDir("dxp2"))
    t.optimize(targetFileSizeBytes = 2 * 1024, sortBy = Seq("k"))
    val target = tmpDir("dxp2_delta")
    t.exportDelta(target)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log = java.nio.file.Files.readString(java.nio.file.Paths.get(
      target, "_delta_log", f"${0L}%020d.json"))
    val adds = log.linesIterator.map(mapper.readTree)
      .filter(_.has("add")).map(_.get("add")).toSeq
    assert(adds.nonEmpty)
    val stats = adds.map(a => mapper.readTree(a.get("stats").asText()))
    assert(stats.map(_.get("numRecords").asLong()).sum == 500L)
    // k is numeric (unquoted) and files are key-sorted: global min is 0
    assert(stats.map(_.get("minValues").get("k").asLong()).min == 0L)
    assert(stats.map(_.get("maxValues").get("k").asLong()).max == 499L)
    assert(stats.exists(_.get("minValues").has("s")), "string bounds too")
  }

  test("partitioned export: hive paths, partitionValues, round-trip") {
    val t = ManagedTable.create(
      spark.range(300).select(col("id").as("k"),
        (col("id") % 3).cast("string").as("p")),
      tmpDir("dxp3"), partitionBy = Seq("p"))
    val target = tmpDir("dxp3_delta")
    t.exportDelta(target)
    val snap = DeltaImport.snapshot(target)
    assert(snap.partitionColumns == Seq("p"))
    assert(snap.files.forall(_.contains("p=")))
    val back = DeltaImport.toDF(spark, target)
    assert(back.count() == 300)
    assert(back.filter(col("p") === "1").count() == 100)
    assert(back.exceptAll(t.toDF).isEmpty)
  }

  test("partition values with '+' and space survive export (escapePathName " +
       "inverse, not URL decoding)") {
    val t = ManagedTable.create(
      Seq((1L, "a+b"), (2L, "a b"), (3L, "plain")).toDF("k", "p"),
      tmpDir("dxp6"), partitionBy = Seq("p"))
    val target = tmpDir("dxp6_delta")
    t.exportDelta(target)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val log = java.nio.file.Files.readString(java.nio.file.Paths.get(
      target, "_delta_log", f"${0L}%020d.json"))
    val pvs = log.linesIterator.map(mapper.readTree)
      .filter(_.has("add"))
      .map(_.get("add").get("partitionValues").get("p").asText()).toSet
    assert(pvs == Set("a+b", "a b", "plain"),
      s"partition values must round-trip exactly, got $pvs")
    val back = DeltaImport.toDF(spark, target)
    assert(back.filter(col("p") === "a+b").count() == 1)
  }

  test("live deletion vectors export as the Delta DV feature, no rewrite") {
    val t = ManagedTable.create(
      spark.range(100).select(col("id").as("k"), col("id").as("v")),
      tmpDir("dxp4"), properties = Map(ManagedTable.dvPropKey -> "true"))
    t.delete("k < 10")
    t.update(Map("v" -> "v + 1000"), Some("k >= 95")) // DV update: mask+append
    val target = tmpDir("dxp4_delta")
    t.exportDelta(target)
    // the log carries protocol 3/7 with the feature, a u-storage
    // descriptor, and tightBounds:false stats on the masked add
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = java.nio.file.Files.readString(java.nio.file.Paths.get(
      target, "_delta_log", f"${0L}%020d.json"))
      .linesIterator.map(mapper.readTree).toSeq
    val proto = lines.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt() == 3)
    assert(proto.get("readerFeatures").toString.contains("deletionVectors"))
    val maskedAdds = lines.filter(n => n.has("add") &&
      n.get("add").has("deletionVector"))
    assert(maskedAdds.nonEmpty, "some add must carry a deletionVector")
    maskedAdds.foreach { n =>
      val dv = n.get("add").get("deletionVector")
      assert(dv.get("storageType").asText() == "u")
      assert(dv.get("cardinality").asLong() > 0)
      val stats = mapper.readTree(n.get("add").get("stats").asText())
      assert(!stats.get("tightBounds").asBoolean(),
        "masked adds must declare wide bounds")
    }
    // exactly one DV payload file, and the data files hard-linked
    val binFiles = java.nio.file.Paths.get(target).toFile.listFiles()
      .filter(_.getName.startsWith("deletion_vector_"))
    assert(binFiles.length == 1)
    // round-trip: the import masks the same rows the source masks
    val back = DeltaImport.toDF(spark, target)
    assert(back.count() == 90)
    assert(back.filter(col("k") < 10).count() == 0)
    assert(back.filter(col("v") > 1000).count() == 5,
      "updated post-images survive, pre-images stay masked")
    // and the re-IMPORTED clone behaves identically (full circle)
    val clone = DeltaImport.importTable(spark, target, tmpDir("dxp4_back"))
    assert(clone.toDF.count() == 90)
    assert(clone.toDFWhere("k < 10").count() == 0)
  }

  test("history export: every graft commit becomes a Delta commit a " +
       "receiving engine can time-travel to, version-by-version equal " +
       "to the source") {
    val t = ManagedTable.create(
      spark.range(300).select(col("id").as("k"), (col("id") * 2).as("v")),
      tmpDir("dxph1"))                                              // v0
    t.append(spark.range(300, 400)
      .select(col("id").as("k"), (col("id") * 2).as("v")))          // v1
    t.delete("k < 50")                                              // v2
    t.optimize(targetFileSizeBytes = 8 * 1024, sortBy = Seq("k"))   // v3
    t.update(Map("v" -> "v + 7"), Some("k >= 390"))                 // v4
    val latest = t.latestVersion
    assert(latest == 4L)
    val target = tmpDir("dxph1_delta")
    t.exportDelta(target, fromVersion = 0L)
    // one Delta commit per graft commit, 0..4
    (0L to latest).foreach { v =>
      assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(
        target, "_delta_log", f"$v%020d.json")), s"missing commit $v")
      val back = DeltaImport.toDF(spark, target, versionAsOf = v)
      val src = t.toDF(v)
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"time travel to version $v must equal the source at v$v")
    }
    // the latest snapshot through the default (unbounded) path too
    val back = DeltaImport.toDF(spark, target)
    assert(back.exceptAll(t.toDF).isEmpty && t.toDF.exceptAll(back).isEmpty)
    // tailing semantics: the per-commit snapshot DELTAS the export
    // replays equal the source's own change feed, version by version
    // (insert rows appear, delete rows disappear)
    (1L to latest).foreach { v =>
      val prev = DeltaImport.toDF(spark, target, versionAsOf = v - 1)
      val cur = DeltaImport.toDF(spark, target, versionAsOf = v)
      val appeared = cur.exceptAll(prev)
      val disappeared = prev.exceptAll(cur)
      val ch = t.changes(v - 1, v) // (from, to] — exactly version v
      val ins = ch.filter(col("_change_type").isin("insert", "update_postimage"))
        .select("k", "v")
      val del = ch.filter(col("_change_type").isin("delete", "update_preimage"))
        .select("k", "v")
      assert(appeared.exceptAll(ins).isEmpty && ins.exceptAll(appeared).isEmpty,
        s"v$v: appeared rows must equal the change feed's inserts")
      assert(disappeared.exceptAll(del).isEmpty &&
        del.exceptAll(disappeared).isEmpty,
        s"v$v: disappeared rows must equal the change feed's deletes")
    }
    // OPTIMIZE exported with dataChange=false on every add and remove
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val optLog = java.nio.file.Files.readString(java.nio.file.Paths.get(
      target, "_delta_log", f"${3L}%020d.json"))
    val optActions = optLog.linesIterator.map(mapper.readTree).toSeq
    val fileActs = optActions.filter(n => n.has("add") || n.has("remove"))
    assert(fileActs.nonEmpty, "OPTIMIZE commit must carry file actions")
    fileActs.foreach { n =>
      val a = if (n.has("add")) n.get("add") else n.get("remove")
      assert(!a.get("dataChange").asBoolean(),
        "OPTIMIZE must export dataChange=false so Delta streams skip it")
    }
    // appends export with dataChange=true
    val appLog = java.nio.file.Files.readString(java.nio.file.Paths.get(
      target, "_delta_log", f"${1L}%020d.json"))
    val appAdds = appLog.linesIterator.map(mapper.readTree)
      .filter(_.has("add")).toSeq
    assert(appAdds.nonEmpty && appAdds.forall(
      _.get("add").get("dataChange").asBoolean()))
    // a BASE commit anchored on an OPTIMIZE is still a full snapshot: a
    // Delta stream tailing the export from scratch must receive its
    // rows, so the base's adds are dataChange=true regardless of the
    // source operation (only tail commits consult it)
    val optBase = tmpDir("dxph1_optbase")
    t.exportDelta(optBase, fromVersion = 3L) // graft v3 == OPTIMIZE
    val baseAdds = java.nio.file.Files.readString(java.nio.file.Paths.get(
        optBase, "_delta_log", f"${0L}%020d.json"))
      .linesIterator.map(mapper.readTree).filter(_.has("add")).toSeq
    assert(baseAdds.nonEmpty && baseAdds.forall(
      _.get("add").get("dataChange").asBoolean()),
      "an OPTIMIZE-anchored base must still export dataChange=true adds")
  }

  test("history export: DV-carrying DML in the tail time-travels, and " +
       "removes re-reference the descriptor their add carried") {
    val t = ManagedTable.create(
      spark.range(400).select(col("id").as("k"), (col("id") % 5).as("v")),
      tmpDir("dxph2"), properties = Map(ManagedTable.dvPropKey -> "true"))
    t.delete("k < 40")                                              // v1: DV
    t.delete("k >= 40 AND k < 60")                                  // v2: DV swap
    val target = tmpDir("dxph2_delta")
    t.exportDelta(target, fromVersion = 0L)
    (0L to 2L).foreach { v =>
      val back = DeltaImport.toDF(spark, target, versionAsOf = v)
      val src = t.toDF(v)
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"DV time travel to v$v")
    }
    // the v2 DV swap must remove the v1 logical file WITH its original
    // descriptor (Delta reconciles by (path, dv uniqueId) — a bare
    // remove would cancel the wrong logical file)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val v1Adds = java.nio.file.Files.readString(java.nio.file.Paths.get(
        target, "_delta_log", f"${1L}%020d.json"))
      .linesIterator.map(mapper.readTree).filter(_.has("add"))
      .map(_.get("add")).filter(a => a.has("deletionVector")).toSeq
    assert(v1Adds.nonEmpty, "v1 must export DV-carrying adds")
    val v2 = java.nio.file.Files.readString(java.nio.file.Paths.get(
        target, "_delta_log", f"${2L}%020d.json"))
      .linesIterator.map(mapper.readTree).toSeq
    val v2Removes = v2.filter(_.has("remove")).map(_.get("remove"))
      .filter(_.has("deletionVector"))
    assert(v2Removes.nonEmpty, "the DV swap must remove the old logical file")
    def dvKey(n: com.fasterxml.jackson.databind.JsonNode) = {
      val d = n.get("deletionVector")
      (n.get("path").asText(), d.get("pathOrInlineDv").asText(),
        d.get("offset").asInt())
    }
    val addKeys = v1Adds.map(dvKey).toSet
    v2Removes.foreach { r =>
      assert(addKeys.contains(dvKey(r)),
        s"remove descriptor must match the v1 add: ${dvKey(r)}")
    }
  }

  test("history export from a mid version: commit 0 is the snapshot AS " +
       "OF fromVersion, the tail follows, and txn markers cross as " +
       "Delta txn actions") {
    val t = ManagedTable.create(
      spark.range(100).select(col("id").as("k"), col("id").as("v")),
      tmpDir("dxph3"))                                              // v0
    t.append(spark.range(100, 150).select(col("id").as("k"),
      col("id").as("v")))                                           // v1
    t.append(spark.range(150, 160).select(col("id").as("k"),
      col("id").as("v")), txn = Some(("writerA", 7L)))              // v2
    t.delete("k < 10")                                              // v3
    val target = tmpDir("dxph3_delta")
    t.exportDelta(target, fromVersion = 1L)
    // Delta versions 0..2 map to graft versions 1..3
    (0L to 2L).foreach { dv =>
      val back = DeltaImport.toDF(spark, target, versionAsOf = dv)
      val src = t.toDF(dv + 1)
      assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
        s"delta v$dv must equal graft v${dv + 1}")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    // graft v2's txn marker rides delta commit 1 as a txn action
    val c1 = java.nio.file.Files.readString(java.nio.file.Paths.get(
        target, "_delta_log", f"${1L}%020d.json"))
      .linesIterator.map(mapper.readTree).toSeq
    val txns = c1.filter(_.has("txn")).map(_.get("txn"))
    assert(txns.map(x => (x.get("appId").asText(), x.get("version").asLong()))
      == Seq(("writerA", 7L)),
      "the idempotent-writer marker must cross as a Delta txn action")
    // commit 0 carries the marker state as of the base? no marker existed
    // at graft v1, so commit 0 has none
    val c0 = java.nio.file.Files.readString(java.nio.file.Paths.get(
        target, "_delta_log", f"${0L}%020d.json"))
      .linesIterator.map(mapper.readTree).toSeq
    assert(!c0.exists(_.has("txn")))
    // requesting a version outside the exported log fails loud
    val e = intercept[IllegalArgumentException](
      DeltaImport.toDF(spark, target, versionAsOf = 9L))
    assert(e.getMessage.contains("not in"), e.getMessage)
  }

  test("history export writes a classic checkpoint: the parquet alone " +
       "reconstructs the head state after the json tail is cleaned up") {
    val t = ManagedTable.create(
      spark.range(200).select(col("id").as("k"), (col("id") % 3).as("v")),
      tmpDir("dxpcp"), properties = Map(ManagedTable.dvPropKey -> "true"))
    t.append(spark.range(200, 260).select(col("id").as("k"),
      (col("id") % 3).as("v")))                                     // v1
    t.delete("k < 30")                                              // v2: DV
    val target = tmpDir("dxpcp_delta")
    t.exportDelta(target, fromVersion = 0L)
    val logDir = java.nio.file.Paths.get(target, "_delta_log")
    val headV = 2L
    assert(java.nio.file.Files.isRegularFile(
      logDir.resolve(f"$headV%020d.checkpoint.parquet")))
    assert(java.nio.file.Files.isRegularFile(logDir.resolve("_last_checkpoint")))
    // snapshot through the advertised checkpoint equals the source
    val viaCp = DeltaImport.toDF(spark, target)
    assert(viaCp.exceptAll(t.toDF).isEmpty && t.toDF.exceptAll(viaCp).isEmpty)
    // Delta log cleanup deletes json commits once checkpointed — the
    // checkpoint must be self-sufficient (protocol + metaData + DV'd
    // adds + stats), exactly what a reader sees on an aged table
    (0L to headV).foreach { v =>
      java.nio.file.Files.delete(logDir.resolve(f"$v%020d.json")); ()
    }
    val aged = DeltaImport.toDF(spark, target)
    assert(aged.exceptAll(t.toDF).isEmpty && t.toDF.exceptAll(aged).isEmpty,
      "the checkpoint alone must reconstruct the head state")
    // time travel TO the checkpointed version itself is served from the
    // checkpoint even with the json tail gone (what real engines do)
    val agedAt = DeltaImport.toDF(spark, target, versionAsOf = headV)
    assert(agedAt.exceptAll(t.toDF).isEmpty && t.toDF.exceptAll(agedAt).isEmpty)
    // versions BELOW the checkpoint are genuinely unreachable now
    val e = intercept[IllegalArgumentException](
      DeltaImport.toDF(spark, target, versionAsOf = 0L))
    assert(e.getMessage.contains("not in"), e.getMessage)
    // single-commit exports stay minimal: no checkpoint artifacts
    val single = tmpDir("dxpcp_single")
    t.exportDelta(single)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      single, "_delta_log", "_last_checkpoint")))
  }

  test("non-empty target refuses; hard links share bytes with the source") {
    val t = ManagedTable.create(
      spark.range(10).select(col("id").as("k")), tmpDir("dxp5"))
    val target = tmpDir("dxp5_delta")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(target, "junk"))
    val e = intercept[IllegalArgumentException](t.exportDelta(target))
    assert(e.getMessage.contains("not empty"))
    val ok = target + "_ok"
    t.exportDelta(ok)
    // same filesystem here: the export must be zero-copy (hard links)
    val exported = java.nio.file.Files.walk(java.nio.file.Paths.get(ok))
    val linked = try {
      import scala.jdk.CollectionConverters._
      exported.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .forall(p => java.nio.file.Files.getAttribute(p, "unix:nlink")
          .asInstanceOf[Number].intValue() >= 2)
    } finally exported.close()
    assert(linked, "expected hard-linked data files on the same filesystem")
  }
}
