package graft.sources

import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import graft.SparkSpec

/** Reading REAL Delta Lake transaction logs (handcrafted per the public
  * PROTOCOL, since no Delta jars exist in this environment): checkpoint +
  * JSON-tail replay, add/remove cancellation, hive partitioning, schema
  * evolution, the importTable clone, column mapping `name` (physical →
  * logical translation), multi-part and v2 checkpoints, deletion
  * vectors (`u`/`i`/`p` storage, read masking + sidecar adoption), and
  * loud refusals for log features that would silently misread (`id`
  * column mapping, unknown reader features).
  */
class DeltaImportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def partFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    val s = Files.walk(root)
    try s.iterator().asScala.toSeq
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString)
      .filterNot(_.startsWith("_delta_log")).sorted
    finally s.close()
  }

  private def writeLog(dir: String, version: Long, actions: Seq[String]): Unit = {
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    Files.writeString(logDir.resolve(f"$version%020d.json"),
      actions.mkString("\n"))
    ()
  }

  private def protocolJson(minReader: Int = 1): String =
    s"""{"protocol":{"minReaderVersion":$minReader,"minWriterVersion":2}}"""

  private def metaJson(schema: org.apache.spark.sql.types.StructType,
                       partCols: Seq[String] = Nil,
                       config: Map[String, String] = Map.empty): String = {
    val root = mapper.createObjectNode()
    val m = root.putObject("metaData")
    m.put("id", "test-table")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns"); partCols.foreach(pc.add)
    val cf = m.putObject("configuration")
    config.foreach { case (k, v) => cf.put(k, v) }
    mapper.writeValueAsString(root)
  }

  private def addJson(path: String,
                      extra: ObjectNode => Unit = _ => ()): String = {
    val root = mapper.createObjectNode()
    val a = root.putObject("add")
    a.put("path", path); a.put("size", 1L)
    a.put("modificationTime", 1L); a.put("dataChange", true)
    extra(a)
    mapper.writeValueAsString(root)
  }

  private def removeJson(path: String): String =
    s"""{"remove":{"path":"$path","dataChange":true}}"""

  /** remove of a DV-carrying LOGICAL file (the tombstone a DV rewrite
    * emits alongside the refreshed add).
    */
  private def removeDvJson(path: String, storage: String,
                           pathOrInline: String,
                           offset: Option[Int]): String = {
    val root = mapper.createObjectNode()
    val r = root.putObject("remove")
    r.put("path", path); r.put("dataChange", true)
    val dv = r.putObject("deletionVector")
    dv.put("storageType", storage); dv.put("pathOrInlineDv", pathOrInline)
    offset.foreach(dv.put("offset", _))
    mapper.writeValueAsString(root)
  }

  test("replays add/remove across versions with schema evolution") {
    val dir = tmpDir("delta1")
    // batch 1: TWO files (range-partitioned so file↔rows is deterministic)
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    val batch1 = partFiles(dir)
    assert(batch1.size == 2)
    writeLog(dir, 0, Seq(protocolJson(),
      metaJson(Seq.empty[(Long, Long)].toDF("k", "v").schema)) ++
      batch1.map(addJson(_)))

    // v1: new file with an EVOLVED schema (tag), remove one v0 file
    Seq((3L, 30L, "c")).toDF("k", "v", "tag").coalesce(1)
      .write.mode("append").parquet(dir)
    val batch2 = partFiles(dir).diff(batch1)
    assert(batch2.size == 1)
    val removed = batch1.head
    writeLog(dir, 1,
      Seq(metaJson(Seq.empty[(Long, Long, String)].toDF("k", "v", "tag").schema)) ++
        batch2.map(addJson(_)) :+ removeJson(removed))

    val snap = DeltaImport.snapshot(dir)
    assert(snap.version == 1)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "v", "tag"))
    assert(snap.files.toSet == (batch1.drop(1) ++ batch2).toSet)
    val got = DeltaImport.toDF(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    assert(got.size == 2, s"one v0 file removed, got $got")
    assert(got.contains((3L, 30L, Some("c"))), "evolved file must be present")
    // the surviving v0 row null-fills the evolved column
    assert(got.exists(r => r._1 != 3L && r._3.isEmpty))
  }

  test("hive-partitioned Delta table round-trips, importTable clones it") {
    val dir = tmpDir("delta2")
    val df = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)).toDF("k", "s", "p")
    df.write.partitionBy("p").parquet(dir)
    writeLog(dir, 0, Seq(protocolJson(), metaJson(df.schema, Seq("p"),
      Map("owner" -> "me", "delta.appendOnly" -> "false"))) ++
      partFiles(dir).map(addJson(_)))

    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "s", "p"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq == Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 2)))

    val t = DeltaImport.importTable(spark, dir, tmpDir("delta2clone"))
    assert(t.partitionColumns == Seq("p"))
    assert(t.properties == Map("owner" -> "me"), "delta.* config must strip")
    assert(t.toDF.count() == 3)
    // partition pruning works on the clone
    assert(t.toDFWhere("p = 2").count() == 1)
    // the import is ZERO-COPY on one filesystem: every adopted parquet is
    // a hard link to the Delta file, not a rewrite
    val walked = Files.walk(Paths.get(t.location, "data"))
    val linked = try {
      import scala.jdk.CollectionConverters._
      val ps = walked.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      ps.nonEmpty && ps.forall(p => Files.getAttribute(p, "unix:nlink")
        .asInstanceOf[Number].intValue() >= 2)
    } finally walked.close()
    assert(linked, "adopted files must be hard links")
    // the clone keeps working after its own DML (link-adopted files
    // rewrite like written ones)
    assert(t.delete("p = 2") == 1)
    assert(t.toDF.count() == 2)
  }

  test("checkpoint baseline + JSON tail replay") {
    val dir = tmpDir("delta3")
    Seq((1L, 1L), (2L, 2L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    val batch1 = partFiles(dir)
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    // checkpoint parquet at v0: one row per action (protocol, metaData, adds)
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val cpRows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(org.apache.spark.sql.Row(1), null, null),
        org.apache.spark.sql.Row(null,
          org.apache.spark.sql.Row("id0", schema.json, Seq.empty[String]), null)) ++
        batch1.map(p => org.apache.spark.sql.Row(null, null,
          org.apache.spark.sql.Row(p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("protocol",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("minReaderVersion",
              org.apache.spark.sql.types.IntegerType)))),
        org.apache.spark.sql.types.StructField("metaData",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("schemaString",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("partitionColumns",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType))))),
        org.apache.spark.sql.types.StructField("add",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("path",
              org.apache.spark.sql.types.StringType)))))))
    val cpTmp = tmpDir("delta3cp")
    cpRows.coalesce(1).write.parquet(cpTmp)
    val cpPart = Paths.get(cpTmp).toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.copy(cpPart, logDir.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":4}""")
    // the v0 json itself is ABSENT (cleaned up) — checkpoint must carry it
    // tail: v1 removes one file
    writeLog(dir, 1, Seq(removeJson(batch1.head)))
    val snap = DeltaImport.snapshot(dir)
    assert(snap.version == 1)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "v"),
      "metaData must come from the checkpoint (its json was cleaned up)")
    assert(snap.files == batch1.drop(1))
    // coalesce(1) wrote one file; the tail removed it → empty snapshot
    assert(DeltaImport.toDF(spark, dir).count() == 0)
  }

  test("refuses unknown mapping modes and unknown reader features") {
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    val dir2 = tmpDir("delta5")
    Seq((1L, 1L)).toDF("k", "v").coalesce(1).write.parquet(dir2)
    writeLog(dir2, 0, Seq(protocolJson(),
      metaJson(schema, Nil,
        Map("delta.columnMapping.mode" -> "positional"))) ++
      partFiles(dir2).map(addJson(_)))
    val e2 = intercept[IllegalArgumentException](DeltaImport.snapshot(dir2))
    assert(e2.getMessage.contains("column mapping"))

    val dir3 = tmpDir("delta6")
    Seq((1L, 1L)).toDF("k", "v").coalesce(1).write.parquet(dir3)
    writeLog(dir3, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["typeWidening"],"writerFeatures":[]}}""",
      metaJson(schema)) ++ partFiles(dir3).map(addJson(_)))
    val e3 = intercept[IllegalArgumentException](DeltaImport.snapshot(dir3))
    assert(e3.getMessage.contains("not supported"))
  }

  // ---- deletion vectors ---------------------------------------------------

  /** add action with a deletionVector descriptor attached. */
  private def addDvJson(path: String, storage: String, pathOrInline: String,
                        offset: Option[Int], size: Int, card: Long): String =
    addJson(path, a => {
      val dv = a.putObject("deletionVector")
      dv.put("storageType", storage); dv.put("pathOrInlineDv", pathOrInline)
      offset.foreach(dv.put("offset", _))
      dv.put("sizeInBytes", size); dv.put("cardinality", card)
      ()
    })

  test("deletion vectors ('u' storage) mask reads and adopt into the clone") {
    val dir = tmpDir("deltadv1")
    // two single-row-group files, written separately for determinism
    Seq(1L, 2L, 3L, 4L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    Seq(10L, 11L).toDF("k").coalesce(1).write.mode("append").parquet(dir)
    val f2 = partFiles(dir).diff(f1)
    val schema = Seq.empty[Tuple1[Long]].toDF("k").schema
    // f1 masks row indexes 1 and 3 (values 2 and 4) via a real DV file
    val (pathOrInline, fileName) = DeltaDv.freshFileId()
    val framed = DeltaDv.writeFile(Paths.get(dir, fileName),
      Seq("only" -> Array(1L, 3L)))("only")
    writeLog(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      metaJson(schema)) ++
      Seq(addDvJson(f1.head, "u", pathOrInline, Some(framed.offset),
        framed.sizeInBytes, framed.cardinality),
        addJson(f2.head)))

    val out = DeltaImport.toDF(spark, dir)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 10L, 11L), "masked rows (2, 4) must not surface")

    // the clone stays ZERO-COPY: data hard-links, the vector becomes a
    // native _graft_dv sidecar, and the managed read masks identically
    val t = DeltaImport.importTable(spark, dir, tmpDir("deltadv1clone"))
    assert(t.toDF.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 10L, 11L))
    assert(t.toDFWhere("k <= 3").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L), "file skipping composes with the adopted mask")
    val walked = Files.walk(Paths.get(t.location, "data"))
    val linked = try walked.iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
      .forall(p => Files.getAttribute(p, "unix:nlink")
        .asInstanceOf[Number].intValue() >= 2)
    finally walked.close()
    assert(linked, "DV-masked import must still hard-link, not rewrite")
    assert(Files.isDirectory(Paths.get(t.location, "_graft_dv")),
      "the Delta vector must adopt as a managed sidecar")
    // the clone keeps working under its own DML on a masked file
    assert(t.delete("k = 3") == 1)
    assert(t.toDF.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 10L, 11L))
  }

  test("deletion vectors: inline ('i') and absolute-path ('p') storage") {
    import graft.sources.DeltaDv.{RoaringBitmapArray, Z85}
    val dir = tmpDir("deltadv2")
    Seq(1L, 2L, 3L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    Seq(20L, 21L, 22L).toDF("k").coalesce(1).write.mode("append").parquet(dir)
    val f2 = partFiles(dir).diff(f1)
    val schema = Seq.empty[Tuple1[Long]].toDF("k").schema
    // inline vector on f1 (drop index 0 -> value 1)
    val inlineData = RoaringBitmapArray.serialize(Array(0L))
    // absolute-path vector on f2 (drop index 2 -> value 22)
    val pDir = tmpDir("deltadv2p")
    Files.createDirectories(Paths.get(pDir))
    val pFile = Paths.get(pDir, "deletion_vector_ext.bin")
    val pFramed = DeltaDv.writeFile(pFile, Seq("x" -> Array(2L)))("x")
    writeLog(dir, 0, Seq(protocolJson(minReader = 3), metaJson(schema)) ++
      Seq(
        addDvJson(f1.head, "i", Z85.encode(inlineData), None,
          inlineData.length, 1L),
        addDvJson(f2.head, "p", pFile.toString, Some(pFramed.offset),
          pFramed.sizeInBytes, pFramed.cardinality)))
    assert(DeltaImport.toDF(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 3L, 20L, 21L))
  }

  test("deletion vectors replay through checkpoints; a later add clears them") {
    import graft.sources.DeltaDv.{RoaringBitmapArray, Z85}
    val dir = tmpDir("deltadv3")
    Seq(1L, 2L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    val schema = Seq.empty[Tuple1[Long]].toDF("k").schema
    val inline = RoaringBitmapArray.serialize(Array(0L))
    // checkpoint at v0 carries the add WITH its deletionVector struct
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    val actions = Seq(protocolJson(), metaJson(schema),
      addDvJson(f1.head, "i", Z85.encode(inline), None, inline.length, 1L))
    val cpTmp = tmpDir("deltadv3cp")
    spark.read.json(actions.toDS).coalesce(1).write.parquet(cpTmp)
    val cpPart = Paths.get(cpTmp).toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.copy(cpPart, logDir.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":3}""")
    assert(DeltaImport.toDF(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L), "checkpoint DV must mask row 0")
    // v1 clears the vector the way a real writer does (RESTORE shape):
    // tombstone the DV-carrying LOGICAL file, re-add without a vector —
    // the refreshed add wins, rows resurface
    writeLog(dir, 1, Seq(
      removeDvJson(f1.head, "i", Z85.encode(inline), None),
      addJson(f1.head)))
    assert(DeltaImport.toDF(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))
  }

  test("remove tombstones reconcile by (path, dv id), not by path alone") {
    import graft.sources.DeltaDv.{RoaringBitmapArray, Z85}
    val dir = tmpDir("deltadv4")
    Seq(1L, 2L, 3L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    val schema = Seq.empty[Tuple1[Long]].toDF("k").schema
    writeLog(dir, 0, Seq(protocolJson(minReader = 3), metaJson(schema),
      addJson(f1.head)))
    // v1 is a merge-on-read DELETE: the protocol permits EITHER intra-
    // commit order, and delta-spark checkpoints interleave live adds with
    // week-old tombstones arbitrarily — the add(P, dv) must survive a
    // LATER remove(P, no-dv), which cancels only the vectorless logical
    // file. Path-keyed replay would drop the whole file here.
    val inline = RoaringBitmapArray.serialize(Array(0L))
    writeLog(dir, 1, Seq(
      addDvJson(f1.head, "i", Z85.encode(inline), None, inline.length, 1L),
      removeJson(f1.head)))
    assert(DeltaImport.toDF(spark, dir).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(2L, 3L),
      "the DV-carrying add must survive the vectorless tombstone")

    // same shape through a CHECKPOINT: the live add row and the stale
    // tombstone row land in one parquet file, tombstone after the add
    val dir2 = tmpDir("deltadv5")
    Seq(5L, 6L).toDF("k").coalesce(1).write.parquet(dir2)
    val g1 = partFiles(dir2)
    val logDir = Paths.get(dir2, "_delta_log")
    Files.createDirectories(logDir)
    val actions = Seq(protocolJson(minReader = 3), metaJson(schema),
      addDvJson(g1.head, "i", Z85.encode(inline), None, inline.length, 1L),
      removeJson(g1.head))
    val cpTmp = tmpDir("deltadv5cp")
    spark.read.json(actions.toDS).coalesce(1).write.parquet(cpTmp)
    val cpPart = Paths.get(cpTmp).toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Files.copy(cpPart, logDir.resolve(f"${0L}%020d.checkpoint.parquet"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":4}""")
    assert(DeltaImport.toDF(spark, dir2).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(6L),
      "checkpoint replay must key tombstones by (path, dv id) too")
  }

  test("two live adds of one path refuse loud (broken writer invariant)") {
    import graft.sources.DeltaDv.{RoaringBitmapArray, Z85}
    val dir = tmpDir("deltadv6")
    Seq(1L, 2L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    val schema = Seq.empty[Tuple1[Long]].toDF("k").schema
    val inline = RoaringBitmapArray.serialize(Array(0L))
    // an add(P, dv) NOT preceded by remove(P, none): both logical files
    // stay live and the path's rows would double-read — refuse
    writeLog(dir, 0, Seq(protocolJson(minReader = 3), metaJson(schema),
      addJson(f1.head),
      addDvJson(f1.head, "i", Z85.encode(inline), None, inline.length, 1L)))
    val e = intercept[IllegalStateException](DeltaImport.snapshot(dir))
    assert(e.getMessage.contains("live adds"), e.getMessage)
  }

  // ---- column mapping mode `name` ----------------------------------------

  private def mappedField(logical: String, physical: String,
                          dt: org.apache.spark.sql.types.DataType,
                          id: Int): org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(logical, dt, nullable = true,
      new org.apache.spark.sql.types.MetadataBuilder()
        .putString("delta.columnMapping.physicalName", physical)
        .putLong("delta.columnMapping.id", id.toLong).build())

  test("column mapping 'name': physical columns read back as logical names") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmpDir("deltacm1")
    // data files carry PHYSICAL names, per the protocol
    Seq((1L, "a"), (2L, "b")).toDF("col-0aa", "col-0bb")
      .coalesce(1).write.parquet(dir)
    val schema = StructType(Seq(
      mappedField("k", "col-0aa", LongType, 1),
      mappedField("s", "col-0bb", StringType, 2)))
    writeLog(dir, 0, Seq(protocolJson(minReader = 2),
      metaJson(schema, Nil, Map("delta.columnMapping.mode" -> "name"))) ++
      partFiles(dir).map(addJson(_)))

    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "s"), "logical names, not col-<uuid>")
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == Seq((1L, "a"), (2L, "b")), "values must come from the physical cols")

    // the clone MATERIALIZES (no hard links): managed parquet must carry
    // logical names, which the physical-named source footers cannot
    val t = DeltaImport.importTable(spark, dir, tmpDir("deltacm1clone"))
    assert(t.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(t.toDF.collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toSeq == Seq((1L, "a"), (2L, "b")))
    val walked = Files.walk(Paths.get(t.location, "data"))
    val nlinks = try walked.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .map(p => Files.getAttribute(p, "unix:nlink").asInstanceOf[Number].intValue())
      .toSeq
    finally walked.close()
    assert(nlinks.nonEmpty && nlinks.forall(_ == 1),
      "name-mapped import must rewrite, not link physical-named footers")
  }

  test("column mapping 'name': physical-named hive partition dirs translate") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
    val dir = tmpDir("deltacm2")
    Seq((1L, 1), (2L, 1), (3L, 2)).toDF("col-0aa", "col-0pp")
      .write.partitionBy("col-0pp").parquet(dir)
    val schema = StructType(Seq(
      mappedField("k", "col-0aa", LongType, 1),
      mappedField("p", "col-0pp", IntegerType, 2)))
    // metaData.partitionColumns hold LOGICAL names; the dirs are physical
    writeLog(dir, 0, Seq(protocolJson(minReader = 2),
      metaJson(schema, Seq("p"), Map("delta.columnMapping.mode" -> "name"))) ++
      partFiles(dir).map(addJson(_)))

    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "p"))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
      == Seq((1L, 1), (2L, 1), (3L, 2)))

    val t = DeltaImport.importTable(spark, dir, tmpDir("deltacm2clone"))
    assert(t.partitionColumns == Seq("p"), "partitioning carries over logically")
    assert(t.toDFWhere("p = 2").count() == 1)
  }

  test("a partitioned table WITHOUT hive dirs reads and imports via " +
       "add.partitionValues (null partitions included)") {
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val dir = tmpDir("deltapv")
    // three root-level files (no k=v dirs — randomized-prefix writers),
    // partition membership recorded ONLY in the log. Partition column is
    // NOT in the data files, as Delta writes it.
    Seq(1L, 2L).toDF("k").coalesce(1).write.parquet(dir)
    val f1 = partFiles(dir)
    Seq(3L).toDF("k").coalesce(1).write.mode("append").parquet(dir)
    val f2 = partFiles(dir).diff(f1)
    Seq(4L).toDF("k").coalesce(1).write.mode("append").parquet(dir)
    val f3 = partFiles(dir).diff(f1 ++ f2)
    assert(f1.size == 1 && f2.size == 1 && f3.size == 1)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("p", IntegerType)))
    def addPv(path: String, p: Option[Int]): String =
      addJson(path, a => {
        val pv = a.putObject("partitionValues")
        p match { case Some(v) => pv.put("p", v.toString)
                  case None => pv.putNull("p") }
        ()
      })
    writeLog(dir, 0, Seq(protocolJson(), metaJson(schema, Seq("p"))) ++
      Seq(addPv(f1.head, Some(1)), addPv(f2.head, Some(2)),
        addPv(f3.head, None)))

    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "p"))
    val got = out.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .sorted.toSeq
    assert(got == Seq((1L, Some(1)), (2L, Some(1)), (3L, Some(2)),
      (4L, None)), s"log partitionValues must attach, got $got")

    // the clone stays ZERO-COPY: k=v target dirs synthesized from the log
    val t = DeltaImport.importTable(spark, dir, tmpDir("deltapvclone"))
    assert(t.partitionColumns == Seq("p"))
    assert(t.toDFWhere("p = 1").count() == 2, "pruning works on the clone")
    assert(t.toDF.filter(col("p").isNull).count() == 1,
      "null partition survives the import")
    val walked = Files.walk(Paths.get(t.location, "data"))
    val linked = try walked.iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq
      .forall(p => Files.getAttribute(p, "unix:nlink")
        .asInstanceOf[Number].intValue() >= 2)
    finally walked.close()
    assert(linked, "non-hive import must still hard-link, not rewrite")

    // a partitioned file with NO partitionValues in the log refuses loud
    val dir2 = tmpDir("deltapv2")
    Seq(1L).toDF("k").coalesce(1).write.parquet(dir2)
    writeLog(dir2, 0, Seq(protocolJson(), metaJson(schema, Seq("p"))) ++
      partFiles(dir2).map(addJson(_)))
    val e = intercept[IllegalArgumentException](
      DeltaImport.toDF(spark, dir2).collect())
    assert(e.getMessage.contains("partitionValues"))
  }

  test("column mapping 'id' (delta-spark annotation shape) reads and " +
       "imports like 'name'") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmpDir("deltacmid")
    Seq((1L, "a"), (2L, "b")).toDF("col-0aa", "col-0bb")
      .coalesce(1).write.parquet(dir)
    // delta-spark annotates BOTH the field id and the physicalName in id
    // mode; resolution rides the physical names either way
    val schema = StructType(Seq(
      mappedField("k", "col-0aa", LongType, 1),
      mappedField("s", "col-0bb", StringType, 2)))
    writeLog(dir, 0, Seq(protocolJson(minReader = 2),
      metaJson(schema, Nil, Map("delta.columnMapping.mode" -> "id"))) ++
      partFiles(dir).map(addJson(_)))
    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "s"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      == Seq((1L, "a"), (2L, "b")))
    val t = DeltaImport.importTable(spark, dir, tmpDir("deltacmidclone"))
    assert(t.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(t.toDF.count() == 2)
  }

  test("column mapping 'id' WITHOUT physicalName metadata refuses loud " +
       "instead of null-filling through logical names") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType,
      StructField, MetadataBuilder}
    val dir = tmpDir("deltacmidbare")
    Seq((1L, "a"), (2L, "b")).toDF("col-0aa", "col-0bb")
      .coalesce(1).write.parquet(dir)
    // a non-Spark id-mode writer: field ids only, NO physicalName — a
    // logical-name fallback would scan for 'k'/'s', match nothing in the
    // footers, and read silent all-nulls
    def idOnly(name: String, dt: org.apache.spark.sql.types.DataType,
               id: Int) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong).build())
    val schema = StructType(Seq(
      idOnly("k", LongType, 1), idOnly("s", StringType, 2)))
    writeLog(dir, 0, Seq(protocolJson(minReader = 2),
      metaJson(schema, Nil, Map("delta.columnMapping.mode" -> "id"))) ++
      partFiles(dir).map(addJson(_)))
    val e = intercept[IllegalStateException](
      DeltaImport.toDF(spark, dir).collect())
    assert(e.getMessage.contains("physicalName"), e.getMessage)
  }

  test("column mapping 'name' resolves NESTED struct fields through " +
       "their physical names") {
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = tmpDir("deltacm3")
    // physical layout: top-level col-0bb is a struct whose INNER fields
    // also carry physical names (delta-spark annotates every level)
    Seq((1L, (10L, "x")), (2L, (20L, "y")))
      .toDF("col-0aa", "s")
      .selectExpr("`col-0aa`",
        "named_struct('col-1xx', s._1, 'col-1yy', s._2) AS `col-0bb`")
      .coalesce(1).write.parquet(dir)
    val inner = StructType(Seq(
      mappedField("x", "col-1xx", LongType, 3),
      mappedField("y", "col-1yy", StringType, 4)))
    val schema = StructType(Seq(
      mappedField("k", "col-0aa", LongType, 1),
      mappedField("s", "col-0bb", inner, 2)))
    writeLog(dir, 0, Seq(protocolJson(minReader = 2),
      metaJson(schema, Nil, Map("delta.columnMapping.mode" -> "name"))) ++
      partFiles(dir).map(addJson(_)))
    val out = DeltaImport.toDF(spark, dir)
    assert(out.columns.toSeq == Seq("k", "s"))
    assert(out.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("x", "y"), "inner fields re-alias to logical")
    val got = out.selectExpr("k", "s.x", "s.y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(got == Seq((1L, 10L, "x"), (2L, 20L, "y")))
    // and the clone materializes to plain logical names at every level
    val t = DeltaImport.importTable(spark, dir, tmpDir("deltacm3clone"))
    assert(t.toDF.selectExpr("s.x").as[Long].collect().sorted.toSeq ==
      Seq(10L, 20L))
  }

  // ---- multi-part and v2 checkpoints -------------------------------------

  /** Write `actions` (JSON strings) as a one-file parquet checkpoint at
    * `target` — schema inferred from the JSON, same nested action shape
    * Delta uses.
    */
  private def writeCpParquet(target: Path, actions: Seq[String]): Unit = {
    import spark.implicits._
    val tmp = tmpDir("cpbuild-" + target.getFileName.toString.hashCode.abs)
    spark.read.json(actions.toDS).coalesce(1).write.parquet(tmp)
    val part = Paths.get(tmp).toFile.listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    Option(target.getParent).foreach(Files.createDirectories(_))
    Files.copy(part, target)
    ()
  }

  test("multi-part checkpoint unions the parts; a missing part refuses") {
    val dir = tmpDir("deltamp")
    Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    val files = partFiles(dir)
    assert(files.size == 2)
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    writeCpParquet(
      logDir.resolve(f"${0L}%020d.checkpoint.${1}%010d.${2}%010d.parquet"),
      Seq(protocolJson(), metaJson(schema), addJson(files(0))))
    writeCpParquet(
      logDir.resolve(f"${0L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"),
      Seq(addJson(files(1))))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":4,"parts":2}""")

    val snap = DeltaImport.snapshot(dir)
    assert(snap.version == 0)
    assert(snap.files.toSet == files.toSet,
      "adds from BOTH parts must survive replay")
    assert(DeltaImport.toDF(spark, dir).count() == 2)

    Files.delete(
      logDir.resolve(f"${0L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"))
    val e = intercept[IllegalArgumentException](DeltaImport.snapshot(dir))
    assert(e.getMessage.contains("missing"), "partial checkpoint must refuse")
  }

  test("v2 UUID json manifest + parquet sidecars, then a JSON tail") {
    val dir = tmpDir("deltav2")
    Seq((1L, 1L), (2L, 2L)).toDF("k", "v")
      .repartitionByRange(2, col("k")).write.parquet(dir)
    val files = partFiles(dir)
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    writeCpParquet(logDir.resolve("_sidecars").resolve("sc-001.parquet"),
      files.map(addJson(_)))
    Files.writeString(
      logDir.resolve(f"${0L}%020d.checkpoint.80a083e8-7026.json"),
      Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
        metaJson(schema),
        """{"sidecar":{"path":"sc-001.parquet","sizeInBytes":100}}""")
        .mkString("\n"))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":4}""")
    writeLog(dir, 1, Seq(removeJson(files.head)))

    val snap = DeltaImport.snapshot(dir)
    assert(snap.version == 1)
    assert(snap.files == files.drop(1),
      "sidecar adds replay, then the tail remove lands")
    assert(DeltaImport.toDF(spark, dir).count() == 1)
  }

  test("checkpoint metaData with a non-empty configuration applies " +
       "(JSON-inferred struct shape included)") {
    val dir = tmpDir("deltacpcf")
    Seq((1L, 1L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    val files = partFiles(dir)
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    // writeCpParquet infers configuration as a STRUCT, not a map — the
    // replay projection must still surface the properties
    writeCpParquet(logDir.resolve(f"${0L}%020d.checkpoint.parquet"),
      Seq(protocolJson(),
        metaJson(schema, Nil, Map("owner" -> "me", "delta.appendOnly" -> "false"))) ++
        files.map(addJson(_)))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":3}""")
    val snap = DeltaImport.snapshot(dir)
    assert(snap.configuration == Map("owner" -> "me", "delta.appendOnly" -> "false"))
    assert(snap.files == files)
  }

  test("v2 UUID parquet manifest with an inline sidecar action") {
    val dir = tmpDir("deltav2p")
    Seq((1L, 1L)).toDF("k", "v").coalesce(1).write.parquet(dir)
    val files = partFiles(dir)
    val schema = Seq.empty[(Long, Long)].toDF("k", "v").schema
    val logDir = Paths.get(dir, "_delta_log")
    Files.createDirectories(logDir)
    writeCpParquet(logDir.resolve("_sidecars").resolve("sc-77.parquet"),
      files.map(addJson(_)))
    writeCpParquet(
      logDir.resolve(f"${0L}%020d.checkpoint.11bb22cc-0001.parquet"),
      Seq(protocolJson(), metaJson(schema),
        """{"sidecar":{"path":"sc-77.parquet","sizeInBytes":10}}"""))
    Files.writeString(logDir.resolve("_last_checkpoint"),
      """{"version":0,"size":3}""")

    val snap = DeltaImport.snapshot(dir)
    assert(snap.files == files)
    assert(DeltaImport.toDF(spark, dir).count() == 1)
  }
}
