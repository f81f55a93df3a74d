package graft.tools

import org.apache.spark.sql.{SparkSession, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.tables._
import graft.operators._
import graft.functions._

/** End-to-end demo driver: exercises the public API against the synthetic
  * TPC-H-ish testdata. `sbt "runMain graft.tools.Drive [sfDir]"`.
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scratch(name: String): String = {
      val p = s"/root/repo/target/tmp/drive_$name"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(p))
      p
    }

    // SCD2 over real customer data
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val base = cust.select(col("c_custkey").as("pkey"), col("c_mktsegment").as("attr"))
      .withColumn("is_current", lit(true))
      .withColumn("effective_time", lit(java.sql.Timestamp.valueOf("2019-01-01 00:00:00")))
      .withColumn("end_time", lit(null).cast(TimestampType))
    val t = ManagedTable.create(base, scratch("scd2"))
    println(s"[1] created table: ${t.toDF.count} rows, version ${t.latestVersion}")

    val updates = cust.limit(10).select(col("c_custkey").as("pkey"),
        concat(col("c_mktsegment"), lit("_NEW")).as("attr"))
      .withColumn("effective_time", lit(java.sql.Timestamp.valueOf("2021-06-01 00:00:00")))
      .union(spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(999901L, "FRESH", java.sql.Timestamp.valueOf("2021-06-01 00:00:00")),
        Row(999902L, "FRESH", java.sql.Timestamp.valueOf("2021-06-01 00:00:00")))),
        StructType(Seq(StructField("pkey", LongType), StructField("attr", StringType),
          StructField("effective_time", TimestampType)))))
    Scd2.upsert(t, updates, "pkey", Seq("attr"))
    println(s"[2] after SCD2 upsert: total=${t.toDF.count}, closed=${t.toDF.filter("is_current = false").count}, current=${t.toDF.filter("is_current").count}, version=${t.latestVersion}")
    t.toDF.filter("pkey in (1, 999901)").orderBy("pkey", "effective_time").show(truncate = false)

    Scd2.upsert(t, updates, "pkey", Seq("attr"))
    println(s"[3] re-upsert same updates (no-op expected): total=${t.toDF.count}")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dt = ManagedTable.create(li, scratch("dedup"))
    val before = dt.toDF.count
    Dedup.killDuplicates(dt, Seq("l_orderkey"))
    println(s"[4] kill_duplicates on l_orderkey: $before -> ${dt.toDF.count} (single-line orders only)")

    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val ct = ManagedTable.create(ord.limit(0), scratch("ca"),
      properties = Map("delta.constraints.price" -> "o_totalprice > 50000"))
    val qt = ManagedTable.create(ord.limit(0), scratch("caq"))
    Appends.constraintAppend(ct, ord, qt)
    println(s"[5] constraint_append: in=${ord.count} -> target=${ct.toDF.count} quarantine=${qt.toDF.count} (sum=${ct.toDF.count + qt.toDF.count})")

    println("[6] " + TableOps.describeFileSizes(ct))

    try Scd2.upsert(t, updates.drop("effective_time"), "pkey", Seq("attr"))
    catch { case e: graft.GraftTypeError =>
      println(s"[7] probe bad updates -> GraftTypeError: ${e.getMessage.take(120)}") }

    try {
      val dup = updates.union(updates)
      Merge.into(t.toDF, "base").using(dup, "u", "base.pkey = u.pkey")
        .whenMatchedUpdate(Map("attr" -> "u.attr")).result().count
      println("[8] probe multi-match -> NO ERROR (unexpected)")
    } catch { case e: Exception =>
      def msgs(x: Throwable): Seq[String] =
        if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
      val hit = msgs(e).exists(_.contains("matched by multiple source rows"))
      println(s"[8] probe multi-match -> raised=${hit}") }

    val part = spark.read.parquet(s"$sfDir/part.parquet")
    println("[9] md5 col sample: " + withMd5Cols(part, Seq("p_brand", "p_type"))
      .select("md5_p_brand_p_type").head.getString(0))
    println("[10] composite key of part: " + Keys.findCompositeKeyCandidates(part))

    // --- extension operators over documents/embeddings ---
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nd = graft.text.MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5).count()
    val kept = graft.text.MinHashDedup.dedup(docs, "doc_id", "text", 0.5).count()
    println(s"[11] minhash near-dup: ${docs.count} docs -> $nd pairs, $kept kept after dedup")
    val sh = graft.text.SimHashDedup.dedup(docs, "doc_id", "text", 3).count()
    println(s"[12] simhash dedup keeps $sh")
    val langs = docs.select(graft.text.TextAnalysis.langId(col("text")).as("l"))
      .groupBy("l").count().collect().map(r => s"${r.getString(0)}:${r.getLong(1)}").mkString(" ")
    println(s"[13] langid distribution: $langs")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val topk = graft.ml.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      emb.limit(2), "vec_id", "embedding", k = 3)
      .collect().map(r => s"(${r.getLong(0)}->${r.getLong(1)} @${r.getDouble(3)})").mkString(" ")
    println(s"[14] brute-force top-3: $topk")
    val model = graft.ml.IvfIndex.fit(emb, "embedding", k = 4)
    val ivfN = graft.ml.IvfIndex.topK(emb, "vec_id", "embedding",
      emb.limit(2), "vec_id", "embedding", model, k = 3, nprobe = 2).count()
    println(s"[15] ivf top-3 rows: $ivfN")

    // --- round-2 storage engine: partitioned merge, vacuum, optimize ---
    val pt = ManagedTable.create(ord.withColumn("o_year", year(col("o_orderdate"))),
      scratch("pmerge"), partitionBy = Seq("o_year"))
    val leavesBefore = pt.detail.numFiles
    val bump = pt.toDF.filter(col("o_year") === 1997)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Merge.into(pt.toDF, "base")
      .using(bump, "src", "base.o_orderkey = src.o_orderkey AND base.o_year = src.o_year")
      .whenMatchedUpdateAll()
      .execute(pt)
    println(s"[16] partition-pruned MERGE on o_year=1997: op=${
      pt.history.orderBy(col("version").desc).head.getString(2)}, " +
      s"rows=${pt.toDF.count}, files $leavesBefore -> ${pt.detail.numFiles}")

    (1 to 3).foreach(_ => pt.append(ord.limit(100)
      .withColumn("o_year", year(col("o_orderdate")))))
    val fragFiles = pt.detail.numFiles
    pt.optimize(sortBy = Seq("o_orderkey"))
    // minAgeMillis=0: waive the concurrent-writer retention floor — this
    // driver is single-writer and wants to SHOW the reclamation
    val (vDirs, vBytes) = pt.vacuum(retainVersions = 1, minAgeMillis = 0)
    println(s"[17] optimize+vacuum: files $fragFiles -> ${pt.detail.numFiles}, " +
      s"reclaimed $vDirs dirs / ${humanizeBytes(vBytes)}; rows=${pt.toDF.count}")

    graft.plans.GraftFunctions.register(spark)
    docs.limit(50).createOrReplaceTempView("drive_docs")
    val sqlDup = spark.sql(
      """SELECT count(*) FROM drive_docs a JOIN drive_docs b
        |ON a.doc_id < b.doc_id
        |AND graft_simhash64(graft_shingle_hashes(a.text, 3)) =
        |    graft_simhash64(graft_shingle_hashes(b.text, 3))""".stripMargin)
      .head.getLong(0)
    println(s"[18] SQL surface (graft_* functions): $sqlDup identical-simhash pairs in 50 docs")

    // --- round-8 surface: Z-order, DML, change feed, timestamp travel ---
    val zt = ManagedTable.create(li.select("l_orderkey", "l_partkey", "l_quantity"),
      scratch("zorder"))
    zt.optimize(targetFileSizeBytes = 8 * 1024, zorderBy = Seq("l_orderkey", "l_partkey"))
    val zTotal = zt.detail.numFiles
    val zRead = zt.toDFWhere(s"l_partkey = 42").inputFiles.length
    println(s"[19] Z-order on (orderkey, partkey): partkey probe reads $zRead of $zTotal files")

    val dmlT = ManagedTable.create(ord, scratch("dml"),
      properties = Map(ManagedTable.cdfPropKey -> "true"))
    dmlT.optimize(targetFileSizeBytes = 16 * 1024, sortBy = Seq("o_orderkey"))
    val v0 = dmlT.latestVersion
    val nDel = dmlT.delete("o_orderkey < 100")
    val nUpd = dmlT.update(Map("o_orderpriority" -> "'9-REPRICED'"),
      Some("o_totalprice > 400000"))
    println(s"[20] DML: deleted $nDel, updated $nUpd, rows=${dmlT.toDF.count}")

    val feed = dmlT.changes(v0)
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    val sidecars = {
      val p = java.nio.file.Paths.get(dmlT.location, "_graft_cdc")
      if (!java.nio.file.Files.isDirectory(p)) 0L
      else { val s = java.nio.file.Files.list(p); try s.count() finally s.close() }
    }
    println(s"[21] change feed since v$v0 (net, read from $sidecars CDC sidecars): $byType")
    println(s"[22] timestamp travel: versionAsOf(now)=${
      dmlT.versionAsOf(System.currentTimeMillis())} (latest=${dmlT.latestVersion})")

    // --- round-9 surface: SQL statements on graft.`path` tables ---------
    val sqlRef = s"graft.`${dmlT.location}`"
    val sqlDel = spark.sql(s"DELETE FROM $sqlRef WHERE o_orderkey < 200")
      .head().getLong(0)
    val sqlFeed = spark.sql(
      s"SELECT count(*) FROM graft_table_changes('${dmlT.location}', $v0)")
      .head().getLong(0)
    val sqlHist = spark.sql(s"DESCRIBE HISTORY $sqlRef").count()
    println(s"[23] SQL DML: DELETE removed $sqlDel rows; table_changes " +
      s"since v$v0 = $sqlFeed rows; history has $sqlHist commits")

    val dvT = ManagedTable.create(ord, scratch("dv"),
      properties = Map(ManagedTable.dvPropKey -> "true"))
    dvT.optimize(targetFileSizeBytes = 16 * 1024, sortBy = Seq("o_orderkey"))
    val dvFilesBefore = dvT.detail.numFiles
    val nDv = dvT.delete("o_orderkey < 150")
    println(s"[24] deletion vectors: removed $nDv rows, data files " +
      s"$dvFilesBefore -> ${dvT.detail.numFiles} (no rewrite), " +
      s"rows=${dvT.toDF.count}")

    // --- streaming sink: cdf source → graft sink mirror -----------------
    import org.apache.spark.sql.functions.col
    val mirrorLoc = scratch("mirror")
    val mq = spark.readStream.format("graft-cdf")
      .option("startingVersion", "0").load(dvT.location)
      .filter(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version", "_commit_timestamp")
      .writeStream.format("graft")
      .option("checkpointLocation", scratch("mirror_ckpt"))
      .start(mirrorLoc)
    try mq.processAllAvailable() finally mq.stop()
    val mirrored = ManagedTable.forPath(spark, mirrorLoc)
    println(s"[25] streaming sink: graft-cdf → format(\"graft\") mirror " +
      s"has ${mirrored.toDF.count} rows across " +
      s"${mirrored.latestVersion + 1} commits (exactly-once txn appends)")

    // --- Delta export: snapshot → real _delta_log, read back ------------
    val dexp = scratch("delta_export")
    val nExported = mirrored.exportDelta(dexp)
    val reread = graft.sources.DeltaImport.toDF(spark, dexp).count()
    println(s"[26] delta export: $nExported hard-linked files + stats " +
      s"log; re-imported rows=$reread (source=${mirrored.toDF.count})")

    // --- History-preserving Delta export: time-travel + tail ------------
    val dexph = scratch("delta_export_history")
    val histFiles = mirrored.exportDelta(dexph, fromVersion = 0L)
    val deltaVersions = (0L to mirrored.latestVersion).map(v =>
      graft.sources.DeltaImport.toDF(spark, dexph, versionAsOf = v).count())
    println(s"[26b] delta history export: $histFiles files across " +
      s"${mirrored.latestVersion + 1} Delta commits; time-travel row " +
      s"counts ${deltaVersions.mkString("[", ", ", "]")} (latest=" +
      s"${mirrored.toDF.count})")

    // --- Delta deletion-vector interop: handcrafted DV table imports ----
    val ddv = scratch("delta_dv_src")
    ord.coalesce(1).write.parquet(ddv)
    val dataFile = new java.io.File(ddv).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    val (dvRef, dvFileName) = graft.sources.DeltaDv.freshFileId()
    val framed = graft.sources.DeltaDv.writeFile(
      java.nio.file.Paths.get(ddv, dvFileName),
      Seq("f" -> Array(0L, 1L, 2L)))("f")
    val logDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(ddv, "_delta_log"))
    java.nio.file.Files.writeString(logDir.resolve(f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      s"""{"metaData":{"id":"drv","schemaString":${
        new com.fasterxml.jackson.databind.ObjectMapper()
          .writeValueAsString(ord.schema.json)},"partitionColumns":[],"configuration":{},""" +
        """"format":{"provider":"parquet","options":{}}}}""",
      s"""{"add":{"path":"$dataFile","size":1,"modificationTime":1,""" +
        s""""dataChange":true,"deletionVector":{"storageType":"u",""" +
        s""""pathOrInlineDv":"$dvRef","offset":${framed.offset},""" +
        s""""sizeInBytes":${framed.sizeInBytes},""" +
        s""""cardinality":${framed.cardinality}}}}""").mkString("\n"))
    val dvImported = graft.sources.DeltaImport
      .importTable(spark, ddv, scratch("delta_dv_clone"))
    println(s"[27] delta DV import: source ${ord.count} rows - 3 masked = " +
      s"${dvImported.toDF.count} (zero-copy, vector adopted as " +
      s"${if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
        dvImported.location, "_graft_dv"))) "_graft_dv sidecar" else "??"})")

    // --- bloom-filter point-lookup skipping ----------------------------
    import org.apache.spark.sql.functions.{md5, lit}
    val bloomT = ManagedTable.create(
      spark.range(2000L).select(col("id"),
        md5(col("id").cast("string")).as("h")).repartition(8),
      scratch("bloom"),
      properties = Map(graft.tables.BloomSkip.columnsPropKey -> "h"))
    val probeH = spark.range(1).select(md5(lit("777"))).head().getString(0)
    val bHit = bloomT.toDFWhere(s"h = '$probeH'")
    val bMiss = bloomT.toDFWhere("h = 'zzz-absent'")
    println(s"[28] bloom skipping: point probe reads " +
      s"${bHit.inputFiles.length} of ${bloomT.detail.numFiles} files " +
      s"(row id=${bHit.head.getLong(0)}); absent key reads " +
      s"${bMiss.inputFiles.length}")

    // --- PII redaction -------------------------------------------------
    val dirty = "reach u7@ex.org at 10.0.0.7 / (555) 123-4567, ssn 123-45-6789"
    val cleaned = spark.range(1).select(lit(dirty).as("t"))
      .select(graft.text.PiiRedact.redact(col("t"))).head.getString(0)
    println(s"[29] pii redaction: '$dirty' -> '$cleaned'")

    // --- fuzzy (shingle-Jaccard) decontamination -----------------------
    import spark.implicits._
    // one mid-word change: splits the 14-word doc into 7- and 6-word
    // runs (no exact 8-gram survives) yet 9 of 12 shingles do (J = 0.6)
    val evalDoc = "the quick brown fox jumps over the lazy dog near the river bank today"
    val para = "the quick brown fox jumps over the sleepy dog near the river bank today"
    val fCorpus = Seq((1L, para), (2L, "entirely different material"))
      .toDF("doc_id", "text")
    val fBench = Seq((9L, evalDoc)).toDF("doc_id", "text")
    val exactKeeps = graft.text.Decontaminate
      .dropContaminated(fCorpus, fBench, "doc_id", "text").count()
    val fuzzyKeeps = graft.text.Decontaminate
      .dropContaminatedFuzzy(fCorpus, fBench, "doc_id", "text",
        threshold = 0.5).count()
    println(s"[30] fuzzy decontamination: paraphrase kept by exact " +
      s"8-gram rule ($exactKeeps of 2 survive) but dropped by " +
      s"shingle-Jaccard >= 0.5 ($fuzzyKeeps of 2 survive)")

    // --- SQL MERGE INTO ------------------------------------------------
    val mrgT = ManagedTable.create(
      spark.range(6).selectExpr("id AS k", "id * 10 AS v"), scratch("sqlmerge"))
    spark.range(4, 8).selectExpr("id AS k", "id * 100 AS sv")
      .createOrReplaceTempView("drive_merge_src")
    val mrg = spark.sql(
      s"""MERGE INTO graft.`${mrgT.location}` t
         |USING drive_merge_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.sv
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.sv)""".stripMargin)
      .head()
    println(s"[31] SQL MERGE INTO: committed v${mrg.getLong(0)}, " +
      s"${mrg.getLong(1)} rows (2 updated, 2 inserted); " +
      s"k=4 -> v=${mrgT.toDF.filter("k = 4").head().getLong(1)}")
    val tvfNow = spark.sql(
      s"SELECT count(*) FROM graft_table('${mrgT.location}')").head().getLong(0)
    val tvfV0 = spark.sql(
      s"SELECT count(*) FROM graft_table('${mrgT.location}', 0)").head().getLong(0)
    println(s"[32] graft_table TVF: snapshot=$tvfNow rows, " +
      s"version-travel v0=$tvfV0 rows")

    // --- audio decode (real RIFF/WAV parser) ---------------------------
    val aud = graft.multimodal.Multimodal.decodeAudio(
      graft.multimodal.Multimodal.syntheticAudio(
        spark.range(3).selectExpr("id AS doc_id", "'hello world' AS text"),
        "doc_id", "text"), "content")
      .select("media_id", "decoded_audio.sample_rate",
        "decoded_audio.n_samples", "decoded_audio.peak").collect()
    println(s"[33] audio decode: " + aud.map(r =>
      s"id=${r.getLong(0)} rate=${r.getInt(1)} n=${r.getInt(2)} " +
        s"peak=${r.getInt(3)}").mkString("; "))

    // --- ALTER TABLE + SHOW PARTITIONS + unicode_clean -----------------
    val altPath = scratch("alter_demo")
    graft.tables.ManagedTable.create(
      spark.range(9).selectExpr("id AS k", "id % 3 AS p"),
      altPath, partitionBy = Seq("p"))
    val altRef = s"graft.`$altPath`"
    val partsShown = spark.sql(s"SHOW PARTITIONS $altRef").collect()
      .map(_.getString(0)).mkString(", ")
    spark.sql(s"ALTER TABLE $altRef ADD COLUMNS (note STRING)")
    spark.sql(s"ALTER TABLE $altRef SET TBLPROPERTIES ('owner' = 'drive')")
    spark.sql(s"ALTER TABLE $altRef UNSET TBLPROPERTIES ('owner')")
    val altT = graft.tables.ManagedTable.forPath(spark, altPath)
    val cleanDemo = spark.sql(
      "SELECT graft_unicode_clean(' cafe\u0301 \u200B ok ') AS c")
      .head().getString(0)
    println(s"[34] ALTER surface: partitions [$partsShown]; " +
      s"schema now ${altT.schema.fieldNames.mkString("/")}; " +
      s"props after set+unset: ${altT.properties.size}; " +
      s"unicode_clean -> '$cleanDemo'")

    // --- SemDeDup semantic dedup over the embeddings table -------------
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    val sdCents = graft.ml.SemDedup.seedCentroids(
      embAll, "vec_id", "embedding", k = 8)
    val sdKept = graft.ml.SemDedup.dropSemanticDuplicates(
      embAll, "vec_id", "embedding", sdCents, tau = 0.25)
    val sdClusters = graft.ml.SemDedup.assignClusters(
      embAll, "vec_id", "embedding", sdCents)
      .groupBy("cluster_id").count().count()
    println(s"[35] semdedup: ${embAll.count} vectors, $sdClusters clusters " +
      s"-> ${sdKept.count} kept at tau=0.25")

    // --- temperature-flattened corpus mixing ---------------------------
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")
    val tempMix = graft.operators.Sampling.temperatureSample(
      docsAll, groupCol = "lang", weightCol = "n_chars",
      keys = Seq("doc_id"), alpha = 0.5, targetRows = docsAll.count() / 2)
      .groupBy("lang").count().orderBy("lang").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
    println(s"[36] temperature mix (alpha=0.5, target=half): $tempMix")

    // --- Gopher document-quality rules ---------------------------------
    val gq = docsAll.select(col("doc_id"),
      graft.text.QualityFilters.gopherQualitySignals(col("text")).as("st"))
    val gqAgg = gq.selectExpr("avg(st.n_words) AS words", "avg(st.stop_hits) AS sh")
      .head()
    val gqKept = graft.text.QualityFilters
      .filterGopherQuality(docsAll, "text").count()
    println(f"[37] gopher quality: avg words ${gqAgg.getDouble(0)}%.1f, " +
      f"avg stop hits ${gqAgg.getDouble(1)}%.2f; " +
      s"$gqKept of ${docsAll.count} kept at published thresholds")

    // --- SQ8-quantized similarity search -------------------------------
    val embRaw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val sqTop = graft.ml.Similarity.sq8TopK(embRaw, "vec_id", "embedding",
      embRaw.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => s"${r.getLong(1)}@${r.getDouble(3)}").mkString(", ")
    val exTop = graft.ml.Similarity.bruteForceTopK(embRaw, "vec_id", "embedding",
      embRaw.filter(col("vec_id") === 0), "vec_id", "embedding", k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).mkString(", ")
    println(s"[38] sq8 ANN: int8 top-3 [$sqTop] vs exact ids [$exTop]")

    // --- video modality: AVI container walk + sampled-frame decode -----
    val vids = graft.multimodal.Multimodal.syntheticVideo(
      docsAll.limit(20), "doc_id", "text")
    val vdec = graft.multimodal.Multimodal.decodeVideo(vids, "content", every = 2)
      .selectExpr("sum(decoded_video.n_frames) AS nf",
        "sum(decoded_video.frames_sampled) AS ns",
        "count(*) AS n").head()
    println(s"[39] video decode: ${vdec.getLong(2)} AVIs, " +
      s"${vdec.getLong(0)} frames in movi, ${vdec.getLong(1)} decoded at every=2")

    // --- real image resize (Graphics2D bilinear, re-encoded PNG) -------
    val imgs = graft.multimodal.Multimodal.syntheticMedia(
      docsAll.limit(10), "doc_id", "text")
    val rz = graft.multimodal.Multimodal.decodeImages(
      graft.multimodal.Multimodal.resizeImages(imgs, "content", 6, 4), "resized")
      .selectExpr("count(*) n", "sum(CAST(decoded.width = 6 AND decoded.height = 4 AS INT)) ok")
      .head()
    println(s"[40] image resize: ${rz.getLong(1)}/${rz.getLong(0)} re-decoded at 6x4")

    // --- PQ-compressed ANN with exact rerank ---------------------------
    val pqModel = graft.ml.PqIndex.fit(embAll, "embedding", m = 8, ksub = 16)
    val pqTop = graft.ml.PqIndex.topK(embAll, "vec_id", "embedding",
      embAll.filter(col("vec_id") === 0), "vec_id", "embedding",
      pqModel, k = 3, shortlist = 50)
      .orderBy("rank").collect().map(_.getLong(1)).mkString(", ")
    println(s"[41] pq ANN (m=8, ksub=16, 8-byte codes): top-3 ids [$pqTop] " +
      s"vs exact [$exTop]")

    // --- partition-scoped OPTIMIZE (Delta's OPTIMIZE ... WHERE) --------
    val owPath = scratch("optwhere")
    val owDf = spark.range(0, 300).selectExpr("id AS k", "id % 3 AS p")
    val owT = graft.tables.ManagedTable.create(owDf, owPath, partitionBy = Seq("p"))
    (0 until 3).foreach { i =>
      owT.append(spark.range(300 + i * 10, 310 + i * 10).selectExpr("id AS k", "id % 3 AS p"))
    }
    def liveFiles(t: graft.tables.ManagedTable, p: Int): Long =
      t.toDF.filter(col("p") === p).select(input_file_name()).distinct().count()
    val owBefore = liveFiles(owT, 2)
    spark.sql(s"OPTIMIZE graft.`$owPath` WHERE p = 0").collect()
    val owT2 = graft.tables.ManagedTable.forPath(spark, owPath)
    val p0After = liveFiles(owT2, 0)
    val p2After = liveFiles(owT2, 2)
    println(s"[42] OPTIMIZE WHERE p=0: p=0 files -> $p0After; " +
      s"p=2 untouched ($owBefore -> $p2After); rows ${owT2.toDF.count}")

    // --- table CHECK constraints (ADD CONSTRAINT + write-time gate) ----
    val ckPath = scratch("checkconstraint")
    val ckT = graft.tables.ManagedTable.create(
      spark.range(0, 50).selectExpr("id AS k", "id + 1 AS v"), ckPath)
    spark.sql(s"ALTER TABLE graft.`$ckPath` ADD CONSTRAINT vpos CHECK (v > 0)")
    val ckT2 = graft.tables.ManagedTable.forPath(spark, ckPath)
    val ckRefused =
      try { ckT2.append(spark.range(1).selectExpr("id AS k", "id - 5 AS v")); "NOT refused" }
      catch { case e: Throwable if e.getMessage.contains("vpos") => "refused" }
    println(s"[43] CHECK constraint: ${ckT2.checkConstraints}; " +
      s"violating append $ckRefused; rows still ${ckT2.toDF.count}")

    // --- unigram-LM NLL + real BPE token budgeting ---------------------
    val nllStats = graft.text.VocabStats.unigramNll(docsAll, "doc_id", "text")
      .agg(min("nll"), avg("nll"), max("nll")).head()
    val bpeModel = graft.text.Bpe.fit(docsAll, "text", numMerges = 200)
    val bpeTotals = docsAll.select(
        graft.text.Bpe.tokenCount(col("text"), bpeModel).as("bpe"),
        graft.text.TextAnalysis.tokenCountWhitespace(col("text")).as("ws"))
      .agg(sum("bpe"), sum("ws")).head()
    val gopherSql = spark.sql(
      "SELECT graft_gopher_stats('the cat\n- item one...') AS g")
      .selectExpr("g.n_words", "g.bullet_lines", "g.ellipsis_lines").head()
    println(f"[44] nll min/avg/max ${nllStats.getDouble(0)}%.2f/" +
      f"${nllStats.getDouble(1)}%.2f/${nllStats.getDouble(2)}%.2f; " +
      s"bpe tokens ${bpeTotals.getLong(0)} vs ws ${bpeTotals.getLong(1)} " +
      s"(${bpeModel.merges.size} merges); " +
      s"SQL gopher_stats -> words=${gopherSql.getLong(0)} " +
      s"bullets=${gopherSql.getLong(1)} ellipses=${gopherSql.getLong(2)}")

    // --- table streaming source: snapshot + append tailing -------------
    val tsSrc = scratch("tstream-src"); val tsDst = scratch("tstream-dst")
    val tsT = graft.tables.ManagedTable.create(
      spark.range(0, 100).selectExpr("id AS k"), tsSrc)
    val tsQ = spark.readStream.format("graft").load(tsSrc)
      .writeStream.format("graft")
      .option("checkpointLocation", scratch("tstream-ckpt"))
      .start(tsDst)
    try {
      tsQ.processAllAvailable()
      tsT.append(spark.range(100, 130).selectExpr("id AS k"))
      tsQ.processAllAvailable()
    } finally tsQ.stop()
    println(s"[45] table stream source: mirror has " +
      s"${graft.tables.ManagedTable.forPath(spark, tsDst).toDF.count} rows " +
      s"after snapshot(100) + append(30)")

    // --- DROP COLUMN (logical, tombstoned) + FSCK ----------------------
    val dcPath = scratch("dropcol")
    val dcT = graft.tables.ManagedTable.create(
      spark.range(0, 20).selectExpr("id AS k", "id * 2 AS extra", "id * 3 AS v"),
      dcPath)
    spark.sql(s"ALTER TABLE graft.`$dcPath` DROP COLUMN extra")
    val dcT2 = graft.tables.ManagedTable.forPath(spark, dcPath)
    val dcResurrect =
      try { dcT2.addColumns(Seq(org.apache.spark.sql.types.StructField(
        "extra", org.apache.spark.sql.types.LongType))); "allowed" }
      catch { case _: IllegalArgumentException => "tombstoned" }
    val fsckRows = spark.sql(s"FSCK REPAIR TABLE graft.`$dcPath` DRY RUN").count()
    println(s"[46] DROP COLUMN: schema now ${dcT2.schema.fieldNames.mkString("/")}, " +
      s"re-add $dcResurrect; FSCK DRY RUN: $fsckRows missing files")

    // --- semantic decontamination (embedding-cosine vs bench set) ------
    val sdBench = embAll.filter(col("vec_id") < 5)
      .select(col("embedding"))
    val sdKept2 = graft.ml.Similarity.dropSemanticMatches(
      embAll, "vec_id", "embedding", sdBench, "embedding", threshold = 0.95)
      .count()
    println(s"[47] semantic decon: ${embAll.count} vectors, 5 bench items " +
      s"-> $sdKept2 kept at cos 0.95 (the 5 self-matches dropped)")

    // --- BPE token ids: encode -> vocab round-trip -> packed shards ----
    val idsModel = graft.text.Bpe.fit(docs, "text", numMerges = 100)
    val idsEnc = docs.select(col("doc_id"),
      graft.text.Bpe.encode(col("text"), idsModel).as("ids"))
    val idsHead = idsEnc.orderBy("doc_id").head()
    val idsSample = idsHead.getSeq[Int](1).take(8)
    val decoded = graft.text.Bpe.decodeTokens(
      idsHead.getSeq[Int](1).toIndexedSeq, idsModel)
    val idsPacked = graft.text.TextChunker.packSequences(
      idsEnc, "doc_id", "ids", capacity = 2048, groups = 4, sepId = Some(0))
    val idsPackAgg = idsPacked
      .agg(count(lit(1)), sum(col("n_tokens")), max(col("n_tokens"))).head()
    println(s"[48] bpe ids: vocab=${idsModel.vocab.size} " +
      s"(${idsModel.merges.size} merges); doc0 ids ${idsSample.mkString(",")}… " +
      s"decode head '${decoded.take(4).mkString(" ")}'; packed " +
      s"${idsPackAgg.getLong(0)} shards / ${idsPackAgg.getLong(1)} tokens " +
      s"(max ${idsPackAgg.getLong(2)})")

    // --- unigram-LM (SentencePiece-style): fit -> TSV round-trip ->
    // Viterbi encode -> detok round-trip -------------------------------
    val ulm = graft.text.UnigramLm.fit(docs, "text", vocabSize = 300)
    // round-trip BOTH public formats: the .model protobuf wire form,
    // then the spm_export_vocab TSV
    val ulmReload = graft.text.UnigramLm.loadTsv(
      graft.text.UnigramLm.exportTsv(
        graft.text.UnigramLm.loadModelBytes(
          graft.text.UnigramLm.exportModelBytes(ulm))))
    val ulmHead = docs.orderBy("doc_id").select(col("text"),
      graft.text.UnigramLm.encode(col("text"), ulmReload).as("ids")).head()
    val ulmIds = ulmHead.getSeq[Int](1)
    val ulmDecoded = graft.text.UnigramLm.decode(ulmIds.toIndexedSeq, ulmReload)
    val ulmAgg = docs.select(
      graft.text.UnigramLm.tokenCount(col("text"), ulmReload).as("n"))
      .agg(sum("n"), max("n")).head()
    println(s"[48b] unigram-lm: vocab=${ulm.pieces.size} pieces; doc0 " +
      s"${ulmIds.take(8).mkString(",")}… detok-prefix-ok=" +
      s"${ulmHead.getString(0).startsWith(ulmDecoded.take(20))}; " +
      s"${ulmAgg.getLong(0)} tokens total (max ${ulmAgg.getLong(1)})")

    // --- IVF×PQ composed ANN: route -> ADC shortlist -> exact rerank ---
    val ivfpqModel = graft.ml.IvfPq.fit(embAll, "embedding", k = 8, m = 8,
      ksub = 16)
    val ivfpqTop = graft.ml.IvfPq.topK(embAll, "vec_id", "embedding",
      embAll.filter(col("vec_id") < 2), "vec_id", "embedding",
      ivfpqModel, k = 3, nprobe = 4, shortlist = 50)
      .orderBy("query_id", "rank").collect()
    val ivfpqStr = ivfpqTop.map(r =>
      s"${r.getLong(0)}->${r.getLong(1)}@${r.getDouble(3)}").mkString(" ")
    println(s"[49] ivfpq ANN (k=8 cells, nprobe=4, 8-byte codes): " +
      s"top-3 $ivfpqStr")

    // --- CDC apply: change feed -> MERGE sink replication --------------
    val caSrc = scratch("cdcapply-src"); val caDst = scratch("cdcapply-dst")
    val caT = graft.tables.ManagedTable.create(
      spark.range(0, 50).selectExpr("id AS k", "id * 2 AS v"), caSrc,
      properties = Map(graft.tables.ManagedTable.cdfPropKey -> "true"))
    caT.delete("k < 5")
    caT.update(Map("v" -> "v + 100"), Some("k >= 45"))
    val caQ = spark.readStream.format("graft-cdf")
      .option("startingVersion", "0").load(caSrc)
      .writeStream.format("graft")
      .option("checkpointLocation", scratch("cdcapply-ckpt"))
      .option("txnAppId", "drive-cdc")
      .option("mergeKeys", "k").option("applyCdf", "true")
      .start(caDst)
    try caQ.processAllAvailable() finally caQ.stop()
    val caMirror = graft.tables.ManagedTable.forPath(spark, caDst)
    val caMatch = caMirror.toDF.orderBy("k").collect().toSeq ==
      caT.toDF.orderBy("k").collect().toSeq
    println(s"[50] CDC apply: graft-cdf -> merge sink replicated " +
      s"${caMirror.toDF.count()} rows through create+delete+update; " +
      s"mirror==source: $caMatch")

    // --- C4 line-level cleaning ---------------------------------------
    val c4Seed = docs.select(col("doc_id"), concat_ws("\n",
      concat(array_join(slice(split(col("text"), " "), 1, 8), " "), lit(".")),
      lit("short line."),
      lit("a fine sentence with many good words here!"),
      lit("this one mentions javascript and dies."),
      lit("one more healthy line to pass the page rule.")).as("text"))
    val c4 = graft.text.C4Filters.clean(c4Seed, "doc_id", "text")
      .agg(sum(when(col("page_kept"), 1).otherwise(0)),
        sum(col("n_kept")), sum(col("n_lines"))).head()
    println(s"[51] C4 cleaning: ${c4.getLong(0)} of ${docs.count()} pages " +
      s"kept, ${c4.getLong(1)}/${c4.getLong(2)} lines survive the " +
      "terminal-punct/word-count/javascript rules")

    // --- DSIR importance weights against a domain target ---------------
    val dsirW = graft.text.VocabStats.dsirWeights(docs, "doc_id", "text",
      docs.filter(col("source") === "src0"), "text")
    val dsirStats = dsirW.agg(min("dsir_weight"), max("dsir_weight")).head()
    val dsirTop = dsirW.orderBy(col("dsir_weight").desc)
      .limit(3).select("doc_id").as[Long].collect().mkString(",")
    println(f"[52] DSIR vs src0 target: weight range " +
      f"${dsirStats.getDouble(0)}%.1f..${dsirStats.getDouble(1)}%.1f, " +
      s"top-3 target-like docs: $dsirTop")
    // --- budget-driven mixing ------------------------------------------
    val mixOut = graft.operators.Sampling.tokenBudgetMix(
      docsAll, "lang", "n_chars", keys = Seq("doc_id"),
      shares = Map("en" -> 3.0, "fr" -> 1.0), totalWeight = 4000L)
    val mixBy = mixOut.groupBy("lang").agg(sum("n_chars").as("w"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
      .mkString(" ")
    println(s"[53] token-budget mix (4k chars, en:fr = 3:1): kept $mixBy; " +
      s"other languages dropped")

    // --- Hilbert clustering: both-column skipping --------------------
    val hbLoc = scratch("hilbert")
    val hbT = graft.tables.ManagedTable.create(
      spark.range(20000).selectExpr("CAST(id % 100 AS INT) AS hx",
        "CAST(id / 100 AS INT) AS hy", "id AS payload"), hbLoc)
    hbT.optimize(targetFileSizeBytes = 16 * 1024,
      zorderBy = Seq("hx", "hy"), curve = "hilbert")
    val hbTotal = hbT.detail.numFiles
    val hbX = hbT.toDFWhere("hx BETWEEN 10 AND 19").inputFiles.length
    val hbY = hbT.toDFWhere("hy BETWEEN 10 AND 19").inputFiles.length
    println(s"[54] Hilbert clustering on (hx, hy): x probe reads " +
      s"$hbX of $hbTotal files, y probe $hbY of $hbTotal")

    // --- byte-level GPT-2-format tokenizer: fit -> export the public
    // vocab.json/merges.txt -> reload -> encode -> chunk -> pack, the
    // full pipeline a trainer consumes, driven from the IMPORTED vocab
    val g2Fit = graft.text.Gpt2Bpe.fit(docs, "text", numMerges = 120)
    val g2Dir = java.nio.file.Paths.get(scratch("gpt2tok"))
    java.nio.file.Files.createDirectories(g2Dir)
    java.nio.file.Files.write(g2Dir.resolve("vocab.json"),
      graft.text.Gpt2Bpe.exportVocabJson(g2Fit)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(g2Dir.resolve("merges.txt"),
      graft.text.Gpt2Bpe.exportMergesTxt(g2Fit)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val g2 = graft.text.Gpt2Bpe.loadFiles(
      g2Dir.resolve("vocab.json").toString, g2Dir.resolve("merges.txt").toString)
    val g2Enc = docs.select(col("doc_id"),
      graft.text.Gpt2Bpe.encode(col("text"), g2).as("ids"))
    val g2Head = g2Enc.orderBy("doc_id").head()
    val g2RoundTrip = graft.text.Gpt2Bpe.decode(
      g2Head.getSeq[Int](1).toIndexedSeq, g2) ==
      docs.orderBy("doc_id").select("text").head().getString(0)
    val g2Chunks = graft.text.TextChunker.chunkIds(
      g2Enc, "doc_id", "ids", maxTokens = 64, overlap = 8)
    val g2Packed = graft.text.TextChunker.packSequences(
      g2Enc, "doc_id", "ids", capacity = 2048, groups = 4,
      sepId = Some(g2.encoder("<|endoftext|>")))
    val g2PackAgg = g2Packed
      .agg(count(lit(1)), sum(col("n_tokens"))).head()
    println(s"[55] gpt2-format tokenizer: vocab=${g2.encoder.size} " +
      s"(${g2.merges.size} merges) exported+reloaded; doc0 lossless " +
      s"decode=$g2RoundTrip; ${g2Chunks.count()} chunks at 64/8; packed " +
      s"${g2PackAgg.getLong(0)} shards / ${g2PackAgg.getLong(1)} tokens " +
      s"(sep=<|endoftext|>)")

    // --- exact substring dedup (ExactSubstr as duplicated-k-window
    // union): mark + strip verbatim >= 30-char spans corpus-wide, then
    // prove conservation (clean length + struck chars = original)
    val ssd = graft.text.SubstrDedup.strip(
      docs.select("doc_id", "text"), "doc_id", "text", k = 30)
    val ssdAgg = ssd.agg(
      sum(when(col("n_spans") > 0, 1).otherwise(0)),
      sum("dup_chars"), sum(length(col("text")))).head()
    val origChars = docs.agg(sum(length(col("text")))).head().getLong(0)
    println(s"[56] exact-substring dedup (k=30): ${ssdAgg.getLong(0)} of " +
      s"${docs.count()} docs carry duplicated spans; struck " +
      s"${ssdAgg.getLong(1)} of $origChars chars; conservation " +
      s"${ssdAgg.getLong(1) + ssdAgg.getLong(2) == origChars}")

    // token-granular variant over real BPE ids (the paper's unit): strip
    // duplicated >= 8-token windows from the gpt2-format encodings
    val ssdT = graft.text.SubstrDedup.stripIds(g2Enc, "doc_id", "ids", k = 8)
      .agg(sum("dup_tokens"), sum(size(col("ids")))).head()
    println(s"[57] token-level ExactSubstr over gpt2 ids (k=8): struck " +
      s"${ssdT.getLong(0)} tokens, ${ssdT.getLong(1)} kept")

    // C4 page-blocklist rule against a seeded badwords list (single
    // word + phrase — both kernel paths)
    val blAgg = docs.select(
      graft.text.C4Filters.blocklistHits(col("text"),
        Seq("slow", "merge batch")).as("h"))
      .agg(sum(when(col("h") > 0, 1).otherwise(0)), sum("h")).head()
    println(s"[58] C4 badwords page rule ('slow', 'merge batch'): " +
      s"${blAgg.getLong(0)} of ${docs.count()} pages dropped, " +
      s"${blAgg.getLong(1)} total hits")

    // interpolated bigram LM quality score (the order-aware CCNet proxy)
    val bnll = graft.text.VocabStats.bigramNll(docs, "doc_id", "text")
      .agg(min("nll"), max("nll"), sum("n_bigrams")).head()
    println(f"[59] bigram LM NLL: range ${bnll.getDouble(0)}%.2f.." +
      f"${bnll.getDouble(1)}%.2f over ${bnll.getLong(2)} bigrams")

    // C4's three-sentence-span dedup — the corpus carries no sentence
    // punctuation, so re-line it first (a period every 8 words)
    val toks8 = filter(split(col("text"), " "), w => length(w) > 0)
    val n8 = ((size(toks8) + lit(7)) / lit(8)).cast("int")
    val relined = docs.select(col("doc_id"),
      when(size(toks8) === 0, lit("")).otherwise(concat(array_join(
        transform(sequence(lit(0), n8 - 1), g =>
          array_join(slice(toks8, g * lit(8) + 1, lit(8)), " ")), ". "),
        lit(".")))
        .as("text"))
    val spd = graft.text.C4Filters.dropRepeatedSpans(relined, "doc_id", "text")
      .agg(sum(when(col("n_removed") > 0, 1).otherwise(0)),
        sum("n_removed"), sum("n_sentences")).head()
    println(s"[60] C4 span dedup (3-sentence windows, 8-word re-lining): " +
      s"${spd.getLong(0)} docs lose ${spd.getLong(1)} of " +
      s"${spd.getLong(2)} sentences")

    // inverted index + tf-idf keywords over the corpus vocabulary
    val inv = graft.text.VocabStats.invertedIndex(docs, "doc_id", "text",
      maxDfFrac = 0.9)
    val kw = graft.text.VocabStats.tfidfKeywords(docs, "doc_id", "text",
        k = 3, maxDfFrac = 0.9)
      .filter(col("rank") === 1).groupBy("word").count()
      .orderBy(col("count").desc, col("word")).limit(3)
      .collect().map(r => s"${r.getString(0)}(${r.getLong(1)})").mkString(" ")
    println(s"[61] inverted index: ${inv.count()} words survive the 0.9 " +
      s"df-cut; top rank-1 keywords: $kw")

    // BM25 retrieval for a mixed-selectivity query
    val bm = graft.text.VocabStats.bm25Search(docs, "doc_id", "text",
        Seq("dup", "fast", "key"), k = 3)
      .collect().map(r => f"${r.getLong(0)}@${r.getDouble(2)}%.2f")
      .mkString(" ")
    println(s"[62] BM25 top-3 for 'dup fast key': $bm")

    // the same query served from the prebuilt structures (index +
    // doc-length table) — must reproduce the scan ranking exactly
    val bmIdx = graft.text.VocabStats.bm25SearchIndexed(
        graft.text.VocabStats.invertedIndexStructured(docs, "doc_id", "text",
          maxDfFrac = 0.9),
        graft.text.VocabStats.docLengths(docs, "doc_id", "text"),
        "doc_id", Seq("dup", "fast", "key"), k = 3)
      .collect().map(r => f"${r.getLong(0)}@${r.getDouble(2)}%.2f")
      .mkString(" ")
    println(s"[62b] BM25-from-index top-3: $bmIdx" +
      (if (bmIdx == bm) " (matches scan)" else s" MISMATCH vs scan: $bm"))

    // batch retrieval: two queries, one corpus scan; query 1 must
    // reproduce the single-query ranking above
    val bmQs = Seq((1L, Seq("dup", "fast", "key")),
      (2L, Seq("line", "small"))).toDF("qid", "terms")
    val bmAll = graft.text.VocabStats.bm25SearchAll(docs, "doc_id", "text",
        bmQs, "qid", "terms", k = 3)
      .collect().map(r => (r.getLong(0),
        f"${r.getLong(2)}@${r.getDouble(4)}%.2f"))
    val bmQ1 = bmAll.filter(_._1 == 1L).map(_._2).mkString(" ")
    println(s"[62c] BM25 batch (2 queries, 1 scan): q1 $bmQ1" +
      (if (bmQ1 == bm) " (matches single)" else s" MISMATCH vs $bm") +
      s"; q2 ${bmAll.filter(_._1 == 2L).map(_._2).mkString(" ")}")

    // WARC container round-trip: export shards (both layouts), read back
    val warcDir = "target/tmp/drive_warc"
    def rmWarc(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmWarc); f.delete(); ()
    }
    rmWarc(new java.io.File(warcDir))
    val warcIn = docs.select(
      concat(lit("http://corpus.local/doc/"), col("doc_id")).as("uri"),
      col("text").cast("binary").as("payload"))
    graft.sources.Warc.export(warcIn.repartition(2), "uri", "payload",
      warcDir, gzipPerRecord = true)
    val warcBack = graft.sources.Warc.read(spark, warcDir + "/*.warc*")
    val wAgg = warcBack.agg(count(lit(1)),
      sum(length(col("payload").cast("string")))).head()
    val wOrig = docs.agg(count(lit(1)), sum(length(col("text")))).head()
    println(s"[62d] WARC round-trip: ${wAgg.getLong(0)} records / " +
      s"${wAgg.getLong(1)} chars " +
      (if (wAgg.getLong(0) == wOrig.getLong(0) &&
        wAgg.getLong(1) == wOrig.getLong(1)) "(byte-faithful)"
       else s"MISMATCH vs ${wOrig.getLong(0)}/${wOrig.getLong(1)}"))

    // near-dup survivor policies: min-id vs keep-longest
    val minIds = graft.text.NearDupClusters.dedupTransitive(
      docs, "doc_id", "text", threshold = 0.5).count()
    val best = graft.text.NearDupClusters.dedupKeepBest(
      docs, "doc_id", "text", "n_chars", threshold = 0.5)
    println(s"[63] near-dup survivors: min-id $minIds, keep-longest " +
      s"${best.count()} (same clusters, ${best.agg(sum("n_chars")).head.getLong(0)} chars retained)")

    // same survivors from the O(log n)-round star-contraction components
    val starIds = graft.text.NearDupClusters.dedupTransitive(
      docs, "doc_id", "text", threshold = 0.5, algo = "star").count()
    println(s"[63b] star-contraction components: $starIds survivors " +
      (if (starIds == minIds) "(identical to label propagation)"
       else s"MISMATCH vs $minIds"))

    // RefinedWeb keep-first: one canonical copy of each repeated segment
    // stays; boilerplate strike removes every copy — keep-first must
    // retain at least as much text
    val keepFirst = graft.text.Boilerplate.dedupKeepFirst(
      docs.select("doc_id", "text"), "doc_id", "text",
      graft.text.Boilerplate.segmentsByWords(col("text"), 10))
    val strikeAll = graft.text.Boilerplate.removeRepeated(
      docs.select("doc_id", "text"), "doc_id", "text",
      graft.text.Boilerplate.segmentsByWords(col("text"), 10), minDocs = 2)
    val kfStats = keepFirst.agg(sum("n_removed"), sum(length(col("text")))).head()
    val saChars = strikeAll.agg(sum(length(col("text")))).head().getLong(0)
    println(s"[63c] keep-first segment dedup: ${kfStats.getLong(0)} windows " +
      s"struck, ${kfStats.getLong(1)} chars kept vs strike-all's $saChars " +
      (if (kfStats.getLong(1) >= saChars) "(canonical copies preserved)"
       else "UNEXPECTED: keep-first kept less"))

    // hybrid retrieval: BM25 lexical leg + embedding-cosine dense leg
    // fused by Reciprocal Rank Fusion (join-free union-pivot shape)
    val sparseLeg = graft.text.VocabStats.bm25Search(
        docs, "doc_id", "text", query = Seq("dup", "fast"), k = 10)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id"))))
    val denseLeg = graft.ml.Similarity.bruteForceTopK(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") === 0), "vec_id", "embedding", k = 10)
    val fusedTop = graft.ml.Fusion.rrfFuse(
      Seq(("bm25", sparseLeg, "doc_id", "rank"),
        ("cosine", denseLeg, "neighbor_id", "rank")),
      outIdCol = "doc_id", k0 = 60, k = 5).collect()
    val bothLegs = fusedTop.count(r => !r.isNullAt(1) && !r.isNullAt(2))
    println(s"[64] hybrid RRF top-5: " +
      fusedTop.map(r => s"doc ${r.getLong(0)} rrf=${r.getDouble(3)}")
        .mkString(", ") + s" ($bothLegs of 5 surfaced by both legs)")

    // Naive Bayes seed classifier: self-train on `source`, report how
    // often the argmax recovers the training label (NB is consistent on
    // separable classes; the synthetic sources share vocabulary, so
    // expect recovery well above the 1/|labels| prior but below 1.0)
    val nbPred = graft.text.NaiveBayes.classify(docs, "doc_id", "text", "source")
    val nbHit = nbPred.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("pred") === col("source")).count()
    val nLabels = docs.select("source").distinct().count()
    println(s"[65] naive-bayes self-classification: $nbHit of ${docs.count()} " +
      s"recover their source ($nLabels labels, prior ${1.0 / nLabels})")

    // image perceptual hash: dHash the synthetic PNGs, pair by the
    // pigeonhole band join; under the planted x-gradient rows repeat,
    // so every qualifying pair is hash-identical (hamming 0)
    val media = graft.multimodal.Multimodal.syntheticMedia(
      docs, "doc_id", "text")
    val phPairs = graft.multimodal.Multimodal.imageNearDupPairs(
      media, "media_id", "content", maxDist = 3)
    val phAgg = phPairs.agg(count(lit(1)), max(col("hamming"))).head()
    println(s"[66] image dHash near-dup: ${phAgg.getLong(0)} pairs, " +
      s"max hamming ${phAgg.get(1)} (planted gradient makes pairs exact)")

    // the banded-Hamming optimizer rule: the naive SQL pair join plans
    // as an equi-join (no nested loop) once the rule is installed
    spark.experimental.extraOptimizations = Seq(graft.plans.BandedHammingJoin)
    docs.selectExpr("doc_id",
        "shiftleft(CAST(length(text) AS BIGINT) % 32768, 32) | " +
          "(CAST(length(text) AS BIGINT) * 131 % 65536) AS fp")
      .createOrReplaceTempView("drive_fp")
    val bhj = spark.sql("""SELECT count(*) FROM drive_fp a JOIN drive_fp b
      ON a.doc_id < b.doc_id AND bit_count(a.fp ^ b.fp) <= 3""")
    val banded = bhj.queryExecution.optimizedPlan.toString.contains("__band_idx")
    println(s"[67] banded hamming join: ${bhj.head().getLong(0)} pairs, " +
      (if (banded) "rewritten to a band equi-join" else "NOT REWRITTEN"))

    // Luhn-validated card redaction: valid test number redacts, its
    // off-by-one twin survives
    val luhn = docs.limit(3).select(graft.text.PiiRedact.redactCards(
      concat(col("text"), lit(" 4111 1111 1111 1111 vs 4111 1111 1111 1112")))
      .as("c")).collect()
    val allGood = luhn.forall(r => r.getString(0).contains("<CARD>") &&
      r.getString(0).contains("4111 1111 1111 1112"))
    println(s"[68] luhn card redaction on 3 docs: " +
      (if (allGood) "valid redacted, invalid twin kept" else "UNEXPECTED"))

    // persisted IVF: build, reload from path, serve through pruned read
    val ivfBase = "target/tmp/drive_ivf_disk"
    def rmIvf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmIvf); f.delete(); ()
    }
    rmIvf(new java.io.File(ivfBase))
    val ivfModel = graft.ml.IvfIndex.fit(emb, "embedding", k = 8)
    graft.ml.IvfIndex.persist(emb, "vec_id", "embedding", ivfModel, ivfBase)
    val (ivfTbl, _) = graft.ml.IvfIndex.load(spark, ivfBase)
    val servedN = graft.ml.IvfIndex.topKPersisted(ivfTbl, "vec_id",
      "embedding", emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      k = 5, nprobe = 2).count()
    val probeFiles = ivfTbl.toDFWhere("cell IN (0,1)").inputFiles.length
    println(s"[69] persisted IVF: $servedN results served reading " +
      s"$probeFiles of ${ivfTbl.detail.numFiles} files")

    // Bloom-prefiltered dedup: reference = 40% of the corpus by id,
    // incoming = everything; the filter routes, the anti-join confirms
    val keyed = docs.withColumn("__k", md5(col("text")))
    val bloomRef = keyed.filter(col("doc_id") % 5 < 2).select(col("__k"))
    val bf = graft.text.BloomDedup.buildFilter(bloomRef, "__k")
    val maybeN = keyed.filter(
      graft.text.BloomDedup.mightContain(col("__k"), bf)).count()
    val newN = graft.text.BloomDedup.newRows(keyed, bloomRef, "__k",
      filter = Some(bf)).count()
    println(s"[70] bloom dedup: ${keyed.count()} incoming, $maybeN probe " +
      s"true (exact-confirm branch), $newN genuinely new")

    // stateful streaming sessionization: batch frame through the same
    // update function's BATCH limitation is documented; here just pin
    // that the closed-session stream from a two-batch replay matches the
    // batch sessionizer on a bounded slice
    val evSlice = graft.SparkEntry.queries("streaming_sessionize")(
      spark, sfDir)
    val batchSess = graft.streaming.EventStreams.sessionize(
      graft.SparkEntry.events(spark, sfDir), gap = "30 minutes")
    println(s"[71] streaming sessionize: ${evSlice.count()} closed " +
      s"sessions == batch ${batchSess.count()}")

    // URL canonicalization + .tiktoken round-trip on the live session
    val canonN = docs.select(graft.plans.expressions.canonicalize_url(
        concat(lit("HTTP://Site.COM:80/d/"), col("doc_id") % 50,
          lit("?utm_s=x&b=2&a=1#f"))).as("u"))
      .distinct().count()
    val tik = graft.text.Tiktoken.load(
      graft.text.Tiktoken.export(graft.text.Tiktoken.fromGpt2(
        graft.text.Gpt2Bpe.fit(docs, "text", numMerges = 60))),
      pattern = graft.text.Tiktoken.Gpt2Pattern)
    val tikToks = docs.select(
        sum(size(graft.text.Tiktoken.encode(col("text"), tik))).as("n"))
      .head().getLong(0)
    println(s"[72] url canon: 500 tracked variants -> $canonN canonical; " +
      s"tiktoken round-trip encodes $tikToks tokens")

    // exact stratified sample: per-language ceil(frac·N) sizes hold, and
    // the approx (sketch-threshold, window-free) path tracks the exact one
    val strat = graft.operators.Sampling.stratifiedSample(
      docs, Seq("lang"), 0.25, Seq("doc_id"))
    val langN = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val stratN = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactHold = langN.forall { case (l, n) =>
      stratN.getOrElse(l, 0L) == math.ceil(n * 0.25).toLong }
    val apxN = graft.operators.Sampling.stratifiedSampleApprox(
      docs, Seq("lang"), 0.25, Seq("doc_id")).count()
    println(s"[73] stratified sample: exact ceil-sizes hold=$exactHold " +
      s"(${stratN.values.sum} of ${langN.values.sum}); approx path kept $apxN")

    // containment pairs: doc-inside-doc detection over the live corpus —
    // every verified pair really is ≥0.9-contained (re-scored exactly)
    val cont = graft.text.MinHashDedup.containmentPairs(
      docs, "doc_id", "text", threshold = 0.9, maxDf = 64)
    val contRows = cont.collect()
    println(s"[74] containment pairs (t=0.9): ${contRows.length} pairs, " +
      s"min containment=${if (contRows.isEmpty) "n/a"
        else contRows.map(_.getDouble(2)).min}")

    // compression-ratio quality band + contamination-rate audit
    val crKept = graft.text.QualityFilters.filterCompressible(
      docs, "text", minRatio = 0.1, maxRatio = 0.9).count()
    val contam = graft.text.Decontaminate.contaminationRate(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 8)
    val hot = contam.filter(col("rate") > 0.5).count()
    println(s"[75] compression band keeps $crKept of ${docs.count()}; " +
      s"contamination rate > 0.5 flags $hot docs")

    // JSONL round-trip with a planted corrupt shard
    val jsonlDir = scratch("jsonl")
    graft.sources.Jsonl.export(
      docs.select("doc_id", "text", "lang").repartition(2), jsonlDir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(jsonlDir, "bad.json"),
      "{oops\n".getBytes("UTF-8"))
    val jl = graft.sources.Jsonl.read(spark, jsonlDir,
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
        .add("lang", org.apache.spark.sql.types.StringType)).persist()
    val (jlClean, jlBad) = graft.sources.Jsonl.partitionCorrupt(jl)
    println(s"[76] jsonl: ${jlClean.count()} clean rows round-trip, " +
      s"${jlBad.count()} corrupt line quarantined")
    jl.unpersist()

    // incremental IVF: append a delta through frozen centroids
    val ivfDir = scratch("ivf_append")
    val embAll2 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val ivfModel2 = graft.ml.IvfIndex.fit(embAll2, "embedding", k = 4)
    val ivfTbl2 = graft.ml.IvfIndex.persist(
      embAll2.filter(col("vec_id") % 5 =!= 0), "vec_id", "embedding",
      ivfModel2, ivfDir)
    graft.ml.IvfIndex.append(ivfTbl2, "vec_id", "embedding",
      embAll2.filter(col("vec_id") % 5 === 0))
    val cells = graft.ml.IvfIndex.cellStats(ivfTbl2)
    println(s"[77] ivf append: metadata cell counts ${cells.toSeq.sorted
      .map { case (c, n) => s"$c:$n" }.mkString(", ")} " +
      s"(sum ${cells.values.sum} == ${embAll2.count()})")

    // sharded bloom bank: same exact result as the single filter
    val keyed2 = docs.withColumn("__k", md5(col("text")))
    val bloomRef2 = keyed.filter(col("doc_id") % 5 < 2).select("__k")
    val singleN = graft.text.BloomDedup.newRows(keyed2, bloomRef2, "__k").count()
    val bankN = graft.text.BloomDedup.newRowsSharded(
      keyed2, bloomRef2, "__k", shards = 8).count()
    println(s"[78] sharded bloom bank: $bankN new rows == single-filter $singleN")

    // binary retrieval: sign-code Hamming prefilter + exact rerank
    // equals brute force on the raw embeddings' own near-duplicates
    val bq = embAll2.filter(col("vec_id") < 3)
    val bin = graft.ml.Similarity.binaryTopK(embAll2, "vec_id", "embedding",
      bq, "vec_id", "embedding", k = 5, maxHamming = 24).count()
    println(s"[79] binary retrieval: ${bin} ranked rows for 3 queries " +
      s"(Hamming-prefiltered, exact rerank)")

    // funnel + retention over live events; nearest as-of parity
    val evAll = spark.read.parquet(s"$sfDir/events.parquet")
    val fun = graft.operators.Funnel.funnelReport(evAll, "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"),
        within = Some("1 HOUR"))
      .groupBy("steps_completed").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ret = graft.operators.Funnel.weeklyRetention(evAll, "user_id", "ts")
      .count()
    println(s"[81] funnel steps histogram ${fun.toSeq.sorted.mkString(", ")}; " +
      s"retention triangle has $ret cells")

    // npy + safetensors round-trips on the embeddings
    val ioDir = scratch("tensor_io")
    graft.sources.Npy.export(embAll2.repartition(2), "vec_id", "embedding",
      ioDir + "/npy")
    graft.sources.Safetensors.export(embAll2.repartition(2), "vec_id",
      "embedding", ioDir + "/st")
    val npyN = graft.sources.Npy.readPaired(spark, ioDir + "/npy").count()
    val stN = graft.sources.Safetensors.read(spark, ioDir + "/st").count()
    println(s"[82] tensor interchange: .npy round-trips $npyN rows, " +
      s"safetensors $stN")

    // Kneser-Ney trigram LM (the real CCNet scorer class): NLL must be
    // finite on every >=3-word doc and ORDER-SENSITIVE — higher than the
    // bigram score's information floor on average
    val knAgg = graft.text.VocabStats.trigramKnNll(docs, "doc_id", "text")
      .agg(min("nll"), max("nll"), sum("n_trigrams")).head()
    println(f"[83] KN trigram NLL: range ${knAgg.getDouble(0)}%.2f.." +
      f"${knAgg.getDouble(1)}%.2f over ${knAgg.getLong(2)} trigrams")

    // registrable-domain extraction + the per-domain cap it feeds
    val domUrls = docs.select(col("doc_id"),
      concat(lit("https://www.crawl-"), col("source"), lit(".co.uk/d/"),
        col("doc_id")).as("u"))
    val domains = domUrls.select(col("doc_id"),
      graft.plans.expressions.registrable_domain(col("u")).as("domain"))
    val nDom = domains.select("domain").distinct().count()
    val capped = graft.operators.Sampling.capPerGroup(
      domains, Seq("domain"), Seq(col("doc_id").asc), n = 2).count()
    println(s"[84] registrable domains: ${domains.count()} urls -> " +
      s"$nDom domains, per-domain cap 2 keeps $capped")

    // best-fit-decreasing packing vs the id-ordered fill: waste must drop
    val packIn = docs.select(col("doc_id"),
      graft.text.TextAnalysis.tokenCountWhitespace(col("text")).as("n_tokens"))
    def wasteOf(sh: org.apache.spark.sql.DataFrame) =
      graft.text.TextChunker.packingEfficiency(sh, "n_tokens", 500L)
        .head()
    val wId = wasteOf(graft.text.TextChunker.shardByTokenBudget(
      packIn, "doc_id", "n_tokens", 500L, groups = 8))
    val wBfd = wasteOf(graft.text.TextChunker.shardByTokenBudgetBfd(
      packIn, "doc_id", "n_tokens", 500L, groups = 8))
    println(f"[85] packing: id-ordered ${wId.getLong(0)} packs waste " +
      f"${wId.getDouble(2)}%.4f; BFD ${wBfd.getLong(0)} packs waste " +
      f"${wBfd.getDouble(2)}%.4f")

    // outlink extraction feeding the frontier (href -> domain)
    val linkPages = docs.select(col("doc_id"), concat(
      lit("<p>t</p><a href=\"https://site-"), col("source"),
      lit(".example.com/d/"), col("doc_id"), lit("\">doc "), col("doc_id"),
      lit("</a><a href='/rel'>rel</a>")).as("h"))
    val outlinks = linkPages.select(
      explode(graft.plans.expressions.html_links(col("h"))).as("l"))
    val linkDomains = outlinks
      .select(graft.plans.expressions.registrable_domain(col("l.href"))
        .as("d")).filter(col("d").isNotNull).distinct().count()
    println(s"[86] outlinks: ${outlinks.count()} links from " +
      s"${linkPages.count()} pages -> $linkDomains frontier domains")

    // deterministic training-order shuffle into balanced shards
    val shuf = graft.operators.Sampling.shuffleShards(
      docs.select(col("doc_id")), Seq("doc_id"), shards = 8, seed = 11L)
    val shufSizes = shuf.groupBy("shard").count()
      .agg(min("count"), max("count")).head()
    println(s"[87] shuffle shards: ${shuf.count()} docs -> 8 shards, " +
      s"sizes ${shufSizes.getLong(0)}..${shufSizes.getLong(1)}")

    // robots.txt gate over the frontier paths
    val robotsBody = "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
    val gated = docs.select(col("doc_id"),
      concat(lit("/private/"), col("doc_id")).as("p"))
      .select(graft.plans.expressions.robots_allowed(
        lit(robotsBody), col("p")).as("ok"))
      .groupBy("ok").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    println(s"[88] robots gate: /private/* paths -> " +
      s"${gated.getOrElse(false, 0L)} blocked, ${gated.getOrElse(true, 0L)} allowed")

    // KN-ranked CCNet tiers: head tier must score lower than the tail
    val knb = graft.text.VocabStats.knBuckets(docs, "doc_id", "text", "lang")
      .groupBy("bucket").agg(round(avg("nll"), 2).as("avg_nll"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    println(s"[89] KN ccnet tiers: avg nll by bucket " +
      s"${knb.toSeq.sorted.map { case (b, v) => s"$b:$v" }.mkString(", ")}")

    // politeness schedule over the outlink frontier
    val sched = graft.operators.Frontier.schedule(
      outlinks.select(col("l.href").as("url")).filter(
        col("url").startsWith("http")), "url", delayMs = 1000L)
    val maxLane = sched.groupBy("domain").agg(max("scheduled_ms").as("m"))
      .agg(max("m")).head().getLong(0)
    println(s"[90] frontier schedule: ${sched.count()} fetches, busiest " +
      s"lane spans ${maxLane} ms at 1 req/s")

    // EM-trained vs whole-word-init unigram at the same budget: on this
    // tiny corpus whole words fit in the budget so the initializer can
    // edge ahead; EM wins where shared subwords matter (spec-pinned on
    // the compositional fixture) — both printed honestly
    val emModel = graft.text.UnigramLm.fitEm(docs, "text",
      vocabSize = 300, emIters = 2)
    val wordModel = graft.text.UnigramLm.fit(docs, "text", vocabSize = 300)
    def toks(m: graft.text.UnigramLm.Model) =
      docs.select(sum(graft.text.UnigramLm.tokenCount(col("text"), m)))
        .head().getLong(0)
    println(s"[91] unigram @300 pieces: EM ${toks(emModel)} tokens, " +
      s"whole-word init ${toks(wordModel)}")

    // modified-KN vs single-discount KN: same docs, different smoothing
    val mknAgg = graft.text.VocabStats.trigramModKnNll(docs, "doc_id", "text")
      .agg(round(avg("nll"), 3)).head().getDouble(0)
    val knAgg2 = graft.text.VocabStats.trigramKnNll(docs, "doc_id", "text")
      .agg(round(avg("nll"), 3)).head().getDouble(0)
    println(s"[92] LM ladder top: modified-KN avg nll $mknAgg vs " +
      s"single-D KN $knAgg2")

    // WET/WAT siblings: extracted-text and link-metadata records
    // through the same ISO 28500 container
    val wwBase = scratch("wetwat")
    val wwPages = docs.limit(50).select(
      concat(lit("http://corpus.local/doc/"), col("doc_id")).as("uri"),
      concat(lit("<html><body><p>"), col("text"),
        lit("</p><a href=\"/doc/0\">home</a></body></html>")).as("html"))
    graft.sources.Warc.exportWet(wwPages, "uri", "html", s"$wwBase/wet")
    graft.sources.Warc.exportWat(wwPages, "uri", "html", s"$wwBase/wat")
    val wetN = graft.sources.Warc.read(spark, s"$wwBase/wet/*.warc*")
      .filter(col("warc_type") === "conversion").count()
    val watLinks = graft.sources.Warc.read(spark, s"$wwBase/wat/*.warc*")
      .filter(col("payload").cast("string").contains("\"url\":\"/doc/0\""))
      .count()
    println(s"[95] WET/WAT: $wetN conversion records, " +
      s"$watLinks WAT payloads carry the seeded outlink")

    // sitemap seeding: urlset shards + index round-trip into the
    // frontier schedule
    val smBase = scratch("sitemap")
    graft.sources.Sitemap.export(
      docs.limit(60).select(concat(lit("https://crawl-"), col("source"),
        lit(".org/d/"), col("doc_id")).as("loc")).repartition(2),
      "loc", None, smBase, gzip = true)
    graft.sources.Sitemap.writeIndex(spark, smBase, "https://c.local/m")
    val smBack = graft.sources.Sitemap.read(spark, s"$smBase/sitemap*")
    val smSched = graft.operators.Frontier.schedule(
      smBack.filter(col("kind") === "url").select("loc"), "loc")
    // ...and the discovery hop in front of it: Sitemap: directives out
    // of robots.txt bodies
    val smDisc = docs.limit(60).select(
      graft.plans.expressions.robots_sitemaps(concat(
        lit("User-agent: *\nDisallow: /p/\nSitemap: https://crawl-"),
        col("source"), lit(".org/map.xml\n"))).as("sm"))
      .select(explode(col("sm"))).distinct().count()
    println(s"[96] sitemap seed: ${smBack.filter(col("kind") === "url")
      .count()} urls from ${smBack.filter(col("kind") === "sitemap")
      .count()} indexed shards -> ${smSched.select("domain").distinct()
      .count()} politeness lanes; robots discovery yields $smDisc maps")

    // per-domain Crawl-delay politeness: domains declaring a delay get
    // their own lane spacing, the rest keep the default
    val cdBody = concat(lit("User-agent: *\n"),
      when(col("doc_id") % 2 === 0, lit("Crawl-delay: 3\n"))
        .otherwise(lit("Disallow: /tmp/\n")))
    val cdSched = graft.operators.Frontier.scheduleWithDelays(
      docs.limit(100).select(
        concat(lit("https://cd-"), col("doc_id") % 2, lit(".org/d/"),
          col("doc_id")).as("url"),
        graft.plans.expressions.robots_crawl_delay(cdBody).as("cd")),
      "url", "cd", defaultDelayMs = 500L)
    val cdSpacing = cdSched.groupBy("domain").agg(max("delay_ms").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[97] crawl-delay lanes: ${cdSpacing.toSeq.sorted
      .map { case (d, ms) => s"$d@${ms}ms" }.mkString(", ")}")

    // fit-once/score-many: the persisted KN model serves scores that
    // equal the one-shot computation; the ARPA leg round-trips
    val knmBase = scratch("kn_model")
    graft.text.VocabStats.fitKnModel(docs, "text")
      .write.parquet(s"$knmBase/model")
    val knServed = spark.read.parquet(s"$knmBase/model")
    val knFromModel = graft.text.VocabStats.knNllFromModel(
      knServed, docs, "doc_id", "text")
      .agg(round(avg("nll"), 3)).head().getDouble(0)
    graft.text.Arpa.write(graft.text.Arpa.fromKnModel(knServed),
      s"$knmBase/model.arpa")
    val arpaRows = graft.text.Arpa.read(spark, s"$knmBase/model.arpa")
    val arpaNll = graft.text.Arpa.nll(arpaRows, docs, "doc_id", "text")
      .agg(round(avg("nll"), 3)).head().getDouble(0)
    println(s"[93] KN serving: persisted-model avg nll $knFromModel " +
      s"(one-shot $knAgg2); .arpa has ${arpaRows.count()} entries, " +
      s"backoff-chain scorer avg nll $arpaNll")

    // window-free KN tier pass tracks the exact ntile tiers
    val knbExact = graft.text.VocabStats.knBuckets(
      docs, "doc_id", "text", "lang").select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val knbApprox = graft.text.VocabStats.knBucketsApprox(
      docs, "doc_id", "text", "lang").select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val knbAgree = knbExact.count { case (id, b) => knbApprox(id) == b }
    println(s"[94] KN tier sketch path: $knbAgree of ${knbExact.size} " +
      "docs agree with the exact ntile tiers")

    // mojibake repair round-trips the corpus through a Latin-1 mangle
    val mjN = docs.select(graft.plans.expressions.fix_mojibake(
        decode(encode(col("text"), "UTF-8"), "ISO-8859-1")).as("f"),
        col("text"))
      .filter(col("f") === col("text")).count()
    println(s"[80] mojibake repair restores $mjN of ${docs.count()} docs")

    // PageRank over a seeded outlink domain graph: hubs beat sinks and
    // the fixed-point integer mass stays conserved up to truncation
    val prEdges = docs.select(
      concat(lit("site-"), col("doc_id") % 11, lit(".com")).as("src"),
      concat(lit("site-"), (col("doc_id") * 3 + 1) % 11, lit(".com"))
        .as("dst"))
    val pr = graft.operators.PageRank.ranks(prEdges, "src", "dst")
    val prTotal = pr.agg(sum("rank_fp")).head().getLong(0)
    val prTop = pr.orderBy(col("rank_fp").desc).limit(1)
      .select("node", "rank").head()
    println(f"[98] pagerank: ${pr.count()} domains, total fp mass " +
      f"$prTotal (of 1e12), top ${prTop.getString(0)} @ " +
      f"${prTop.getDouble(1)}%.4f")

    // TFRecord: docs -> framed Example shards -> read-back equality
    val tfrBase = scratch("tfrecord")
    graft.sources.Tfrecord.export(
      docs.select("doc_id", "text", "lang").repartition(2), tfrBase)
    val tfrSchema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
      .add("lang", org.apache.spark.sql.types.StringType)
    val tfrBack = graft.sources.Tfrecord.read(
      spark, tfrBase + "/part-*", tfrSchema)
    val tfrMatch = tfrBack.join(docs.select(col("doc_id"),
        col("text").as("t0")), Seq("doc_id"))
      .filter(col("text") === col("t0")).count()
    println(s"[99] tfrecord: $tfrMatch of ${docs.count()} docs " +
      "round-trip the Example wire format bit-exact")

    // WebDataset: two-modality tar samples -> adjacency-grouped read
    val wdsBase = scratch("webdataset")
    graft.sources.WebDataset.export(
      docs.select(format_string("%06d", col("doc_id")).as("k"),
        col("text"), col("lang")).repartition(2),
      "k", Seq("text" -> "txt", "lang" -> "cls"), wdsBase)
    val wdsBack = graft.sources.WebDataset.read(spark, wdsBase + "/shard-*")
    val wdsTwo = wdsBack.filter(size(col("parts")) === 2).count()
    println(s"[100] webdataset: ${wdsBack.count()} tar samples, " +
      s"$wdsTwo carrying both modalities")

    // integer perceptron on a separable, roughly BALANCED target
    // (chars >= 300, near the corpus median) over a BUCKETED feature
    // (chars div 100 — the integer feature-scaling the scaladoc
    // requires); the trainer should drive mistakes to ~zero, and the
    // base rate can't fake it
    val pFeats = docs.select(
      lit(1L).as("bias"),
      expr("length(text) div 100").as("cbkt"))
      .withColumn("label",
        when(col("cbkt") >= 3, 1L).otherwise(-1L))
    val pModel = graft.ml.Perceptron.fit(pFeats,
      Seq("bias", "cbkt"), "label", epochs = 25)
    val pAcc = graft.ml.Perceptron.score(pFeats, pModel)
      .filter((col("label") === 1L) === col("pred")).count()
    println(s"[101] perceptron: w=${pModel.weights.mkString("[", ",", "]")}" +
      s" recovers the chars>=300 threshold on $pAcc of ${docs.count()} docs")

    // heavy hitters: two-pass MG sweep with the exactness certificate,
    // over a synthetic skew (hot sources over singleton tails)
    val hhKey = when(col("doc_id") % 5 < 4,
        concat(lit("hot-"), col("doc_id") % 3))
      .otherwise(concat(lit("solo-"), col("doc_id")))
    val hh = graft.operators.HeavyHitters.topK(
      docs.select(hhKey.as("k")), "k", k = 3, capacity = 64).collect()
    println(s"[102] heavy hitters: top-3 " +
      hh.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ") +
      " (certificate held)")

    // sketch profile: one pass, HLL estimates near the exact melt
    val pExact = graft.operators.Profile.profile(docs,
      Seq("doc_id", "lang", "source")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val pApprox = graft.operators.Profile.profileApprox(docs,
      Seq("doc_id", "lang", "source")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    println(s"[103] sketch profile: distinct estimates " +
      pApprox.toSeq.sorted.map { case (c, v) =>
        s"$c=$v(exact ${pExact(c)})" }.mkString(", "))

    // LSH parameter fit: the S-curve split for three thresholds
    val fits = Seq(0.3, 0.5, 0.8).map(t =>
      t -> graft.text.MinHashDedup.tuneBands(t, 128))
    println(s"[104] LSH tuning @128 hashes: " + fits.map {
      case (t, (b, r)) => s"t=$t -> $b bands x $r rows" }.mkString(", "))

    // hard negatives: most confusable different-label embedding
    val embD = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        (col("vec_id") % 7).as("label"))
    val hn1 = graft.ml.Similarity.hardNegatives(embD, "vec_id",
      "embedding", "label", embD.filter(col("vec_id") === 0), "vec_id",
      "embedding", "label", k = 1).head()
    println(s"[105] hard negative for vec 0: vec ${hn1.getLong(1)} " +
      s"cosine ${hn1.getDouble(3)} (different label by construction)")

    // mKN-5 fit/serve split: the served score equals the one-shot
    val mknBase = scratch("mkn5_model")
    graft.text.VocabStats.fitMknModel(docs, "text", order = 5)
      .write.parquet(s"$mknBase/model")
    val mknServed = graft.text.VocabStats.mknNllFromModel(
      spark.read.parquet(s"$mknBase/model"), docs, "doc_id", "text",
      order = 5).agg(round(avg("nll"), 3)).head().getDouble(0)
    val mknOneShot = graft.text.VocabStats.ngramModKnNll(
      docs, "doc_id", "text", order = 5)
      .agg(round(avg("nll"), 3)).head().getDouble(0)
    println(s"[106] mKN-5 serving: persisted-model avg nll $mknServed " +
      s"(one-shot $mknOneShot)")

    // version diff: seeded DML nets out to exactly its change classes
    val vdBase = scratch("vdiff")
    val vdTbl = graft.tables.ManagedTable.create(
      docs.select("doc_id", "lang", "source"), vdBase)
    vdTbl.delete("doc_id % 7 = 0")
    vdTbl.update(Map("lang" -> "'xx'"), Some("doc_id % 7 = 1"))
    val vd = graft.operators.TableOps.versionDiff(
      vdTbl, 0L, -1L, Seq("doc_id"))
      .groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"[107] version diff: ${vd.getOrElse("delete", 0L)} deletes, " +
      s"${vd.getOrElse("update", 0L)} updates, " +
      s"${vd.getOrElse("insert", 0L)} inserts between v0 and head")

    // trained language-id vs the heuristic label: the published
    // confusion audit (the trained NB is taught by the declared lang;
    // the heuristic is the one-pass n-gram label) + agreement with the
    // declared label for both
    val liTrained = graft.text.LangId.trained(docs, "doc_id", "text",
      "lang").select(col("doc_id"), col("pred"))
    val liBoth = docs.select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.langId(col("text")).as("heur"))
      .join(liTrained, Seq("doc_id"))
    val liN = liBoth.count()
    val accT = liBoth.filter(col("pred") === col("lang")).count()
    val accH = liBoth.filter(col("heur") === col("lang")).count()
    println(f"[108] lang-id vs declared: trained ${accT * 100.0 / liN}%.1f%% " +
      f"vs heuristic ${accH * 100.0 / liN}%.1f%% (n=$liN)")
    val liConf = liBoth.groupBy("heur", "pred").count()
      .orderBy(col("count").desc).limit(6).collect()
      .map(r => s"${r.getString(0)}->${r.getString(1)}:${r.getLong(2)}")
      .mkString(", ")
    println(s"[109] trained-vs-heuristic confusion (top cells): $liConf")

    // freshness recrawl ordering: stalest URL leads its lane
    val frUrls = docs.limit(200).select(col("doc_id"),
      concat(lit("https://site-"), col("doc_id") % 5, lit(".com/p/"),
        col("doc_id")).as("url"),
      concat(lit("site-"), col("doc_id") % 5, lit(".com")).as("domain"),
      to_date(concat(lit("2024-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
        .as("lastmod"),
      lit(1000000L).as("rank_fp"))
    val fr = graft.operators.Frontier.freshOrder(frUrls, "url", "domain",
      "lastmod", "rank_fp", asOf = "2024-02-15")
    val frHead = fr.filter(col("fresh_order") === 0)
      .agg(min("age_days"), max("age_days")).head()
    println(s"[110] fresh recrawl: lane leaders are the stalest " +
      s"(age range ${frHead.getLong(0)}..${frHead.getLong(1)} days; " +
      s"global dispatch key = rank_fp x (1 + age))")

    // global dispatch order: write-time range sort == the total order
    val disp = graft.operators.Frontier.dispatchOrder(
      fr.select(col("url"), col("fresh_score")), "fresh_score", "url",
      shards = 4)
    val dispTop = disp.orderBy("dispatch_order").limit(2)
      .select("dispatch_order", "fresh_score").collect()
      .map(r => s"#${r.getLong(0)}@${r.getLong(1)}").mkString(", ")
    println(s"[111] global dispatch order (range-sort, no global " +
      s"window): head $dispTop of ${disp.count()} fetches")

    // Iceberg round trip: export the managed table zero-copy, re-import
    val iceDir = scratch("iceberg")
    val iceBack = scratch("iceberg_back")
    val iceSrcTbl = graft.tables.ManagedTable.create(
      docs.select("doc_id", "lang", "source").limit(300),
      scratch("iceberg_src"))
    val nIce = graft.sources.Iceberg.exportTable(iceSrcTbl, iceDir)
    val iceTbl = graft.sources.Iceberg.importTable(spark, iceDir, iceBack)
    println(s"[112] iceberg round trip: exported $nIce file refs " +
      s"(zero-copy), re-imported ${iceTbl.numRows} rows, " +
      s"schema ${iceTbl.schema.fieldNames.mkString("/")}")

    // merge-on-read Iceberg: DV snapshot -> v2 position deletes -> DV
    val dvIceSrc = graft.tables.ManagedTable.create(
      docs.select("doc_id", "lang", "source").limit(300),
      scratch("iceberg_dv_src"),
      properties = Map(graft.tables.ManagedTable.dvPropKey -> "true"))
    dvIceSrc.delete("doc_id % 7 = 0")
    val dvIceDir = scratch("iceberg_dv")
    graft.sources.Iceberg.exportTable(dvIceSrc, dvIceDir)
    val dvIceBack = graft.sources.Iceberg.importTable(spark, dvIceDir,
      scratch("iceberg_dv_back"))
    println(s"[113] iceberg merge-on-read round trip: " +
      s"${dvIceSrc.numRows} live rows exported as position deletes, " +
      s"re-imported ${dvIceBack.numRows} " +
      s"(DV sidecar: ${dvIceBack.currentFileStats.count(_.dv.isDefined)} " +
      "masked files)")

    spark.stop()
  }
}
