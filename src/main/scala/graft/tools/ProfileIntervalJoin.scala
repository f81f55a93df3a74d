package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Phase-level profile of the bench's `streaming_interval_join` query —
  * the r15 bench's single largest line (18.26 s at sf0.1, 11 % of the
  * whole run). `sbt "runMain graft.tools.ProfileIntervalJoin [sfDir]"`.
  *
  * Prints (a) wall time per harness phase (table setup, stream start,
  * first drain, second append + drain, readback) and (b) per-micro-batch
  * `StreamingQueryProgress` durations (addBatch / getBatch / walCommit /
  * commitOffsets / stateOperators commit), which is where a stream-stream
  * join actually spends: each micro-batch commits FOUR state stores per
  * shuffle partition (left/right × keyToNumValues/keyWithIndexToValue),
  * so partition count multiplies the per-batch checkpoint tail.
  */
object ProfileIntervalJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val shufflePartitions =
      args.drop(1).headOption.getOrElse("32")
    // 3rd arg: state-store provider — "hdfs" (default), "rocksdb",
    // or "rocksdb-changelog" (RocksDB + changelog checkpointing, which
    // uploads per-batch deltas instead of full snapshots)
    val provider = args.drop(2).headOption.getOrElse("hdfs")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (provider.startsWith("rocksdb")) {
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      if (provider == "rocksdb-changelog")
        builder.config("spark.sql.streaming.stateStore.rocksdb." +
          "changelogCheckpointing.enabled", "true")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[profile] provider=$provider parts=$shufflePartitions")
    spark.range(1000).selectExpr("sum(id)").collect()

    (1 to 2).foreach { iter =>
      val base = "/root/repo/target/tmp/profile_ssjoin"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(base))
      val t0 = System.nanoTime()
      def mark(label: String, since: Long): Long = {
        val now = System.nanoTime()
        System.err.println(f"[profile] iter $iter $label: ${(now - since) / 1e9}%.3f s")
        now
      }
      val ev = graft.SparkEntry.normalizeEventTs(
        spark.read.parquet(s"$sfDir/events.parquet"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"))
      val split = lit("2024-01-16").cast("timestamp")
      val cTbl = ManagedTable.create(
        clicks.filter(col("click_ts") < split), s"$base/clicks")
      val vTbl = ManagedTable.create(
        views.filter(col("view_ts") < split), s"$base/views")
      var t = mark("setup(tables)", t0)
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions)
      val joined = graft.streaming.EventStreams.intervalJoinStreams(
        spark.readStream.format("graft").load(s"$base/clicks"),
        spark.readStream.format("graft").load(s"$base/views"),
        keys = Seq("user_id"), leftTime = "click_ts",
        rightTime = "view_ts", lookback = "24 hours",
        watermark = "48 hours")
        .select(col("click_id"), col("view_id"), col("user_id"),
          (col("click_ts").cast("long") - col("view_ts").cast("long"))
            .as("gap_sec"))
      val q = joined.writeStream.format("graft")
        .option("checkpointLocation", s"$base/ckpt")
        .option("txnAppId", "q_ssjoin")
        .start(s"$base/out")
      t = mark("stream start", t)
      try {
        q.processAllAvailable()
        t = mark("drain 1", t)
        cTbl.append(clicks.filter(col("click_ts") >= split))
        vTbl.append(views.filter(col("view_ts") >= split))
        t = mark("append batch 2", t)
        q.processAllAvailable()
        t = mark("drain 2", t)
      } finally {
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", "32")
      }
      t = mark("stop", t)
      val n = ManagedTable.forPath(spark, s"$base/out").toDF.count()
      t = mark(s"readback ($n rows)", t)
      System.err.println(f"[profile] iter $iter TOTAL: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      q.recentProgress.foreach { p =>
        val dur = p.durationMs
        val states = p.stateOperators.map(s =>
          s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal} " +
            s"mem=${s.memoryUsedBytes}").mkString("; ")
        System.err.println(
          s"[progress] batch=${p.batchId} rows=${p.numInputRows} " +
            s"addBatch=${dur.get("addBatch")} getBatch=${dur.get("getBatch")} " +
            s"latestOffset=${dur.get("latestOffset")} " +
            s"queryPlanning=${dur.get("queryPlanning")} " +
            s"walCommit=${dur.get("walCommit")} " +
            s"commitOffsets=${dur.get("commitOffsets")} " +
            s"state[$states]")
      }
    }
    spark.stop()
  }
}
