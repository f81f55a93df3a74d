package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Watermark/state probe for the left-outer interval join (the tool that
  * found the r16 pushdown hazard: a pre-sink filter on a source column
  * pushes BELOW the EventTimeWatermark node and starves the watermark of
  * the sentinel rows, stalling the null-padded flush at maxTs - delay).
  * Prints per-drain watermark, state rows/removals, and sink count.
  */
object ProbeOuterJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/repo/target/tmp/probe_sso"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    import spark.implicits._
    val ev = graft.SparkEntry.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val split = lit("2024-01-16").cast("timestamp")
    val cTbl = ManagedTable.create(clicks.filter(col("click_ts") < split), s"$base/clicks")
    val vTbl = ManagedTable.create(views.filter(col("view_ts") < split), s"$base/views")
    val joined = graft.streaming.EventStreams.intervalJoinStreams(
      spark.readStream.format("graft").load(s"$base/clicks"),
      spark.readStream.format("graft").load(s"$base/views"),
      keys = Seq("user_id"), leftTime = "click_ts", rightTime = "view_ts",
      lookback = "24 hours", watermark = "48 hours", joinType = "left_outer")
      .filter(col("user_id") >= 0)
    val q = joined.writeStream.format("graft")
      .option("checkpointLocation", s"$base/ckpt")
      .option("txnAppId", "probe_sso").start(s"$base/out")
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    def sentC(days: Long) = Seq((-1L, -1L,
      new java.sql.Timestamp(maxTs.getTime + days * 86400000L)))
      .toDF("click_id", "user_id", "click_ts")
    def sentV(days: Long) = Seq((-2L, -2L,
      new java.sql.Timestamp(maxTs.getTime + days * 86400000L)))
      .toDF("view_id", "user_id", "view_ts")
    def report(tag: String): Unit = {
      val p = q.lastProgress
      if (p != null) {
        val st = p.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} removed=${s.numRowsRemoved}").mkString(";")
        System.err.println(s"[probe] $tag batch=${p.batchId} wm=${p.eventTime.get("watermark")} state[$st] out=${ManagedTable.forPath(spark, s"$base/out").toDF.count()}")
      }
    }
    try {
      q.processAllAvailable(); report("drain1")
      cTbl.append(clicks.filter(col("click_ts") >= split))
      vTbl.append(views.filter(col("view_ts") >= split))
      q.processAllAvailable(); report("drain2")
      cTbl.append(sentC(60)); vTbl.append(sentV(60))
      q.processAllAvailable(); report("sent60")
      cTbl.append(sentC(120)); vTbl.append(sentV(120))
      q.processAllAvailable(); report("sent120")
      cTbl.append(sentC(180)); vTbl.append(sentV(180))
      q.processAllAvailable(); report("sent180")
    } finally q.stop()
    spark.stop()
  }
}
