package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Phase-level profile of the bench's `streaming_incremental_dedup` query
  * (run with GRAFT_TRACE_STREAMING=1 to see per-phase wall times):
  * `sbt "runMain graft.tools.StreamProfile [sfDir]"`. Exists because this
  * query is the bench's dominant cost and its time is commit/job overhead
  * rather than compute — changes need per-phase attribution.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // 2nd arg: shuffle width (default 32 = the bench session's) — for
    // the width-scoping A/B on the per-batch pipeline
    val width = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", width)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    (1 to 2).foreach { iter =>
      val base = "/root/repo/target/tmp/profile_stream_dedup"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      Seq(base + "_idx", base + "_out").foreach(p => rm(new java.io.File(p)))
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val t0 = System.nanoTime()
      val index = graft.streaming.StreamingDedup.openIndex(spark, base + "_idx",
        "doc_id", docs.schema("doc_id").dataType, parts = 8)
      val out = ManagedTable.create(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          docs.schema), base + "_out")
      val t1 = System.nanoTime()
      System.err.println(f"[profile] iter $iter setup: ${(t1 - t0) / 1e9}%.3f s")
      graft.streaming.StreamingDedup.incremental(
        docs.filter(col("doc_id") < 250), "doc_id", "text", index, out,
        txn = ("q_stream", 0L), threshold = 0.5)
      val t2 = System.nanoTime()
      System.err.println(f"[profile] iter $iter batch1: ${(t2 - t1) / 1e9}%.3f s")
      graft.streaming.StreamingDedup.incremental(
        docs.filter(col("doc_id") >= 250 && col("doc_id") < 500),
        "doc_id", "text", index, out, txn = ("q_stream", 1L),
        threshold = 0.5)
      val t3 = System.nanoTime()
      System.err.println(f"[profile] iter $iter batch2: ${(t3 - t2) / 1e9}%.3f s")
      out.toDF.select("doc_id", "source", "n_chars").count()
      System.err.println(f"[profile] iter $iter total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
