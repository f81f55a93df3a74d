package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Phase-level wall-time attribution for the bench's `table_cdf_stream`
  * query: `sbt "runMain graft.tools.ProfileCdfStream [sfDir]"`. Splits
  * table create / DML / stream drain / sink materialize so a regression
  * in the total names its phase.
  */
object ProfileCdfStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    (1 to 2).foreach { iter =>
      val base = "/root/repo/target/tmp/profile_cdf_stream"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(base)); rm(new java.io.File(base + "_ckpt"))
      var t = System.nanoTime()
      def lap(label: String): Unit = {
        val now = System.nanoTime()
        System.err.println(f"[cdfprof] iter $iter $label%-12s ${(now - t) / 1e9}%6.3f s")
        t = now
      }
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      orders.limit(1).collect()
      lap("read")
      val tbl = ManagedTable.create(
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        base, properties = Map(ManagedTable.cdfPropKey -> "true"))
      lap("create")
      val omax = orders.agg(max("o_orderkey")).head().getLong(0)
      val vBase = tbl.latestVersion
      tbl.delete(s"o_orderkey < ${omax / 10}")
      lap("delete")
      tbl.update(Map("o_orderpriority" -> "'9-REPRICED'"),
        Some("o_totalprice > 400000"))
      lap("update")
      val sink = "profile_cdf_sink"
      spark.catalog.dropTempView(sink)
      val q = spark.readStream.format("graft-cdf")
        .option("startingVersion", (vBase + 1).toString).load(base)
        .writeStream.format("memory").queryName(sink)
        .option("checkpointLocation", base + "_ckpt").start()
      try q.processAllAvailable() finally q.stop()
      lap("stream")
      val out = spark.table(sink).drop("_commit_timestamp").cache()
      out.count()
      lap("materialize")
      out.unpersist()
    }
    spark.stop()
  }
}
