package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Phase-level timing for the deletion-vector bench queries (`table_dv`,
  * `delta_dv_roundtrip`): attributes their wall-time to create / delete /
  * update / count / scan / export / import so a regression names the
  * phase, not the query. `runMain graft.tools.ProfileDv [sfDir]`.
  */
object ProfileDv {
  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[dv] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val base = "/root/repo/target/tmp/prof_dv"
    val out = base + "_delta"
    val back = base + "_clone"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      Seq(base, out, back).foreach(p => rm(new java.io.File(p)))
      val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      val tbl = timed("create")(ManagedTable.create(
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions("o_orderkey"),
        base, properties = Map(ManagedTable.dvPropKey -> "true")))
      val omax = timed("max-orderkey")(
        orders.agg(max("o_orderkey")).head().getLong(0))
      timed("delete-1")(tbl.delete(s"o_orderkey < ${omax / 20}"))
      timed("delete-2")(tbl.delete(
        s"o_orderkey >= ${omax / 20} AND o_orderkey < ${omax / 10}"))
      timed("update")(tbl.update(Map("o_orderpriority" -> "'9-REPRICED'"),
        Some("o_totalprice > 400000")))
      timed("numRows-meta")(tbl.numRows)
      timed("count-scan")(tbl.toDF.count())
      timed("hash-scan")(tbl.toDF.agg(count(lit(1))).head())
      timed("exportDelta")(tbl.exportDelta(out))
      timed("importTable")(graft.sources.DeltaImport.importTable(spark, out, back))
      timed("clone-scan")(ManagedTable.forPath(spark, back).toDF.count())
    }
    spark.stop()
  }
}
