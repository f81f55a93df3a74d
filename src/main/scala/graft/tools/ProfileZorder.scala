package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.ManagedTable

/** Phase-level timing of the table_zorder query shape — attributes its
  * bench cost across create / optimize(zorder) / probes / count so a
  * regression points at a phase, not the whole query.
  */
object ProfileZorder {
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

    def phase[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[zorder-prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    (1 to 2).foreach { iter =>
      println(s"--- iteration $iter ---")
      val base = "/root/repo/target/tmp/prof_zorder"
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(base))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      val tbl = phase("create")(ManagedTable.create(li, base))
      val target = math.max(8L * 1024, tbl.detail.sizeInBytes / 32)
      phase("optimize(zorder)")(tbl.optimize(targetFileSizeBytes = target,
        zorderBy = Seq("l_orderkey", "l_partkey")))
      val pmax = phase("agg pmax")(li.agg(max("l_partkey")).head().getLong(0))
      val omax = phase("agg omax")(li.agg(max("l_orderkey")).head().getLong(0))
      val pProbe = phase("probe plan p")(tbl.toDFWhere(
        s"l_partkey BETWEEN ${pmax / 20} AND ${pmax / 10}"))
      val oProbe = phase("probe plan o")(tbl.toDFWhere(
        s"l_orderkey BETWEEN ${omax / 20} AND ${omax / 10}"))
      phase("inputFiles")(
        (pProbe.inputFiles.length, oProbe.inputFiles.length))
      phase("counts")((tbl.toDF.count(), pProbe.count(), oProbe.count()))
    }
    spark.stop()
  }
}
