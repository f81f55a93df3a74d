package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** Time a subset of the declared queries (iterating on one operator's
  * plan without paying for the whole bench): `runMain graft.tools.BenchOne
  * <sfDir> <query>...` prints each query's two timed runs.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: BenchOne <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    // same fixed-work anchor as the full bench: compare against other
    // runs' calib values to separate box noise from plan changes
    val calib = Bench.calibProbe(spark, sfDir)
    println(f"calib (fixed probe): $calib%.3fs")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val (s1, e1) = Bench.timeQuery(spark, sfDir, name, fn)
      val (s2, e2) =
        if (e1.isDefined) (s1, e1) else Bench.timeQuery(spark, sfDir, name, fn)
      println(f"$name%-28s cold=$s1%7.2fs warm=$s2%7.2fs" +
        e1.orElse(e2).fold("")(" ERR " + _))
    }
    spark.stop()
  }
}
