package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Bench, SparkEntry}

/** Interleaved A/B of the state-store provider on the DECLARED stateful
  * streaming queries: `runMain graft.tools.ProfileStateStore [sfDir]
  * [pairs] [query...]`. The box's ambient load drifts minute-to-minute
  * (calib probes have ranged 0.4–2.8 against a 0.5 reference within one
  * session), so back-to-back single runs of two configurations measure
  * the DRIFT, not the provider. This tool alternates
  * HDFS → RocksDB → HDFS → ... within ONE JVM, bracketing each run with
  * the fixed calib probe, and prints per-pair ratios — drift shows up as
  * calib movement, provider cost as a consistent within-pair ratio.
  *
  * The provider flips through the `graft.stateStore` system property
  * ("rocksdb" opts into RocksDB+changelog; unset keeps the default
  * HDFS-backed provider — see SparkEntry.rocksDbStateConfs, which also
  * records the measured verdict: HDFS wins at this state size).
  */
object ProfileStateStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = {
      val rest = args.drop(2).toSeq
      if (rest.nonEmpty) rest
      else Seq("streaming_interval_join", "streaming_interval_join_outer",
        "streaming_sessionize")
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String): Double = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      require(n > 0, s"$name returned no rows")
      (System.nanoTime() - t0) / 1e9
    }

    names.foreach { name =>
      time(name) // warm both code paths' first-run costs out of the A/B
      (1 to pairs).foreach { i =>
        val c0 = Bench.calibProbe(spark, sfDir)
        System.clearProperty("graft.stateStore")
        val h = time(name)
        System.setProperty("graft.stateStore", "rocksdb")
        val r = time(name)
        System.clearProperty("graft.stateStore")
        val c1 = Bench.calibProbe(spark, sfDir)
        println(f"[ab] $name pair $i: hdfs=$h%.2fs rocksdb=$r%.2fs " +
          f"ratio=${h / r}%.2f calib=$c0%.2f->$c1%.2f")
      }
    }
    spark.stop()
  }
}
