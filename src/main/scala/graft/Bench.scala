package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: runs every declared query against
  * `SPARK_GRAFT_SF_DIR`, printing one JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm-up outside the timed region: session/codegen/parquet-footer
    // initialization would otherwise be billed to whichever query runs
    // first (~5s of JVM+Janino+reader setup, not query cost).
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => () }
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Pruning-proof sink: a bare count() would let Catalyst drop every
      // projected column (it counts parquet rows without evaluating the
      // query's expressions), under-billing projection-only queries.
      // Hashing the full output row forces evaluation of every column;
      // bit_xor folds the hashes without ANSI sum overflow.
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("__h"))
          .agg(expr("bit_xor(__h)")).head()
      } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
