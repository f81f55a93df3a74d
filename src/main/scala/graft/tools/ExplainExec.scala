package graft.tools
import org.apache.spark.sql.SparkSession

/** Executes a declared query and prints the FINAL adaptive plan — what
  * AQE actually ran (stage reuse, runtime join strategy), which the
  * static `explain` cannot show.
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { q =>
      println(s"==== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      // big enough that the deep joins (where a silent strategy
      // fallback hides) survive; sys.prop override for spelunking
      val cap = sys.props.get("graft.explain.cap").map(_.toInt)
        .getOrElse(120000)
      println(df.queryExecution.executedPlan.toString.take(cap))
    }
    spark.stop()
  }
}
