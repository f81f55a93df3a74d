package graft.tools
import org.apache.spark.sql.SparkSession

/** Prints `explain("formatted")` for named declared queries — the
  * static plan with the operator list, PushedFilters/ReadSchema and
  * join/exchange placement (the round's plans/r<N>/ evidence files).
  * Sibling of [[ExplainExec]], which executes and prints the FINAL
  * adaptive plan instead.
  */
object ExplainFmt {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    args.drop(1).foreach { q =>
      println(s"==== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
