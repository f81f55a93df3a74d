package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"==== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
