package graft.tools
import org.apache.spark.sql.SparkSession

/** One-shot golden-literal generator for the token_unigram_em oracle. */
object DumpUnigramEm {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("token_unigram_em")(
      spark, "/root/testdata/sf0.01")
    df.orderBy("source").collect().foreach { r =>
      println(s"  ('${r.getString(0)}', ${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)}, ${r.getLong(4)}),")
    }
    spark.stop()
  }
}
