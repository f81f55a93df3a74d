package graft.tools
import org.apache.spark.sql.SparkSession
import graft.text._

object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime()-t0)/1e9}%6.2f s  (n=$n)")
    }
    time("char candidates")(MinHashDedup.candidatePairs(docs, "doc_id", "text", charNgram = 5).count())
    time("char verified")(MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5, charNgram = 5).count())
    time("word candidates")(MinHashDedup.candidatePairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
