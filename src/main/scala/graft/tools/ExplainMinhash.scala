package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text._

object ExplainMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val shingled = docs.select(col("doc_id").as("__id"),
      MinHashDedup.wordShingles(col("text"), 3).as("__sh"))
    val hashed = shingled.select(col("__id"), transform(col("__sh"), s => xxhash64(s)).as("__hh"))
    val signed = hashed.select(col("__id"), MinHashDedup.minHashFromHashes(col("__hh"), 64).as("__sig"))
    val banded = signed.select(col("__id"),
      posexplode(MinHashDedup.bandHashes(col("__sig"), 64, 16)).as(Seq("__band", "__bh")))
    val plan = banded.queryExecution.optimizedPlan.toString
    // how many times does minhash_sig appear inlined?
    println("minhashsig occurrences in optimized plan: " + "minhashsig".r.findAllIn(plan.toLowerCase).length)
    println("xxhash64 occurrences: " + "xxhash64".r.findAllIn(plan.toLowerCase).length)
    println(plan.take(3000))
    spark.stop()
  }
}
