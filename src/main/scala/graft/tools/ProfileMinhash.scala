package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("docs=" + docs.count())
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  (n=$n)")
    }
    val shingled = docs.select(col("doc_id").as("__id"),
      MinHashDedup.wordShingles(col("text"), 3).as("__sh"))
    time("shingles FORCED")(shingled.select((xxhash64(col("__sh")) % 1000000).as("f")).agg(sum("f")).head().getLong(0))
    val hashed = shingled.select(col("__id"), transform(col("__sh"), s => xxhash64(s)).as("__hh"))
    time("hashed FORCED")(hashed.select((xxhash64(col("__hh")) % 1000000).as("f")).agg(sum("f")).head().getLong(0))
    val signed = hashed.select(col("__id"), MinHashDedup.minHashFromHashes(col("__hh"), 64).as("__sig"))
    time("signature FORCED")(signed.select((xxhash64(col("__sig")) % 1000000).as("f")).agg(sum("f")).head().getLong(0))
    val bandsOnly = signed.select(col("__id"), MinHashDedup.bandHashes(col("__sig"), 64, 16).as("__bhs"))
    time("bands FORCED")(bandsOnly.select((xxhash64(col("__bhs")) % 1000000).as("f")).agg(sum("f")).head().getLong(0))
    val banded = signed.select(col("__id"),
      posexplode(MinHashDedup.bandHashes(col("__sig"), 64, 16)).as(Seq("__band", "__bh")))
    time("banded")(banded.count())
    time("candidates")(MinHashDedup.candidatePairs(docs, "doc_id", "text").count())
    time("verified pairs")(MinHashDedup.nearDupPairs(docs, "doc_id", "text", 0.5).count())
    time("dedup")(MinHashDedup.dedup(docs, "doc_id", "text", 0.5).count())
    time("simhash fp")(docs.select(SimHashDedup.simHash64(col("text"))).count())
    time("simhash dedup")(SimHashDedup.dedup(docs, "doc_id", "text", 3).count())
    spark.stop()
  }
}
