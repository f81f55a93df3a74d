package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the pigeonhole chunk join is EXACT — equal to all-pairs hamming
  * filtering — and pins the golden loser list the dedup_simhash oracle
  * uses (simhash features hash with Spark's xxhash64, which DuckDB cannot
  * reproduce, so that oracle is a literal id list derived here from first
  * principles).
  */
class SimHashExactnessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("pigeonhole simhash dedup equals exact all-pairs hamming dedup at sf0.01") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fp = docs.select(col("doc_id"),
      SimHashDedup.simHash64(col("text")).as("__fp"))

    // exact all-pairs losers: any doc within hamming<=3 of a smaller id
    val a = fp.select(col("doc_id").as("id_a"), col("__fp").as("fa"))
    val b = fp.select(col("doc_id").as("id_b"), col("__fp").as("fb"))
    val exactLosers = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3)
      .select("id_b").distinct()
      .collect().map(_.getLong(0)).toSet

    val kept = SimHashDedup.dedup(docs, "doc_id", "text", maxDist = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val pigeonLosers = allIds -- kept

    assert(pigeonLosers == exactLosers,
      s"pigeonhole losers diverge from exact: only-pigeon=${(pigeonLosers -- exactLosers).take(5)} " +
        s"only-exact=${(exactLosers -- pigeonLosers).take(5)}")

    // golden list in SparkEntry.oracleSql("dedup_simhash") — must track this
    val golden = Set(134L, 178L, 245L, 267L, 290L, 293L, 301L, 323L,
      332L, 340L, 377L, 383L, 387L, 389L, 413L, 420L, 429L, 446L, 447L,
      450L, 457L, 462L)
    assert(exactLosers == golden,
      "the dedup_simhash golden oracle is stale: update the literal id list " +
        s"in SparkEntry.oracleSql to ${exactLosers.toSeq.sorted}")
  }
}
