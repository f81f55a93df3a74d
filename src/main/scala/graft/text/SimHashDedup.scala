package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash (Charikar) 64-bit near-duplicate fingerprinting: each token
  * hash votes ±1 on every bit; the sign of each bit-counter forms the
  * fingerprint, and near-duplicates differ in few bits (small Hamming
  * distance).
  *
  * The fingerprint is ONE aggregate HOF pass per document (single scan,
  * 64-counter array accumulator, no UDF, no shuffle). Candidate pairs use
  * the standard pigeonhole trick: split 64 bits into `chunks` equal chunks
  * — any pair within Hamming distance `chunks-1` shares at least one exact
  * chunk — and join on (chunkIdx, chunkValue), so the shuffle key is the
  * chunk value and no quadratic comparison happens.
  */
object SimHashDedup {

  /** 64-bit SimHash of the word tokens of `text` (one fused pass:
    * [[graft.plans.TokenHashes]] → [[graft.plans.SimHash64]] — the earlier
    * HOF `split → transform(xxhash64)` chain evaluated interpreted, one
    * lambda dispatch per token).
    */
  def simHash64(text: Column): Column =
    graft.plans.expressions.simhash64(
      graft.plans.expressions.token_hashes(text))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Verified near-duplicate pairs (idA < idB, hamming ≤ maxDist).
    * `chunks` must be > maxDist for the pigeonhole guarantee.
    *
    * Degenerate chunk buckets are capped at `maxBucketSize` ids, mirroring
    * [[MinHashDedup.candidatePairsFromHashes]]: a fingerprint mega-clique
    * (empty documents, shared boilerplate) would otherwise make every
    * chunk collide — quadratic in clique size. Capped buckets are dropped
    * whole, which only ever MISSES pairs inside mega-cliques (exact-dedup
    * those first); it never invents pairs, since every surviving pair is
    * verified by the exact hamming filter.
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3, chunks: Int = 4,
                   maxBucketSize: Int = 1000): DataFrame =
    nearDupPairsFromFingerprints(
      df.select(col(idCol), simHash64(col(textCol)).as("__sh64fp")),
      idCol, "__sh64fp", maxDist, chunks, maxBucketSize)

  /** [[nearDupPairs]] over PRE-COMPUTED 64-bit fingerprints (`fpCol`
    * long) — the fingerprint-generic core, shared with non-text
    * fingerprints (e.g. the image dHash,
    * [[graft.multimodal.Multimodal.imageNearDupPairs]]). Same pigeonhole
    * guarantee: `chunks > maxDist` ⇒ every qualifying pair shares at
    * least one exact chunk, so the band join misses nothing (outside
    * capped mega-buckets) and the exact hamming filter invents nothing.
    */
  def nearDupPairsFromFingerprints(df: DataFrame, idCol: String,
                                   fpCol: String, maxDist: Int = 3,
                                   chunks: Int = 4,
                                   maxBucketSize: Int = 1000): DataFrame = {
    require(chunks > maxDist, s"need chunks > maxDist for recall guarantee")
    val bits = 64 / chunks
    val fp = df.select(col(idCol).as("__id"), col(fpCol).as("__fp"))
    val chunked = fp.select(col("__id"), col("__fp"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("__fp"), c * bits)
          .bitwiseAND((1L << bits) - 1)
      }: _*)).as(Seq("__chunk", "__cv")))
    val bucketed = chunked
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("__chunk", "__cv")))
      .filter(col("__bucket_n") <= maxBucketSize)
      .drop("__bucket_n")
    val a = bucketed.select(col("__chunk"), col("__cv"),
      col("__id").as("id_a"), col("__fp").as("__fp_a"))
    val b = bucketed.select(col("__chunk"), col("__cv"),
      col("__id").as("id_b"), col("__fp").as("__fp_b"))
    a.join(b, Seq("__chunk", "__cv"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hamming(col("__fp_a"), col("__fp_b")))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
      .distinct()
  }

  /** Keep-first SimHash dedup (drop the larger id of each pair). */
  def dedup(df: DataFrame, idCol: String, textCol: String,
            maxDist: Int = 3, chunks: Int = 4,
            maxBucketSize: Int = 1000): DataFrame = {
    val losers = nearDupPairs(df, idCol, textCol, maxDist, chunks, maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** ManagedTable shell: simhash-dedup the table in place. */
  def dedup(table: graft.tables.ManagedTable, idCol: String, textCol: String,
            maxDist: Int, chunks: Int): Unit =
    table.overwrite(dedup(table.toDF, idCol, textCol, maxDist, chunks),
      operation = "DELETE")
}
