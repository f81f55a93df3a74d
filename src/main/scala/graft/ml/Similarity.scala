package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns: brute-force
  * cosine top-k as the exact baseline, and random-hyperplane LSH bucketing
  * as the scale path (candidates only meet inside a bucket, so the corpus
  * is never cross-joined).
  *
  * All arithmetic is Spark HOFs (`zip_with` dot products aggregate in one
  * codegen'd pass); vectors are cast to double before multiplication for
  * cross-engine-stable numerics.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision (custom single-pass expression — the
    * HOF formulation evaluates interpreted with one lambda dispatch per
    * element, which dominates brute-force search cost).
    */
  def dot(a: Column, b: Column): Column = graft.plans.expressions.dot_product(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.plans.expressions.cosine_sim(a, b)

  /** L2-normalize a vector (pre-normalizing the corpus once turns cosine
    * into a plain dot product for every later query).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }

  /** Exact brute-force cosine top-k: every query against every corpus row.
    * The query set is broadcast (it must be small — that is what "queries"
    * means); the corpus streams through one scan, then one shuffle on
    * queryId ranks the candidates. O(|Q|·|C|) compute but |C|-bounded IO.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("__qv")))
    val scored = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic random hyperplanes: `nbits` unit-free gaussian vectors
    * of dimension `dim`, seeded — the same planes on every executor and
    * every run.
    */
  private def hyperplanes(dim: Int, nbits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-of-projection LSH bucket id (0 .. 2^nbits-1) for a vector:
    * vectors with small angle share buckets with high probability.
    */
  def lshBucket(vec: Column, dim: Int, nbits: Int = 8, seed: Long = 42L): Column = {
    val planes = hyperplanes(dim, nbits, seed)
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(dot(vec, plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The query-side probe buckets for multi-probe LSH: the vector's own
    * bucket plus `probes` single-bit flips of its most *marginal*
    * hyperplanes (smallest |projection| — the planes the vector nearly
    * straddles, where true neighbors most likely landed on the other
    * side). Returns array<bigint> of 1+probes bucket ids.
    */
  def lshProbeBuckets(vec: Column, dim: Int, nbits: Int, seed: Long,
                      probes: Int): Column = {
    require(probes >= 0 && probes <= nbits, s"probes must be in [0, $nbits]")
    val planes = hyperplanes(dim, nbits, seed)
    val projs = array(planes.map(p => dot(vec, array(p.map(lit): _*))): _*)
    // struct sort: (|projection|, planeIdx) ascending → most marginal first
    val marginal = array_sort(zip_with(
      transform(projs, p => abs(p)),
      sequence(lit(0), lit(nbits - 1)),
      (a, i) => struct(a.as("a"), i.as("i"))))
    val bucket = aggregate(
      zip_with(projs, sequence(lit(0), lit(nbits - 1)),
        (p, i) => when(p > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
    concat(array(bucket),
      transform(slice(marginal, 1, probes),
        s => bucket.bitwiseXOR(call_function("shiftleft", lit(1L), s.getField("i")))))
  }

  /** Approximate top-k: rank only within the query's LSH bucket, plus
    * `probes` adjacent buckets (multi-probe — flips the most marginal
    * hyperplanes). probes=0 is pure single-bucket LSH; higher probes
    * recovers recall at (1+probes)× candidate cost, still ≪ brute force.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              dim: Int, k: Int = 10, nbits: Int = 8, seed: Long = 42L,
              probes: Int = 0): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      lshBucket(col(corpusVec), dim, nbits, seed).as("__bucket"))
    val q = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
        explode(lshProbeBuckets(col(queryVec), dim, nbits, seed, probes)).as("__bucket")))
    c.join(q, Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates from
    * shared LSH buckets (idA < idB). The usual semantic-dedup primitive.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   threshold: Double = 0.95, nbits: Int = 8,
                   seed: Long = 42L): DataFrame = {
    val v = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      lshBucket(col(vecCol), dim, nbits, seed).as("__bucket"))
    val a = v.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("__va"))
    val b = v.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("__vb"))
    a.join(b, Seq("__bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
      .distinct()
  }
}
