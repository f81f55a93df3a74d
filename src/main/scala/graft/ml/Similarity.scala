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

  /** Hard-negative mining — the contrastive-training data op (retriever
    * / CLIP-style models train on (anchor, positive, HARD negative)
    * triples, and the hard negatives are exactly the highest-similarity
    * corpus items with a DIFFERENT label): [[bruteForceTopK]]'s scoring
    * with a label-disagreement gate before the rank cut. Same scale
    * shape — queries broadcast, corpus never shuffles, per-query top-k
    * via the partitioned window; the label filter runs before ranking
    * so negatives ranked k are the k most CONFUSABLE, not the k
    * nearest overall minus positives.
    */
  def hardNegatives(corpus: DataFrame, corpusId: String, corpusVec: String,
                    corpusLabel: String,
                    queries: DataFrame, queryId: String, queryVec: String,
                    queryLabel: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("__qv"),
      col(queryLabel).as("__ql")))
    corpus.select(col(corpusId).as("neighbor_id"),
        col(corpusVec).as("__cv"), col(corpusLabel).as("__cl"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id") &&
        !(col("__cl") <=> col("__ql")))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Sign-bit binary code of the vector: `array<bigint>`, bit i of block
    * i/64 set iff component i > 0 — the 1-bit embedding (32× smaller than
    * float32) binary-retrieval stacks prefilter with.
    */
  def signBits(vec: Column): Column = graft.plans.expressions.sign_bits(vec)

  /** Hamming distance between two sign-bit codes (long, block-wise
    * popcount of the xor). Tiny arrays — the HOF stays cheap.
    */
  def hammingBits(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, h) => acc + h)

  /** Binary-quantized cosine top-k — the modern 1-bit retrieval shape:
    * corpus vectors prefilter by HAMMING distance of their sign-bit
    * codes against the broadcast query codes (popcounts at scan speed —
    * the float vectors of rejected rows are never touched by the
    * scorer), and only the `maxHamming` shortlist pays the exact cosine
    * rerank + per-query top-k. Sign bits approximate angle (each
    * agreeing bit is an agreeing half-space), so the shortlist contains
    * the true neighbors whenever `maxHamming` exceeds the in-neighbor
    * bit-flip rate — with an exact rerank on top, output EQUALS brute
    * force whenever no true top-k neighbor is farther than `maxHamming`
    * bits (the gated-regime claim, spec-checked; at 64 dims random
    * vectors sit ~32 bits apart, near-duplicates a handful).
    *
    * Scale shape: one scan computes codes + popcounts (Q per row,
    * broadcast queries), the shortlist is the only thing entering the
    * rerank window, and corpus floats never shuffle. For large Q swap
    * the broadcast for the banded pigeonhole join
    * ([[graft.plans.BandedHammingJoin]]'s shape).
    */
  def binaryTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                 queries: DataFrame, queryId: String, queryVec: String,
                 k: Int = 10, maxHamming: Int = 16): DataFrame = {
    require(k >= 1 && maxHamming >= 0)
    val q = broadcast(queries.select(
      col(queryId).as("query_id"), col(queryVec).as("__qv"),
      signBits(col(queryVec)).as("__qf")))
    corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
        signBits(col(corpusVec)).as("__cf"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      // fail loudly on mismatched embedding dims: zip_with pads the
      // shorter code with null, bit_count(null ^ x) nulls the whole sum,
      // and the Hamming filter would silently drop every such pair
      .filter(when(size(col("__cf")) === size(col("__qf")),
        hammingBits(col("__cf"), col("__qf")))
        .otherwise(raise_error(format_string(
          "binaryTopK: embedding dimension mismatch (%d-block vs " +
            "%d-block sign codes) — corpus and query vectors must share " +
            "one dimensionality",
          size(col("__cf")), size(col("__qf"))))) <= maxHamming)
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  // ---- int8 scalar quantization (SQ8) ----------------------------------

  /** Per-vector int8 scalar quantization: `scale = max|xᵢ|/127`, `codes =
    * round(xᵢ/scale)` in [-127, 127] as `array<tinyint>` — the quantized
    * corpus is 4× smaller than float32 on disk, in shuffle, and in any
    * broadcast/cache, which is the difference between an embedding corpus
    * fitting executor memory or not at 100 TB. A zero vector quantizes to
    * all-zero codes with scale 0. Rounding is pinned to
    * `floor(x/scale + 0.5)` (identical in any engine, unlike native
    * round()'s half-even/half-up divergence), so an external oracle can
    * replay quantization bit-for-bit.
    */
  def sq8Quantize(vec: Column): Column = {
    val dv = transform(vec, x => x.cast("double"))
    val scale = aggregate(dv, lit(0.0), (a, x) => greatest(a, abs(x))) / 127
    val codes = when(scale === 0,
        transform(dv, _ => lit(0).cast("tinyint")))
      .otherwise(transform(dv,
        x => least(floor(x / scale + 0.5), lit(127.0)).cast("tinyint")))
    struct(scale.as("scale"), codes.as("codes"))
  }

  /** Approximate dot product of two SQ8-quantized vectors:
    * `scaleA·scaleB·Σ codesAᵢ·codesBᵢ`. The integer dot is exact in
    * double (|Σ| ≤ 127²·dim ≪ 2⁵³), so scores are bit-deterministic —
    * codes Cast to array<double> feed the codegen'd [[dot]] kernel (a
    * native Cast, not a per-element lambda).
    */
  def sq8Score(scaleA: Column, codesA: Column,
               scaleB: Column, codesB: Column): Column =
    scaleA * scaleB * dot(codesA.cast("array<double>"), codesB.cast("array<double>"))

  /** Brute-force top-k over SQ8-quantized vectors: same shape as
    * [[bruteForceTopK]] (broadcast queries, one corpus scan) but compares
    * int8 codes — the memory-bound variant for corpora whose float32
    * vectors don't fit. Ranking ties break on neighbor_id, so the result
    * is deterministic even where quantization collapses scores.
    */
  def sq8TopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int = 10): DataFrame = {
    val qq = sq8Quantize(col(queryVec))
    val q = broadcast(queries.select(
      col(queryId).as("query_id"),
      qq.getField("scale").as("__qs"),
      qq.getField("codes").cast("array<double>").as("__qc")))
    val cq = sq8Quantize(col(corpusVec))
    val scored = corpus.select(col(corpusId).as("neighbor_id"),
        cq.getField("scale").as("__cs"),
        cq.getField("codes").cast("array<double>").as("__cc"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx",
        sq8Score(col("__qs"), col("__qc"), col("__cs"), col("__cc")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("approx").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("approx"), 4).as("approx"))
  }

  // ---- semantic decontamination ---------------------------------------

  /** Embedding-level benchmark decontamination: drop every corpus row
    * whose vector is within `threshold` cosine of ANY benchmark vector —
    * the semantic tier of the decontamination family
    * ([[graft.text.Decontaminate]] covers the exact word-n-gram and
    * fuzzy shingle tiers), catching reworded eval items that share no
    * surface n-grams. The benchmark set is broadcast (it is small — that
    * is what "benchmark" means); the corpus streams through one scan
    * with |B| codegen'd dot products per row and a left-anti join on its
    * own id — no corpus shuffle, no all-pairs.
    */
  def dropSemanticMatches(corpus: DataFrame, corpusId: String,
                          corpusVec: String,
                          bench: DataFrame, benchVec: String,
                          threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val b = broadcast(bench.select(col(benchVec).as("__bv")))
    val contaminated = corpus
      .select(col(corpusId).as("__cid"), col(corpusVec).as("__cv"))
      .crossJoin(b)
      .filter(cosine(col("__cv"), col("__bv")) >= threshold)
      .select(col("__cid")).distinct()
    corpus.join(broadcast(contaminated),
      corpus(corpusId) === contaminated("__cid"), "left_anti")
  }

  /** Deterministic random hyperplanes: `nbits` unit-free gaussian vectors
    * of dimension `dim`, seeded — the same planes on every executor and
    * every run.
    */
  private def hyperplanes(dim: Int, nbits: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nbits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Test hook: the plane matrix for one table (spec parity checks). */
  private[ml] def testPlanes(dim: Int, nbits: Int, seed: Long): Seq[Seq[Double]] =
    hyperplanes(dim, nbits, seed)

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

  /** Per-table seed spacing (any fixed odd stride decorrelates the
    * `scala.util.Random` gaussian streams across tables).
    */
  private def tableSeed(seed: Long, t: Int): Long = seed + 1000003L * t

  /** All tables' plane matrices, [table][bit][dim] flattened — the layout
    * [[graft.plans.LshBuckets]] consumes. Same seeds and plane order as
    * [[lshBucket]], so fused bucket ids are identical.
    */
  private def allPlanes(dim: Int, nbits: Int, seed: Long, tables: Int): Seq[Double] =
    (0 until tables).flatMap(t =>
      hyperplanes(dim, nbits, tableSeed(seed, t)).flatten)

  /** Corpus-side bucketing: one fused pass computing every table's bucket
    * (array<long>, length `tables`) — replaces tables × nbits separate
    * dot-product expressions per row.
    */
  private def allBuckets(vec: Column, dim: Int, nbits: Int, seed: Long,
                         tables: Int): Column =
    graft.plans.expressions.lsh_buckets(vec,
      allPlanes(dim, nbits, seed, tables), tables, nbits, dim)

  /** Approximate top-k: rank only within the query's LSH buckets. The
    * AND-OR construction: each of `tables` independent hash tables uses
    * `nbits` hyperplanes (AND — collision prob p_bit^nbits per table), and
    * a neighbor is a candidate if it collides in ANY table (OR — recall
    * 1-(1-p)^tables), plus `probes` marginal-bit flips per table
    * (multi-probe) to buy recall without more tables. Size `nbits` ≈
    * log₂(corpus/bucket-target) so buckets stay small; add tables/probes
    * until recall clears the target. Candidates are deduped as bare id
    * pairs BEFORE vectors are re-joined, so corpus vectors never ride the
    * bucket shuffle ×tables.
    */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              dim: Int, k: Int = 10, nbits: Int = 8, seed: Long = 42L,
              probes: Int = 0, tables: Int = 1): DataFrame = {
    require(tables >= 1)
    val cBuckets = corpus.select(col(corpusId).as("neighbor_id"),
      posexplode(allBuckets(col(corpusVec), dim, nbits, seed, tables))
        .as(Seq("__t", "__bucket")))
    val qBuckets = broadcast(queries.select(col(queryId).as("query_id"),
        explode(flatten(array((0 until tables).map(t =>
          transform(lshProbeBuckets(col(queryVec), dim, nbits, tableSeed(seed, t), probes),
            b => struct(lit(t).as("t"), b.as("bucket")))): _*))).as("__tb"))
      .select(col("query_id"), col("__tb.t").as("__t"), col("__tb.bucket").as("__bucket")))
    val cands = cBuckets.join(qBuckets, Seq("__t", "__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
    val cv = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
    val qv = broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv")))
    cands.join(cv, Seq("neighbor_id")).join(qv, Seq("query_id"))
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
    *
    * Scale shape: `tables` independent nbits-plane tables (AND-OR, as in
    * [[lshTopK]]); `maxBucketSize` caps any pathological bucket (an
    * all-identical-embedding clique would otherwise go quadratic — capped
    * buckets are dropped whole, which only misses pairs inside mega-
    * cliques; exact-dedup those first). Candidate pairs are deduped as
    * bare ids before vectors are re-joined. Size `nbits` ≈ log₂(n) so
    * expected bucket size stays O(1); recall comes from `tables`, not
    * from keeping buckets huge.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   threshold: Double = 0.95, nbits: Int = 16,
                   tables: Int = 8, seed: Long = 42L,
                   maxBucketSize: Int = 10000): DataFrame = {
    require(tables >= 1)
    val buckets = df.select(col(idCol).as("__id"),
      posexplode(allBuckets(col(vecCol), dim, nbits, seed, tables))
        .as(Seq("__t", "__bucket")))
    val capped = buckets
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy("__t", "__bucket")))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
    val a = capped.select(col("__t"), col("__bucket"), col("__id").as("id_a"))
    val b = capped.select(col("__t"), col("__bucket"), col("__id").as("id_b"))
    val pairs = a.join(b, Seq("__t", "__bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val v = df.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    pairs
      .join(v.select(col("__vid").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(v.select(col("__vid").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Exact all-pairs near-duplicate baseline: every pair idA < idB with
    * cosine ≥ threshold. O(n²/2) compute — the correctness oracle for
    * [[nearDupPairs]] and the right tool below ~10⁵ rows; use the LSH
    * path at scale.
    */
  def exactNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }
}
