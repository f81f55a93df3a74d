package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ml.{IvfIndex, Similarity}
import graft.text.MinHashDedup

/** Recall gates for every approximate path, measured against its exact
  * baseline on the driver's synthetic testdata (sf0.01). These are the
  * committed evidence behind:
  *   - the exact DuckDB oracles of the LSH-backed queries (the banded
  *     minhash candidates and the simsearch_lsh candidates must CONTAIN
  *     the exact answer at this SF for those oracles to hash-match), and
  *   - the declared parameters of the approximate-only queries
  *     (embedding_neardup_lsh, simsearch_ivf), which cannot have a SQL
  *     oracle by design.
  */
class RecallGateSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def exactJaccardPairs(hashed: DataFrame, threshold: Double): Set[(Long, Long)] = {
    val a = hashed.select(col("__id").as("id_a"), col("__hh").as("__ha"))
    val b = hashed.select(col("__id").as("id_b"), col("__hh").as("__hb"))
    pairSet(a.join(b, col("id_a") < col("id_b"))
      .withColumn("j",
        size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(array_union(col("__ha"), col("__hb"))))
      .filter(col("j") >= threshold))
  }

  test("minhash LSH candidates contain every exact word-shingle pair (oracle precondition)") {
    val hashed = docs.select(col("doc_id").as("__id"),
      graft.plans.expressions.shingle_hashes(col("text"), 3).as("__hh"))
    val exact = exactJaccardPairs(hashed, 0.5)
    val got = pairSet(MinHashDedup.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 64, bands = 16))
    assert(exact.nonEmpty, "gate is vacuous: no exact pairs at threshold 0.5")
    val missed = exact -- got
    assert(missed.isEmpty,
      s"banded LSH (b=16,r=4) missed ${missed.size}/${exact.size} exact pairs: " +
        s"${missed.take(5)} — the neardup_minhash_pairs/dedup_minhash/" +
        "dedup_transitive/pipeline_clean_corpus oracles depend on completeness")
    assert(got == exact, s"verified pairs must equal exact pairs, got ${got.size} vs ${exact.size}")
  }

  test("char-5-gram LSH candidates contain every exact n-gram pair (oracle precondition)") {
    val hashed = docs.select(col("doc_id").as("__id"),
      graft.plans.expressions.char_ngram_hashes(col("text"), 5).as("__hh"))
    val exact = exactJaccardPairs(hashed, 0.7)
    val got = pairSet(MinHashDedup.nearDupPairs(docs, "doc_id", "text",
      threshold = 0.7, numHashes = 64, bands = 8, charNgram = 5))
    assert(exact.nonEmpty, "gate is vacuous: no exact pairs at threshold 0.7")
    assert(got == exact,
      s"ngram LSH pairs (${got.size}) diverge from exact (${exact.size}); " +
        "the neardup_ngram_pairs oracle depends on equality")
  }

  private def topkSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("lshTopK with declared params recovers the exact top-10 (oracle precondition)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = topkSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val got = topkSet(Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", dim = 64, k = 10,
      nbits = 4, probes = 4, tables = 12))
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"lshTopK recall@10 $recall below 0.9")
    assert(got == exact,
      "simsearch_lsh shares the brute-force oracle, which requires exact " +
        "agreement (12 tables measured to cover the top-10 through sf0.1)")
  }

  test("multi-table embedding LSH near-dup recall >= 0.9 vs exact all-pairs (stress case)") {
    // the low-threshold near-orthogonal STRESS configuration the declared
    // query used before round 3 — kept as a spec per the r2 verdict; the
    // declared embedding_neardup_lsh now runs the production regime below
    val exact = pairSet(Similarity.exactNearDupPairs(emb, "vec_id", "embedding", 0.25))
    val got = pairSet(Similarity.nearDupPairs(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25, nbits = 4, tables = 32))
    assert(exact.nonEmpty)
    // precision is exact (cosine-verified); only recall is approximate
    assert((got -- exact).isEmpty, "LSH emitted a pair below threshold")
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"embedding LSH recall $recall below 0.9 " +
      "(stress params: nbits=4, tables=32)")
  }

  /** The corpus the DECLARED embedding_neardup_lsh query builds: every
    * original vector plus a deterministic derived near-duplicate
    * (v_i + 0.05·v_{i+1}, cosine ≈ 0.98-1.0), in pure double arithmetic
    * so DuckDB reproduces it bit-for-bit.
    */
  private lazy val productionCorpus: DataFrame = {
    val toDouble = transform(col("embedding"), x => x.cast("double"))
    val orig = emb.select(col("vec_id").cast("long").as("vec_id"),
      toDouble.as("embedding"))
    val mate = orig.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("__mate"))
    val derived = orig.join(mate, "vec_id")
      .select((col("vec_id") + 1000000L).as("vec_id"),
        zip_with(col("embedding"), col("__mate"),
          (x, y) => x + lit(0.05) * y).as("embedding"))
    orig.unionByName(derived)
  }

  test("production-regime LSH near-dup equals exact all-pairs (oracle precondition)") {
    val exact = pairSet(Similarity.exactNearDupPairs(
      productionCorpus, "vec_id", "embedding", 0.9))
    assert(exact.size >= 400, s"planting failed: ${exact.size} exact pairs at 0.9")
    val got = pairSet(Similarity.nearDupPairs(productionCorpus, "vec_id", "embedding",
      dim = 64, threshold = 0.9, nbits = 12, tables = 16))
    assert(got == exact,
      s"declared embedding_neardup_lsh params (nbits=12, tables=16) must have " +
        s"candidate recall 1.0 on this corpus for its exact DuckDB oracle to " +
        s"hash-match: got ${got.size} vs exact ${exact.size}, " +
        s"missed ${(exact -- got).take(5)}")
  }

  /** Deterministic near-duplicates planted on the real embeddings: each
    * planted vector is a small relative perturbation of a base vector
    * (cosine ≈ 0.98) — the regime semantic near-dedup is designed for
    * (the raw synthetic corpus is near-orthogonal, max cosine ≈ 0.35,
    * which no sub-quadratic method can bucket efficiently).
    */
  private lazy val planted: DataFrame = {
    val rnd = new scala.util.Random(7L)
    val base = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding")).collect()
    val dupRows = base.map { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).toArray
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      val sigma = 0.2 * norm / math.sqrt(v.length.toDouble)
      Row(id + 10000L, v.map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val dups = spark.createDataFrame(
      spark.sparkContext.parallelize(dupRows.toIndexedSeq, 2), schema)
    emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .unionByName(dups)
  }

  test("embedding LSH near-dup finds planted high-cosine duplicates (production regime)") {
    val exact = pairSet(Similarity.exactNearDupPairs(planted, "vec_id", "embedding", 0.9))
    assert(exact.size >= 90, s"planting failed: only ${exact.size} exact pairs at 0.9")
    val got = pairSet(Similarity.nearDupPairs(planted, "vec_id", "embedding",
      dim = 64, threshold = 0.9, nbits = 12, tables = 8))
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"planted near-dup recall $recall below 0.9")
  }

  /** Clustered vectors for the IVF gate: IVF's contract is that the
    * corpus has coarse cluster structure (that is what the centroids
    * quantize); on such data nprobe cells must recover the true
    * neighbors. 8 well-separated clusters, 50 vectors each.
    */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(11L)
    val dim = 16
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      c <- centroids.indices
      i <- 0 until 50
    } yield Row((c * 50 + i).toLong,
      centroids(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("IVF top-k recall >= 0.9 on clustered data (its design regime)") {
    val queries = clustered.filter(col("vec_id") % 50 === 0).limit(5)
    val exact = topkSet(Similarity.bruteForceTopK(clustered, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val model = IvfIndex.fit(clustered, "embedding", k = 8)
    val got = topkSet(IvfIndex.topK(clustered, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 10, nprobe = 2))
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall@10 $recall below 0.9 on clustered data")
  }

  test("simsearch_ivf derived-cluster corpus: IVF output EQUALS brute force (oracle precondition)") {
    // the exact construction the declared query + DuckDB oracle use:
    // member_i = centroid_{i%8} + 0.1·v_i over the 8 base vectors
    val toDouble = transform(col("embedding"), x => x.cast("double"))
    val orig = emb.select(col("vec_id").cast(LongType).as("vec_id"),
      toDouble.as("__v"))
    val cents = orig.filter(col("vec_id") < 8)
      .select(col("vec_id").as("__c"), col("__v").as("__cv"))
    val corpus = orig.join(broadcast(cents), col("vec_id") % 8 === col("__c"))
      .select(col("vec_id"),
        zip_with(col("__cv"), col("__v"), (c, x) => c + lit(0.1) * x).as("embedding"))
    val queries = corpus.filter(col("vec_id") < 5)
    def ranked(df: DataFrame): Seq[(Long, Long, Int, Double)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("rank").cast("int"), col("cosine").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq.sorted
    val exact = ranked(Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val model = IvfIndex.fit(corpus, "embedding", k = 8)
    val got = ranked(IvfIndex.topK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 10, nprobe = 2))
    assert(exact.size == 50, s"setup: expected 5 queries x 10, got ${exact.size}")
    assert(got == exact,
      "IVF (k=8, nprobe=2) must return the exact ranked top-10 on the " +
        "clustered corpus — the simsearch_ivf DuckDB oracle depends on it; " +
        s"diff: ${(got.toSet diff exact.toSet).take(3)} vs ${(exact.toSet diff got.toSet).take(3)}")
  }

  test("simsearch_pq derived-cluster corpus: PQ output EQUALS brute force (oracle precondition)") {
    // same construction as the IVF gate; PQ shortlists by ADC then
    // reranks exactly, so equality holds iff shortlist recall@10 is 1.0
    val toDouble = transform(col("embedding"), x => x.cast("double"))
    val orig = emb.select(col("vec_id").cast(LongType).as("vec_id"),
      toDouble.as("__v"))
    val cents = orig.filter(col("vec_id") < 8)
      .select(col("vec_id").as("__c"), col("__v").as("__cv"))
    val corpus = orig.join(broadcast(cents), col("vec_id") % 8 === col("__c"))
      .select(col("vec_id"),
        zip_with(col("__cv"), col("__v"), (c, x) => c + lit(0.1) * x).as("embedding"))
    val queries = corpus.filter(col("vec_id") < 5)
    def ranked(df: DataFrame): Seq[(Long, Long, Int, Double)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("rank").cast("int"), col("cosine").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq.sorted
    val exact = ranked(Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val model = graft.ml.PqIndex.fit(corpus, "embedding", m = 8, ksub = 16)
    val got = ranked(graft.ml.PqIndex.topK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 10, shortlist = 100))
    assert(exact.size == 50, s"setup: expected 5 queries x 10, got ${exact.size}")
    assert(got == exact,
      "PQ (m=8, ksub=16, shortlist=100) must return the exact ranked top-10 " +
        "on the clustered corpus — the simsearch_pq DuckDB oracle depends " +
        s"on it; diff: ${(got.toSet diff exact.toSet).take(3)}")
  }

  test("simsearch_ivfpq derived-cluster corpus: IVF-routed PQ output EQUALS " +
       "brute force at nprobe=2 (oracle precondition)") {
    // the composed index: coarse routing must put each derived cluster
    // in a probeable cell AND the ADC shortlist within the probed cells
    // must cover the true top-10 — equality holds iff both do
    val toDouble = transform(col("embedding"), x => x.cast("double"))
    val orig = emb.select(col("vec_id").cast(LongType).as("vec_id"),
      toDouble.as("__v"))
    val cents = orig.filter(col("vec_id") < 8)
      .select(col("vec_id").as("__c"), col("__v").as("__cv"))
    val corpus = orig.join(broadcast(cents), col("vec_id") % 8 === col("__c"))
      .select(col("vec_id"),
        zip_with(col("__cv"), col("__v"), (c, x) => c + lit(0.1) * x).as("embedding"))
    val queries = corpus.filter(col("vec_id") < 5)
    def ranked(df: DataFrame): Seq[(Long, Long, Int, Double)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
          col("rank").cast("int"), col("cosine").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSeq.sorted
    val exact = ranked(Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val model = graft.ml.IvfPq.fit(corpus, "embedding", k = 8, m = 8, ksub = 16)
    val got = ranked(graft.ml.IvfPq.topK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 10, nprobe = 2,
      shortlist = 100))
    assert(got == exact,
      "IVF×PQ (k=8, nprobe=2, m=8, ksub=16, shortlist=100) must return the " +
        "exact ranked top-10 on the clustered corpus — the simsearch_ivfpq " +
        s"DuckDB oracle depends on it; diff: ${(got.toSet diff exact.toSet).take(3)}")
  }

  test("IVF top-k floor on the near-orthogonal corpus (documented weak regime)") {
    val queries = emb.filter(col("vec_id") < 5)
    val exact = topkSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val model = IvfIndex.fit(emb, "embedding", k = 8)
    val got = topkSet(IvfIndex.topK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 10, nprobe = 4))
    val recall = (exact intersect got).size.toDouble / exact.size
    // near-orthogonal vectors have no cluster structure for the coarse
    // quantizer to exploit; nprobe=4 of k=8 cells measured 0.78 — gate a
    // floor so regressions (e.g. broken assignment) still surface
    assert(recall >= 0.5, s"IVF recall@10 $recall below the 0.5 floor")
  }
}
