package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1f, 0f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)),   // close to 1
    (3L, Array(0f, 1f, 0f, 0f)),       // orthogonal to 1
    (4L, Array(-1f, 0f, 0f, 0f)),      // opposite of 1
    (5L, Array(1f, 0f, 0f, 0f)))       // duplicate of 1
    .toDF("vec_id", "embedding")

  test("cosine basics") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .filter($"a.vec_id" === 1 && $"b.vec_id".isin(3, 4, 5))
      .select($"b.vec_id",
        Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(3L)) < 1e-9)
    assert(math.abs(out(4L) + 1.0) < 1e-9)
    assert(math.abs(out(5L) - 1.0) < 1e-9)
  }

  test("brute-force top-k ranking") {
    val queries = vecs.filter($"vec_id" === 1)
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2)))
    // expected order: 5 (identical, cos 1), 2 (cos ~.994), 3 (cos 0)
    assert(out.toSeq == Seq((5L, 1), (2L, 2), (3L, 3)))
  }

  test("sq8 quantization: scale, code range, zero vector, reconstruction") {
    val d = Seq(
      (1L, Array(1f, -0.5f, 0.25f, 0f)),
      (2L, Array(0f, 0f, 0f, 0f)),
      (3L, Array(-2f, 1f, 0.003f, -0.004f))
    ).toDF("vec_id", "embedding")
    val rows = d.select($"vec_id", Similarity.sq8Quantize($"embedding").as("q"))
      .select($"vec_id", $"q.scale", $"q.codes").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Byte](2))).toMap
    val (s1, c1) = rows(1L)
    assert(math.abs(s1 - 1.0 / 127) < 1e-15)
    assert(c1 == Seq[Byte](127, -63, 32, 0)) // round(-63.5)→floor(-63)= -63
    val (s2, c2) = rows(2L)
    assert(s2 == 0.0 && c2 == Seq[Byte](0, 0, 0, 0))
    val (s3, c3) = rows(3L)
    assert(c3.head == -127 && c3(1) == 64) // max|x|=2 → scale=2/127
    // reconstruction error per element ≤ scale/2
    c3.zip(Seq(-2f, 1f, 0.003f, -0.004f)).foreach { case (c, x) =>
      assert(math.abs(c * s3 - x) <= s3 / 2 + 1e-12) }
  }

  test("sq8 top-k preserves exact ranking on well-separated vectors") {
    val queries = vecs.filter($"vec_id" === 1)
    val out = Similarity.sq8TopK(vecs, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq((5L, 1), (2L, 2), (3L, 3)))
    // identical vectors score exactly |v|² under quantization: 1·1 here
    assert(math.abs(out.head._3 - 1.0) < 1e-3)
    assert(out(2)._3 == 0.0) // orthogonal stays exactly zero in int space
  }

  test("semantic decontamination drops near-copies of bench items only") {
    val corpus = vecs // ids 1..5 (see fixture: 1 and 5 identical, 4 opposite)
    val bench = Seq(Tuple1(Array(0.99f, 0.05f, 0f, 0f))).toDF("embedding")
    val out = Similarity.dropSemanticMatches(corpus, "vec_id", "embedding",
      bench, "embedding", threshold = 0.95)
      .select("vec_id").as[Long].collect().sorted
    // 1, 2, 5 are within 0.95 cosine of the bench vector; 3 (orthogonal)
    // and 4 (opposite) survive
    assert(out.toSeq == Seq(3L, 4L), s"got ${out.toSeq}")
  }

  test("normalize produces unit vectors") {
    val n = vecs.select(Similarity.l2Norm(
      Similarity.normalize($"embedding")).as("n"))
      .as[Double].collect()
    n.foreach(v => assert(math.abs(v - 1.0) < 1e-3))
  }

  test("lsh bucket is deterministic and groups identical vectors") {
    val b = vecs.select($"vec_id",
      Similarity.lshBucket($"embedding", dim = 4, nbits = 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(5L)) // identical vectors, same bucket
    val again = vecs.select(Similarity.lshBucket($"embedding", 4, 6).as("b"))
      .collect().map(_.getLong(0))
    assert(again.toSeq == Seq(b(1L), b(2L), b(3L), b(4L), b(5L)))
  }

  test("embedding near-dup pairs finds the duplicate") {
    val pairs = Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      dim = 4, threshold = 0.98, nbits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 5L)))
    assert(!pairs.exists(p => p._2 == 3L || p._2 == 4L))
  }

  test("lsh top-k finds planted same-direction neighbors on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 2)
    // plant scaled copies (same direction → same hyperplane bucket, cosine 1)
    val planted = queries.select(
      ($"vec_id" + 100000).as("vec_id"),
      transform($"embedding", x => x * 2f).as("embedding"),
      $"label")
    val corpus = emb.unionByName(planted)
    val approx = Similarity.lshTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", dim = 64, k = 3, nbits = 4)
      .filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(approx.length == 2)
    approx.foreach { case (q, n, cos) =>
      assert(n == q + 100000, s"expected planted copy as top-1 for $q, got $n")
      assert(math.abs(cos - 1.0) < 1e-6)
    }
  }

  test("multi-probe buckets: own bucket first, variants differ by one bit") {
    val out = vecs.select($"vec_id",
      Similarity.lshBucket($"embedding", 4, 6).as("b"),
      Similarity.lshProbeBuckets($"embedding", 4, 6, 42L, 3).as("probes"))
      .collect()
    out.foreach { r =>
      val b = r.getLong(1)
      val ps = r.getSeq[Long](2)
      assert(ps.length == 4)
      assert(ps.head == b, "first probe must be the exact bucket")
      ps.tail.foreach { p =>
        assert(java.lang.Long.bitCount(p ^ b) == 1,
          s"variant $p not one bit from $b")
      }
      assert(ps.distinct.length == ps.length)
    }
  }

  test("fused lsh_buckets equals per-table lshBucket bit-for-bit") {
    // the fused kernel must reproduce the unfused formulation exactly —
    // the recall gates and the simsearch_lsh / embedding_neardup_lsh
    // oracles are pinned to these bucket ids
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tables = 5; val nbits = 7; val dim = 64; val seed = 42L
    val unfused = emb.select($"vec_id", org.apache.spark.sql.functions.array(
      (0 until tables).map(t =>
        Similarity.lshBucket($"embedding", dim, nbits, seed + 1000003L * t)): _*
    ).as("b"))
    val fused = emb.select($"vec_id", graft.plans.expressions.lsh_buckets(
      $"embedding",
      (0 until tables).flatMap(t => Similarity.testPlanes(dim, nbits, seed + 1000003L * t).flatten),
      tables, nbits, dim).as("b"))
    val u = unfused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(u == f)
  }

  test("multi-probe recall dominates single-bucket recall on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(probes: Int): Double = {
      val got = Similarity.lshTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", dim = 64, k = 5, nbits = 6,
        probes = probes)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    val r0 = recall(0); val r4 = recall(4)
    assert(r4 >= r0, s"multi-probe recall $r4 below single-bucket $r0")
  }

  test("signBits packs positive components; >64 dims span blocks") {
    import org.apache.spark.sql.functions.col
    val v = Seq(
      (1L, Array(1.0f, -2.0f, 0.0f, 3.0f)),            // bits 0 and 3
      (2L, Array.tabulate(70)(i => if (i % 3 == 0) 1.0f else -1.0f)))
      .toDF("id", "v")
    val got = v.select(col("id"), Similarity.signBits(col("v")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq((1L << 0) | (1L << 3)), got(1L).toString)
    assert(got(2L).length == 2, "70 dims need two blocks")
    // bit i set iff i % 3 == 0 (block-local)
    val b = got(2L)
    (0 until 70).foreach { i =>
      val set = ((b(i >> 6) >> (i & 63)) & 1L) == 1L
      assert(set == (i % 3 == 0), s"bit $i")
    }
    // hamming of a code with itself is 0; flipping one sign flips 1 bit
    val pair = Seq((Array(1.0f, -1.0f, 1.0f), Array(1.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
      .select(Similarity.hammingBits(
        Similarity.signBits(col("a")), Similarity.signBits(col("b"))))
    assert(pair.head().getLong(0) == 1L)
  }

  test("binaryTopK equals brute force when the Hamming cut covers the " +
       "true neighbors, and the prefilter actually prunes") {
    import org.apache.spark.sql.functions._
    // 3 tight clusters in 16d: in-cluster sign flips ≈ 0-2 bits,
    // cross-cluster ≈ 8 — maxHamming = 4 splits them
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(3, 16)((c, i) =>
      if ((i + c) % 3 == 0) 1.0f else -1.0f) // 3 DISTINCT sign patterns
                                             // (~10/16 bits apart pairwise)
    val docs = (0 until 90).map { i =>
      val c = i % 3
      (i.toLong, base(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }.toDF("vec_id", "embedding")
    val queries = docs.filter(col("vec_id") < 3)
    val got = Similarity.binaryTopK(docs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, maxHamming = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Similarity.bruteForceTopK(docs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
    // the shortlist really prunes: cross-cluster candidates never rerank
    val q1 = queries.filter(col("vec_id") === 0L)
    val shortlist = docs
      .crossJoin(broadcast(q1.select(
        Similarity.signBits(col("embedding")).as("__qf"))))
      .filter(Similarity.hammingBits(
        Similarity.signBits(col("embedding")), col("__qf")) <= 4)
      .count()
    assert(shortlist <= 35, s"expected ~1 cluster of 30, got $shortlist")
  }

  test("binaryTopK fails loudly on mismatched embedding dimensions") {
    // zip_with pads the shorter sign code with null and the Hamming sum
    // nulls out — before the guard, every mismatched pair silently
    // dropped instead of erroring
    val docs = Seq((1L, Array.fill(128)(1.0f)), (2L, Array.fill(128)(-1.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.binaryTopK(docs, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 1, maxHamming = 64).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dimension mismatch")),
      s"expected the dimension-mismatch raise_error, got: $e")
  }


  test("hardNegatives: top-k most confusable DIFFERENT-label vectors") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // four corpus vectors around query (1,0): same-label near-duplicate
    // must be EXCLUDED; the nearest different-label one ranks first
    val corpus = Seq(
      (10L, Seq(0.999f, 0.04f), "a"), // same label as query: excluded
      (11L, Seq(0.99f, 0.14f), "b"),  // hardest negative
      (12L, Seq(0.9f, 0.43f), "b"),
      (13L, Seq(-1.0f, 0.0f), "c"))
      .toDF("vec_id", "vec", "label")
    val q = Seq((1L, Seq(1.0f, 0.0f), "a")).toDF("vec_id", "vec", "label")
    val r = Similarity.hardNegatives(corpus, "vec_id", "vec", "label",
      q, "vec_id", "vec", "label", k = 2).collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(11L, 12L))
    assert(r.map(_.getInt(2)).toSeq == Seq(1, 2))
    assert(!r.map(_.getLong(1)).contains(10L),
      "same-label near-duplicate must not appear as a negative")
  }

  test("hardNegatives agrees with bruteForceTopK when labels all differ") {
    import org.apache.spark.sql.functions._
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        // query gets label -1, corpus labels 0.. -> never equal
        lit(0L).as("label"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding"), lit(-1L).as("label"))
    val hn = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      q, "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(hn == bf)
  }
}
