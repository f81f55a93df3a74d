package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters in 8d (same construction as
    * IvfIndexSpec): axis directions with noise.
    */
  private def clustered = {
    val rnd = new scala.util.Random(7)
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f))
    (0 until 90).map { i =>
      val c = i % 3
      val v = base(c).clone()
      (0 until 8).foreach(j => v(j) = v(j) + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "true_cluster")
  }

  test("encode: m one-byte codes in [0, ksub), deterministic") {
    val df = clustered
    val model = PqIndex.fit(df, "embedding", m = 4, ksub = 4)
    assert(model.dsub == 2 && model.dim == 8)
    val codes = df.select(PqIndex.encode($"embedding", model).as("c"))
      .collect().map(_.getSeq[Byte](0))
    assert(codes.forall(_.length == 4))
    assert(codes.flatten.forall(b => b >= 0 && b < 4))
    val codes2 = df.select(PqIndex.encode($"embedding", model).as("c"))
      .collect().map(_.getSeq[Byte](0))
    assert(codes.toSeq == codes2.toSeq)
  }

  test("adc score equals the explicit LUT sum and approximates cosine") {
    val df = clustered
    val model = PqIndex.fit(df, "embedding", m = 4, ksub = 8)
    val pairs = df.filter($"vec_id" < 2).select($"vec_id".as("qid"), $"embedding".as("qv"))
      .crossJoin(df.filter($"vec_id" >= 2 && $"vec_id" < 12)
        .select($"vec_id".as("cid"), $"embedding".as("cv")))
      .select($"qid", $"cid",
        PqIndex.adcScore(PqIndex.lut($"qv", model),
          PqIndex.encode($"cv", model), model).as("adc"),
        Similarity.cosine($"qv", $"cv").as("cos"),
        PqIndex.lut($"qv", model).as("lut"),
        PqIndex.encode($"cv", model).as("code"))
      .collect()
    pairs.foreach { r =>
      val lut = r.getSeq[Double](4)
      val code = r.getSeq[Byte](5)
      val manual = code.zipWithIndex.map { case (c, sub) =>
        lut(sub * model.ksub + (c & 0xff)) }.sum
      assert(math.abs(r.getDouble(2) - manual) < 1e-12, "adc = LUT sum")
      // 8 centroids per 2-dim subspace quantize this corpus tightly
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.15,
        s"adc ${r.getDouble(2)} vs cos ${r.getDouble(3)}")
    }
  }

  test("pq topK with full shortlist equals brute force exactly") {
    val df = clustered
    val model = PqIndex.fit(df, "embedding", m = 4, ksub = 8)
    val queries = df.filter($"vec_id" < 3)
    val pq = PqIndex.topK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 5, shortlist = 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(pq.sortBy(t => (t._1, t._3)).toSeq == bf.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("shortlist recall: tight shortlist still contains the true top-k " +
       "on the clustered corpus") {
    val df = clustered
    val model = PqIndex.fit(df, "embedding", m = 4, ksub = 8)
    val queries = df.filter($"vec_id" < 3)
    val pq = PqIndex.topK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 5, shortlist = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == bf, "ADC shortlist of 15 must recover the exact top-5")
  }

  test("wrong-dimension vectors yield null codes, not a dead scan") {
    val df = clustered
    val model = PqIndex.fit(df, "embedding", m = 4, ksub = 4)
    val mixed = df.limit(2).union(
      Seq((999L, Array(1f, 2f), -1)).toDF("vec_id", "embedding", "true_cluster"))
    val out = mixed.select($"vec_id",
        PqIndex.encode($"embedding", model).as("c"),
        PqIndex.lut($"embedding", model).as("l"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(999L) == ((true, true)), "short vector -> null codes and lut")
    assert(out.filter(_._1 != 999L).values.forall(_ == ((false, false))))
  }

  test("zero vector encodes without NaN and scores 0") {
    val df = Seq((0L, Array(0f, 0f, 0f, 0f)), (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)), (3L, Array(0.5f, 0.5f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val model = PqIndex.fit(df, "embedding", m = 2, ksub = 2)
    val s = df.filter($"vec_id" === 1).select($"embedding".as("qv"))
      .crossJoin(df.filter($"vec_id" === 0).select($"embedding".as("cv")))
      .select(PqIndex.adcScore(PqIndex.lut($"qv", model),
        PqIndex.encode($"cv", model), model).as("s"))
      .head().getDouble(0)
    assert(!s.isNaN)
  }
}
