package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BandedHammingJoinSpec extends SparkSpec {
  import spark.implicits._

  // fingerprints with known pairwise distances:
  //   1 vs 2: hamming 0; 1 vs 3: hamming 1 (bit 5); 1 vs 4: hamming 2
  //   (bits 20, 40); 5 is far from everything
  private def fps = Seq(
    (1L, 0x0123456789ABCDEFL),
    (2L, 0x0123456789ABCDEFL),
    (3L, 0x0123456789ABCDEFL ^ (1L << 5)),
    (4L, 0x0123456789ABCDEFL ^ (1L << 20) ^ (1L << 40)),
    (5L, 0x7EDCBA9876543210L)
  ).toDF("id", "fp")

  private def naiveJoin(df: DataFrame, k: Int): DataFrame = {
    val a = df.as("a")
    val b = df.as("b")
    a.join(b, col("a.id") < col("b.id") &&
      bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) <= k)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("rule fires: the optimized plan is an equi-join, not a " +
      "nested-loop, and results are the exact pair set") {
    val q = naiveJoin(fps, 3)
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") &&
      !physical.contains("CartesianProduct"),
      s"rule did not fire:\n$physical")
    assert(q.queryExecution.optimizedPlan.toString.contains("posexplode") ||
      q.queryExecution.optimizedPlan.toString.contains("Generate"))
    assert(pairs(q) == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1),
      (1L, 4L, 2), (2L, 4L, 2), (3L, 4L, 3)))
  }

  test("multiplicities survive duplicate input rows (no Distinct trick)") {
    // id 1's row twice: every pair involving it must appear twice, and
    // the (1,1) self-pair is excluded by id < id
    val dup = fps.union(fps.filter($"id" === 1L))
    val rows = naiveJoin(dup, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    // pairs at hamming 0: (1,2) from each copy of 1 -> twice
    assert(rows == List((1L, 2L), (1L, 2L)))
  }

  test("k = 0 degenerates to an equi-join on the fingerprint itself") {
    val q = naiveJoin(fps, 0)
    assert(!q.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(pairs(q) == Set((1L, 2L, 0)))
  }

  test("null fingerprints never pair") {
    val withNull = fps.union(Seq((9L, null.asInstanceOf[java.lang.Long]))
      .toDF("id", "fp").select($"id", $"fp".cast("long")))
    assert(pairs(naiveJoin(withNull, 3)) == pairs(naiveJoin(fps, 3)))
  }

  test("strict <, and mirrored literal-first forms, also fire") {
    val a = fps.as("a"); val b = fps.as("b")
    val strict = a.join(b, col("a.id") < col("b.id") &&
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))) < 1)
      .select(col("a.id"), col("b.id"))
    assert(!strict.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(strict.count() == 1L) // only the hamming-0 pair
    // mirrored literal-first form through SQL: k >= bit_count(...)
    fps.createOrReplaceTempView("bhj_fps")
    val mirrored = spark.sql(
      """SELECT a.id, b.id FROM bhj_fps a JOIN bhj_fps b
        |ON a.id < b.id AND 3 >= bit_count(a.fp ^ b.fp)""".stripMargin)
    assert(mirrored.queryExecution.optimizedPlan.toString
      .contains("__band_idx"))
    assert(mirrored.count() == 6L)
  }

  test("no rewrite when an equality conjunct already exists") {
    val left = Seq((1L, 10L, 0L), (2L, 20L, 1L)).toDF("id", "key", "fp")
    val right = Seq((3L, 10L, 0L), (4L, 20L, 0L)).toDF("id2", "key2", "fp2")
    val q = left.join(right, $"key" === $"key2" &&
      bit_count($"fp".bitwiseXOR($"fp2")) <= 3)
    // equi-join on key: the plan must NOT contain our band explode
    assert(!q.queryExecution.optimizedPlan.toString.contains("__band_idx"))
    assert(q.count() == 2L)
  }

  test("no rewrite past MaxDist") {
    val q = naiveJoin(fps, BandedHammingJoin.MaxDist + 1)
    assert(!q.queryExecution.optimizedPlan.toString.contains("__band_idx"))
  }

  test("randomized: rewritten join equals brute force") {
    val rnd = new scala.util.Random(7L)
    val data = (0 until 200).map { i =>
      // clustered fingerprints so some pairs fall within distance 3
      val base = Array(0x1111L, 0x7F00FF00AA55L, -1L)(rnd.nextInt(3))
      val flips = rnd.nextInt(5)
      var fp = base
      (0 until flips).foreach(_ => fp ^= 1L << rnd.nextInt(64))
      (i.toLong, fp)
    }
    val df = data.toDF("id", "fp")
    val got = pairs(naiveJoin(df, 3))
    val expected = (for {
      (i, fi) <- data; (j2, fj) <- data if i < j2
      h = java.lang.Long.bitCount(fi ^ fj) if h <= 3
    } yield (i, j2, h)).toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }
}
