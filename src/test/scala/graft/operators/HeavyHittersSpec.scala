package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 5 heavy keys (1000 rows each) over a singleton tail far wider than
  // the counter budget — MG must decrement constantly and still keep
  // every heavy key in some partition's summary
  private def skewed() = spark.range(0, 5000)
    .select(concat(lit("hot-"), col("id") % 5).as("k"))
    .union(spark.range(0, 3000)
      .select(concat(lit("cold-"), col("id")).as("k")))

  test("exact top-k under a tail wider than the counter budget") {
    val r = HeavyHitters.topK(skewed().repartition(7), "k", k = 5,
      capacity = 64).collect()
    assert(r.map(_.getString(0)).toSeq ==
      Seq("hot-0", "hot-1", "hot-2", "hot-3", "hot-4"),
      "tie-break: equal counts order by key asc")
    assert(r.forall(_.getLong(1) == 1000L))
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("matches the full groupBy on every partitioning") {
    val full = skewed().groupBy("k").count()
      .orderBy(col("count").desc, col("k")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    Seq(1, 4, 16).foreach { p =>
      val got = HeavyHitters.topK(skewed().repartition(p), "k", 5, 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == full, s"mismatch at $p partitions")
    }
  }

  test("certificate trips on uniform data instead of lying") {
    val uniform = spark.range(0, 4000)
      .select(concat(lit("u-"), col("id") % 1000).as("k"))
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topK(uniform, "k", k = 5, capacity = 16)
    }
    assert(e.getMessage.contains("certificate failed"))
  }

  test("null keys are excluded, not counted as a group") {
    val d = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .toDF("k")
    val r = HeavyHitters.topK(d, "k", k = 2, capacity = 8).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  test("fewer distinct keys than k returns them all, certified") {
    val d = Seq("x", "x", "y").toDF("k")
    val r = HeavyHitters.topK(d, "k", k = 10, capacity = 32).collect()
    assert(r.length == 2)
    assert(r.head.getString(0) == "x" && r.head.getLong(1) == 2L)
  }
}
