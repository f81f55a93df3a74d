package graft.ml

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Pins the physical-plan shape the ANN top-k operators' scale story
  * depends on: `row_number().over(partitionBy(query).orderBy(score))
  * .filter(rank <= k)` must compile to `WindowGroupLimit` on BOTH sides
  * of the exchange (partial per-partition top-k before the shuffle,
  * final after). Nothing else pins this — if the optimizer rule were
  * disabled (config change, upgrade), every query's candidate set would
  * silently become a full per-query sort-and-shuffle, which at corpus
  * scale is the difference between a shortlist and an O(N log N)
  * catastrophe. This spec fails loud instead.
  */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): DataFrame =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")

  /** Count WindowGroupLimit nodes in the executed physical plan. */
  private def windowGroupLimits(df: DataFrame): Int =
    "WindowGroupLimit".r
      .findAllMatchIn(df.queryExecution.executedPlan.toString).length

  test("bruteForceTopK plans partial + final WindowGroupLimit around " +
       "the rank exchange") {
    val corpus = vecs(200, 8)
    val queries = vecs(3, 8)
    val plan = Similarity.bruteForceTopK(
      corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
    assert(windowGroupLimits(plan) >= 2,
      s"rank-limit pushdown must fire on both sides of the exchange:\n" +
        plan.queryExecution.executedPlan.toString.take(2000))
    // and the result is still the top-k it claims
    assert(plan.count() == 3 * 5)
  }

  test("PqIndex.topK plans WindowGroupLimit for both the ADC shortlist " +
       "and the exact rerank") {
    val corpus = vecs(256, 16)
    val queries = vecs(2, 16)
    val model = PqIndex.fit(corpus, "embedding", m = 4, ksub = 16)
    val plan = PqIndex.topK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", model, k = 3, shortlist = 10)
    // two rank stages (shortlist + rerank), each with a partial and a
    // final node
    assert(windowGroupLimits(plan) >= 4,
      s"both rank stages must push partial top-k:\n" +
        plan.queryExecution.executedPlan.toString.take(3000))
    assert(plan.count() == 2 * 3)
  }

  test("the spec would catch the pushdown being disabled") {
    val corpus = vecs(50, 8)
    val queries = vecs(2, 8)
    val key = "spark.sql.optimizer.windowGroupLimitThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = Similarity.bruteForceTopK(
        corpus, "vec_id", "embedding", queries, "vec_id", "embedding", k = 5)
      assert(windowGroupLimits(plan) == 0,
        "sanity: the counter actually tracks the optimizer rule")
    } finally spark.conf.set(key, prev)
  }
}
