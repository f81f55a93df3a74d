package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable by 2a - b > 0; the perceptron convergence
  // theorem guarantees a finite number of mistakes on this
  private def separable() = (1L to 60L).map { i =>
    val a = i % 10 + 1
    val b = (i * 7) % 15 + 1
    val y = if (2 * a - b > 0) 1L else -1L
    (y, 1L, a, b)
  }.toDF("label", "bias", "a", "b")

  test("separable data: enough epochs reach zero training mistakes") {
    val d = separable()
    val m = Perceptron.fit(d, Seq("bias", "a", "b"), "label", epochs = 30)
    val wrong = Perceptron.score(d, m)
      .filter((col("label") === 1L) =!= col("pred")).count()
    assert(wrong == 0, s"still $wrong training mistakes: ${m.weights.toSeq}")
  }

  test("score is the literal integer margin") {
    val d = Seq((1L, 1L, 3L, 4L)).toDF("label", "bias", "a", "b")
    val m = Perceptron.Model(Seq("bias", "a", "b"), Array(10L, -2L, 5L))
    val r = Perceptron.score(d, m).head()
    assert(r.getAs[Long]("score") == 10L - 6L + 20L)
    assert(r.getAs[Boolean]("pred"))
  }

  test("training is bit-deterministic under repartitioning") {
    val d = separable()
    val w1 = Perceptron.fit(d, Seq("bias", "a", "b"), "label", 7).weights
    val w2 = Perceptron.fit(d.repartition(13), Seq("bias", "a", "b"),
      "label", 7).weights
    val w3 = Perceptron.fit(d.repartition(1), Seq("bias", "a", "b"),
      "label", 7).weights
    assert(w1.toSeq == w2.toSeq && w2.toSeq == w3.toSeq)
  }

  test("epoch 1 from zero weights updates on every row") {
    // w=0 → margin 0 → y·margin <= 0 everywhere, so the first update
    // is exactly sum(y·x) over ALL rows
    val d = separable()
    val m = Perceptron.fit(d, Seq("bias", "a", "b"), "label", epochs = 1)
    val expected = d.select(
      sum(col("label") * col("bias")), sum(col("label") * col("a")),
      sum(col("label") * col("b"))).head()
    assert(m.weights.toSeq ==
      Seq(expected.getLong(0), expected.getLong(1), expected.getLong(2)))
  }

  test("non ±1 labels are refused") {
    val d = Seq((2L, 1L, 1L, 1L)).toDF("label", "bias", "a", "b")
    val e = intercept[IllegalArgumentException] {
      Perceptron.fit(d, Seq("bias", "a", "b"), "label", 1)
    }
    assert(e.getMessage.contains("must be +1/-1"))
  }
}
