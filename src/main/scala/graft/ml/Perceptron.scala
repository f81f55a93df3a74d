package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch INTEGER perceptron — the trainable seed-classifier slot
  * (the GPT-3 / CCNet pipelines train a small linear classifier over
  * cheap features to rank raw documents against a curated seed set;
  * [[graft.text.NaiveBayes]] is the counting member of that family,
  * this is the mistake-driven one, Rosenblatt 1958 / the batch variant
  * of Collins 2002's perceptron).
  *
  * Everything is `BIGINT`: features are integer counts, the learning
  * rate is an integer, and each epoch's update is the integer sum of
  * `y·x` over currently-misclassified rows (`y·(w·x) <= 0`, so the
  * zero-initialized first epoch updates on every row — the standard
  * convention). Integer sums are order-independent, so training is
  * bit-deterministic under any partitioning/AQE replan, and an
  * external engine replays the whole fit exactly — the same
  * determinism contract as [[graft.operators.PageRank]].
  *
  * Scale shape: the feature frame persists once; each epoch is ONE
  * map-side-combinable aggregation over it producing a single row of
  * per-feature gradients (no shuffle wider than the feature count),
  * with the weight vector living driver-side between epochs exactly
  * like MLlib coefficients or [[IvfIndex]] centroids — it is
  * O(features), not O(rows). Margins recompute in-plan from literal
  * weights, so epoch k's job is independent of epoch k−1's plan (no
  * lineage growth, nothing checkpointed). Weight magnitude grows with
  * corpus size (|w| ≲ epochs × Σ|x|); at extreme scale either train on
  * a sampled split (the production shape — the seed set is small) or
  * right-shift the update, both leaving determinism intact.
  *
  * As with any unit-step mistake-driven method, bring features to
  * comparable SMALL scales (integer bucketing: `chars div 100`, count
  * caps) — each update moves w_j by ±Σx_j, so a raw large-magnitude
  * feature makes the full-batch iterate overshoot and limit-cycle
  * instead of settling (the classic feature-normalization requirement,
  * in integer form).
  */
object Perceptron {

  /** Fitted weights, index-aligned with the `featureCols` given to
    * [[fit]]; prepend a constant-1 column for a bias.
    */
  final case class Model(featureCols: Seq[String], weights: Array[Long]) {
    require(featureCols.length == weights.length,
      s"${featureCols.length} features vs ${weights.length} weights")
    def marginCol: Column = featureCols.zip(weights)
      .map { case (c, w) => col(c) * lit(w) }
      .reduce(_ + _)
  }

  /** Train `epochs` full-batch passes. `labelCol` must be ±1 (checked
    * in-plan); `featureCols` must be integral — counts, flags, a
    * constant 1 bias.
    */
  def fit(df: DataFrame, featureCols: Seq[String], labelCol: String,
          epochs: Int = 5, lr: Long = 1L): Model = {
    require(featureCols.nonEmpty, "need at least one feature column")
    require(epochs >= 1, s"need epochs >= 1, got $epochs")
    require(lr >= 1L, s"need integer lr >= 1, got $lr")
    val y = col("__y")
    val feats = df.select(
      (col(labelCol).cast("long").as("__y") +:
        featureCols.map(c => col(c).cast("long").as(c))): _*)
      .persist()
    val w = new Array[Long](featureCols.length)
    try {
      var ep = 0
      while (ep < epochs) {
        val margin = featureCols.zip(w)
          .map { case (c, wj) => col(c) * lit(wj) }
          .reduce(_ + _)
        val mis = y * margin <= 0
        val grads = feats.select(featureCols.zipWithIndex.map {
          case (c, j) =>
            coalesce(sum(when(mis, y * col(c))), lit(0L)).as(s"g$j")
        } ++ Seq(
          // ±1 label contract, checked in the same pass (free):
          count(when(y.isNull || abs(y) =!= 1L, lit(1)))
            .as("__bad")): _*).head()
        require(grads.getLong(featureCols.length) == 0L,
          s"labelCol '$labelCol' must be +1/-1")
        var j = 0
        while (j < w.length) { w(j) += lr * grads.getLong(j); j += 1 }
        ep += 1
      }
    } finally feats.unpersist() // also on the label-contract throw
    Model(featureCols, w)
  }

  /** Score rows with a fitted model: appends `score` (the integer
    * margin) and `pred` (`score > 0`).
    */
  def score(df: DataFrame, model: Model): DataFrame = {
    val margin = model.featureCols.zip(model.weights)
      .map { case (c, w) => col(c).cast("long") * lit(w) }
      .reduce(_ + _)
    df.withColumn("score", margin).withColumn("pred", col("score") > 0L)
  }
}
