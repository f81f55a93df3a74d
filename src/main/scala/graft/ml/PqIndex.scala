package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product quantization (PQ) approximate nearest-neighbor search: each
  * L2-normalized vector splits into `m` subvectors, each encoded as the
  * id of its nearest per-subspace centroid — `m` bytes per vector (32×
  * smaller than 64 float32 dims), THE standard memory-bound ANN
  * compression. Queries score candidates through an ADC lookup table
  * (one `m·ksub` dot-product table per query, then `m` array reads per
  * candidate instead of a dim-length dot), shortlist top-N, and exact
  * vectors are fetched ONLY for the shortlist to rerank — so the wide
  * float corpus is read once at encode time and never broadcast or
  * shuffled at query time.
  *
  * Codebooks are trained per subspace by deterministic k-means on a
  * bounded driver-collected sample (the standard offline recipe, same
  * shape as [[IvfIndex.fit]]).
  */
object PqIndex {

  /** `codebooks` is [sub][centroid][dim] flattened: index
    * `(sub*ksub + j)*dsub + t`.
    */
  final case class Model(m: Int, ksub: Int, dsub: Int, codebooks: Array[Double]) {
    def dim: Int = m * dsub
  }

  /** Train per-subspace codebooks on a deterministic sample. Vectors are
    * L2-normalized first (cosine geometry); subspace k-means is plain
    * Euclidean (no per-subspace renormalization — ADC then approximates
    * the full inner product, which on normalized vectors is the cosine).
    */
  def fit(df: DataFrame, vecCol: String, m: Int = 8, ksub: Int = 16,
          sampleSize: Int = 10000, iters: Int = 10, seed: Long = 42L): Model = {
    require(m >= 1 && ksub >= 2 && ksub <= 256,
      "need 1 <= m, 2 <= ksub <= 256 (codes are one byte)")
    val rows = BoundedSample.rows(df, vecCol, sampleSize, seed)
    val sample: Array[Array[Double]] = rows.map { r =>
      val v = r.getSeq[Number](0).map(_.doubleValue).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    require(sample.nonEmpty, "empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    require(sample.length >= ksub,
      s"sample (${sample.length}) smaller than ksub=$ksub")

    val codebooks = new Array[Double](m * ksub * dsub)
    for (sub <- 0 until m) {
      val off = sub * dsub
      val subVecs = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + dsub))
      val cents = kmeans(subVecs, ksub, iters, seed * 31 + sub)
      for (j <- 0 until ksub; t <- 0 until dsub)
        codebooks((sub * ksub + j) * dsub + t) = cents(j)(t)
    }
    Model(m, ksub, dsub, codebooks)
  }

  // plain Euclidean k-means++ + Lloyd (deterministic via seeded Random)
  private def kmeans(sample: Array[Array[Double]], k: Int, iters: Int,
                     seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val cents = new Array[Array[Double]](k)
    cents(0) = sample(rnd.nextInt(sample.length)).clone()
    val d2 = Array.fill(sample.length)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < sample.length) {
        val d = sqDist(sample(i), cents(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val tot = d2.sum
      var target = rnd.nextDouble() * tot
      var pick = 0
      while (pick < sample.length - 1 && target > d2(pick)) {
        target -= d2(pick); pick += 1
      }
      cents(c) = sample(pick).clone()
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          val d = sqDist(v, cents(c)); if (d < bd) { bd = d; best = c }; c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < v.length) { sums(best)(j) += v(j); j += 1 }
      }
      for (c <- 0 until k if counts(c) > 0)
        cents(c) = sums(c).map(_ / counts(c))
    }
    cents
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** PQ codes (`array<tinyint>`, length m) for a vector column. */
  def encode(vec: Column, model: Model): Column =
    toColumn(PqEncode(expression(vec), model))

  /** ADC lookup table (`array<double>`, length m·ksub) for a query. */
  def lut(vec: Column, model: Model): Column =
    toColumn(PqLut(expression(vec), model))

  /** ADC score of a candidate's codes against a query's LUT. */
  def adcScore(lutCol: Column, codes: Column, model: Model): Column =
    toColumn(PqAdcScore(expression(lutCol), expression(codes), model.ksub))

  /** Approximate cosine top-k with exact rerank: ADC-score the encoded
    * corpus against broadcast query LUTs, shortlist `shortlist` ids per
    * query, fetch exact vectors ONLY for shortlisted candidates (a
    * broadcast semi-join back against the corpus scan), rerank by exact
    * cosine. With shortlist recall 1 (gated in specs on the planted
    * corpus), output equals brute force.
    */
  def topK(corpus: DataFrame, corpusId: String, corpusVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           model: Model, k: Int = 10, shortlist: Int = 50): DataFrame = {
    val enc = corpus.select(col(corpusId).as("neighbor_id"),
      encode(col(corpusVec), model).as("__code"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      lut(col(queryVec), model).as("__lut")))
    val cands = enc.crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__adc", adcScore(col("__lut"), col("__code"), model))
      .withColumn("__arank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("__adc").desc, col("neighbor_id"))))
      .filter(col("__arank") <= shortlist)
      .select("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("__qv")))
    corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .join(broadcast(cands), Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }
}

/** PQ codes of a float/double vector (see [[graft.plans.ExprKernels.pqEncode]]);
  * codebooks ride the expression and reach generated code as a reference
  * object, so encoding keeps whole-stage codegen.
  */
case class PqEncode(child: Expression, model: PqIndex.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true // wrong-dim vectors yield null
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    graft.plans.ExprKernels.pqEncode(input.asInstanceOf[ArrayData], isFloat,
      model.codebooks, model.m, model.ksub, model.dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", model.codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqCodes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.plans.ExprKernels.pqEncode($c, $isFloat, $cb,
         |    ${model.m}, ${model.ksub}, ${model.dsub});
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
}

/** ADC lookup table of a query vector (see [[graft.plans.ExprKernels.pqLut]]). */
case class PqLut(child: Expression, model: PqIndex.Model)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true // wrong-dim vectors yield null
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_lut expects array<float|double>, got ${other.sql}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    graft.plans.ExprKernels.pqLut(input.asInstanceOf[ArrayData], isFloat,
      model.codebooks, model.m, model.ksub, model.dsub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", model.codebooks, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("pqLut")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.plans.ExprKernels.pqLut($c, $isFloat, $cb,
         |    ${model.m}, ${model.ksub}, ${model.dsub});
         |${ev.isNull} = $tmp == null;
         |if (!${ev.isNull}) ${ev.value} = $tmp;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

/** ADC score: Σ LUT[sub·ksub + code_sub] (see
  * [[graft.plans.ExprKernels.pqAdcScore]]) — m array reads per candidate.
  */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<double>, array<tinyint>), got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    graft.plans.ExprKernels.pqAdcScore(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ExprKernels.pqAdcScore($a, $b, $ksub);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : PqAdcScore = copy(left = l, right = r)
}
