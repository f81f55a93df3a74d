package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest-neighbor search: vectors are
  * assigned to their nearest coarse centroid; a query probes only the
  * `nprobe` closest cells, so the corpus is never cross-joined.
  *
  * Training is a small deterministic k-means (k-means++ seeding + Lloyd)
  * over a driver-collected sample — the standard IVF recipe: coarse
  * quantizers are trained on a sample offline, then assignment is a pure
  * per-row expression that scales with the corpus. The probe join
  * shuffles on cell id, and cells are ~|corpus|/k rows, so query cost is
  * `nprobe/k` of brute force.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
    def dim: Int = if (centroids.isEmpty) 0 else centroids(0).length
  }

  /** Deterministic k-means over a sample of `df`'s vector column (cosine
    * geometry: vectors are L2-normalized before training and centroids
    * re-normalized each iteration — spherical k-means).
    */
  def fit(df: DataFrame, vecCol: String, k: Int,
          sampleSize: Int = 10000, iters: Int = 10, seed: Long = 42L): Model = {
    val rows = BoundedSample.rows(df, vecCol, sampleSize, seed)
    val sample: Array[Array[Double]] = rows.map { r =>
      normalizeArr(r.getSeq[Number](0).map(_.doubleValue).toArray)
    }
    require(sample.length >= k, s"sample (${sample.length}) smaller than k=$k")
    val rnd = new scala.util.Random(seed)

    // k-means++ seeding
    val centroids = new Array[Array[Double]](k)
    centroids(0) = sample(rnd.nextInt(sample.length)).clone()
    val d2 = Array.fill(sample.length)(Double.MaxValue)
    for (c <- 1 until k) {
      var i = 0
      while (i < sample.length) {
        val d = sqDist(sample(i), centroids(c - 1))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      val total = d2.sum
      var target = rnd.nextDouble() * total
      var pick = 0
      while (pick < sample.length - 1 && target > d2(pick)) {
        target -= d2(pick); pick += 1
      }
      centroids(c) = sample(pick).clone()
    }

    // Lloyd iterations (spherical)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var j = 0
        while (j < v.length) { sums(c)(j) += v(j); j += 1 }
      }
      for (c <- 0 until k if counts(c) > 0)
        centroids(c) = normalizeArr(sums(c).map(_ / counts(c)))
    }
    Model(centroids)
  }

  private def normalizeArr(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }
  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }
  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bd = Double.MaxValue; var c = 0
    while (c < cs.length) { val d = sqDist(v, cs(c)); if (d < bd) { bd = d; best = c }; c += 1 }
    best
  }

  /** Cell assignment for a vector column (nearest centroid by cosine). */
  def assign(vec: Column, model: Model): Column =
    toColumn(NearestCentroids(expression(vec), model.centroids, 1))(0)

  /** The `nprobe` nearest cells for a query vector, as array<int>. */
  def probeCells(vec: Column, model: Model, nprobe: Int): Column =
    toColumn(NearestCentroids(expression(vec), model.centroids, nprobe))

  /** Approximate cosine top-k: corpus rows in the query's `nprobe` nearest
    * cells are ranked. Shuffles on cell id; the broadcast query side is
    * exploded nprobe-fold, the corpus is scanned once.
    */
  // ---- persisted index (build once, serve many) -----------------------

  private val centroidsProp = "graft.ivf.centroids"

  private def encodeCentroids(model: Model): String =
    model.centroids.map(_.mkString(",")).mkString(";")

  private def decodeCentroids(s: String): Model =
    Model(s.split(";").map(_.split(",").map(java.lang.Double.parseDouble)))

  /** Persist the routed corpus as a CELL-PARTITIONED managed table —
    * the FAISS "inverted lists" layout expressed as table storage:
    * every row carries its assigned cell, the table partitions by it,
    * and the per-file min/max stats turn a cell predicate into whole-
    * partition pruning, so serving reads ~nprobe/k of the corpus FROM
    * DISK instead of scanning it. The centroids ride in the table
    * properties (k·dim doubles — kilobytes), so [[load]] reconstructs
    * the full index from the path alone. Build once, query many — the
    * shape a 100 TB embedding corpus actually needs, where re-routing
    * per query batch would be the dominant cost.
    */
  def persist(corpus: DataFrame, idCol: String, vecCol: String,
              model: Model, location: String): graft.tables.ManagedTable = {
    // parquet reads arrays back with containsNull=true; log the schema
    // that way up front so the reopened table casts cleanly
    val vecT = corpus.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(et, containsNull = true)
      case other => other
    }
    graft.tables.ManagedTable.create(
      corpus.select(col(idCol), col(vecCol).cast(vecT).as(vecCol),
        assign(col(vecCol), model).as("cell")),
      location, partitionBy = Seq("cell"),
      properties = Map(centroidsProp -> encodeCentroids(model)))
  }

  /** Incrementally add vectors to a [[persist]]ed index WITHOUT a refit
    * — the standard IVF maintenance path (FAISS `add`): each new row
    * routes to its nearest EXISTING centroid and appends into that cell
    * partition. Centroids stay frozen, so (a) already-served rankings
    * can only gain candidates, never re-shuffle cells, and (b) the
    * append is a pure scan-shaped projection + partitioned write —
    * nothing existing is read or rewritten, which is what daily
    * embedding deltas against a 100 TB index require. The cost of never
    * refitting is drift: cells fatten unevenly as the distribution
    * moves, and a fat cell serves slower (probe reads more rows).
    * Watch [[cellStats]] and refit when the imbalance crosses the
    * caller's threshold.
    */
  def append(table: graft.tables.ManagedTable, idCol: String,
             vecCol: String, rows: DataFrame): Unit = {
    val model = decodeCentroids(table.properties(centroidsProp))
    val vecT = rows.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(et, containsNull = true)
      case other => other
    }
    table.append(rows.select(col(idCol), col(vecCol).cast(vecT).as(vecCol),
      assign(col(vecCol), model).as("cell")))
  }

  /** Live rows per cell from table METADATA alone (log stats, zero data
    * scan) — the drift/balance probe behind the refit decision. Missing
    * cells (never populated) are absent from the map.
    */
  def cellStats(table: graft.tables.ManagedTable): Map[Int, Long] =
    table.partitionRowCounts.map { case (k, n) =>
      require(k.nonEmpty && k.head._1 == "cell",
        s"not an IVF cell-partitioned table: partition key $k")
      k.head._2.toInt -> n
    }

  /** Reopen a [[persist]]ed index: (table, model). */
  def load(spark: org.apache.spark.sql.SparkSession,
           location: String): (graft.tables.ManagedTable, Model) = {
    val t = graft.tables.ManagedTable.forPath(spark, location)
    val enc = t.properties.getOrElse(centroidsProp,
      throw new IllegalArgumentException(
        s"$location is not an IVF index (missing $centroidsProp)"))
    (t, decodeCentroids(enc))
  }

  /** Serve cosine top-k from a [[persist]]ed index: the distinct probe
    * cells of the query batch (Q·nprobe ints — the driver-side "query
    * planning" step every ANN server runs) become a pruned read that
    * skips every unprobed partition's files; the cell column comes from
    * storage, so corpus vectors are neither re-routed nor re-scanned.
    * Ranking matches [[topK]] exactly.
    */
  def topKPersisted(table: graft.tables.ManagedTable, idCol: String,
                    vecCol: String, queries: DataFrame, queryId: String,
                    queryVec: String, k: Int = 10,
                    nprobe: Int = 2): DataFrame = {
    val model = decodeCentroids(table.properties(centroidsProp))
    val probed = queries
      .select(explode(probeCells(col(queryVec), model, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).sorted
    require(probed.nonEmpty, "no probe cells — empty query batch?")
    val pruned = table.toDFWhere(
      probed.mkString("cell IN (", ",", ")"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("__qv"),
      explode(probeCells(col(queryVec), model, nprobe)).as("cell")))
    pruned.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col("cell"))
      .join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }

  def topK(corpus: DataFrame, corpusId: String, corpusVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           model: Model, k: Int = 10, nprobe: Int = 2): DataFrame = {
    val c = corpus.select(col(corpusId).as("neighbor_id"),
      col(corpusVec).as("__cv"), assign(col(corpusVec), model).as("__cell"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("__qv"),
        explode(probeCells(col(queryVec), model, nprobe)).as("__cell")))
    c.join(q, Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cosine"), 4).as("cosine"))
  }
}

/** The `nprobe` nearest centroids (by dot product against the L2-normalized
  * centroids — cosine order) of a float/double vector, as array<int>.
  * One tight loop per row; centroids ride inside the expression (and reach
  * generated code via a codegen reference object, so the assignment stage
  * keeps whole-stage codegen).
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = {
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids expects array<float|double>, got ${other.sql}")
    }
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    graft.plans.ExprKernels.nearestCentroids(
      input.asInstanceOf[ArrayData], centroids, nprobe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ExprKernels.nearestCentroids($c, $cents, $nprobe, $isFloat);")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroids =
    copy(child = c)
}
