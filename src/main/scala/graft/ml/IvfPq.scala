package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF×PQ — the composed ANN index a corpus actually runs at 100 TB
  * (FAISS's IVFPQ shape, Jégou et al. 2011): a coarse quantizer routes
  * each vector to a cell, PQ codes (m bytes) stand in for the floats
  * inside every cell, and a query (a) probes only its `nprobe` nearest
  * cells, (b) ADC-scores the probed cells' CODES — never their floats —
  * to build a shortlist, then (c) reranks the shortlist by exact cosine.
  *
  * Scale shape: the float corpus is scanned once at index time (cell
  * assignment + PQ encode are sibling codegen'd expressions in one
  * projection) and never broadcast or shuffled at query time. The probe
  * is a broadcast hash join of the exploded query×cell pairs against the
  * encoded corpus — cost `nprobe/k` of a full ADC scan, compounding with
  * PQ's 32× byte-per-vector compression. The shortlist exchange carries
  * only ids (WindowGroupLimit partial top-k on both sides — pinned in
  * PlanShapeSpec for the PQ stages this reuses).
  */
object IvfPq {

  /** Coarse router + per-subspace codebooks, trained independently on
    * the same bounded sample recipe ([[IvfIndex.fit]], [[PqIndex.fit]]).
    */
  final case class Model(ivf: IvfIndex.Model, pq: PqIndex.Model)

  def fit(df: DataFrame, vecCol: String, k: Int, m: Int = 8, ksub: Int = 16,
          sampleSize: Int = 10000, iters: Int = 10, seed: Long = 42L): Model =
    Model(IvfIndex.fit(df, vecCol, k, sampleSize, iters, seed),
      PqIndex.fit(df, vecCol, m, ksub, sampleSize, iters, seed))

  /** Approximate cosine top-k: probe `nprobe` cells, ADC-shortlist
    * `shortlist` ids per query within them, exact-rerank the shortlist.
    * In a clustered regime with `shortlist` >= the probed population's
    * matching cluster and enough probes to cover it, recall is provably
    * 1.0 and output equals brute force (gated in RecallGateSpec).
    */
  def topK(corpus: DataFrame, corpusId: String, corpusVec: String,
           queries: DataFrame, queryId: String, queryVec: String,
           model: Model, k: Int = 10, nprobe: Int = 2,
           shortlist: Int = 50): DataFrame = {
    // one corpus scan: route + encode side by side, floats dropped
    val enc = corpus.select(col(corpusId).as("neighbor_id"),
      IvfIndex.assign(col(corpusVec), model.ivf).as("__cell"),
      PqIndex.encode(col(corpusVec), model.pq).as("__code"))
    // broadcast query side, exploded nprobe-fold: (query, cell, LUT)
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      PqIndex.lut(col(queryVec), model.pq).as("__lut"),
      explode(IvfIndex.probeCells(col(queryVec), model.ivf, nprobe))
        .as("__cell")))
    val cands = enc.join(q, Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__adc", PqIndex.adcScore(col("__lut"), col("__code"), model.pq))
      .withColumn("__arank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("__adc").desc, col("neighbor_id"))))
      .filter(col("__arank") <= shortlist)
      .select("query_id", "neighbor_id")
    // exact vectors fetched ONLY for the shortlist
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
