package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a sparse (BM25) and a
  * dense (embedding cosine) ranking of the same corpus, the standard
  * recipe modern RAG/search stacks run because the two legs fail
  * differently (lexical match vs semantic match).
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  *
  *   RRF(d) = Σ_legs 1 / (k0 + rank_leg(d))
  *
  * over the UNION of the legs' top-k lists; a document absent from a
  * leg contributes 0 for that leg. RRF needs no score calibration
  * between legs — only ranks — which is why it is the robust default
  * over weighted score sums.
  *
  * Scale shape: each leg is already a top-k list (the expensive corpus
  * work happened inside the leg), so fusion is join-FREE — the legs
  * union (no shuffle), one hash aggregate pivots per-leg ranks onto
  * one row per id (a single shuffle of Σ_legs k tagged 24-byte rows,
  * map-side combined), and the final cut is an order-by-limit. A
  * full-outer join formulation would force an n-way sort-merge
  * cascade (full outer cannot broadcast); the union-pivot shape adds
  * legs for one union branch each.
  */
object Fusion {

  /** Fuse named ranked lists by RRF. Each leg is `(name, df, idCol,
    * rankCol)` where `rankCol` is 1-based within that leg. Returns
    * `(outIdCol, rank_<name>... , rrf)` — the per-leg ranks kept
    * (nullable) so a consumer can see WHY a document surfaced.
    *
    * Determinism: ranks pivot onto one row per id (`max(when)` over
    * at most one non-null value per leg — order-free), then the score
    * adds the legs' `1/(k0+rank)` terms in the GIVEN leg order (pure
    * double arithmetic, identical in any engine); `round(6)` pins the
    * printed form; ties break by id.
    */
  def rrfFuse(legs: Seq[(String, DataFrame, String, String)],
              outIdCol: String, k0: Int = 60, k: Int = 10): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k0 >= 1, s"need k0 >= 1, got $k0")
    require(k >= 1, s"need k >= 1, got $k")
    val names = legs.map(_._1)
    require(names.distinct.size == names.size,
      s"duplicate leg names: ${names.mkString(", ")}")
    val tagged = legs.zipWithIndex.map { case ((_, df, idCol, rankCol), i) =>
      df.select(col(idCol).cast("long").as(outIdCol),
        lit(i).as("__leg"), col(rankCol).cast("long").as("__rank"))
    }
    val pivots = names.zipWithIndex.map { case (n, i) =>
      max(when(col("__leg") === i, col("__rank"))).as(s"rank_$n")
    }
    val pivoted = tagged.reduce(_.unionByName(_))
      .groupBy(col(outIdCol))
      .agg(pivots.head, pivots.tail: _*)
    val score: Column = names
      .map(n => coalesce(lit(1.0) / (lit(k0.toDouble) + col(s"rank_$n")),
        lit(0.0)))
      .reduce(_ + _)
    pivoted
      .select(col(outIdCol) +: names.map(n => col(s"rank_$n")) :+
        round(score, 6).as("rrf"): _*)
      .orderBy(col("rrf").desc, col(outIdCol))
      .limit(k)
  }
}
