package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for extreme hot keys.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense and needs no code. Manual
  * salting still matters in two cases AQE cannot fix: (a) a sort-merge
  * join where ONE key holds a double-digit share of all rows — AQE can
  * split the partition but every split still collides with the same
  * build-side rows; (b) aggregations upstream of the join where the
  * hot key's partial state overflows one task.
  */
object Skew {

  /** Skew-safe equi-join of a LARGE frame against a SMALL one on `keys`:
    * the large side scatters every row into one of `salts` sub-keys (by
    * row hash, deterministic), the small side is replicated `salts`
    * times, and the join key becomes (keys, salt) — so a hot key's rows
    * spread over `salts` tasks instead of one. Inner/left joins (the
    * shapes where the large side drives the output).
    *
    * Cost model: small side is duplicated `salts`× (it must be
    * broadcast-scale anyway — if it were large you'd bucket, not salt),
    * large side shuffles once on the salted key. Result equals
    * `large.join(small, keys, joinType)` row-for-row.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salt = "__graft_salt"
    // per-row ORDINAL scatter, not a row-content hash: fully identical
    // rows (the most common hot-key shape) all hash to ONE salt, which
    // defeats the mitigation entirely. monotonically_increasing_id is
    // (partitionId << 33 | rowOrdinal), so pmod round-robins consecutive
    // rows across salts regardless of content, and is deterministic for a
    // fixed scan partitioning (retries re-scan the same partition in the
    // same order — the same argument Merge uses for its row ids).
    val saltedLarge = large.withColumn(salt,
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicated = small.withColumn(salt,
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLarge.join(replicated, keys :+ salt, joinType).drop(salt)
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (keys, salt)
    * first, then finish on keys — the hot key's map-side state spreads
    * over `salts` tasks. `partials` lists (aggExpr, alias) for the salted
    * phase; `finals` recombines them (e.g. sum of partial counts).
    * For algebraic aggregates Spark's own partial aggregation already
    * does this; use when a custom/expensive aggregate needs the split.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      partials: Seq[(org.apache.spark.sql.Column, String)],
      finals: Seq[(org.apache.spark.sql.Column, String)]): DataFrame = {
    require(salts >= 1)
    val salt = "__graft_salt"
    // ordinal scatter for the same reason as saltedJoin: identical rows
    // must still spread across salts
    val salted = df.withColumn(salt,
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val partial = salted.groupBy((keys :+ salt).map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, a) => c.as(a) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head._1.as(finals.head._2),
        finals.tail.map { case (c, a) => c.as(a) }: _*)
  }
}
