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
                 salts: Int = 16, joinType: String = "inner",
                 uniqueCol: Option[String] = None): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salt = "__graft_salt"
    val saltedLarge = large.withColumn(salt, scatter(salts, uniqueCol))
    val replicated = small.withColumn(salt,
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLarge.join(replicated, keys :+ salt, joinType).drop(salt)
  }

  /** The scatter expression assigning each large-side row a salt.
    *
    * With `uniqueCol` (a column whose values are unique per row — a pkey,
    * a doc id): salt = pmod(xxhash64(uniqueCol), salts). Fully
    * DETERMINISTIC — the same row gets the same salt on any retry of any
    * stage — and still spreads identical hot-key payloads because the
    * unique column differs. This is the form to use whenever the input is
    * a shuffle/aggregation output.
    *
    * Without it: per-row ORDINAL scatter via monotonically_increasing_id
    * (= partitionId << 33 | rowOrdinal), because a row-CONTENT hash sends
    * fully identical rows (the most common hot-key shape) to ONE salt,
    * defeating the mitigation. The ordinal is deterministic for a fixed
    * SCAN partitioning (retries re-read the same file split in the same
    * order — the argument Merge uses for its row ids), but NOT when the
    * input is itself a shuffle output: reduce-side fetch order varies
    * across attempts, so a fetch-failure recompute can re-salt rows and
    * double-count/drop them mid-aggregate. If the input has been shuffled
    * and no unique column exists, materialize the input first (cache or
    * write) or mint ids upstream.
    */
  private def scatter(salts: Int, uniqueCol: Option[String]) =
    uniqueCol match {
      case Some(c) => pmod(xxhash64(col(c)), lit(salts.toLong))
      case None => pmod(monotonically_increasing_id(), lit(salts.toLong))
    }

  /** Two-phase skew-safe aggregation: partial-aggregate on (keys, salt)
    * first, then finish on keys — the hot key's map-side state spreads
    * over `salts` tasks. `partials` lists (aggExpr, alias) for the salted
    * phase; `finals` recombines them (e.g. sum of partial counts).
    * For algebraic aggregates Spark's own partial aggregation already
    * does this; use when a custom/expensive aggregate needs the split.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                uniqueCol: Option[String] = None)(
      partials: Seq[(org.apache.spark.sql.Column, String)],
      finals: Seq[(org.apache.spark.sql.Column, String)]): DataFrame = {
    require(salts >= 1)
    val salt = "__graft_salt"
    // same scatter rules as saltedJoin: pass uniqueCol for a fully
    // deterministic spread when the input is a shuffle output
    val salted = df.withColumn(salt, scatter(salts, uniqueCol))
    val partial = salted.groupBy((keys :+ salt).map(col): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, a) => c.as(a) }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(finals.head._1.as(finals.head._2),
        finals.tail.map { case (c, a) => c.as(a) }: _*)
  }
}
