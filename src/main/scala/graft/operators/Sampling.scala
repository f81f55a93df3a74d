package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic sampling and per-group caps for corpus curation.
  *
  * `df.sample()` is NOT reproducible at scale: its output depends on the
  * partitioning of the input (a retry, a different file split, or a
  * repartition upstream changes the sample). Training-data pipelines need
  * the opposite — a sample that is a pure function of each row's key, so
  * re-runs, backfills, and incremental appends agree on which rows are in.
  */
object Sampling {

  /** 60-bit deterministic key hash: the first 15 hex chars of
    * md5(keys ⊕ seed), parsed as an integer. Slower than [[fastHash]] but
    * portable — any engine with `md5` computes the identical value, which
    * is how the DuckDB oracle verifies the sampled-set membership exactly
    * (`CAST(concat('0x', substr(md5(k || chr(1) || seed), 1, 15)) AS
    * BIGINT)`). Keys must be non-null (`concat_ws` skips nulls, which
    * would alias distinct key tuples).
    */
  def portableHash(keys: Seq[Column], seed: String): Column =
    conv(substring(md5(concat_ws("\u0001", keys :+ lit(seed): _*)), 1, 15),
      16, 10).cast(LongType)

  /** xxhash64 key hash — codegen'd, no string materialization; the
    * default for production use where cross-engine parity isn't needed.
    */
  def fastHash(keys: Seq[Column], seed: Long): Column =
    xxhash64(keys :+ lit(seed): _*)

  /** Keep a row iff `hash(keys, seed) mod denominator < numerator` — a
    * deterministic Bernoulli(numerator/denominator) sample stratified by
    * nothing but the key hash. Pure per-row filter: no shuffle, pushes
    * into the scan, and two tables sampled with the same keys/seed keep
    * ALIGNED row sets (sample a join's both sides consistently).
    */
  def hashSample(df: DataFrame, keys: Seq[String], numerator: Int,
                 denominator: Int, seed: Long = 42L,
                 portable: Boolean = false): DataFrame = {
    require(denominator > 0 && numerator >= 0 && numerator <= denominator,
      s"need 0 <= numerator <= denominator, got $numerator/$denominator")
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    df.filter(pmod(h, lit(denominator.toLong)) < numerator)
  }

  /** Deterministic train/validation/test split assignment: each row gets
    * the split whose cumulative hash-bucket range contains
    * `hash(keys, seed) mod denominator` — a pure per-row function of the
    * key, so re-runs, backfills, and incremental appends land every row
    * in the SAME split forever (the property `randomSplit` lacks: its
    * assignment changes with partitioning), and two tables split with the
    * same keys/seed stay aligned. Ranges are assigned in `splits`
    * declaration order; weights must sum to `denominator` so no row is
    * unassigned. One projection, no shuffle.
    */
  def assignSplits(df: DataFrame, splits: Seq[(String, Int)],
                   denominator: Int, keys: Seq[String], seed: Long = 42L,
                   portable: Boolean = false,
                   splitCol: String = "split"): DataFrame = {
    require(denominator > 0, "denominator must be positive")
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "every split needs a positive weight")
    require(splits.map(_._2).sum == denominator,
      s"split weights ${splits.map(_._2).sum} must sum to denominator " +
        s"$denominator — a gap would leave rows unassigned")
    require(splits.map(_._1).distinct.size == splits.size,
      "duplicate split names")
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    val bucket = pmod(h, lit(denominator.toLong))
    val bounds = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assigned = splits.zip(bounds).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), upper)) =>
        when(bucket < upper, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }

  /** Per-source corpus mixing: keep each row with probability
    * `rates(group)/denominator` (falling back to `defaultNumerator` for
    * unlisted groups), deterministic per key — the "sample src_wiki at
    * 50%, src_web at 10%" step of a training-data mix. Same pure per-row
    * filter as [[hashSample]] (no shuffle, pushes into the scan, re-runs
    * and backfills agree); the rate lookup compiles to a codegen'd CASE
    * chain, which is the right shape for config-sized rate maps (use a
    * broadcast join instead if rates ever become a million-row table).
    */
  def weightedSample(df: DataFrame, groupCol: String, rates: Map[String, Int],
                     denominator: Int, defaultNumerator: Int = 0,
                     keys: Seq[String], seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(denominator > 0, "denominator must be positive")
    (rates.values.toSeq :+ defaultNumerator).foreach(n =>
      require(n >= 0 && n <= denominator,
        s"need 0 <= rate <= $denominator, got $n"))
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    val thresh = rates.toSeq.sortBy(_._1).foldLeft(
      lit(defaultNumerator.toLong)) { case (acc, (g, n)) =>
      when(col(groupCol) === g, n.toLong).otherwise(acc)
    }
    df.filter(pmod(h, lit(denominator.toLong)) < thresh)
  }

  /** Temperature-flattened corpus mixing — the multilingual `p_s ∝ W_s^α`
    * rule (mBERT/XLM-R exponential smoothing): head groups are
    * down-weighted and tail groups up-weighted by flattening each group's
    * weight mass `W_s` (e.g. total characters or tokens via `weightCol`)
    * with exponent `alpha` in [0, 1] before allocating an expected
    * `targetRows` sample across groups. `alpha = 1` degenerates to
    * proportional sampling; `alpha = 0` to uniform-per-group.
    *
    * Keep rate per group: `min(1, targetRows · W_s^α / Σ_g W_g^α / N_s)`,
    * quantized to `resolution` and applied as the same deterministic
    * per-row hash filter as [[hashSample]] — re-runs, backfills, and
    * retries agree on the kept set. Group statistics stay in-plan (one
    * partial-agg shuffle of |groups| rows, broadcast back); the corpus
    * itself is never shuffled, and the filter sits directly over the
    * scan.
    */
  def temperatureSample(df: DataFrame, groupCol: String, weightCol: String,
                        keys: Seq[String], alpha: Double, targetRows: Long,
                        resolution: Int = 1000000, seed: Long = 42L,
                        portable: Boolean = false): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(targetRows > 0, "targetRows must be positive")
    require(resolution > 0, "resolution must be positive")
    val stats = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col(weightCol)).cast("double").as("__w"))
    // |groups| rows — a global window over the aggregate is driver-cheap
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = stats
      .withColumn("__sumpow", sum(pow(col("__w"), lit(alpha))).over(wAll))
      .withColumn("__num", floor(least(lit(1.0),
          lit(targetRows.toDouble) * pow(col("__w"), lit(alpha))
            / col("__sumpow") / col("__n")) * resolution).cast(LongType))
      .select(col(groupCol), col("__num"))
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    df.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(h, lit(resolution.toLong)) < col("__num"))
      .drop("__num")
      .select(df.columns.map(col): _*)
  }

  /** Budget-driven corpus mixing — the explicit "data recipe" step a
    * pretraining mix is specified in ("30% web, 30% code, 20% books …"
    * of a TOKEN budget, not row proportions): each group samples down to
    * its share of `totalWeight` (weight = tokens/chars via `weightCol`)
    * with keep rate `min(1, totalWeight·share_g / W_g)`, quantized to
    * `resolution` and applied as the same deterministic per-row hash
    * filter as [[hashSample]]. Groups absent from `shares` drop
    * entirely; shares are normalized (pass un-normalized ratios
    * freely); a group with less mass than its allocation keeps
    * everything — re-balancing the shortfall across the rest is the
    * caller's loop, as in published data recipes.
    *
    * Scale shape: group masses are one partial-agg shuffle of |groups|
    * rows broadcast back; the share lookup compiles to a codegen'd CASE
    * chain; the corpus itself is never shuffled and the filter sits
    * over the scan.
    */
  def tokenBudgetMix(df: DataFrame, groupCol: String, weightCol: String,
                     keys: Seq[String], shares: Map[String, Double],
                     totalWeight: Long, resolution: Int = 1000000,
                     seed: Long = 42L,
                     portable: Boolean = false): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0),
      "shares must be positive")
    require(totalWeight > 0 && resolution > 0)
    val norm = shares.values.sum
    val stats = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol)).cast("double").as("__w"))
    val share = shares.toSeq.sortBy(_._1).foldLeft(
      lit(null).cast("double")) { case (acc, (g, v)) =>
      when(col(groupCol) === g, lit(v / norm)).otherwise(acc)
    }
    // filter BEFORE least(): Spark's least() skips NULLs, so an absent
    // group's NULL share would otherwise collapse to rate 1.0
    val rates = stats
      .withColumn("__share", share)
      .filter(col("__share").isNotNull)
      .withColumn("__num", floor(least(lit(1.0),
          lit(totalWeight.toDouble) * col("__share") / col("__w")) *
        resolution).cast(LongType))
      .select(col(groupCol), col("__num"))
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    df.join(broadcast(rates), Seq(groupCol))
      .filter(pmod(h, lit(resolution.toLong)) < col("__num"))
      .drop("__num")
      .select(df.columns.map(col): _*)
  }

  /** Exact-size stratified sample: each group keeps exactly
    * `ceil(frac · N_g)` rows — the rows with the SMALLEST key hashes, so
    * the kept set is a pure function of the keys (re-runs, backfills, and
    * repartitions agree) and nested fractions telescope (the `frac = 0.1`
    * sample is a subset of the `frac = 0.2` sample, because both keep
    * hash-order prefixes). This is the guarantee [[hashSample]] lacks:
    * rate-based Bernoulli sampling only hits a stratum's target size in
    * EXPECTATION, and a small stratum (a low-resource language, a rare
    * label) can lose most or all of its rows to variance — exactly the
    * strata stratification exists to protect.
    *
    * One window pass per stratum (rank by hash, count via the same
    * partition) — strata must individually fit a task. A stratum holding
    * most of a 100 TB corpus would serialize its window task; at that
    * scale use [[stratifiedSampleApprox]], which replaces the rank with a
    * per-group hash-quantile sketch and never windows the data.
    */
  def stratifiedSample(df: DataFrame, groupCols: Seq[String], frac: Double,
                       keys: Seq[String], seed: Long = 42L,
                       portable: Boolean = false): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"need 0 < frac <= 1, got $frac")
    require(groupCols.nonEmpty, "need at least one stratum column")
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    val rank = "__graft_rank"
    val cnt = "__graft_n"
    // hash first, keys as tiebreaker: total order whenever keys are unique
    val wRank = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(h.asc +: keys.map(col(_).asc): _*)
    val wCnt = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn(rank, row_number().over(wRank))
      .withColumn(cnt, count(lit(1)).over(wCnt))
      .filter(col(rank) <= ceil(col(cnt) * lit(frac)))
      .drop(rank, cnt)
  }

  /** [[stratifiedSample]]'s scale path: the per-stratum cut point comes
    * from a `percentile_approx` sketch of the key hash at `frac` (map-side
    * partial aggregation — no per-stratum window task, so one giant
    * stratum cannot serialize the pass) and rows keep by comparing their
    * hash against the broadcast per-group threshold. Stratum sizes are
    * approximate at the boundary (sketch accuracy); determinism in the
    * keys still holds because the sketch is computed from the same
    * hash values every run. The exact-rank form remains for bounded
    * strata and oracle verification.
    */
  def stratifiedSampleApprox(df: DataFrame, groupCols: Seq[String],
                             frac: Double, keys: Seq[String],
                             seed: Long = 42L, accuracy: Int = 10000,
                             portable: Boolean = false): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"need 0 < frac <= 1, got $frac")
    require(groupCols.nonEmpty, "need at least one stratum column")
    require(accuracy > 0, "accuracy must be positive")
    val h =
      if (portable) portableHash(keys.map(col), seed.toString)
      else fastHash(keys.map(col), seed)
    val hashed = df.withColumn("__graft_h", h)
    val bounds = hashed.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col("__graft_h"), lit(frac), lit(accuracy))
        .as("__graft_bound"))
    hashed.join(broadcast(bounds), groupCols)
      .filter(col("__graft_h") <= col("__graft_bound"))
      .select(df.columns.map(col): _*)
  }

  /** Cap each group at a WEIGHT budget instead of a row count — "keep
    * each source's best documents until its token budget is spent", the
    * curation form row caps can't express (a source of ten-token
    * fragments and one of novels need very different row counts for the
    * same token mass). Rows keep while the running `weightCol` sum in
    * `orderBy` order stays ≤ `budget` — best-first, deterministic given
    * a total order (add a unique tiebreaker), and a row that would
    * cross the budget is dropped whole (no partial documents).
    *
    * Scale note: the running sum serializes each group in one task —
    * fine for config-sized group counts (sources, languages). For a
    * group holding most of the corpus, pre-cut with [[capPerGroup]]
    * (budget/min-weight rows bounds the survivors) and apply this to
    * the remainder (the composition stays exact because the row cap
    * keeps a superset of any budget-feasible prefix), or switch to the
    * sketch-based [[capWeightPerGroupApprox]], which never windows.
    */
  def capWeightPerGroup(df: DataFrame, groupCols: Seq[String],
                        orderBy: Seq[Column], weightCol: String,
                        budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val cum = "__graft_cum"
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cum, sum(col(weightCol)).over(w))
      .filter(col(cum) <= budget)
      .drop(cum)
  }

  /** WINDOW-FREE approximation of [[capWeightPerGroup]] for the
    * hot-group case the exact form documents away (one group = half the
    * corpus serializes its running sum on one task): per group, a
    * `percentile_approx` sketch splits the priority score into `bins`
    * quantile bins, one aggregation sums each bin's weight, and a tiny
    * per-group fold keeps the longest PREFIX of bins whose cumulative
    * weight fits `budget` — the kept-set boundary broadcasts back as a
    * score threshold (the [[stratifiedSampleApprox]] shape, made
    * weight-aware). Rows keep while `scoreCol` ≤ the group's boundary:
    * best-first at bin granularity.
    *
    * `scoreCol` is the ascending priority (smaller = kept first) — the
    * single-column form of the exact API's `orderBy`; negate for
    * "largest first". Guarantees: the kept weight NEVER exceeds
    * `budget` (whole bins only, so the approximation always
    * under-keeps, by at most one bin's weight plus sketch error);
    * equal scores keep or drop together (value-deterministic — ties
    * cannot straddle the cut as they can under the exact form's
    * tiebreaker). Agreement with the exact form is spec-pinned ≥ 90 %
    * at the default 64 bins.
    *
    * Scale shape: two corpus-mass hash aggregations (sketch, bin
    * weights) + two broadcast joins — no window, nothing serializes a
    * group, skew-immune. Increase `bins`/`accuracy` to tighten.
    */
  def capWeightPerGroupApprox(df: DataFrame, groupCols: Seq[String],
                              scoreCol: Column, weightCol: String,
                              budget: Long, bins: Int = 64,
                              accuracy: Int = 10000): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bins >= 2, "need at least 2 bins")
    require(groupCols.nonEmpty, "need at least one group column")
    val s = "__graft_score"
    val scored = df.withColumn(s, scoreCol.cast("double"))
    val probs = array((1 to bins).map(i => lit(i.toDouble / bins)): _*)
    val bounds = scored.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(s), probs, lit(accuracy))
        .as("__graft_bounds"))
    // bin = number of boundaries strictly below the score (ties go to
    // the LOWER bin, so equal scores always land together)
    val withBin = scored.join(broadcast(bounds), groupCols)
      .withColumn("__graft_bin",
        size(filter(col("__graft_bounds"), b => b < col(s))))
    val perBin = withBin
      .groupBy((groupCols :+ "__graft_bin").map(col): _*)
      .agg(sum(col(weightCol).cast("long")).as("__graft_w"))
    // per-group fold over ≤ `bins` rows: longest prefix fitting budget
    val thresh = perBin.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col("__graft_bin"), col("__graft_w")))).as("__bw"))
      .select(groupCols.map(col) :+
        aggregate(col("__bw"),
          struct(lit(0L).as("cum"), lit(false).as("done"),
            lit(-1).as("keep")),
          (acc, x) => {
            val cum = acc.getField("cum") + x.getField("__graft_w")
            val done = acc.getField("done") || cum > budget
            struct(cum.as("cum"), done.as("done"),
              when(!done, x.getField("__graft_bin"))
                .otherwise(acc.getField("keep")).as("keep"))
          },
          acc => acc.getField("keep")).as("__graft_keep_bin"): _*)
    withBin.join(broadcast(thresh), groupCols)
      .filter(col("__graft_bin") <= col("__graft_keep_bin"))
      .select(df.columns.map(col): _*)
  }

  /** Deterministic training-order shuffle + balanced shard assignment —
    * the step between curation and export: every row gets a `shard` in
    * `[0, shards)` and a 0-based `position` within its shard, both pure
    * functions of `(keys, seed)`. Training runs want data order
    * DECORRELATED from ingest order (adjacent crawl rows share
    * topic/time; sequential reads would feed correlated batches) yet
    * exactly reproducible across reruns — hashing gives both: `shard` =
    * routing-hash mod `shards` (balanced to ±O(√(n/shards)) without any
    * global sort), `position` = rank of an INDEPENDENTLY-salted hash
    * within the shard, keys as the tiebreaker, so within-shard order
    * carries no trace of the routing hash.
    *
    * Scale shape: one shuffle on the shard key; the per-shard rank
    * window parallelizes across shards (shard count ≈ export-file
    * count — thousands at 100 TB, far above core counts, and each
    * shard's window task holds n/shards rows by construction). With
    * `portable = true` both hashes are the md5 form an external engine
    * replays exactly.
    */
  def shuffleShards(df: DataFrame, keys: Seq[String], shards: Int,
                    seed: Long = 42L, portable: Boolean = false): DataFrame = {
    require(shards >= 1, s"need shards >= 1, got $shards")
    require(keys.nonEmpty, "need at least one key column")
    def h(salt: String): Column =
      if (portable) portableHash(keys.map(col), s"${seed}_$salt")
      else fastHash(keys.map(col), seed ^ salt.hashCode.toLong)
    val w = Window.partitionBy(col("shard"))
      .orderBy(h("order").asc +: keys.map(col(_).asc): _*)
    df.withColumn("shard", pmod(h("shard"), lit(shards.toLong)).cast("int"))
      .withColumn("position", (row_number().over(w) - 1).cast("long"))
  }

  /** At most `n` rows per group, ranked by `orderBy` — per-domain caps
    * against over-represented sources. `orderBy` MUST be a total order
    * within each group (add a unique tiebreaker column): with ties at the
    * cut the kept set would otherwise be partitioning-dependent.
    *
    * Two-phase for skew: a hot group (one domain = half the corpus) would
    * serialize a single window task. Phase 1 scatters each group's rows
    * over `salts` subtasks by row ordinal (identical rows still spread —
    * same argument as [[Skew.saltedJoin]]) and locally truncates to `n`;
    * any row below local rank `n` cannot be in the group's global top
    * `n`, so phase 2 ranks only the ≤ `salts`·`n` survivors. Exact for
    * ANY scatter assignment because `orderBy` is total.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column],
                  n: Int, salts: Int = 16): DataFrame = {
    require(n > 0, "cap must be positive")
    require(salts >= 1, "salts must be >= 1")
    val rank = "__graft_rank"
    val salt = "__graft_salt"
    val local = df
      .withColumn(salt, pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .withColumn(rank, row_number().over(
        Window.partitionBy(groupCols.map(col) :+ col(salt): _*).orderBy(orderBy: _*)))
      .filter(col(rank) <= n)
      .drop(salt, rank)
    local
      .withColumn(rank, row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)))
      .filter(col(rank) <= n)
      .drop(rank)
  }
}
