package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the step after
  * `html_links → canonicalize_url → registrable_domain →
  * robots_allowed → domain_cap`: order the surviving fetches per
  * registrable domain and space them a politeness delay apart (the
  * per-host rate rule every polite crawler implements; RFC 9309 leaves
  * the rate to the crawler, and one lane per registrable domain is the
  * standard conservative choice).
  *
  * Each row gets:
  *  - `domain`       — its registrable domain (the politeness lane);
  *  - `fetch_order`  — its 0-based position within the lane, ordered by
  *    a seeded hash of the URL (url as tiebreaker): a stable
  *    pseudo-random order, so one site's deep pages don't fetch in path
  *    order and reruns schedule identically;
  *  - `scheduled_ms` — `fetch_order × delayMs`, the earliest polite
  *    fetch offset within the lane.
  *
  * URLs with no registrable domain (relative links, malformed hosts)
  * share the null lane — filter or resolve them upstream.
  *
  * Scale shape: one shuffle on the domain; the rank window
  * parallelizes across lanes (a frontier has orders of magnitude more
  * domains than cores, and a lane's row count is already bounded by
  * [[Sampling.capPerGroup]] upstream). `portable = true` uses the md5
  * hash form an external engine replays exactly.
  */
object Frontier {

  def schedule(df: DataFrame, urlCol: String, delayMs: Long = 1000L,
               seed: Long = 42L, portable: Boolean = false,
               suffixRules: Seq[String] =
                 graft.plans.RegistrableDomain.DefaultRules): DataFrame = {
    require(delayMs >= 0, s"need delayMs >= 0, got $delayMs")
    val h: Column =
      if (portable) Sampling.portableHash(Seq(col(urlCol)), seed.toString)
      else Sampling.fastHash(Seq(col(urlCol)), seed)
    val w = Window.partitionBy(col("domain"))
      .orderBy(h.asc, col(urlCol).asc)
    df.withColumn("domain",
        graft.plans.expressions.registrable_domain(col(urlCol), suffixRules))
      .withColumn("fetch_order", (row_number().over(w) - 1).cast("long"))
      .withColumn("scheduled_ms", col("fetch_order") * delayMs)
  }

  /** [[schedule]] honoring each domain's OWN politeness rate: rows
    * carry a nullable crawl-delay seconds column (the
    * `robots_crawl_delay` extraction over that domain's robots.txt),
    * and the lane spacing becomes `ceil(delaySeconds × 1000)` ms —
    * `defaultDelayMs` where the site declares none. Same one-shuffle
    * shape; the delay is a per-row value so no second join is needed
    * (the robots body rode the row from the fetch that produced it,
    * which is how a real frontier sees it).
    */
  def scheduleWithDelays(df: DataFrame, urlCol: String,
                         delaySecondsCol: String,
                         defaultDelayMs: Long = 1000L,
                         seed: Long = 42L, portable: Boolean = false,
                         suffixRules: Seq[String] =
                           graft.plans.RegistrableDomain.DefaultRules)
      : DataFrame = {
    require(defaultDelayMs >= 0, s"need defaultDelayMs >= 0")
    val h: Column =
      if (portable) Sampling.portableHash(Seq(col(urlCol)), seed.toString)
      else Sampling.fastHash(Seq(col(urlCol)), seed)
    val w = Window.partitionBy(col("domain"))
      .orderBy(h.asc, col(urlCol).asc)
    val delayMs = coalesce(
      ceil(col(delaySecondsCol) * 1000).cast("long"), lit(defaultDelayMs))
    df.withColumn("domain",
        graft.plans.expressions.registrable_domain(col(urlCol), suffixRules))
      .withColumn("fetch_order", (row_number().over(w) - 1).cast("long"))
      .withColumn("delay_ms", delayMs)
      .withColumn("scheduled_ms", col("fetch_order") * col("delay_ms"))
  }

  /** Freshness-driven RECRAWL ordering — the signal [[schedule]]'s
    * pseudo-random lane order deliberately lacks: once a frontier has
    * fetched everything once, real crawlers re-visit by CONTENT AGE
    * (sitemap `<lastmod>` is exactly this signal — Cho &
    * Garcia-Molina 2003's freshness-driven refresh policy, and what
    * the sitemaps protocol exists to feed). Each row gets:
    *
    *  - `age_days`    — whole days from `lastmodCol` to the caller's
    *    `asOf` date (a pinned literal, NEVER the wall clock — reruns
    *    must schedule identically), floored at 0 for future-dated
    *    lastmods; rows with NO lastmod get `defaultAgeDays` (unknown
    *    freshness is treated as stale-ish, the conservative refresh
    *    choice);
    *  - `fresh_score` — `rank_fp × (1 + age_days)`, all-BIGINT: the
    *    cross-domain dispatch key combining the domain's PageRank
    *    importance with staleness (importance × age is the canonical
    *    refresh-priority product);
    *  - `fresh_order` — 0-based position WITHIN the politeness lane,
    *    stalest first (age desc, url asc): inside one lane the domain
    *    rank is constant, so staleness IS the lane order.
    *
    * The global dispatch order is deliberately NOT materialized as a
    * row_number: a global window over corpus-mass URLs is a
    * single-partition sort — the dispatcher orders by
    * (`fresh_score` desc) via a range-partitioned sort at write time,
    * or interleaves lanes by score, both scale-safe. One shuffle on
    * the domain key, integer arithmetic throughout (engine-portable,
    * deterministic under any partitioning).
    */
  def freshOrder(df: DataFrame, urlCol: String, domainCol: String,
                 lastmodCol: String, rankFpCol: String, asOf: String,
                 defaultAgeDays: Long = 30L): DataFrame = {
    require(defaultAgeDays >= 0,
      s"need defaultAgeDays >= 0, got $defaultAgeDays")
    val asOfD = lit(java.sql.Date.valueOf(asOf))
    // explicit null branch: greatest() SKIPS nulls (greatest(null, 0)
    // is 0, not null), so a coalesce-after-greatest would silently
    // treat unknown lastmod as perfectly fresh — the opposite of the
    // conservative default
    val age = when(col(lastmodCol).isNull, lit(defaultAgeDays))
      .otherwise(greatest(datediff(asOfD, col(lastmodCol)).cast("long"),
        lit(0L)))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("age_days").desc, col(urlCol).asc)
    df.withColumn("age_days", age)
      .withColumn("fresh_score",
        col(rankFpCol) * (lit(1L) + col("age_days")))
      .withColumn("fresh_order", (row_number().over(w) - 1).cast("long"))
  }

  /** The GLOBAL dispatch order [[freshOrder]]'s scaladoc promises —
    * materialized the scale-safe way, as a range-partitioned sort at
    * write time rather than a global window: the dispatcher hands
    * fetches out highest-`fresh_score` first across ALL lanes, and
    * that total order must exist WITHOUT ever putting corpus mass in
    * one partition.
    *
    * Shape (the classic distributed-ranking construction):
    *  1. `repartitionByRange(shards, score desc, tie asc)` +
    *     `sortWithinPartitions` — shard i holds keys strictly before
    *     shard i+1 in dispatch order (and a (score, tie) pair lands in
    *     exactly one shard, so equal boundary keys cannot split), each
    *     shard sorted locally — ONE corpus-mass shuffle;
    *  2. `rdd.zipWithIndex` attaches the global ordinal: a count pass
    *     over per-shard sizes (O(shards) driver state), then per-row
    *     `shard offset + local index` — both passes read the SAME
    *     shuffle files because RDD-level shuffle reuse is by object
    *     identity, so the corpus exchange is computed once.
    *
    * Because `tieCol` must be unique (require()d by totality of the
    * oracle's replay), the resulting order is a total order identical
    * to `row_number() OVER (ORDER BY score DESC, tie ASC) − 1`
    * regardless of where the sampled range boundaries land — boundary
    * placement moves rows between shards, never reorders them. Shard
    * ids are NOT part of the verified contract for exactly that
    * reason (they are sampling-dependent); the global ordinal is.
    *
    * Returns the frame plus `dispatch_order` (0-based global rank).
    * Asserts that the sort really fanned out — range-boundary
    * sampling may legitimately produce FEWER shards than asked on
    * tiny/skewed input (fewer distinct sampled boundaries than
    * requested partitions), but a collapse to ONE partition is the
    * exact global-single-partition-sort hazard this exists to dodge
    * and fails loud.
    */
  def dispatchOrder(df: DataFrame, scoreCol: String, tieCol: String,
                    shards: Int): DataFrame = {
    require(shards > 1, s"need shards > 1, got $shards — a one-shard " +
      "dispatch is the global single-partition sort this avoids")
    val ord = Seq(col(scoreCol).desc, col(tieCol).asc)
    // ONE corpus-mass shuffle, COMPUTED ONCE: the classic distributed
    // ranking construction — range-shuffle + within-shard sort, then
    // `zipWithIndex` attaches the global ordinal (a count pass over
    // per-shard sizes, then per-row offsets). This deliberately drops
    // to the RDD for the ordinal: RDD-level shuffle reuse is by OBJECT
    // identity, so the count pass and the index pass read the same
    // shuffle files. The pure-DataFrame alternative (ordinal from
    // monotonically_increasing_id + a broadcast shard-count manifest)
    // COMPUTED THE CORPUS EXCHANGE TWICE — per-consumer column pruning
    // made the manifest's exchange subtree canonically different from
    // the stream's, so neither planner-level exchange reuse nor AQE
    // stage reuse fired (found by reading the executed adaptive plan,
    // not the static explain). A terminal write-time step, so leaving
    // whole-stage codegen at the boundary costs one row conversion.
    val sorted = df.repartitionByRange(shards, ord: _*)
      .sortWithinPartitions(ord: _*)
    val rdd = sorted.rdd // ONE RDD object — both jobs share its shuffle
    // no-single-partition assertion: the range exchange must actually
    // fan out (boundary sampling can produce FEWER shards than asked
    // on tiny/skewed input — legitimate — but the plan must never
    // collapse to 1, and never exceed what was asked)
    val nParts = rdd.getNumPartitions
    require(nParts > 1 && nParts <= shards,
      s"range-partitioned dispatch sort ran at $nParts partitions, " +
        s"asked $shards — the write-time sort is not parallel")
    val withIdx = rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(withIdx,
      org.apache.spark.sql.types.StructType(sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("dispatch_order",
          org.apache.spark.sql.types.LongType, nullable = false)))
  }
}
