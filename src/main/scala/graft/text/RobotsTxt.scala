package graft.text

/** robots.txt evaluation (RFC 9309, the public Robots Exclusion
  * Protocol) — the crawl-pipeline gate between outlink extraction and
  * the frontier: given a site's robots.txt body and a target path, may
  * `agent` fetch it?
  *
  * Semantics implemented (all from the RFC + the original 1994
  * convention it codifies):
  *  - groups: consecutive `User-agent:` lines share the rule block that
  *    follows; group selection picks the LONGEST user-agent token that
  *    is a case-insensitive prefix of `agent`, falling back to the `*`
  *    group; no matching group ⇒ allowed.
  *  - rules: `Allow:` / `Disallow:` path patterns with `*` wildcards
  *    and a `$` end anchor, matched against the percent-path; the
  *    MOST-SPECIFIC (longest-pattern) match wins, `allow` beating
  *    `disallow` on equal length. An empty `Disallow:` value matches
  *    nothing (allow all) — the classic "blank disallow" rule.
  *  - comments (`#` to end of line) and unknown directives (crawl-delay,
  *    sitemap, ...) are ignored; directive names are case-insensitive.
  *
  * Parsing is memoized per task through a small bounded cache keyed on
  * the robots body (a corpus carries one body per domain repeated
  * across thousands of rows, so the amortized per-row cost is the rule
  * scan, not the parse).
  */
object RobotsTxt {

  final case class Rule(allow: Boolean, pattern: String)

  /** One parsed robots.txt: user-agent tokens (lowercased) → rules. */
  final case class Robots(groups: Seq[(Seq[String], Seq[Rule])]) {
    /** The rule block for `agent`: longest matching UA token wins,
      * `*` as the fallback. RFC 9309 §2.2.1: "crawlers MUST merge the
      * groups" that match the same user-agent — real robots.txt files
      * repeat `User-agent: *` blocks, so ALL groups whose best token
      * ties the winning length are concatenated (and all `*` groups
      * when falling back), not just the first.
      */
    def rulesFor(agent: String): Seq[Rule] = {
      val a = agent.toLowerCase(java.util.Locale.ROOT)
      var bestLen = -1
      groups.foreach { case (uas, _) =>
        uas.foreach { ua =>
          if (ua != "*" && a.startsWith(ua) && ua.length > bestLen)
            bestLen = ua.length
        }
      }
      if (bestLen >= 0) {
        groups.collect {
          case (uas, rules)
              if uas.exists(ua =>
                ua != "*" && ua.length == bestLen && a.startsWith(ua)) =>
            rules
        }.flatten
      } else {
        groups.collect { case (uas, rules) if uas.contains("*") => rules }.flatten
      }
    }
  }

  def parse(body: String): Robots = {
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var inUaRun = false // consecutive user-agent lines share one group
    body.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
              inUaRun = true
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            inUaRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value)
          // an empty Disallow: matches nothing — drop it (allow-all)
          case _ => inUaRun = false // crawl-delay, sitemap, unknown
        }
      }
    }
    Robots(groups.map { case (uas, rules) => (uas.toSeq, rules.toSeq) }.toSeq)
  }

  /** `pattern` matches `path` from the start, `*` spanning any run,
    * `$` (only meaningful at pattern end) anchoring to the path end.
    * Iterative greedy-with-backtrack — no regex compilation per row.
    */
  private[text] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val pn = pat.length
    val n = path.length
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < n) {
      if (pi < pn && pat.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (pi < pn && pat.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi + 1 }
      else return false
      // consumed the whole pattern: prefix-match succeeds unless anchored
      if (pi == pn && !anchored) return true
    }
    while (pi < pn && pat.charAt(pi) == '*') pi += 1
    pi == pn && (!anchored || si == n)
  }

  /** Effective pattern length for specificity (RFC: "most specific
    * match, measured by the LENGTH of the path pattern").
    */
  private def specificity(r: Rule): Int = r.pattern.length

  /** Is `path` fetchable for `agent` under `robots`? */
  def allowed(robots: Robots, agent: String, path: String): Boolean = {
    val rules = robots.rulesFor(agent)
    val p = if (path.isEmpty) "/" else path
    var bestLen = -1
    var bestAllow = true // no matching rule ⇒ allowed
    rules.foreach { r =>
      if (matches(r.pattern, p)) {
        val len = specificity(r)
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** The `Sitemap:` directives of a robots.txt body (RFC 9309 §2.2.4 /
    * sitemaps.org discovery: the directive is GROUP-INDEPENDENT — it
    * applies regardless of user-agent, so extraction ignores group
    * structure entirely). Returned in document order, duplicates kept
    * (the caller's frontier dedups by canonical URL like any other
    * discovered link). This is the discovery hop between the robots
    * gate and [[graft.sources.Sitemap]]: robots.txt → sitemap URLs →
    * urlset/sitemapindex → frontier.
    */
  def sitemapUrls(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    body.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim
            .equalsIgnoreCase("sitemap")) {
        val value = line.substring(colon + 1).trim
        if (value.nonEmpty) out += value
      }
    }
    out.toSeq
  }

  /** The effective `Crawl-delay` (seconds) for `agent`: the directive
    * is GROUP-SCOPED (unlike `Sitemap:`), so group selection follows
    * [[Robots.rulesFor]]'s rule — all groups whose best user-agent
    * token ties the winning length are merged and the FIRST parseable
    * crawl-delay among them wins ('*' groups as the fallback). NaN /
    * negative / unparseable values are ignored (real robots.txt files
    * carry junk here). Returns None when no matching group declares
    * one — the caller keeps its default politeness delay.
    *
    * Crawl-delay is a de-facto extension (not in RFC 9309; Yandex/Bing
    * honor it, Google ignores it) — implemented because the frontier
    * scheduler is the consumer and per-domain delays are how real
    * crawl etiquette varies.
    */
  def crawlDelay(body: String, agent: String = "*"): Option[Double] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    // group structure with crawl-delay kept per group: re-walk the
    // lines with the same run-sharing rule as parse()
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Double])]
    var inUaRun = false
    body.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer.empty[String],
                scala.collection.mutable.ArrayBuffer.empty[Double]))
              inUaRun = true
            }
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
          case "crawl-delay" =>
            inUaRun = false
            if (groups.nonEmpty) {
              val d = try value.toDouble catch { case _: Throwable => -1.0 }
              if (!d.isNaN && !d.isInfinite && d >= 0) groups.last._2 += d
            }
          case _ => inUaRun = false
        }
      }
    }
    var bestLen = -1
    groups.foreach { case (uas, _) =>
      uas.foreach { ua =>
        if (ua != "*" && a.startsWith(ua) && ua.length > bestLen)
          bestLen = ua.length
      }
    }
    val selected =
      if (bestLen >= 0)
        groups.collect {
          case (uas, ds)
              if uas.exists(ua =>
                ua != "*" && ua.length == bestLen && a.startsWith(ua)) =>
            ds
        }.flatten
      else groups.collect { case (uas, ds) if uas.contains("*") => ds }
        .flatten
    selected.headOption
  }

  /** [[crawlDelay]] boxed for the codegen path (null = no directive). */
  def crawlDelayBoxed(body: org.apache.spark.unsafe.types.UTF8String,
                      agent: String): java.lang.Double =
    crawlDelay(body.toString, agent)
      .map(java.lang.Double.valueOf).orNull

  /** [[sitemapUrls]] in the Catalyst wire types — the codegen entry the
    * `robots_sitemaps` expression calls per row.
    */
  def sitemapUrlsData(body: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sitemapUrls(body.toString).map(
        org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])

  // bounded PER-THREAD parse memo: a corpus repeats one body per domain
  // across many rows, so the amortized per-row cost is the rule scan.
  // ThreadLocal (one LRU per executor core) rather than a shared
  // synchronized map — accessOrder=true mutates on get, so even cache
  // HITS would take the monitor and serialize all codegen threads of
  // the task JVM on one lock. Worst case is a parse per thread per
  // domain — still O(domains × cores) parses per JVM, amortized away.
  private val cache =
    new ThreadLocal[java.util.LinkedHashMap[String, Robots]] {
      override def initialValue(): java.util.LinkedHashMap[String, Robots] =
        new java.util.LinkedHashMap[String, Robots](64, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, Robots]): Boolean = size() > 256
        }
    }

  def allowedCached(body: String, agent: String, path: String): Boolean = {
    val c = cache.get()
    var robots = c.get(body)
    if (robots == null) { robots = parse(body); c.put(body, robots) }
    allowed(robots, agent, path)
  }
}
