package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RobotsTxtSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# example robots
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok/
      |Disallow: /*.pdf$
      |Disallow: /tmp$
      |Crawl-delay: 10
      |Sitemap: https://x.com/sitemap.xml
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /bot-only/
      |Disallow:
      |""".stripMargin

  private val robots = RobotsTxt.parse(body)

  test("group selection: longest UA prefix wins, * is the fallback, " +
       "stacked user-agent lines share a group") {
    assert(RobotsTxt.allowed(robots, "*", "/private/x") == false)
    // graftbot's own group has no /private/ rule
    assert(RobotsTxt.allowed(robots, "graftbot", "/private/x") == true)
    assert(RobotsTxt.allowed(robots, "otherbot", "/bot-only/x") == false)
    assert(RobotsTxt.allowed(robots, "graftbot/1.0", "/bot-only/x") == false,
      "UA token matches by prefix (product/version forms)")
    // no groups at all => allowed
    assert(RobotsTxt.allowed(RobotsTxt.parse("# nothing"), "*", "/x"))
  }

  test("most-specific rule wins; allow beats disallow on ties") {
    assert(!RobotsTxt.allowed(robots, "*", "/private/secret"))
    assert(RobotsTxt.allowed(robots, "*", "/private/ok/file"),
      "the longer Allow: /private/ok/ overrides Disallow: /private/")
    val tie = RobotsTxt.parse(
      "User-agent: *\nDisallow: /a/\nAllow: /a*/\n") // hmm different lens
    assert(RobotsTxt.allowed(
      RobotsTxt.parse("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n"),
      "*", "/dir/x"), "equal-length allow wins the tie")
    assert(tie != null)
  }

  test("wildcards and $ anchors") {
    assert(!RobotsTxt.allowed(robots, "*", "/docs/report.pdf"),
      "/*.pdf$ blocks any pdf path")
    assert(RobotsTxt.allowed(robots, "*", "/docs/report.pdf.html"),
      "$ anchors to the very end")
    assert(!RobotsTxt.allowed(robots, "*", "/tmp"))
    assert(RobotsTxt.allowed(robots, "*", "/tmp2"))
    assert(RobotsTxt.allowed(robots, "*", "/tmpX/file"))
    // mid-pattern wildcard
    val w = RobotsTxt.parse("User-agent: *\nDisallow: /a/*/c\n")
    assert(!RobotsTxt.allowed(w, "*", "/a/b/c"))
    assert(!RobotsTxt.allowed(w, "*", "/a/b/b2/cc"),
      "prefix semantics after the wildcard segment")
    assert(RobotsTxt.allowed(w, "*", "/a/b"))
  }

  test("empty Disallow matches nothing; comments and unknown directives " +
       "are ignored; empty path defaults to /") {
    val allowAll = RobotsTxt.parse(
      "User-agent: *\nDisallow:\n# Disallow: /fake\n")
    assert(RobotsTxt.allowed(allowAll, "*", "/anything"))
    val blockRoot = RobotsTxt.parse("User-agent: *\nDisallow: /\n")
    assert(!RobotsTxt.allowed(blockRoot, "*", ""))
    assert(!RobotsTxt.allowed(blockRoot, "*", "/x"))
  }

  test("RFC 9309 §2.2.1 group MERGE: repeated user-agent groups for the " +
       "same token concatenate — later Disallow rules are not ignored") {
    // real-world shape: two separate `User-agent: *` blocks
    val split = RobotsTxt.parse(
      """User-agent: *
        |Disallow: /a/
        |
        |User-agent: *
        |Disallow: /b/
        |""".stripMargin)
    assert(!RobotsTxt.allowed(split, "anybot", "/a/x"))
    assert(!RobotsTxt.allowed(split, "anybot", "/b/x"),
      "the SECOND * group's rules must apply too")
    assert(RobotsTxt.allowed(split, "anybot", "/c/x"))
    // specific-UA groups merge the same way when the winning token ties
    val specific = RobotsTxt.parse(
      """User-agent: graftbot
        |Disallow: /one/
        |
        |User-agent: graftbot
        |Allow: /one/ok/
        |Disallow: /two/
        |
        |User-agent: *
        |Disallow: /star-only/
        |""".stripMargin)
    assert(!RobotsTxt.allowed(specific, "graftbot", "/one/x"))
    assert(!RobotsTxt.allowed(specific, "graftbot", "/two/x"))
    assert(RobotsTxt.allowed(specific, "graftbot", "/one/ok/x"),
      "allow from the merged second group must beat the first's disallow")
    assert(RobotsTxt.allowed(specific, "graftbot", "/star-only/x"),
      "a matched specific group excludes the * fallback entirely")
    // a LONGER matching token still excludes shorter ones from the merge
    val tiers = RobotsTxt.parse(
      """User-agent: graft
        |Disallow: /short/
        |
        |User-agent: graftbot
        |Disallow: /long/
        |""".stripMargin)
    assert(RobotsTxt.allowed(tiers, "graftbot", "/short/x"),
      "only the longest-token groups participate")
    assert(!RobotsTxt.allowed(tiers, "graftbot", "/long/x"))
  }

  test("Sitemap: directives extract group-independently in document " +
       "order; comments strip; case-insensitive; column + SQL parity") {
    val b =
      """# head comment
        |Sitemap: https://a.org/s1.xml
        |User-agent: *
        |Disallow: /x/
        |siteMAP: https://a.org/s2.xml.gz # trailing comment
        |User-agent: bot
        |Sitemap: https://a.org/s3.xml
        |Sitemap:
        |""".stripMargin
    assert(RobotsTxt.sitemapUrls(b) == Seq(
      "https://a.org/s1.xml", "https://a.org/s2.xml.gz",
      "https://a.org/s3.xml"),
      "directives collect across ALL groups; empty values drop")
    assert(RobotsTxt.sitemapUrls("User-agent: *\nDisallow: /\n") == Seq())
    val df = Seq(b).toDF("r")
    val viaCol = df.select(
      graft.plans.expressions.robots_sitemaps(col("r")))
      .head().getSeq[String](0)
    assert(viaCol == RobotsTxt.sitemapUrls(b))
    df.createOrReplaceTempView("__robots_sm_probe")
    val viaSql = spark.sql(
      "SELECT graft_robots_sitemaps(r) FROM __robots_sm_probe")
      .head().getSeq[String](0)
    assert(viaSql == viaCol)
  }

  test("Crawl-delay: group-scoped with the same merge rule as the allow " +
       "gate; fractional values; junk ignored; None when undeclared") {
    val b =
      """User-agent: *
        |Crawl-delay: 2
        |
        |User-agent: graftbot
        |Disallow: /x/
        |crawl-delay: 0.5 # be nice
        |
        |User-agent: junkbot
        |Crawl-delay: fast
        |""".stripMargin
    assert(RobotsTxt.crawlDelay(b, "anybot") == Some(2.0),
      "unmatched agents use the * group's delay")
    assert(RobotsTxt.crawlDelay(b, "graftbot/1.0") == Some(0.5),
      "a matched specific group wins; fractional seconds parse")
    assert(RobotsTxt.crawlDelay(b, "junkbot") == None,
      "an unparseable value is ignored, and a matched group does NOT " +
        "fall back to *")
    assert(RobotsTxt.crawlDelay("User-agent: *\nDisallow: /\n") == None)
    assert(RobotsTxt.crawlDelay("User-agent: *\nCrawl-delay: -3\n") == None,
      "negative delays are junk")
    // merged same-token groups: first parseable delay wins
    val merged = RobotsTxt.crawlDelay(
      "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nCrawl-delay: 7\n")
    assert(merged == Some(7.0))
    // column + SQL parity, nullable result
    val df = Seq(b, "User-agent: *\nDisallow: /\n").toDF("r")
    val viaCol = df.select(
      graft.plans.expressions.robots_crawl_delay(col("r")))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSeq
    assert(viaCol == Seq(Some(2.0), None))
    df.createOrReplaceTempView("__robots_cd_probe")
    val viaSql = spark.sql(
      "SELECT graft_robots_crawl_delay(r) FROM __robots_cd_probe")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      .toSeq
    assert(viaSql == viaCol)
  }

  test("column API + SQL registration parity; memoized path matches " +
       "direct evaluation") {
    val df = Seq(("/private/a", body), ("/private/ok/a", body),
      ("/free", body)).toDF("p", "r")
    val viaCol = df.select(
      graft.plans.expressions.robots_allowed(col("r"), col("p")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaCol == Seq(false, true, true))
    df.createOrReplaceTempView("__robots_probe")
    val viaSql = spark.sql(
      "SELECT graft_robots_allowed(r, p) FROM __robots_probe")
      .collect().map(_.getBoolean(0)).toSeq
    assert(viaSql == viaCol)
    assert(RobotsTxt.allowedCached(body, "*", "/private/a") ==
      RobotsTxt.allowed(robots, "*", "/private/a"))
  }
}
