package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL surface for the engine's custom expressions. Two entry points:
  *
  *  - cluster config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    injects the functions at session build time (the standard
  *    third-party-extension mechanism — how a 1000-executor deployment
  *    turns them on without code changes);
  *  - library call: `GraftFunctions.register(spark)` adds them to an
  *    already-running session's registry (what the tests use).
  *
  * After either, plain SQL can run the hot-loop expressions:
  * {{{
  *   SELECT graft_simhash64(graft_shingle_hashes(text, 3)) FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    GraftFunctions.tableRegistrations.foreach(ext.injectTableFunction)
    // DELETE/UPDATE/OPTIMIZE/DESCRIBE HISTORY/VACUUM on graft.`path`
    // tables (delta-spark's delegating-parser pattern)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // naive `bit_count(a ^ b) <= k` joins → pigeonhole band equi-joins
    ext.injectOptimizerRule(_ => BandedHammingJoin)
  }
}

object GraftFunctions {

  private def stringArg(name: String, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$name expects literal string arguments, got $other")
  }

  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** (identifier, info, builder) triples in SparkSessionExtensions'
    * injectFunction shape.
    */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes",
        "graft_shingle_hashes(text, w) - distinct hashes of lowercase word w-shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingle_hashes(text, w)")
        ShingleHashes(args.head, intArg("graft_shingle_hashes", args(1)))
      }),
    (FunctionIdentifier("graft_char_ngram_hashes"),
      info("graft_char_ngram_hashes",
        "graft_char_ngram_hashes(text, n) - distinct hashes of normalized char n-grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_char_ngram_hashes(text, n)")
        CharNgramHashes(args.head, intArg("graft_char_ngram_hashes", args(1)))
      }),
    (FunctionIdentifier("graft_kgram_hashes"),
      info("graft_kgram_hashes",
        "graft_kgram_hashes(text, k) - POSITIONAL rolling hashes of every raw k-char window"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_kgram_hashes(text, k)")
        KgramHashes(args.head, intArg("graft_kgram_hashes", args(1)))
      }),
    (FunctionIdentifier("graft_coalesce_spans"),
      info("graft_coalesce_spans",
        "graft_coalesce_spans(positions, k[, minSpan]) - ascending window starts -> maximal disjoint (start, end) spans"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "graft_coalesce_spans(positions, k[, minSpan])")
        CoalesceSpans(args.head, intArg("graft_coalesce_spans", args(1)),
          if (args.length == 3) intArg("graft_coalesce_spans", args(2)) else 0)
      }),
    (FunctionIdentifier("graft_blocklist_hits"),
      info("graft_blocklist_hits",
        "graft_blocklist_hits(text, word, ...) - case-insensitive C4 badwords hit count (single words match whole tokens, phrases match with boundary semantics)"),
      (args: Seq[Expression]) => {
        require(args.length >= 2, "graft_blocklist_hits(text, word, ...)")
        BlocklistHits(args.head, args.tail.map(stringArg("graft_blocklist_hits", _)))
      }),
    (FunctionIdentifier("graft_word_ngram_hashes"),
      info("graft_word_ngram_hashes",
        "graft_word_ngram_hashes(text, n) - strict word n-gram hashes (no short-doc fallback)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_word_ngram_hashes(text, n)")
        WordNgramHashes(args.head, intArg("graft_word_ngram_hashes", args(1)))
      }),
    (FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig",
        "graft_minhash_sig(hashes, numHashes) - one-permutation minhash signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_sig(hashes, numHashes)")
        MinHashSig(args.head, intArg("graft_minhash_sig", args(1)))
      }),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(hashes) - 64-bit simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64(hashes)")
        SimHash64(args.head)
      }),
    (FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - dot product of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_vec_dot(a, b)")
        VecDot(args.head, args(1), DotMode.Dot)
      }),
    (FunctionIdentifier("graft_vec_cosine"),
      info("graft_vec_cosine", "graft_vec_cosine(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_vec_cosine(a, b)")
        VecDot(args.head, args(1), DotMode.Cosine)
      }),
    (FunctionIdentifier("graft_normalized_md5"),
      info("graft_normalized_md5",
        "graft_normalized_md5(text) - md5 of the whitespace-collapsed, lowercased, trimmed text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_normalized_md5(text)")
        NormalizedMd5(args.head)
      }),
    (FunctionIdentifier("graft_unicode_clean"),
      info("graft_unicode_clean",
        "graft_unicode_clean(text) - NFC + whitespace collapse + control/format strip"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_unicode_clean(text)")
        UnicodeClean(args.head)
      }),
    (FunctionIdentifier("graft_sign_bits"),
      info("graft_sign_bits",
        "graft_sign_bits(vec) - sign-bit binary code of a float/double " +
          "vector (array<bigint> blocks; the 1-bit retrieval prefilter)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_sign_bits(vec)")
        SignBits(args.head)
      }),
    (FunctionIdentifier("graft_hash_jaccard"),
      info("graft_hash_jaccard",
        "graft_hash_jaccard(a, b) - one-pass set Jaccard of two " +
          "array<bigint> hash sets (the near-dup verify predicate)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hash_jaccard(a, b)")
        HashJaccard(args(0), args(1))
      }),
    (FunctionIdentifier("graft_hash_containment"),
      info("graft_hash_containment",
        "graft_hash_containment(a, b) - |A∩B| / min(|A|,|B|) of two " +
          "array<bigint> hash sets (the doc-inside-doc predicate)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hash_containment(a, b)")
        HashContainment(args(0), args(1))
      }),
    (FunctionIdentifier("graft_fix_mojibake"),
      info("graft_fix_mojibake",
        "graft_fix_mojibake(text) - unwind UTF-8-as-Latin-1 mis-decodes " +
          "(up to 3 layers); never alters text that is not one"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_fix_mojibake(text)")
        FixMojibake(args.head)
      }),
    (FunctionIdentifier("graft_deflate_ratio"),
      info("graft_deflate_ratio",
        "graft_deflate_ratio(text) - deflate compression ratio of the " +
          "UTF-8 bytes (both-tail quality signal)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_deflate_ratio(text)")
        DeflateRatio(args.head)
      }),
    (FunctionIdentifier("graft_luhn_redact"),
      info("graft_luhn_redact",
        "graft_luhn_redact(text) - replace Luhn-valid card-shaped digit " +
          "runs (13-19 digits, space/dash separators) with <CARD>"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_luhn_redact(text)")
        LuhnRedact(args.head)
      }),
    (FunctionIdentifier("graft_html_extract"),
      info("graft_html_extract",
        "graft_html_extract(html) - main text of an HTML payload: drop " +
          "head/script/style/comments, strip tags, decode entities, " +
          "collapse whitespace"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_html_extract(html)")
        HtmlExtract(args.head)
      }),
    (FunctionIdentifier("graft_canonicalize_url"),
      info("graft_canonicalize_url",
        "graft_canonicalize_url(url) - canonical URL for url-level dedup: " +
          "scheme/host lowercase, default port + fragment dropped, " +
          "tracking params (utm_*, gclid, ...) removed, params sorted, " +
          "trailing path slash trimmed"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_canonicalize_url(url)")
        UrlCanonicalize(args.head, UrlCanonicalize.DefaultDropNames,
          UrlCanonicalize.DefaultDropPrefixes)
      }),
    (FunctionIdentifier("graft_robots_allowed"),
      info("graft_robots_allowed",
        "graft_robots_allowed(robots_txt, path) - RFC 9309 evaluation " +
          "for the '*' agent: longest-pattern rule wins, allow beats " +
          "disallow on ties, * wildcards and $ anchors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_robots_allowed(robots_txt, path)")
        RobotsAllowed(args.head, args(1), "*")
      }),
    (FunctionIdentifier("graft_html_links"),
      info("graft_html_links",
        "graft_html_links(html) - array<struct<href, anchor>> of the " +
          "page's <a href=...> outlinks: hrefs entity-decoded verbatim, " +
          "anchor text tag-stripped and whitespace-collapsed; " +
          "comment/script/style content skipped"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_html_links(html)")
        HtmlLinks(args.head)
      }),
    (FunctionIdentifier("graft_robots_crawl_delay"),
      info("graft_robots_crawl_delay",
        "graft_robots_crawl_delay(robots_txt) - effective Crawl-delay " +
          "seconds for the '*' agent (group-scoped, same merge rule as " +
          "the allow gate); NULL when no matching group declares one"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_robots_crawl_delay(robots_txt)")
        RobotsCrawlDelay(args.head, "*")
      }),
    (FunctionIdentifier("graft_robots_sitemaps"),
      info("graft_robots_sitemaps",
        "graft_robots_sitemaps(robots_txt) - array<string> of the " +
          "body's Sitemap: directives in document order " +
          "(group-independent per RFC 9309 §2.2.4)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_robots_sitemaps(robots_txt)")
        RobotsSitemaps(args.head)
      }),
    (FunctionIdentifier("graft_sitemap_entries"),
      info("graft_sitemap_entries",
        "graft_sitemap_entries(xml) - array<struct<loc, lastmod, kind>> " +
          "of a sitemaps.org document: urlset <url> entries (kind " +
          "'url') and sitemapindex <sitemap> entries (kind 'sitemap'), " +
          "loc/lastmod entity-decoded, entries without a loc skipped"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_sitemap_entries(xml)")
        SitemapEntries(args.head)
      }),
    (FunctionIdentifier("graft_registrable_domain"),
      info("graft_registrable_domain",
        "graft_registrable_domain(url) - registrable (eTLD+1) domain of " +
          "a URL or bare host under public-suffix semantics: longest " +
          "suffix rule wins, exceptions prevail, null for bare suffixes " +
          "and malformed hosts"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_registrable_domain(url)")
        RegistrableDomain(args.head, RegistrableDomain.DefaultRules)
      }),
    (FunctionIdentifier("graft_gopher_stats"),
      info("graft_gopher_stats",
        "graft_gopher_stats(text) - one-pass Gopher document-quality counters " +
          "(words, word-length mass, alpha words, symbols, lines, bullets, " +
          "ellipses, canonical stop-word hits)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gopher_stats(text)")
        GopherStats(args.head, graft.text.QualityFilters.gopherStopwords)
      }))

  /** Table-valued functions: the change data feed as a SQL relation —
    * `SELECT * FROM graft_table_changes('/path', fromV[, toV[, net]])`
    * (Delta's `table_changes`). Args must be literals; the plan is the
    * same one [[graft.tables.ManagedTable.changes]] builds.
    */
  val tableRegistrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_table_changes"),
      info("graft_table_changes",
        "graft_table_changes(path, fromVersion[, toVersion[, net]]) - change data feed rows"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 4,
          "graft_table_changes(path, fromVersion[, toVersion[, net]])")
        def lit(i: Int): Any = args(i) match {
          case l: Literal => l.value
          case other => throw new IllegalArgumentException(
            s"graft_table_changes expects literal arguments, got $other")
        }
        val path = lit(0).toString
        def asLong(v: Any): Long = v match {
          case n: Number => n.longValue()
          case other => throw new IllegalArgumentException(
            s"graft_table_changes expects an integer version, got $other")
        }
        val from = asLong(lit(1))
        val to = if (args.length >= 3) asLong(lit(2)) else -1L
        val net = if (args.length < 4) true else lit(3) match {
          case b: Boolean => b
          case other => throw new IllegalArgumentException(
            s"graft_table_changes expects a boolean net flag, got $other")
        }
        graft.tables.ManagedTable
          .forPath(SparkSession.active, path)
          .changes(from, to, net)
          .queryExecution.logical
      }),
    (FunctionIdentifier("graft_table"),
      info("graft_table",
        "graft_table(path[, versionOrTimestamp]) - managed-table snapshot rows"),
      (args: Seq[Expression]) => {
        require(args.length == 1 || args.length == 2,
          "graft_table(path[, versionOrTimestamp])")
        def lit(i: Int): Any = args(i) match {
          case l: Literal => l.value
          case other => throw new IllegalArgumentException(
            s"graft_table expects literal arguments, got $other")
        }
        val t = graft.tables.ManagedTable
          .forPath(SparkSession.active, lit(0).toString)
        val df =
          if (args.length == 1) t.toDF
          else lit(1) match {
            case n: Number => t.toDF(n.longValue())
            case s =>
              // a string second argument is a timestamp (Delta's
              // `TIMESTAMP AS OF`): snapshot as of that instant
              val raw = s.toString
              val norm =
                if (raw.length == 10) raw + " 00:00:00"
                else raw.replace("T", " ")
              t.toDFAsOf(java.sql.Timestamp.valueOf(norm).getTime)
          }
        df.queryExecution.logical
      }))

  /** Register into a live session (idempotent). The SQL statement surface
    * (DELETE/UPDATE/OPTIMIZE/…, [[GraftSqlParser]]) is parser-level and
    * can only come from `spark.sql.extensions` at session build.
    */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
    tableRegistrations.foreach { case (id, inf, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, inf, builder)
    }
  }
}
