package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UrlCanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(expressions.canonicalize_url(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://ExAmPle.COM/Some/Path") ==
      Seq("http://example.com/Some/Path"))
  }

  test("default ports strip; explicit non-default ports stay") {
    assert(canon(
      "http://example.com:80/x",
      "https://example.com:443/x",
      "http://example.com:8080/x",
      "https://example.com:80/x") == Seq(
      "http://example.com/x",
      "https://example.com/x",
      "http://example.com:8080/x",
      "https://example.com:80/x"))
  }

  test("fragment drops; empty path becomes root; trailing slash trims") {
    assert(canon(
      "https://example.com#top",
      "https://example.com/",
      "https://example.com/a/b/",
      "https://example.com/a/b/#frag") == Seq(
      "https://example.com/",
      "https://example.com/",
      "https://example.com/a/b",
      "https://example.com/a/b"))
  }

  test("tracking params drop; survivors sort stably by name") {
    assert(canon(
      "https://example.com/p?utm_source=x&b=2&a=1&utm_campaign=y",
      "https://example.com/p?gclid=123&z=9",
      "https://example.com/p?b=2&b=1&a=0",
      "https://example.com/p?utm_source=x") == Seq(
      "https://example.com/p?a=1&b=2",
      "https://example.com/p?z=9",
      "https://example.com/p?a=0&b=2&b=1",
      "https://example.com/p"))
  }

  test("userinfo preserved, bare key params kept, IPv6 host port logic") {
    assert(canon(
      "http://User:pw@Host.COM/x?flag&a=1",
      "http://[2001:DB8::1]:80/x",
      "http://[2001:DB8::1]:8080/x") == Seq(
      "http://User:pw@host.com/x?a=1&flag",
      "http://[2001:db8::1]/x",
      "http://[2001:db8::1]:8080/x"))
  }

  test("non-URL input passes through trimmed-only") {
    assert(canon("  not a url  ", "mailto:a@b.c", "://nohost") ==
      Seq("not a url", "mailto:a@b.c", "://nohost"))
  }

  test("SQL registration parity") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      """SELECT graft_canonicalize_url(
        |  'HTTP://ExAmPle.COM:80/P/?utm_source=x&b=2&a=1#f') AS c""".stripMargin)
      .head().getString(0)
    assert(viaSql == "http://example.com/P?a=1&b=2")
  }

  test("canonicalization is idempotent: canon(canon(u)) == canon(u)") {
    val messy = Seq(
      "HTTP://ExAmPle.COM:80/Path/?utm_source=x&b=2&a=1#frag",
      "https://Example.com:443/",
      "http://User:pw@Host.COM/x?flag&a=1",
      "http://[2001:DB8::1]:8080/x?z=1&y=2",
      "not a url", "mailto:a@b.c")
    val once = canon(messy: _*)
    val twice = canon(once: _*)
    assert(twice == once, "a canonical form must be a fixed point")
  }

  test("url-level dedup: tracked and fragment variants collapse") {
    val urls = Seq(
      "https://news.site/Article/42?utm_source=tw&utm_medium=s",
      "HTTPS://News.Site/Article/42#comments",
      "https://news.site:443/Article/42/",
      "https://news.site/Article/43").toDF("u")
    val distinct = urls
      .select(expressions.canonicalize_url(col("u")).as("c"))
      .distinct().count()
    assert(distinct == 2L)
  }
}
