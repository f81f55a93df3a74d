package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlLinksSpec extends SparkSpec {
  import spark.implicits._

  private def links(html: String): Seq[(String, String)] =
    Seq(html).toDF("h")
      .select(explode(expressions.html_links(col("h"))).as("l"))
      .select("l.href", "l.anchor")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  test("quoted, single-quoted, and unquoted hrefs; href-less anchors skip") {
    assert(links(
      """<a href="https://x.com/a">one</a>""" +
        """<a href='/rel'>two</a>""" +
        """<a href=bare.html>three</a>""" +
        """<a name="anchor-only">four</a>""") == Seq(
      ("https://x.com/a", "one"),
      ("/rel", "two"),
      ("bare.html", "three")))
  }

  test("entities decode in href and anchor; anchor tags strip and " +
       "whitespace collapses") {
    assert(links(
      """<a href="/q?a=1&amp;b=2">A &amp;  <b>deep <i>bold</i></b>""" +
        "\n  text</a>") ==
      Seq(("/q?a=1&b=2", "A & deep bold text")))
  }

  test("links inside comments and script/style blocks are skipped; " +
       "attribute order and case do not matter") {
    assert(links(
      """<!-- <a href="c">gone</a> -->""" +
        """<script>document.write('<a href="s">x</a>')</script>""" +
        """<style>a{content:'<a href="st">y</a>'}</style>""" +
        """<A CLASS="big" HREF="/real" id=z>kept</A>""") ==
      Seq(("/real", "kept")))
  }

  test("<abbr>/<article> do not false-match the <a> scan; unterminated " +
       "anchors run to end of input") {
    assert(links("""<abbr title="x">ab</abbr><article>c</article>""" +
      """<a href="/v">tail unclosed""") == Seq(("/v", "tail unclosed")))
  }

  test("'href=' inside ANOTHER attribute's quoted value is not the href: " +
       "the attribute span tokenizes attribute-by-attribute") {
    assert(links("""<a title="see href=evil" href="/real">t</a>""") ==
      Seq(("/real", "t")),
      "href= inside a quoted title value must not win")
    assert(links("""<a data-x='href="/fake"' href=/good>u</a>""") ==
      Seq(("/good", "u")))
    // valueless attributes before the real href don't derail the scan
    assert(links("""<a download title="href=no" href="/dl">v</a>""") ==
      Seq(("/dl", "v")))
    // an anchor whose ONLY href-ish text sits inside another value has none
    assert(links("""<a title="href=/only-inside">w</a>""") == Seq.empty)
  }

  test("SQL registration parity and empty/no-link pages") {
    Seq("""<p>no links at all</p>""").toDF("h")
      .createOrReplaceTempView("__hl_pages")
    assert(spark.sql("SELECT size(graft_html_links(h)) FROM __hl_pages")
      .head().getInt(0) == 0)
    Seq("""<a href="/x">y</a>""").toDF("h")
      .createOrReplaceTempView("__hl_one")
    val row = spark.sql(
      "SELECT l.href, l.anchor FROM __hl_one " +
        "LATERAL VIEW explode(graft_html_links(h)) t AS l").head()
    assert((row.getString(0), row.getString(1)) == ("/x", "y"))
  }

  test("interpreted eval matches codegen") {
    val html = """<a href="/a?x=1&amp;y=2">A <b>b</b></a><a href=c.html>c</a>"""
    val viaCodegen = links(html)
    import org.apache.spark.unsafe.types.UTF8String
    val arr = ExprKernels.htmlLinks(UTF8String.fromString(html))
    val viaKernel = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
    assert(viaCodegen == viaKernel)
  }

  test("frontier composition: href -> canonical url -> registrable domain") {
    val out = Seq("""<a href="HTTP://WWW.Shop.ACME.co.uk:80/P?utm_source=f&amp;b=1#f">buy</a>""")
      .toDF("h")
      .select(explode(expressions.html_links(col("h"))).as("l"))
      .select(expressions.canonicalize_url(col("l.href")).as("url"),
        expressions.registrable_domain(col("l.href")).as("domain"))
      .head()
    assert(out.getString(0) == "http://www.shop.acme.co.uk/P?b=1")
    assert(out.getString(1) == "acme.co.uk")
  }
}
