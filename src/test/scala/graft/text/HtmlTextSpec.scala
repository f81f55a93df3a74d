package graft.text

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ExprKernels

class HtmlTextSpec extends AnyFunSuite {

  private def x(s: String): String =
    ExprKernels.htmlExtract(UTF8String.fromString(s)).toString

  test("drops head, script, style, comments; strips tags to spaces") {
    val html = "<html><head><title>T</title><style>p{}</style></head>" +
      "<body><h1>A</h1><p>b c</p><!-- no --><div>d</div></body></html>"
    assert(x(html) == "A b c d")
  }

  test("script content never leaks, even with tags inside strings") {
    assert(x("<script>var s = 'hello';</script>after") == "after")
    assert(x("<SCRIPT TYPE=\"module\">x<b>y</SCRIPT>z") == "z")
  }

  test("adjacent cells don't glue; case-insensitive tags") {
    assert(x("<TABLE><TR><TD>a</TD><TD>b</TD></TR></TABLE>") == "a b")
  }

  test("tag-boundary check: <scripter> is a normal tag, not a script") {
    assert(x("<scripter>visible</scripter>") == "visible")
  }

  test("entities: named core, decimal, hex, nbsp collapses, unknown kept") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") ==
      "a & b <c> \"d\" 'e'")
    assert(x("x&#65;y&#x42;z") == "xAyBz")
    assert(x("a&nbsp;&nbsp;b") == "a b")
    assert(x("5 &undefined; 6") == "5 &undefined; 6")
    assert(x("AT&T works") == "AT&T works")
  }

  test("stray < is text; unterminated tag drops the tail") {
    assert(x("1 < 2 and 3 > 2") == "1 < 2 and 3 > 2")
    assert(x("ok <div unterminated") == "ok")
  }

  test("unterminated script/head swallow to end of input") {
    assert(x("before<script>never closed") == "before")
    assert(x("<head><title>t</title>") == "")
  }

  test("whitespace collapses; leading/trailing trims") {
    assert(x("  <p>  a\n\t b  </p>  ") == "a b")
    assert(x("") == "")
    assert(x("<p></p>") == "")
  }

  test("non-BMP text and numeric supplementary entities survive") {
    assert(x("<p>😀 ok</p>") == "😀 ok")
    assert(x("&#128512;!") == "😀!")
  }

  test("column API + SQL registration parity") {
    val e = graft.plans.HtmlExtract(
      org.apache.spark.sql.catalyst.expressions.Literal("<b>hi</b> there"))
    assert(e.eval(null).toString == "hi there")
  }
}
