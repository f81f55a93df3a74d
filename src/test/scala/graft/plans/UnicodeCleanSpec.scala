package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.expressions.unicode_clean

/** Pins the fused [[UnicodeClean]] kernel: NFC composition, whitespace
  * collapse across ASCII + Z* separators, Cc/Cf strike (which must NOT
  * break a whitespace run), and edge trims -- the contract the
  * `normalize_text` oracle re-derives with nfc_normalize + RE2 chains.
  * (Inputs are spelled with unicode escapes -- invisible characters are
  * the whole point of the fixture.)
  */
class UnicodeCleanSpec extends SparkSpec {

  private val cases = Seq(
    ("hello world",
      "hello world"), // plain ASCII
    ("  lead  and   trail  ",
      "lead and trail"), // edge trim + run collapse
    ("cafe\u0301",
      "caf\u00E9"), // NFC: e + COMBINING ACUTE composes
    ("A\u030A",
      "\u00C5"), // A + COMBINING RING ABOVE composes
    ("\u00C5",
      "\u00C5"), // already composed: unchanged
    ("\u212B",
      "\u00C5"), // ANGSTROM SIGN normalizes to A-RING
    ("a\u200Bb",
      "ab"), // ZERO WIDTH SPACE (Cf) strikes
    ("a \u200B b",
      "a b"), // ...and does not break the whitespace run
    ("a\u00ADb",
      "ab"), // SOFT HYPHEN (Cf)
    ("a\uFEFFb",
      "ab"), // BOM / ZWNBSP (Cf)
    ("a\u0001b",
      "ab"), // control (Cc)
    ("a \u0001 b",
      "a b"), // control between spaces: one space
    ("a\u000Bb",
      "ab"), // VT is Cc (matches the oracle's RE2 classes)
    ("a\u00A0b",
      "a b"), // NBSP is Zs: whitespace
    ("a\u3000b",
      "a b"), // IDEOGRAPHIC SPACE (Zs)
    ("a\u2028b",
      "a b"), // LINE SEPARATOR (Zl)
    ("a\u2029b",
      "a b"), // PARAGRAPH SEPARATOR (Zp)
    ("a\u0009b\u000Ac\u000Dd\u000Ce",
      "a b c d e"), // ASCII whitespace set
    ("\u200B\u00AD",
      ""), // nothing but strikes
    (" \u0009 ",
      ""), // nothing but whitespace
    ("",
      ""), // empty
    ("emoji \uD83C\uDF89 stays",
      "emoji \uD83C\uDF89 stays"), // astral pair survives
  )

  test("kernel contract over adversarial inputs (codegen path)") {
    val in = df(StructType(Seq(StructField("t", StringType, nullable = true))),
      cases.map(c => Row(c._1)) :+ Row(null))
    val got = in.select(unicode_clean(col("t")).as("c")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    cases.zip(got).foreach { case ((input, want), have) =>
      assert(have == want,
        "unicode_clean(" +
          input.map(c => f"<${c.toInt}%04X>").mkString + ") = " +
          Option(have).fold("NULL")(_.map(c => f"<${c.toInt}%04X>").mkString))
    }
    assert(got.last == null, "NULL in, NULL out")
  }

  test("interpreted path agrees with codegen") {
    val e = UnicodeClean(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        " cafe\u0301 \u200B xy \u3000 "), StringType))
    assert(e.eval(null).toString == "caf\u00E9 xy")
  }

  test("SQL function registration") {
    val out = spark.sql(
      "SELECT graft_unicode_clean(' a\u200B  b ') AS c").head().getString(0)
    assert(out == "a b")
  }
}
