package graft.text

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ExprKernels

class LuhnRedactSpec extends AnyFunSuite {

  private def redact(s: String): String =
    ExprKernels.luhnRedact(UTF8String.fromString(s)).toString

  /** Reference implementation: java.util.regex Matcher.find loop over
    * the same pattern, replacing candidates that pass a reference Luhn.
    */
  private val pat = java.util.regex.Pattern.compile("\\d(?:[ -]?\\d){12,18}")

  private def refLuhn(candidate: String): Boolean = {
    val digits = candidate.filter(_.isDigit)
    val sum = digits.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  private def refRedact(s: String): String = {
    val m = pat.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s.substring(last, m.start()))
      sb.append(if (refLuhn(m.group())) "<CARD>" else m.group())
      last = m.end()
    }
    sb.append(s.substring(last))
    sb.toString
  }

  test("published test card numbers redact; off-by-one twins survive") {
    // the canonical public test numbers (Visa, Amex, Mastercard)
    assert(redact("pay 4111 1111 1111 1111 now") == "pay <CARD> now")
    assert(redact("amex 378282246310005 ok") == "amex <CARD> ok")
    assert(redact("mc 5555-5555-5555-4444.") == "mc <CARD>.")
    // same shape, broken checksum: untouched
    assert(redact("pay 4111 1111 1111 1112 now") ==
      "pay 4111 1111 1111 1112 now")
  }

  test("shapes: 13 to 19 digits, mixed separators; 12 is too short") {
    assert(redact("4222222222222") == "<CARD>") // 13-digit Visa test
    assert(redact("6799990100000000019") == "<CARD>") // 19-digit Maestro
    assert(redact("4222 2222-22222") == "<CARD>") // mixed separators
    assert(redact("422222222222") == "422222222222") // 12 digits: not card-shaped
  }

  test("an over-long digit run matches like the regex (first 19 gobble)") {
    val s = "4222222222222" + "0000000000000000"
    assert(redact(s) == refRedact(s))
  }

  test("order ids and timestamps survive (the precision claim)") {
    // ~90% of digit runs fail Luhn; these specific ones do
    assert(redact("order 1234 5678 9012 3456 shipped") ==
      "order 1234 5678 9012 3456 shipped")
    assert(redact("ts 20240115 093000 123") == "ts 20240115 093000 123")
  }

  test("a valid suffix inside an invalid candidate is not re-examined") {
    // the Matcher.find contract: the invalid match consumes its span
    val invalid = "9999 4111 1111 1111 111" // 19 digits, fails Luhn
    assert(refLuhn("4111111111111111"))
    assert(!refLuhn(invalid))
    assert(redact(invalid) == refRedact(invalid))
  }

  test("matches java.util.regex + reference Luhn on randomized inputs") {
    val rnd = new scala.util.Random(20260815L)
    val pieces = Array("4111", "1111", " ", "-", "ab", ".", "12345",
      "0", "9", " x ", "378282246310005", "4111 1111 1111 1111")
    for (_ <- 0 until 500) {
      val s = Seq.fill(rnd.nextInt(12))(pieces(rnd.nextInt(pieces.length)))
        .mkString
      assert(redact(s) == refRedact(s), s"divergence on <$s>")
    }
  }

  test("empty, no-digit, and unicode-adjacent text pass through") {
    assert(redact("") == "")
    assert(redact("no numbers here") == "no numbers here")
    assert(redact("😀4111 1111 1111 1111😀") == "😀<CARD>😀")
  }

  test("column API: one codegen'd pass") {
    // smoke the expression path (interpreted eval is exercised above)
    val e = graft.plans.LuhnRedact(
      org.apache.spark.sql.catalyst.expressions.Literal("a 4111 1111 1111 1111 b"))
    assert(e.eval(null).toString == "a <CARD> b")
  }
}
