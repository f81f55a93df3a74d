package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FixMojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def fix(s: String): String =
    Seq(s).toDF("t")
      .select(expressions.fix_mojibake(col("t"))).head().getString(0)

  private def mangle(s: String): String =
    new String(s.getBytes("UTF-8"), "ISO-8859-1")

  test("unwinds single, double, and triple Latin-1 mis-decodes exactly") {
    for (orig <- Seq("café résumé über",
        "中文文本", // CJK
        "emoji 😀 and accents àèì",
        "plain ascii stays plain ascii")) {
      assert(fix(mangle(orig)) == orig, s"1 layer: $orig")
      assert(fix(mangle(mangle(orig))) == orig, s"2 layers: $orig")
      assert(fix(mangle(mangle(mangle(orig)))) == orig, s"3 layers: $orig")
    }
  }

  test("never damages text that is not a mis-decode") {
    for (valid <- Seq(
        "café résumé",        // accented Latin-1-range text
        "中文 mixed with ascii",     // cp > 0xFF: can't be Latin-1
        "", "   ", "tabs\tand\nnewlines")) {
      assert(fix(valid) == valid, s"must be identity: '$valid'")
    }
  }

  test("the fix gate is strict UTF-8 decodability, not heuristics") {
    // a lone 0xE9 between letters is invalid UTF-8 -> untouched
    assert(fix("aéb") == "aéb")
    // literal "Ã©" IS the mis-decode of "é" (the documented stance:
    // decodable-and-different means fix)
    assert(fix("Ã©") == "é")
  }

  test("property over random unicode: fix is idempotent and " +
       "mangle-invariant (both converge to the same fixpoint)") {
    val rnd = new scala.util.Random(2026L)
    // mixed alphabets incl. supplementary planes and Latin-1-range chars
    val pool = "abz ÀÉÜàéü中文日本語κόσμε мир😀🎉\t\n0129'\"\\"
    val cps = pool.codePoints().toArray
    (1 to 300).foreach { _ =>
      val n = rnd.nextInt(24)
      val sb = new java.lang.StringBuilder()
      (0 until n).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      val s = sb.toString
      val f = fix(s)
      // idempotence: a repaired string has nothing left to repair
      assert(fix(f) == f, s"not idempotent on '$s'")
      // mangling never changes the fixpoint (an adversarial s that
      // already LOOKS mis-decoded converges to the same repair)
      assert(fix(mangle(s)) == f, s"mangle changed the fixpoint of '$s'")
      // pristine strings whose repair differs must themselves be
      // strict-UTF-8 reinterpretable (the documented fix gate)
      if (f != s) {
        assert(s.forall(_ <= 0xFF), s"gate violated on '$s'")
      }
    }
  }

  test("null-safe and SQL-exposed") {
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, mangle("ü")))
      .toDF("id", "t")
    r.createOrReplaceTempView("mj")
    val out = spark.sql(
      "SELECT id, graft_fix_mojibake(t) AS f FROM mj ORDER BY id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) == "ü")
  }
}
