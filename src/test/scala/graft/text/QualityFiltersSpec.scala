package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins [[graft.plans.RepetitionStats]] against an independent plain-Scala
  * reference implementation (different code path: collections groupBy, no
  * incremental scan) on planted repetition cases and edges.
  */
class QualityFiltersSpec extends SparkSpec {
  import spark.implicits._

  // independent reference: straightforward collections implementation
  private def ref(text: String): (Long, Double, Double, Double, Double, Double) = {
    val lines = text.split("\n", -1).toSeq
      .map(_.dropWhile(c => c == ' ' || c == '\t' || c == '\r')
        .reverse.dropWhile(c => c == ' ' || c == '\t' || c == '\r').reverse)
      .filter(_.nonEmpty)
    val byLine = lines.groupBy(identity).view.mapValues(_.size).toMap
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    val nLines = lines.size.toLong
    val dupLineFrac =
      if (nLines > 0) (nLines - byLine.size).toDouble / nLines else 0.0
    val totChars = lines.map(cp).sum
    val dupChars = byLine.collect { case (l, c) if c >= 2 => c * cp(l) }.sum
    val dupLineCharFrac = if (totChars > 0) dupChars.toDouble / totChars else 0.0

    val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
    val sumTokLen = toks.map(cp).sum
    def grams(n: Int): Map[Seq[String], Int] =
      if (toks.size < n) Map.empty
      else toks.sliding(n).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    def mass(g: Seq[String], c: Int): Long = c.toLong * g.map(cp).sum
    def frac(x: Long): Double =
      if (sumTokLen > 0) math.min(x.toDouble / sumTokLen, 1.0) else 0.0
    def top(n: Int): Long =
      grams(n).collect { case (g, c) if c >= 2 => mass(g, c) }.foldLeft(0L)(math.max)
    val dup5 = grams(5).collect { case (g, c) if c >= 2 => mass(g, c) }.sum
    (nLines, dupLineFrac, dupLineCharFrac, frac(top(2)), frac(top(3)), frac(dup5))
  }

  private def kernel(text: String): (Long, Double, Double, Double, Double, Double) = {
    val r = Seq(text).toDF("t")
      .select(QualityFilters.repetitionStats(col("t")).as("st"))
      .select("st.*").head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))
  }

  private val cases = Seq(
    "hello world hello world hello world",              // repeated bigram
    "spam spam spam spam spam spam",                    // one token repeated
    "a line\na line\nanother line\n\n  a line  ",       // duplicate lines + trim
    "one two three four five one two three four five",  // repeated 5-gram
    "unique words only here today",                     // no repetition
    "x",                                                // single token
    "123 456 789",                                      // no letters → no tokens
    "",                                                 // empty
    "tab\t\nline\r\ntab\t",                             // CR/tab trimming
    "Der die DAS der Die das")                          // case folding

  test("kernel matches the independent reference on planted cases") {
    for (c <- cases) assert(kernel(c) == ref(c), s"case: ${c.take(40)}")
  }

  test("null text yields null struct") {
    val r = Seq[(String, Int)]((null, 1)).toDF("t", "i")
      .select(QualityFilters.repetitionStats(col("t")).as("st")).head()
    assert(r.isNullAt(0))
  }

  test("gopherRepetitionKeep drops the planted spam and keeps clean text") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a perfectly normal sentence with varied interesting words")
    ).toDF("doc_id", "t")
    val kept = QualityFilters.filterRepetitive(d, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("boilerplate-heavy doc fails dup_line_char_frac specifically") {
    val footer = "subscribe to our newsletter for more updates"
    val t = s"real content paragraph\n$footer\nmore real content\n$footer"
    val st = kernel(t)
    assert(st._3 > 0.20, s"dup_line_char_frac=${st._3}") // footer dominates
  }

  // ---- Gopher document-quality (non-repetition) rules ------------------

  private def gopher(text: String): Row =
    Seq(text).toDF("t")
      .select(QualityFilters.gopherQualitySignals(col("t")).as("st"))
      .select("st.*").head()

  test("gopher signals on a crafted document") {
    val t = "the quick brown fox #tag jumps…\n" +
      "- bullet item one\n" +
      "* bullet item two\n" +
      "plain line that trails off...\n" +
      "   \n" + // blank (ignored by line rules)
      "12345 !!! end"
    val r = gopher(t)
    assert(r.getLong(0) == 22L, "n_words counts non-whitespace runs")
    // '#' ×1, '…' ×1, '...' ×1 → 3 symbols / 22 words
    assert(math.abs(r.getDouble(3) - 3.0 / 22) < 1e-12, s"symbol ratio ${r.getDouble(3)}")
    // 5 nonempty lines, 2 bullets, 2 ellipsis-enders ('…' and '...')
    assert(r.getDouble(4) == 2.0 / 5, "bullet fraction")
    assert(r.getDouble(5) == 2.0 / 5, "ellipsis fraction")
    // words w/o [A-Za-z]: '-', '*', '12345', '!!!' → 18/22 alphabetic
    assert(math.abs(r.getDouble(2) - 18.0 / 22) < 1e-12, "alpha-word fraction")
    // canonical stopwords present: 'the', 'that' → 2
    assert(r.getLong(6) == 2L, "stop hits")
  }

  test("bullet marker followed by only spaces still counts as a bullet " +
       "(ltrim(l) LIKE '- %' semantics)") {
    val r = gopher("- \nreal line\n* ")
    assert(r.getDouble(4) == 2.0 / 3, s"'- ' and '* ' are bullets: ${r.getDouble(4)}")
  }

  test("gopher signals on empty text are total (no div-by-zero)") {
    val r = gopher("")
    assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0 &&
      r.getDouble(4) == 0.0 && r.getLong(6) == 0L)
  }

  test("compressionRatio separates prose, repetition, and noise; " +
       "filterCompressible cuts both tails") {
    val prose = "The committee reviewed the proposal in detail and " +
      "suggested several amendments before the final vote was scheduled " +
      "for the following quarter, citing budget concerns and timelines."
    val repetitive = "spam spam spam " * 200
    val noise = (1 to 400).map(i => graft.plans.ExprKernels.mix64(i)
      .toHexString).mkString("")
    val d = Seq((1L, prose), (2L, repetitive), (3L, noise), (4L, ""))
      .toDF("doc_id", "t")
    val r = d.select(col("doc_id"),
        QualityFilters.compressionRatio(col("t")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > 0.3 && r(1L) < 0.9, s"prose mid-band: ${r(1L)}")
    assert(r(2L) < 0.05, s"50×-pasted text near zero: ${r(2L)}")
    // hex carries 4 bits/byte, so 0.5 is its entropy floor — deflate
    // should land just above it, far from prose's dictionary wins
    assert(r(3L) > 0.55, s"hex noise sits at its entropy floor: ${r(3L)}")
    assert(r(4L) == 1.0, "empty text pins to 1.0")
    // deterministic: the same document always gets the same ratio
    val again = d.select(col("doc_id"),
        QualityFilters.compressionRatio(col("t")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again == r)
    val kept = QualityFilters.filterCompressible(d, "t",
        minRatio = 0.1, maxRatio = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L) || kept == Set(1L),
      s"repetition and empty cut; prose kept: $kept")
    intercept[IllegalArgumentException](
      QualityFilters.filterCompressible(d, "t", minRatio = 0.9, maxRatio = 0.1))
  }

  test("gopherQualityKeep applies the published thresholds") {
    val good = ("the and of to that have be with word " * 8).trim // 72 words, all rules pass
    val tooShort = "the and of short"
    val symbols = ("the and of " * 20).trim + " " + ("# " * 30).trim // symbol ratio > 0.1
    val d = Seq((1L, good), (2L, tooShort), (3L, symbols)).toDF("doc_id", "t")
    val kept = QualityFilters.filterGopherQuality(d, "t")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }
}
