package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition-based document-quality filters for pretraining corpora —
  * the public Gopher repetition rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", table A1)
  * plus C4-style boilerplate heuristics, computed by the one-pass fused
  * kernel [[graft.plans.RepetitionStats]] (codegen'd, no UDFs — a single
  * scan per document regardless of how many signals are read, so the
  * filter costs one projection at 100 TB).
  */
object QualityFilters {

  /** All repetition statistics of a text as one struct column — evaluate
    * once per row (Spark's subexpression elimination collapses repeated
    * references within a projection).
    */
  def repetitionStats(text: Column): Column = graft.plans.RepetitionStats(text)

  /** Fraction of nonempty lines that repeat an identical earlier line. */
  def dupLineFraction(text: Column): Column =
    repetitionStats(text).getField("dup_line_frac")

  /** Fraction of line characters inside lines occurring ≥ 2 times. */
  def dupLineCharFraction(text: Column): Column =
    repetitionStats(text).getField("dup_line_char_frac")

  /** Token-character mass of the most frequent word bigram / total. */
  def topBigramCharFraction(text: Column): Column =
    repetitionStats(text).getField("top2gram_char_frac")

  /** Token-character mass of the most frequent word trigram / total. */
  def topTrigramCharFraction(text: Column): Column =
    repetitionStats(text).getField("top3gram_char_frac")

  /** Token-character mass of all word 5-grams occurring ≥ 2 times / total. */
  def dupFiveGramCharFraction(text: Column): Column =
    repetitionStats(text).getField("dup5gram_char_frac")

  /** Boolean keep-decision under the Gopher repetition thresholds
    * (defaults are the published values; every signal reads the same
    * struct, so the whole predicate is one fused scan).
    */
  def gopherRepetitionKeep(text: Column,
                           maxDupLineFrac: Double = 0.30,
                           maxDupLineCharFrac: Double = 0.20,
                           maxTop2CharFrac: Double = 0.20,
                           maxTop3CharFrac: Double = 0.18,
                           maxDup5CharFrac: Double = 0.15): Column = {
    val st = repetitionStats(text)
    st.getField("dup_line_frac") <= maxDupLineFrac &&
      st.getField("dup_line_char_frac") <= maxDupLineCharFrac &&
      st.getField("top2gram_char_frac") <= maxTop2CharFrac &&
      st.getField("top3gram_char_frac") <= maxTop3CharFrac &&
      st.getField("dup5gram_char_frac") <= maxDup5CharFrac
  }

  /** Drop documents failing the Gopher repetition rules. */
  def filterRepetitive(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame =
    df.filter(gopherRepetitionKeep(col(textCol)))

  /** The eight highest-frequency English function words Gopher's "stop
    * word" rule checks for (a document must contain at least two).
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Non-overlapping occurrence count of a literal `needle` via the
    * replace-length trick — identical greedy left-to-right semantics in
    * Spark and DuckDB, so oracles can replay it verbatim.
    */
  private def litCount(text: Column, needle: String): Column =
    (length(text) - length(replace(text, lit(needle), lit("")))) / needle.length

  /** Gopher document-quality signals (Rae et al. 2021, table A1 — the
    * non-repetition rules; repetition lives in [[repetitionStats]]).
    * Computed entirely from codegen'd built-ins (split / HOF filter /
    * length arithmetic), no UDFs and no kernel: one projection per row
    * at any scale. Words = maximal non-whitespace runs; lines = `\n`
    * splits with blank lines ignored for the line-fraction rules.
    */
  def gopherQualitySignals(text: Column): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w))
    val meanWordLen = when(nWords > 0, sumLen.cast("double") / nWords).otherwise(lit(0.0))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val fracAlpha = when(nWords > 0, alphaWords.cast("double") / nWords).otherwise(lit(0.0))
    // symbol-to-word ratio: '#' plus ellipses ('…' or literal '...')
    val nSymbols = litCount(text, "#") + litCount(text, "…") + litCount(text, "...")
    val symbolRatio =
      when(nWords > 0, nSymbols.cast("double") / nWords).otherwise(lit(0.0))
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l =>
      ltrim(l).startsWith("•") || ltrim(l).startsWith("- ") ||
        ltrim(l).startsWith("* "))).cast("long")
    val ellipsisLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…"))).cast("long")
    val fracBullet =
      when(nLines > 0, bulletLines.cast("double") / nLines).otherwise(lit(0.0))
    val fracEllipsis =
      when(nLines > 0, ellipsisLines.cast("double") / nLines).otherwise(lit(0.0))
    val wordsLower = transform(words, w => lower(w))
    val stopHits = size(filter(
      array(gopherStopwords.map(lit): _*),
      s => array_contains(wordsLower, s))).cast("long")
    struct(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      fracAlpha.as("frac_alpha_words"),
      symbolRatio.as("symbol_word_ratio"),
      fracBullet.as("frac_bullet_lines"),
      fracEllipsis.as("frac_ellipsis_lines"),
      stopHits.as("stop_hits"))
  }

  /** Boolean keep-decision under the published Gopher document-quality
    * thresholds (word count 50..100k, mean word length 3..10, symbol
    * ratio ≤ 0.1, bullet lines ≤ 90%, ellipsis lines ≤ 30%, ≥ 80% words
    * alphabetic, ≥ 2 of the eight canonical stop words). Every signal
    * reads the same struct, so the predicate is one fused projection.
    */
  def gopherQualityKeep(text: Column,
                        minWords: Long = 50L,
                        maxWords: Long = 100000L,
                        minMeanWordLen: Double = 3.0,
                        maxMeanWordLen: Double = 10.0,
                        maxSymbolRatio: Double = 0.1,
                        maxBulletFrac: Double = 0.90,
                        maxEllipsisFrac: Double = 0.30,
                        minAlphaFrac: Double = 0.80,
                        minStopHits: Long = 2L): Column = {
    val st = gopherQualitySignals(text)
    st.getField("n_words").between(minWords, maxWords) &&
      st.getField("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
      st.getField("symbol_word_ratio") <= maxSymbolRatio &&
      st.getField("frac_bullet_lines") <= maxBulletFrac &&
      st.getField("frac_ellipsis_lines") <= maxEllipsisFrac &&
      st.getField("frac_alpha_words") >= minAlphaFrac &&
      st.getField("stop_hits") >= minStopHits
  }

  /** Drop documents failing the Gopher document-quality rules. */
  def filterGopherQuality(df: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame =
    df.filter(gopherQualityKeep(col(textCol)))
}
