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

  /** Gopher document-quality signals (Rae et al. 2021, table A1 — the
    * non-repetition rules; repetition lives in [[repetitionStats]]).
    * All counters come from the one-pass codegen'd kernel
    * [[graft.plans.GopherStats]] (the unfused HOF formulation
    * re-tokenized the document once per signal, interpreted); the
    * fractions here are single double divisions of those counters, with
    * division order pinned to the DuckDB oracle formulation. Words =
    * maximal non-whitespace runs; lines = `\n` splits with blank lines
    * ignored for the line-fraction rules; symbols = '#' + '…' + literal
    * non-overlapping "..." occurrences.
    */
  def gopherQualitySignals(text: Column): Column = {
    val st = graft.plans.GopherStats(text, gopherStopwords)
    val nWords = st.getField("n_words")
    val nLines = st.getField("n_lines")
    val meanWordLen = when(nWords > 0,
      st.getField("sum_word_len").cast("double") / nWords).otherwise(lit(0.0))
    val fracAlpha = when(nWords > 0,
      st.getField("alpha_words").cast("double") / nWords).otherwise(lit(0.0))
    val symbolRatio = when(nWords > 0,
      st.getField("n_symbols").cast("double") / nWords).otherwise(lit(0.0))
    val fracBullet = when(nLines > 0,
      st.getField("bullet_lines").cast("double") / nLines).otherwise(lit(0.0))
    val fracEllipsis = when(nLines > 0,
      st.getField("ellipsis_lines").cast("double") / nLines).otherwise(lit(0.0))
    struct(
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      fracAlpha.as("frac_alpha_words"),
      symbolRatio.as("symbol_word_ratio"),
      fracBullet.as("frac_bullet_lines"),
      fracEllipsis.as("frac_ellipsis_lines"),
      st.getField("stop_hits").as("stop_hits"))
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

  /** Deflate compression ratio of the document (compressed bytes / raw
    * bytes, raw-deflate at zlib level 6) — the model-free signal that
    * catches BOTH failure tails the word-statistics rules can saturate
    * on: a page that is one paragraph pasted 50 times compresses to a
    * ratio near 0.02 (Gopher's dup-ngram fractions cap at 1.0 long
    * before distinguishing 10× from 50× repetition), while minified
    * blobs / base64 / binary-in-text sit near or above 1.0. One codegen
    * pass, thread-local native state — scan speed.
    */
  def compressionRatio(text: Column): Column =
    graft.plans.expressions.deflate_ratio(text)

  /** Keep documents whose compression ratio lies inside
    * `[minRatio, maxRatio]` — the published both-tail band cut. Defaults
    * bound the obviously-degenerate tails; tune per corpus (prose
    * typically deflates to 0.3-0.5).
    */
  def filterCompressible(df: org.apache.spark.sql.DataFrame, textCol: String,
                         minRatio: Double = 0.1, maxRatio: Double = 0.9)
      : org.apache.spark.sql.DataFrame = {
    require(minRatio >= 0.0 && minRatio < maxRatio,
      s"need 0 <= minRatio < maxRatio, got [$minRatio, $maxRatio]")
    df.filter(compressionRatio(col(textCol)).between(minRatio, maxRatio))
  }
}
