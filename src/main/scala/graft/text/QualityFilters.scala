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
}
