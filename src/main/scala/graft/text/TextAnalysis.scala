package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language identification, quality scoring, token counting, and document
  * fingerprinting. All are pure Column expressions built from Spark
  * built-ins (codegen'd, no UDFs), so they inline into whole-stage codegen
  * and run as a single scan at any scale.
  */
object TextAnalysis {

  /** Lowercased word tokens (unicode-letter runs). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), t => length(t) > 0)

  /** The fused one-pass surface-statistics struct (see
    * [[graft.plans.TextSurfaceStats]]) every scorer below reads from.
    * Within one projection Spark's subexpression elimination evaluates it
    * once per row even though the formulas reference many fields.
    */
  def surfaceStats(text: Column): Column =
    graft.plans.TextSurfaceStats(text, stopwords)

  /** Whitespace token count. */
  def tokenCountWhitespace(text: Column): Column =
    surfaceStats(text).getField("n_ws")

  /** BPE-ish token count: word pieces + standalone punctuation, the usual
    * pre-tokenization granularity (≈ GPT-2 pre-tokenizer classes).
    */
  def tokenCountBpe(text: Column): Column =
    surfaceStats(text).getField("n_bpe")

  // HOF/regex formulations kept for the parity spec (TextAnalysisSpec
  // asserts the fused scan reproduces them exactly)
  private[text] def tokenCountWhitespaceHof(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0)).cast("long")
  private[text] def tokenCountBpeHof(text: Column): Column =
    regexp_count(text, lit("[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]"))

  // --- language identification ----------------------------------------

  /** Per-language stopword markers (high-frequency function words chosen to
    * be disjoint across languages where possible).
    */
  // declaration order is the tie-break priority (first wins on equal hits)
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for", "was",
      "this", "are", "have", "not", "you", "they"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "für", "auf", "sich", "dass", "von", "wir"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "pour", "dans", "que",
      "pas", "des", "vous", "avec", "sur", "nous"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "que", "con",
      "por", "del", "se", "su", "como", "más"),
    "it" -> Seq("il", "la", "che", "di", "non", "per", "una", "sono", "con",
      "del", "gli", "ma", "questo", "anche", "come"),
    "pt" -> Seq("o", "a", "os", "as", "que", "não", "uma", "para", "com",
      "por", "do", "da", "em", "se", "mais"))

  /** Heuristic language ID. Script detection first (CJK → zh, Cyrillic →
    * ru, …), then stopword voting among latin-script languages; "und"
    * (undetermined) when nothing scores. One fused scan
    * ([[surfaceStats]]) — the label itself is computed in the kernel
    * because the decision when-chain would otherwise defeat subexpression
    * elimination and re-evaluate the scan per branch;
    * [[langIdFormula]] is the Column-level formulation the spec pins the
    * kernel against.
    */
  def langId(text: Column): Column = surfaceStats(text).getField("lang")

  private[text] def langIdFormula(text: Column): Column = {
    val st = surfaceStats(text)
    val n = st.getField("n_chars")
    def scriptRatio(field: String): Column =
      when(n > 0, st.getField(field).cast("double") / n).otherwise(0.0)
    val cjk = scriptRatio("cjk")
    val kana = scriptRatio("kana")
    val hangul = scriptRatio("hangul")
    val cyr = scriptRatio("cyr")
    val arab = scriptRatio("arab")

    val hits = st.getField("hits")
    val scores = stopwords.zipWithIndex.map { case ((lang, _), i) =>
      lang -> hits.getItem(i)
    }
    // argmax over stopword hits, ties broken by map order; 0 hits → "und"
    val best = scores.foldLeft((lit("und"), lit(0))) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }._1

    when(kana > 0.05, "ja")
      .when(cjk > 0.1, "zh")
      .when(hangul > 0.1, "ko")
      .when(cyr > 0.2, "ru")
      .when(arab > 0.2, "ar")
      .otherwise(best)
  }

  // --- quality scoring -------------------------------------------------

  /** Heuristic document-quality score in [0,1] from cheap surface
    * statistics: length, alphabetic ratio, mean word length sanity,
    * punctuation density, and word-repetition. The components mirror the
    * usual pretraining-corpus filters (Gopher/C4-style rules).
    */
  def qualityScore(text: Column): Column = {
    val st = surfaceStats(text)
    val n = st.getField("n_chars").cast("double")
    val nToks = st.getField("n_toks").cast("double")
    val alphaRatio = when(n > 0, st.getField("n_alpha").cast("double") / n).otherwise(0.0)
    val punctRatio = when(n > 0, st.getField("n_punct").cast("double") / n).otherwise(0.0)
    val meanWordLen = when(nToks > 0,
      st.getField("sum_tok_len").cast("double") / nToks).otherwise(0.0)
    val distinctRatio = when(nToks > 0,
      st.getField("n_distinct").cast("double") / nToks).otherwise(0.0)

    val lengthScore = least(n / 200.0, lit(1.0)) // ramps to 1 at 200 chars
    val wordLenScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.3)
    val punctScore = when(punctRatio < 0.2, 1.0).otherwise(0.4)
    val score = lengthScore * 0.25 + alphaRatio * 0.25 +
      wordLenScore * 0.2 + punctScore * 0.1 + distinctRatio * 0.2
    round(least(greatest(score, lit(0.0)), lit(1.0)), 4)
  }

  // --- fingerprinting --------------------------------------------------

  /** Whitespace/case-normalized md5 content fingerprint — the fused
    * one-pass kernel; equal to
    * `md5(trim(lower(regexp_replace(text, "\\s+", " "))))` (pinned by
    * NormalizedMd5Spec), which chains four whole-string materializations
    * per row.
    */
  def fingerprintMd5(text: Column): Column =
    graft.plans.expressions.normalized_md5(text)

  /** 64-bit rolling-style fingerprint (xxhash64 of the normalized text) —
    * cheaper than md5 when only grouping is needed.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(trim(lower(regexp_replace(text, "\\s+", " "))))

  // --- DataFrame-level helpers ----------------------------------------

  def withTextStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_chars", length(col(textCol)))
      .withColumn("n_words", tokenCountWhitespace(col(textCol)))
      .withColumn("n_tokens_bpe", tokenCountBpe(col(textCol)))
      .withColumn("lang", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
}
