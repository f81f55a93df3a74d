package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Field-by-field parity of the fused one-pass [[graft.plans.TextSurfaceStats]]
  * scan against the original Spark built-in formulations (regexp_count,
  * HOF tokenization). Runs over the real sf0.01 corpus AND adversarial
  * edge strings (astral-plane letters, word-final sigma, NBSP, empty).
  * This is what licenses the fused rewrite to keep the DuckDB oracles.
  */
class TextSurfaceStatsSpec extends SparkSpec {
  import spark.implicits._

  private def checkParity(dfIn: org.apache.spark.sql.DataFrame): Unit = {
    val toks = TextAnalysis.tokens(col("text"))
    val stop = Seq(
      ("en", Seq("the", "and", "of")),
      ("de", Seq("der", "die", "das")))
    val st = graft.plans.TextSurfaceStats(col("text"), stop)
    val rows = dfIn.select(
      st.getField("n_chars"), length(col("text")).cast("long"),
      st.getField("n_alpha"), regexp_count(col("text"), lit("[\\p{L}]")).cast("long"),
      st.getField("n_punct"), regexp_count(col("text"), lit("[\\p{Punct}]")).cast("long"),
      st.getField("cjk"), regexp_count(col("text"), lit("[\\x{4E00}-\\x{9FFF}]")).cast("long"),
      st.getField("kana"), regexp_count(col("text"), lit("[\\x{3040}-\\x{30FF}]")).cast("long"),
      st.getField("cyr"), regexp_count(col("text"), lit("[\\x{0400}-\\x{04FF}]")).cast("long"),
      st.getField("n_toks"), size(toks).cast("long"),
      st.getField("sum_tok_len"),
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)),
      st.getField("n_distinct"), size(array_distinct(toks)).cast("long"),
      st.getField("n_ws"), TextAnalysis.tokenCountWhitespaceHof(col("text")),
      st.getField("n_bpe"), TextAnalysis.tokenCountBpeHof(col("text")).cast("long"),
      st.getField("hits").getItem(0),
      size(array_intersect(array_distinct(toks), array(stop.head._2.map(lit): _*))),
      col("text"))
    rows.collect().foreach { r =>
      var i = 0
      while (i < r.length - 1) {
        assert(r.isNullAt(i) == r.isNullAt(i + 1) &&
          (r.isNullAt(i) || r.get(i).toString.toLong == r.get(i + 1).toString.toLong),
          s"field ${i / 2} mismatch (${r.get(i)} vs ${r.get(i + 1)}) " +
            s"for text: ${if (r.isNullAt(r.length - 1)) "NULL" else r.getString(r.length - 1).take(80)}")
        i += 2
      }
    }
  }

  test("fused scan matches built-in formulations on the real corpus") {
    checkParity(spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text"))
  }

  test("fused scan matches built-ins on adversarial edge strings") {
    val edge = Seq(
      "",
      "   \t\n  ",
      "ΑΣ ΤΕΛΟΣ",                       // word-final sigma under lower()
      "𝔘nicode 𝔘", // astral-plane letters (surrogate pairs)
      "a b",                        // NBSP is NOT Java \\s whitespace
      "!!!...???",
      "the the the and of",
      "日本語のテキストです。 카카오 Привет мир",
      "mixed 123 digits42and letters",
      "trailing spaces   ",
      null.asInstanceOf[String])
    checkParity(edge.toDF("text"))
  }

  test("quality/langId/token counts are unchanged by the fused rewrite on real docs") {
    // end-to-end: the public functions (now fused) still produce the exact
    // values the DuckDB oracles pin at sf0.01 — spot-check the aggregate
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = docs.select(
      TextAnalysis.qualityScore(col("text")).as("q"),
      TextAnalysis.langId(col("text")).as("l"),
      TextAnalysis.tokenCountWhitespace(col("text")).as("w"))
    val agg = out.agg(round(sum("q"), 4), sum("w")).head()
    assert(agg.getDouble(0) > 0 && agg.getLong(1) > 0)
    val langs = out.groupBy("l").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs.keySet.subsetOf(Set("en", "de", "fr", "es", "it", "pt",
      "ja", "zh", "ko", "ru", "ar", "und")))
  }
  test("fused lang label equals the Column-level langId formula") {
    val real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text")
    val edge = Seq("", "日本語のテキストです、ひらがな付き。", "Привет мир как дела тут",
      "the and of to is", "der und die das ist", "o a os as que",
      "xyzzy plugh").toDF("text")
    Seq(real, edge).foreach { d =>
      val rows = d.select(TextAnalysis.langId(col("text")).as("k"),
        TextAnalysis.langIdFormula(col("text")).as("f"), col("text")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(0) == r.isNullAt(1) &&
          (r.isNullAt(0) || r.getString(0) == r.getString(1)),
          s"lang mismatch ${r.get(0)} vs ${r.get(1)} for: ${Option(r.getString(2)).getOrElse("NULL").take(60)}")
      }
    }
  }
  test("fused scan matches built-ins on 300 generated unicode strings") {
    val rnd = new scala.util.Random(31337L)
    // alphabet spanning the parity-sensitive classes: ASCII text/punct/
    // digits, accented latin, Greek (incl. capital sigma), Cyrillic, CJK,
    // kana, Arabic, astral-plane letters, NBSP and exotic whitespace
    val alphabet: IndexedSeq[String] =
      ("abcXYZ012 .,!?'\"-_@#$%^&*()[]{}" + "\t\n\r\u000b\f").map(_.toString) ++
      Seq("é", "ß", "Σ", "ς", "Ж", "я", "中", "文", "の", "テ", "한", "م", "ع",
        "\u00a0", "\u3000", "𝔘", "𝕒", "🙂", "½", "²")
    val strings = (0 until 300).map { _ =>
      val len = rnd.nextInt(60)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    checkParity(strings.toDF("text"))
  }
}
