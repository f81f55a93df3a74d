package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId identifies real-language samples") {
    val samples = Seq(
      ("en", "The quick brown fox jumps over the lazy dog and they are not amused by this."),
      ("de", "Der schnelle braune Fuchs springt über den faulen Hund und das ist nicht lustig für die Katze."),
      ("fr", "Le renard brun rapide saute par-dessus le chien paresseux et ce n'est pas amusant pour les chats."),
      ("es", "El zorro marrón rápido salta sobre el perro perezoso y no es una broma para los gatos."),
      ("zh", "敏捷的棕色狐狸跳过了懒惰的狗这不是一个玩笑"),
      ("ru", "Быстрая коричневая лиса перепрыгнула через ленивую собаку и это не шутка"),
      ("ja", "すばしっこい茶色の狐はのろまな犬を飛び越えます"))
    val out = samples.toDF("expected", "text")
      .withColumn("detected", TextAnalysis.langId(col("text")))
      .collect().map(r => r.getString(0) -> r.getString(2))
    out.foreach { case (exp, det) => assert(det == exp, s"expected $exp got $det") }
  }

  test("token counts: whitespace vs BPE-ish") {
    val out = Seq("Hello, world! It's 42.").toDF("text").select(
      TextAnalysis.tokenCountWhitespace(col("text")).as("ws"),
      TextAnalysis.tokenCountBpe(col("text")).as("bpe")).head()
    assert(out.getLong(0) == 4)
    // hello , world ! it ' s 42 . → 9
    assert(out.getLong(1) == 9)
  }

  test("quality score orders clean text above garbage") {
    val rows = Seq(
      ("clean", "This is a well formed paragraph of reasonable length. It contains " +
        "several sentences with varied vocabulary, proper punctuation, and a " +
        "natural distribution of common words that a quality filter should like."),
      ("garbage", "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),
      ("repeat", "spam spam spam spam spam spam spam spam spam spam spam spam"))
      .toDF("kind", "text")
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("clean") > rows("garbage"))
    assert(rows("clean") > rows("repeat"))
    assert(rows.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprints are whitespace/case-insensitive") {
    val out = Seq(
      ("a", "Hello   World\n\tfoo"),
      ("b", "hello world foo"),
      ("c", "entirely different"))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprintMd5(col("text")).as("f"),
        TextAnalysis.fingerprint64(col("text")).as("f64"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("a") == out("b"))
    assert(out("a") != out("c"))
  }

  test("withTextStats over real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.withTextStats(docs.drop("lang"), "text")
    assert(out.count() == docs.count())
    val r = out.select("n_chars", "n_words", "n_tokens_bpe", "quality").head()
    assert(r.getInt(0) > 0 && r.getLong(1) > 0 && r.getLong(2) > 0)
  }
}
