package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WordPiece against the published BERT semantics: greedy
  * longest-match-first with `##` continuations, whole-word `[UNK]` on
  * unsegmentable input, BasicTokenizer punctuation/case/accent rules,
  * the one-token-per-line `vocab.txt` interchange format, and the
  * codegen'd Column surface.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def model(tokens: String*): WordPiece.Model =
    WordPiece.Model((("[UNK]" +: tokens).zipWithIndex).toMap).validated

  private def pieces(m: WordPiece.Model, text: String): Seq[String] = {
    val ids = Seq((1L, text)).toDF("id", "t")
      .select(WordPiece.encode(col("t"), m)).head().getSeq[Int](0)
    ids.map(m.inverse)
  }

  test("the published example: 'unaffable' -> un ##aff ##able") {
    val m = model("un", "##aff", "##able", "aff", "able")
    assert(pieces(m, "unaffable") == Seq("un", "##aff", "##able"))
  }

  test("greedy longest-match-first beats char-by-char") {
    val m = model("h", "##u", "##g", "##s", "hug", "hugs")
    assert(pieces(m, "hugs") == Seq("hugs"))
    assert(pieces(m, "hugg") == Seq("hug", "##g"))
  }

  test("an unsegmentable word becomes ONE [UNK], not partial pieces") {
    val m = model("un", "##aff")
    // 'unaffable' matches un ##aff then dies at 'able' — the published
    // rule replaces the WHOLE word, not the tail
    assert(pieces(m, "unaffable") == Seq("[UNK]"))
  }

  test("words longer than maxInputChars collapse to [UNK]") {
    val m = WordPiece.Model(Seq("[UNK]", "a", "##a").zipWithIndex.toMap,
      maxInputChars = 4)
    assert(pieces(m, "aaaa aaaaa") == Seq("a", "##a", "##a", "##a", "[UNK]"))
  }

  test("BasicTokenizer: punctuation splits off, case folds, accents strip") {
    val m = model("hello", "world", ",", "cafe")
    assert(pieces(m, "Hello,world") == Seq("hello", ",", "world"))
    // NFD accent stripping: Café -> cafe (combining mark dropped)
    assert(pieces(m, "Café") == Seq("cafe"))
  }

  test("lowerCase=false keeps case and accents (cased checkpoints)") {
    val m = WordPiece.Model(
      Seq("[UNK]", "Hello", "hello").zipWithIndex.toMap, lowerCase = false)
    assert(pieces(m, "Hello hello") == Seq("Hello", "hello"))
  }

  test("vocab.txt round-trip: id = line number, export == reload") {
    val txt = "[PAD]\n[UNK]\nthe\n##s\n"
    val m = WordPiece.load(txt)
    assert(m.vocab("[PAD]") == 0 && m.vocab("[UNK]") == 1 &&
      m.vocab("the") == 2 && m.vocab("##s") == 3)
    assert(WordPiece.exportVocabTxt(m) == txt)
    val again = WordPiece.load(WordPiece.exportVocabTxt(m))
    assert(again.vocab == m.vocab)
  }

  test("decode fuses ## joints and spaces word starts; lossy by design") {
    val m = model("un", "##aff", "##able", "is", "fine")
    val ids = Seq("un", "##aff", "##able", "is", "fine").map(m.vocab)
    assert(WordPiece.decode(ids, m) == "unaffable is fine")
  }

  test("fitted baseline: full char coverage means zero [UNK] on the " +
      "corpus itself; fit -> export -> load round-trips") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = WordPiece.fit(docs, "text", vocabSize = 200)
    val reloaded = WordPiece.load(WordPiece.exportVocabTxt(m))
    assert(reloaded.vocab == m.vocab)
    val unk = docs.select(WordPiece.encode(col("text"), reloaded).as("ids"))
      .select(explode(col("ids")).as("id"))
      .filter(col("id") === m.unkId).count()
    assert(unk == 0L, "char coverage must make [UNK] unreachable here")
    // count column and encode column agree
    val row = docs.limit(50)
      .select(sum(WordPiece.tokenCount(col("text"), m)).as("c"),
        sum(size(WordPiece.encode(col("text"), m))).as("s")).head()
    assert(row.getLong(0) == row.getLong(1))
  }

  test("fit char inventory covers the WHOLE corpus, not just top-N " +
      "words: a rare word of otherwise-unseen chars still tokenizes") {
    import spark.implicits._
    // top-2 words are 'aa'/'bb'; 'qz' is rank 3 and its characters
    // appear nowhere in the top-2 — a top-N-only inventory would have
    // no 'q'/'z' pieces and emit [UNK] (the r14 ADVICE finding)
    val docs = Seq("aa bb", "aa bb", "aa bb qz").toDF("text")
    val m = WordPiece.fit(docs, "text", vocabSize = 2)
    val ids = spark.range(1)
      .select(WordPiece.encode(lit("qz"), m).as("ids"))
      .head().getSeq[Int](0)
    assert(ids.nonEmpty && !ids.contains(m.unkId),
      s"full-corpus char coverage must tokenize 'qz' without [UNK]: $ids")
  }

  test("a pretrained-format vocab head encodes like the real thing") {
    // the published bert-base-uncased vocab.txt head layout: specials
    // first, then characters, then frequent pieces — hand-built slice
    // with REAL published tokens; 'the' and '##s' are single pieces
    val m = WordPiece.load(
      "[PAD]\n[UNK]\n[CLS]\n[SEP]\nthe\na\n##s\nbook\n##ing\n")
    assert(pieces(m, "the books") == Seq("the", "book", "##s"))
    assert(pieces(m, "booking") == Seq("book", "##ing"))
    assert(pieces(m, "THE") == Seq("the"), "uncased folds case")
  }
}
