package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UnigramLmTrainSpec extends SparkSpec {
  import spark.implicits._

  // compositional corpus: "un" + root and bare roots — the shape where
  // subword units beat whole words under a tight budget
  private lazy val docs = Seq(
    "unhappy unkind unfit undone unreal",
    "happy kind fit done real",
    "unhappy unkind happy kind unfit",
    "undone unreal done real unhappy").zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("fitEm respects the vocab budget, keeps every char, and learns " +
       "the shared subword under a tight budget") {
    val m = UnigramLm.fitEm(docs, "text", vocabSize = 30, emIters = 3,
      maxPieceLen = 6)
    assert(m.pieces.size <= 30)
    val pieceSet = m.pieces.collect {
      case (p, _, k) if k == UnigramLm.Normal => p }.toSet
    // coverage: every char of the corpus (plus the meta symbol)
    val charsNeeded = ("unhappykindfitdonereal" + UnigramLm.Meta)
      .toSet.map((c: Char) => c.toString)
    assert(charsNeeded.subsetOf(pieceSet),
      s"missing chars: ${charsNeeded -- pieceSet}")
    // the compositional prefix survives EM + pruning
    assert(pieceSet.contains(s"${UnigramLm.Meta}un"),
      s"expected the shared '${UnigramLm.Meta}un' prefix in: " +
        pieceSet.filter(_.length > 1).toSeq.sorted.mkString(", "))
    // and the model tokenizes the corpus into far fewer tokens than
    // character fallback would
    val nTok = docs.select(sum(UnigramLm.tokenCount(col("text"), m)))
      .head().getLong(0)
    val nChars = docs.select(sum(length(regexp_replace(col("text"),
      "\\s+", "x")))).head().getLong(0)
    assert(nTok * 2 < nChars, s"$nTok tokens vs $nChars chars")
  }

  test("fitEm is deterministic across partitionings and round-trips " +
       "the .model wire format") {
    val a = UnigramLm.fitEm(docs, "text", vocabSize = 24, emIters = 2)
    val b = UnigramLm.fitEm(docs.repartition(7), "text", vocabSize = 24,
      emIters = 2)
    assert(a.pieces == b.pieces)
    val reloaded = UnigramLm.loadModelBytes(UnigramLm.exportModelBytes(a))
    val enc1 = docs.select(UnigramLm.encode(col("text"), a).as("i"))
      .collect().map(_.getSeq[Int](0)).toSeq
    val enc2 = docs.select(UnigramLm.encode(col("text"), reloaded).as("i"))
      .collect().map(_.getSeq[Int](0)).toSeq
    assert(enc1 == enc2)
    // decode round-trip: full char coverage means no unks, so decoding
    // restores the normalized text exactly
    enc1.zip(docs.collect().map(_.getString(1))).foreach { case (ids, t) =>
      assert(UnigramLm.decode(ids.map(_.toInt), a) == t)
    }
  }

  test("fitEm seeds by CODE POINT: supplementary-plane characters never " +
       "split into lone surrogates and round-trip the .model wire format") {
    // U+1D54F (𝕏) and U+1F600 (😀) are surrogate PAIRS in UTF-16 — a
    // per-code-unit substring walk would enumerate lone surrogates as
    // vocab "chars", which are not valid Unicode scalar values
    val astral = Seq("𝕏ray data 𝕏ray scan",
      "😀 happy 😀 happy data").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = UnigramLm.fitEm(astral, "text", vocabSize = 40, emIters = 2,
      maxPieceLen = 4)
    m.pieces.foreach { case (p, _, _) =>
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (Character.isHighSurrogate(c)) {
          assert(i + 1 < p.length && Character.isLowSurrogate(p.charAt(i + 1)),
            s"piece '$p' holds a lone high surrogate")
          i += 2
        } else {
          assert(!Character.isLowSurrogate(c),
            s"piece '$p' holds a lone low surrogate")
          i += 1
        }
      }
    }
    // both astral chars survive as single-code-point pieces (coverage)
    val pieceSet = m.pieces.map(_._1).toSet
    assert(pieceSet.contains("𝕏") &&
      pieceSet.contains("😀"))
    // wire-format round-trip is byte-stable and encoding has no unks
    val reloaded = UnigramLm.loadModelBytes(UnigramLm.exportModelBytes(m))
    assert(reloaded.pieces == m.pieces)
    astral.collect().map(_.getString(1)).foreach { t =>
      val ids = Seq(t).toDF("text")
        .select(UnigramLm.encode(col("text"), m).as("i"))
        .head().getSeq[Int](0)
      assert(UnigramLm.decode(ids.map(_.toInt), m) == t)
    }
  }

  test("EM segmentations improve over the seed-frequency baseline: " +
       "later iterations never tokenize the corpus worse") {
    def tokens(iters: Int): Long =
      docs.select(sum(UnigramLm.tokenCount(col("text"),
        UnigramLm.fitEm(docs, "text", vocabSize = 26, emIters = iters))))
        .head().getLong(0)
    val t1 = tokens(1); val t3 = tokens(3)
    assert(t3 <= t1, s"iter3=$t3 vs iter1=$t1")
  }
}
