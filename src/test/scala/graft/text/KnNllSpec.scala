package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[VocabStats.trigramKnNll]] against (a) a brute-force
  * reference implementation of interpolated Kneser-Ney on a hand
  * corpus and (b) the KN normalization identities: the continuation
  * unigram sums to exactly 1 over the vocabulary, and the higher
  * orders sum to 1 for histories free of document-boundary effects
  * (a history that never ends a document, bigram types never
  * exclusively document-initial — KenLM gets this unconditionally from
  * its <s>/</s> markers; self-scoring inherits the boundary caveat).
  */
class KnNllSpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  /** Brute-force interpolated-KN model over per-doc token lists. */
  private final class Ref(docsTokens: Seq[Seq[String]]) {
    val bigrams: Seq[(String, String)] =
      docsTokens.flatMap(ws => ws.zip(ws.drop(1)))
    val trigrams: Seq[(String, String, String)] =
      docsTokens.flatMap(ws => ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq)
    val bcnt = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val tcnt = trigrams.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = docsTokens.flatten.distinct

    def n3f(w1: String, w2: String): Int =
      tcnt.keys.count(t => t._1 == w1 && t._2 == w2)
    def cc2(w2: String, w3: String): Int =
      tcnt.keys.count(t => t._2 == w2 && t._3 == w3)
    def nmid(w2: String): Int = tcnt.keys.count(_._2 == w2)
    def n2f(w2: String): Int = bcnt.keys.count(_._1 == w2)
    def cc1(w3: String): Int = bcnt.keys.count(_._2 == w3)
    def b: Int = bcnt.size

    def pUni(w3: String): Double = cc1(w3).toDouble / b
    def pMid(w2: String, w3: String): Double =
      math.max(cc2(w2, w3) - D, 0.0) / nmid(w2) +
        D * n2f(w2) / nmid(w2) * pUni(w3)
    def pTri(w1: String, w2: String, w3: String): Double =
      math.max(tcnt.getOrElse((w1, w2, w3), 0) - D, 0.0) / bcnt((w1, w2)) +
        D * n3f(w1, w2) / bcnt((w1, w2)) * pMid(w2, w3)

    def nll(ws: Seq[String]): Option[Double] = {
      val tgs = ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq
      if (tgs.isEmpty) None
      else Some(-tgs.map { case (a, b2, c) => math.log(pTri(a, b2, c)) }.sum
        / tgs.size)
    }
  }

  // "a b c" repeats so the (a,b) history is both doc-initial AND
  // interior; the docs end in unique tails so (a,b) never ends a doc
  private val texts = Seq(
    (1L, "a b c a b d a b c x y"),
    (2L, "a b d a b c b c a q"),
    (3L, "c a b c a b d z w v"),
    (4L, "xx")) // < 3 words: n_trigrams = 0, null nll
  private lazy val ref = new Ref(texts.map(_._2.split("\\s+").toSeq)
    .filter(_.size >= 1))

  test("trigramKnNll equals a brute-force interpolated-KN reference") {
    val out = VocabStats.trigramKnNll(texts.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    texts.foreach { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      val want = ref.nll(ws)
      val (n, got) = out(id)
      assert(n == math.max(ws.size - 2, 0), s"doc $id trigram count")
      (got, want) match {
        case (Some(g), Some(w)) =>
          assert(math.abs(g - w) < 5e-5, // round(4) on the library side
            s"doc $id: library $g vs reference $w")
        case (None, None) => ()
        case other => fail(s"doc $id: $other")
      }
    }
  }

  test("KN identities: continuation unigram sums to 1 exactly; higher " +
       "orders sum to 1 for boundary-free histories") {
    val uniSum = ref.vocab.map(ref.pUni).sum
    assert(math.abs(uniSum - 1.0) < 1e-12,
      s"sum of continuation-unigram mass = $uniSum")
    // history (a,b): occurs 6x, always followed (never document-final)
    val triSum = ref.vocab.map(w3 => ref.pTri("a", "b", w3)).sum
    assert(math.abs(triSum - 1.0) < 1e-12,
      s"sum p(.|a b) = $triSum")
    // middle order for w2 = b: every (b, .) bigram type occurs interior
    // to a trigram (docs never start with "b ..."), so N1+ types align
    val midSum = ref.vocab.map(w3 => ref.pMid("b", w3)).sum
    assert(math.abs(midSum - 1.0) < 1e-12,
      s"sum p(.|b) = $midSum")
    // and the discount actually moved mass: the backoff weight for the
    // (a,b) history is strictly positive
    assert(D * ref.n3f("a", "b") / ref.bcnt(("a", "b")) > 0.0)
  }

  test("knBuckets tiers by the KN score per language; unscoreable docs " +
       "land in the tail tier") {
    val docs = texts.map { case (id, t) => (id, t, if (id <= 2) "en" else "de") }
      .toDF("doc_id", "text", "lang")
    val out = VocabStats.knBuckets(docs, "doc_id", "text", "lang",
        buckets = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(4))).toMap
    assert(out.size == 4)
    // de language: doc 3 (scoreable) tiers ahead of doc 4 (2 words, null)
    assert(out(3L) == (("de", 1L)) && out(4L) == (("de", 2L)),
      s"null-nll docs must land in the tail tier: $out")
    // en language: the two docs split across the two tiers by nll order
    val en = Seq(1L, 2L).map(out(_)._2).sorted
    assert(en == Seq(1L, 2L), s"en tiers: $out")
  }

  test("KN demotes the one-collocation word below a spread word " +
       "(the 'Francisco' property)") {
    // "sf" appears 4 times but ONLY after "visit": high raw frequency,
    // continuation count 1. "ok" appears 4 times after 4 different
    // predecessors. Raw-unigram scoring ranks them equal; KN must not.
    val d = new Ref(Seq(
      "visit sf q visit sf r visit sf s visit sf".split(" ").toSeq,
      "a ok b ok c ok d ok".split(" ").toSeq))
    assert(d.cc1("sf") == 1 && d.cc1("ok") == 4)
    assert(d.pUni("ok") > d.pUni("sf"),
      s"continuation p: ok=${d.pUni("ok")} must exceed sf=${d.pUni("sf")}")
  }
}
