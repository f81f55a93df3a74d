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

  test("trigramModKnNll equals a brute-force modified-KN reference; " +
       "discounts sit in their theoretical ranges") {
    // the corpus must have n1..n4 > 0 at both orders for the estimate:
    // engineer repeats so trigram counts 1,2,3,4 all occur
    val mtexts = Seq(
      (1L, "a b c a b c a b c a b c x"), // (a,b,c) x4
      (2L, "a b d a b d a b d q r s"),   // (a,b,d) x3
      (3L, "a b e a b e t u v w"),       // (a,b,e) x2
      (4L, "a b f g h i j k"),           // (a,b,f) x1
      (5L, "c a b d a b e a b f a"),
      // continuation spread: (b,c) preceded by {a,x}=2, (b,d) by
      // {a,y,x}=3, (b,e) by {a,x,y,z}=4 -> continuation n2..n4 > 0
      (6L, "x b c y b d x b d x b e y b e z b e"))
    val toks = mtexts.map(_._2.split("\\s+").toSeq)
    val bcnt = toks.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val tcnt = toks.flatMap(ws =>
      ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val cc2 = tcnt.keys.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    def coc(m: Iterable[Int], k: Int) = m.count(_ == k)
    val (t1c, t2c, t3c, t4c) = (coc(tcnt.values, 1), coc(tcnt.values, 2),
      coc(tcnt.values, 3), coc(tcnt.values, 4))
    val (u1c, u2c, u3c, u4c) = (coc(cc2.values, 1), coc(cc2.values, 2),
      coc(cc2.values, 3), coc(cc2.values, 4))
    assert(t1c > 0 && t2c > 0 && t3c > 0 && t4c > 0, "fixture must cover n1..n4")
    assert(u1c > 0 && u2c > 0 && u3c > 0 && u4c > 0, "fixture continuation n1..n4")
    def refDisc(n1: Int, n2: Int, n3: Int, n4: Int): Array[Double] = {
      val haveN = n1 > 0 && n2 > 0 && n3 > 0 && n4 > 0
      val y = if (n1 > 0) n1.toDouble / (n1 + 2 * n2) else 0.0
      val a = if (haveN) 1.0 - 2.0 * y * n2 / n1 else 0.75
      val bb = if (haveN) 2.0 - 3.0 * y * n3 / n2 else 0.75
      val c = if (haveN) 3.0 - 4.0 * y * n4 / n3 else 0.75
      val sound = haveN && a >= 0 && a <= 1 && bb >= 0 && bb <= 2 &&
        c >= 0 && c <= 3
      if (sound) Array(0.0, a, bb, c) else Array(0.0, 0.75, 0.75, 0.75)
    }
    val d = refDisc(t1c, t2c, t3c, t4c)
    val e = refDisc(u1c, u2c, u3c, u4c)
    // this fixture's trigram order estimates soundly; its middle order
    // does NOT (continuation n3 > n2 drives E2 negative) and must have
    // fallen back — both paths exercised in one fixture
    assert(d(1) > 0 && d(1) < 1 && d(2) > 0 && d(2) < 2 && d(3) > 0 && d(3) < 3,
      d.toSeq.toString)
    assert(e.drop(1).forall(_ == 0.75),
      s"mid order must fall back on this fixture: ${e.toSeq}")
    def dd(c: Int, ds: Array[Double]) = ds(math.min(c, 3))
    val nmid = tcnt.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val mAux = cc2.groupBy(_._1._1).map { case (w2, m) =>
      w2 -> (coc(m.values, 1), coc(m.values, 2), m.values.count(_ >= 3)) }
    val cc1 = bcnt.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val b = bcnt.size
    def pTri(w1: String, w2: String, w3: String): Double = {
      val c3 = tcnt((w1, w2, w3)); val ch = bcnt((w1, w2))
      // .toSeq first: tcnt.keys is a SET, and mapping it through tcnt
      // would deduplicate equal counts in the history
      val hist = tcnt.keys.toSeq.filter(t => t._1 == w1 && t._2 == w2)
        .map(tcnt)
      val (n1h, n2h, n3h) = (coc(hist, 1), coc(hist, 2), hist.count(_ >= 3))
      val cc = cc2((w2, w3)); val nm = nmid(w2)
      val (m1, m2, m3) = mAux(w2)
      val puni = cc1(w3).toDouble / b
      val pmid = (cc - dd(cc, e)) / nm + (e(1) * m1 + e(2) * m2 + e(3) * m3) / nm * puni
      (c3 - dd(c3, d)) / ch + (d(1) * n1h + d(2) * n2h + d(3) * n3h) / ch * pmid
    }
    val out = VocabStats.trigramModKnNll(mtexts.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    mtexts.foreach { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      val tgs = ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq
      val want =
        if (tgs.isEmpty) None
        else Some(-tgs.map { case (x, y, z) => math.log(pTri(x, y, z)) }.sum
          / tgs.size)
      val (n, got) = out(id)
      assert(n == tgs.size)
      (got, want) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 5e-5,
          s"doc $id: library $g vs reference $w")
        case (None, None) => ()
        case other => fail(s"doc $id: $other")
      }
    }
    // and modified KN is genuinely a different model than single-D KN
    val plain = VocabStats.trigramKnNll(mtexts.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(mtexts.exists { case (id, _) =>
      out(id)._2.map(v => Some(v) != plain(id)).getOrElse(false) ||
        (out(id)._2.isDefined && plain(id).isDefined &&
          out(id)._2.get != plain(id).get.asInstanceOf[Double]) })
  }

  test("modified KN falls back to the 0.75 absolute discount per order " +
       "when that order's count-of-counts are incomplete") {
    // the plain-KN fixture has no continuation count >= 2 nuance: all
    // u-statistics beyond u1 vanish, so the MIDDLE order must fall back
    // while the trigram order may or may not estimate — compute both
    // with the same fallback rule the library uses
    val ftexts = texts.filter(_._1 <= 3) // drop the 2-word doc
    val toks = ftexts.map(_._2.split("\\s+").toSeq)
    val bcnt = toks.flatMap(ws => ws.zip(ws.drop(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val tcnt = toks.flatMap(ws =>
      ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val cc2 = tcnt.keys.toSeq.groupBy(t => (t._2, t._3))
      .view.mapValues(_.size).toMap
    def coc(m: Iterable[Int], k: Int) = m.count(_ == k)
    def disc(n: Seq[Int]): Array[Double] = {
      val ok = n.forall(_ > 0)
      val y = if (n(0) > 0) n(0).toDouble / (n(0) + 2 * n(1)) else 0.0
      val a = if (ok) 1.0 - 2.0 * y * n(1) / n(0) else 0.75
      val bb = if (ok) 2.0 - 3.0 * y * n(2) / n(1) else 0.75
      val c = if (ok) 3.0 - 4.0 * y * n(3) / n(2) else 0.75
      val sound = ok && a >= 0 && a <= 1 && bb >= 0 && bb <= 2 &&
        c >= 0 && c <= 3
      if (sound) Array(0.0, a, bb, c) else Array(0.0, 0.75, 0.75, 0.75)
    }
    val d = disc(Seq(coc(tcnt.values, 1), coc(tcnt.values, 2),
      coc(tcnt.values, 3), coc(tcnt.values, 4)))
    val e = disc(Seq(coc(cc2.values, 1), coc(cc2.values, 2),
      coc(cc2.values, 3), coc(cc2.values, 4)))
    assert(e.drop(1).forall(_ == 0.75), "fixture must trip the mid fallback")
    def dd(c: Int, ds: Array[Double]) = ds(math.min(c, 3))
    val nmid = tcnt.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val mAux = cc2.groupBy(_._1._1).map { case (w2, m) =>
      w2 -> (coc(m.values, 1), coc(m.values, 2), m.values.count(_ >= 3)) }
    val cc1 = bcnt.keys.toSeq.groupBy(_._2).view.mapValues(_.size).toMap
    val bTot = bcnt.size
    def pTri(w1: String, w2: String, w3: String): Double = {
      val c3 = tcnt((w1, w2, w3)); val ch = bcnt((w1, w2))
      val hist = tcnt.keys.toSeq.filter(t => t._1 == w1 && t._2 == w2)
        .map(tcnt)
      val (n1h, n2h, n3h) = (coc(hist, 1), coc(hist, 2), hist.count(_ >= 3))
      val cc = cc2((w2, w3)); val nm = nmid(w2)
      val (m1, m2, m3) = mAux(w2)
      val puni = cc1(w3).toDouble / bTot
      val pmid = (cc - dd(cc, e)) / nm +
        (e(1) * m1 + e(2) * m2 + e(3) * m3) / nm * puni
      (c3 - dd(c3, d)) / ch +
        (d(1) * n1h + d(2) * n2h + d(3) * n3h) / ch * pmid
    }
    val out = VocabStats.trigramModKnNll(ftexts.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    ftexts.foreach { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      val tgs = ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq
      val want = -tgs.map { case (x, y, z) =>
        math.log(pTri(x, y, z)) }.sum / tgs.size
      assert(math.abs(out(id).get - want) < 5e-5, s"doc $id")
    }
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

  test("ngramModKnNll at order 5 equals an independent brute-force " +
       "reference of the generic type-table recursion") {
    // repetition so some 5-gram counts reach 2+ (the discount buckets
    // and γ numerators see non-trivial values even where the
    // count-of-count estimates fall back)
    val texts5 = Seq(
      (1L, "the cat sat on the mat and the cat sat on the mat again"),
      (2L, "the dog sat on the mat and then slept on the mat"),
      (3L, "a cat and a dog sat on the mat near the door"),
      (4L, "the cat sat on the rug and the dog sat on the rug"),
      (5L, "short words only")) // < 5 words → null score
    val docsTok = texts5.map(_._2.split("\\s+").toSeq)
    val n = 5
    def grams(k: Int): Seq[Seq[String]] =
      docsTok.flatMap(_.sliding(k).filter(_.size == k).map(_.toList))
    val gcnt: Map[Int, Map[Seq[String], Int]] = (2 to n).map(k =>
      k -> grams(k).groupBy(identity).view.mapValues(_.size).toMap).toMap
    // level-k continuation counts from the raw (k+1)-gram TYPE table
    def cont(k: Int): Map[Seq[String], Int] =
      gcnt(k + 1).keys.toSeq.groupBy(_.tail).view.mapValues(_.size).toMap
    def den(k: Int): Map[Seq[String], Int] =
      gcnt(k + 1).keys.toSeq.groupBy(_.slice(1, k))
        .view.mapValues(_.size).toMap
    def mBuckets(k: Int): Map[Seq[String], (Int, Int, Int)] =
      cont(k).groupBy(_._1.init).map { case (u, m) =>
        u -> (m.values.count(_ == 1), m.values.count(_ == 2),
          m.values.count(_ >= 3)) }
    def disc(vals: Iterable[Int]): Array[Double] = {
      val cs = (1 to 4).map(j => vals.count(_ == j))
      val ok = cs.forall(_ > 0)
      val y = if (cs(0) > 0) cs(0).toDouble / (cs(0) + 2 * cs(1)) else 0.0
      val a = if (ok) 1.0 - 2.0 * y * cs(1) / cs(0) else 0.75
      val bb = if (ok) 2.0 - 3.0 * y * cs(2) / cs(1) else 0.75
      val c = if (ok) 3.0 - 4.0 * y * cs(3) / cs(2) else 0.75
      val sound = ok && a >= 0 && a <= 1 && bb >= 0 && bb <= 2 &&
        c >= 0 && c <= 3
      if (sound) Array(0.0, a, bb, c) else Array(0.0, 0.75, 0.75, 0.75)
    }
    val dTop = disc(gcnt(n).values)
    val dMid = (2 until n).map(k => k -> disc(cont(k).values)).toMap
    def dd(c: Int, ds: Array[Double]) = ds(math.min(c, 3))
    val b = gcnt(2).size
    def p1(w: String): Double = cont(1)(Seq(w)).toDouble / b
    def pk(k: Int, g: Seq[String]): Double =
      if (k == 1) p1(g.last)
      else {
        val e = dMid(k)
        val cc = cont(k)(g)
        val dn = den(k)(g.init)
        val (m1, m2, m3) = mBuckets(k)(g.init)
        (cc - dd(cc, e)) / dn +
          (e(1) * m1 + e(2) * m2 + e(3) * m3) / dn * pk(k - 1, g.tail)
      }
    def pTop(g: Seq[String]): Double = {
      val c = gcnt(n)(g)
      val ch = gcnt(n - 1)(g.init)
      val hist = gcnt(n).collect { case (t, v) if t.init == g.init => v }
      val (n1h, n2h, n3h) = (hist.count(_ == 1), hist.count(_ == 2),
        hist.count(_ >= 3))
      (c - dd(c, dTop)) / ch +
        (dTop(1) * n1h + dTop(2) * n2h + dTop(3) * n3h) / ch *
          pk(n - 1, g.tail)
    }
    val out = VocabStats.ngramModKnNll(texts5.toDF("doc_id", "text"),
        "doc_id", "text", order = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    texts5.foreach { case (id, text) =>
      val ws = text.split("\\s+").toSeq
      val gs = ws.sliding(n).filter(_.size == n).map(_.toList).toSeq
      val (gotN, gotNll) = out(id)
      assert(gotN == gs.size, s"doc $id n_ngrams")
      if (gs.isEmpty) assert(gotNll.isEmpty, s"doc $id must be unscored")
      else {
        val want = -gs.map(g => math.log(pTop(g))).sum / gs.size
        assert(math.abs(gotNll.get - want) < 5e-5,
          s"doc $id: got ${gotNll.get} want $want")
      }
    }
    // deterministic across partitionings
    val again = VocabStats.ngramModKnNll(
        texts5.toDF("doc_id", "text").repartition(7),
        "doc_id", "text", order = 5)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(again == out.view.mapValues(_._2).toMap)
  }
}
