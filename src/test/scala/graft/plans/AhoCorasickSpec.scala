package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {

  private def hits(text: String, entries: Seq[String]): Long = {
    val single = new java.util.HashSet[String]()
    entries.map(_.trim.toLowerCase).filterNot(_.exists(_.isWhitespace))
      .foreach(single.add)
    val phrases = entries.map(_.trim.toLowerCase)
      .filter(_.exists(_.isWhitespace))
      .map(_.split("\\s+").mkString(" ")).toArray
    val ac = if (phrases.isEmpty) null else new AhoCorasick(phrases)
    ExprKernels.blocklistHits(UTF8String.fromString(text), single, ac)
  }

  private def scan(text: String, entries: Seq[String]): Long = {
    val single = new java.util.HashSet[String]()
    entries.map(_.trim.toLowerCase).filterNot(_.exists(_.isWhitespace))
      .foreach(single.add)
    val phrases = entries.map(_.trim.toLowerCase)
      .filter(_.exists(_.isWhitespace))
      .map(_.split("\\s+").mkString(" ")).toArray
    ExprKernels.blocklistHitsScan(UTF8String.fromString(text), single, phrases)
  }

  test("raw automaton visits every occurrence of every pattern, end order") {
    val ac = new AhoCorasick(Array("he", "she", "his", "hers"))
    val found = collection.mutable.ArrayBuffer[(Int, Int)]()
    ac.visit("ushers", (p, e) => found += ((p, e)))
    // classic AC example: she@4, he@4 (suffix), hers@6
    assert(found.toList == List((1, 4), (0, 4), (3, 6)) ||
      found.toList.sortBy(x => (x._2, x._1)) ==
        List((0, 4), (1, 4), (3, 6)))
    assert(found.map(_._2).toList == found.map(_._2).sorted.toList,
      "matches must arrive in increasing end order")
  }

  test("phrase overlap across different patterns both count") {
    // "merge batch" and "batch job" overlap in "merge batch job" —
    // per-phrase non-overlap never suppresses a DIFFERENT phrase
    assert(hits("run merge batch job now",
      Seq("merge batch", "batch job")) == 2L)
  }

  test("same-phrase occurrences never overlap (greedy left-to-right)") {
    // "aa bb aa bb aa bb": "aa bb" at 0, 6, 12 — all disjoint -> 3;
    // the middle occurrence "bb aa" style overlap is a different phrase
    assert(hits("aa bb aa bb aa bb", Seq("aa bb")) == 3L)
    // self-overlapping phrase: "x y x" in "x y x y x" — greedy accepts
    // at 0 (ends 5), next occurrence at 4 overlaps, so only 1
    assert(hits("x y x y x", Seq("x y x")) == 1L)
  }

  test("word boundaries gate phrase matches but don't block later ones") {
    // "cheap deal" embedded in "cheap deals" fails the right boundary;
    // the standalone occurrence after it must still count
    assert(hits("cheap deals then a cheap deal", Seq("cheap deal")) == 1L)
  }

  test("matches the sequential reference on randomized corpora") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Array("a", "ab", "abc", "b", "bc", "x", "xy", "deal",
      "cheap", "now", "z9", "_u")
    val entries = Seq("cheap deal", "ab bc", "x xy", "deal now x",
      "a b", "b a", "abc", "xy", "z9 _u", "now now")
    for (_ <- 0 until 300) {
      val sepChoices = Array(" ", "  ", ".", ", ", "-")
      val words = Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
      val seps = Seq.fill(words.length)(sepChoices(rnd.nextInt(5)))
      val text = words.zip(seps).map { case (w, s) => w + s }.mkString
      val take = entries.take(1 + rnd.nextInt(entries.length))
      assert(hits(text, take) == scan(text, take),
        s"divergence on <$text> with $take")
    }
  }

  test("null automaton (no phrase entries) counts single words only") {
    assert(hits("spam and eggs and spam", Seq("spam", "eggs")) == 3L)
  }

  test("unicode text around ASCII patterns") {
    // supplementary chars are non-word chars: boundaries hold across 😀
    assert(hits("😀cheap deal😀", Seq("cheap deal")) == 1L)
    assert(hits("café cheap deal", Seq("cheap deal")) == 1L)
  }

  test("paths agree on a list past the expression's automaton threshold") {
    val rnd = new scala.util.Random(42)
    val entries = (0 until 100).map(i => s"w$i w${(i * 3) % 97}")
    assert(entries.size >= BlocklistHits.AcThreshold)
    for (_ <- 0 until 20) {
      val text = Seq.fill(60)(s"w${rnd.nextInt(100)}").mkString(" ")
      assert(hits(text, entries) == scan(text, entries))
    }
  }

  test("automaton survives a serialization round-trip (plan shipping)") {
    val ac = new AhoCorasick(Array("cheap deal", "merge batch"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[AhoCorasick]
    var n = 0
    back.visit("a cheap deal and a merge batch", (_, _) => n += 1)
    assert(n == 2)
  }
}
