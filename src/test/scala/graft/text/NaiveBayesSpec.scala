package graft.text

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // two cleanly separable classes: "spam" docs say buy/cheap, "ham"
  // docs say meeting/notes; one word ("now") is shared
  private def docs = Seq(
    (1L, "buy cheap now", "spam"),
    (2L, "buy buy cheap", "spam"),
    (3L, "meeting notes now", "ham"),
    (4L, "notes meeting meeting", "ham")
  ).toDF("doc_id", "text", "source")

  private def handScore(len: Long, prior: Double, lnz: Double,
                        matchedCTf: Seq[(Long, Long)], a: Double): Double = {
    val ev = matchedCTf.sorted.map { case (c, tf) => tf * math.log(c + a) }.sum
    val mtoks = matchedCTf.map(_._2).sum
    val raw = prior + ev + (len - mtoks) * math.log(a) - len * lnz
    BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("self-classification recovers the training labels") {
    val out = NaiveBayes.classify(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "spam", 2L -> "spam", 3L -> "ham", 4L -> "ham"))
  }

  test("score matches the closed-form model by hand") {
    val a = 0.5
    // corpus: V = 6 (buy cheap now meeting notes), wait: buy cheap now
    // meeting notes -> 5 distinct words; tokens per label = 6 each
    val prior = math.log(2.0 / 4.0)
    val lnzSpam = math.log(6 + a * 5)
    // doc 1 "buy cheap now" vs spam: c(buy)=3, c(cheap)=2, c(now)=1
    val expected = handScore(3L, prior, lnzSpam,
      Seq((3L, 1L), (2L, 1L), (1L, 1L)), a)
    val got = NaiveBayes.classify(docs, "doc_id", "text", "source")
      .filter($"doc_id" === 1L).collect().head.getDouble(2)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }

  test("a word absent from one class folds through the ln(alpha) term") {
    // "cheap cheap cheap" has zero ham evidence: score must be the
    // prior-minus-normalizer line plus 3*ln(a) exactly
    val m = NaiveBayes.fit(docs, "text", "source")
    val probe = Seq((9L, "cheap cheap cheap")).toDF("doc_id", "text")
    val rows = NaiveBayes.predict(m, probe, "doc_id", "text").collect()
    assert(rows.head.getString(1) == "spam") // cheap is spam-only
    val a = 0.5
    val hamScore = handScore(3L, math.log(0.5), math.log(6 + a * 5), Nil, a)
    val spamScore = handScore(3L, math.log(0.5), math.log(6 + a * 5),
      Seq((2L, 3L)), a)
    assert(spamScore > hamScore)
    assert(math.abs(rows.head.getDouble(2) - spamScore) < 1e-9)
  }

  test("empty and NULL text fall back to the prior-only argmax") {
    val skew = Seq(
      (1L, "x", "big"), (2L, "y", "big"), (3L, "z", "big"),
      (4L, "w", "small")
    ).toDF("doc_id", "text", "source")
    val m = NaiveBayes.fit(skew, "text", "source")
    val probe = Seq((10L, ""), (11L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = NaiveBayes.predict(m, probe, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(10L -> "big", 11L -> "big"))
  }

  test("NULL labels train nothing but every row is still scored") {
    val d = Seq(
      (1L, "buy cheap", "spam"),
      (2L, "meeting notes", "ham"),
      (3L, "buy cheap buy", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "source")
    val out = NaiveBayes.classify(d, "doc_id", "text", "source")
    assert(out.count() == 3L)
    val pred3 = out.filter($"doc_id" === 3L).collect().head.getString(1)
    assert(pred3 == "spam")
    // and the null-label doc contributed no counts: vocab has no row
    // for a label of NULL
    val m = NaiveBayes.fit(d, "text", "source")
    assert(m.labelStats.count() == 2L)
  }

  test("argmax tie-break is label-ascending on the rounded score") {
    // perfectly symmetric corpus: both labels score identically on a
    // shared-word probe, so the tie must resolve to the smaller label
    val d = Seq(
      (1L, "alpha common", "l1"),
      (2L, "beta common", "l2")
    ).toDF("doc_id", "text", "source")
    val m = NaiveBayes.fit(d, "text", "source")
    val probe = Seq((7L, "common")).toDF("doc_id", "text")
    val r = NaiveBayes.predict(m, probe, "doc_id", "text").collect().head
    assert(r.getString(1) == "l1")
  }
}
