package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VocabStatsSpec extends SparkSpec {
  import spark.implicits._

  // corpus: "the" x4, "cat" x2, "sat" x1, "mat" x1, "dog" x1
  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "The cat mat"), // case-folds onto doc 1's words
    (3L, "the the dog")
  ).toDF("doc_id", "text")

  test("self-corpus signals: counts, types, rare mass, top-K coverage") {
    val out = VocabStats.vocabSignals(docs, "doc_id", "text",
        rareMax = 1, topK = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // vocab: the=4 cat=2 sat=1 mat=1 dog=1; top-2 = {the, cat}
    assert(out(1L) == ((3L, 3L, 1L, 2L))) // sat is rare; the+cat in top
    assert(out(2L) == ((3L, 3L, 1L, 2L)))
    assert(out(3L) == ((3L, 2L, 1L, 2L))) // the,the,dog: 2 types, dog rare
  }

  test("top-K tie at the cut breaks by word, deterministically") {
    // counts: a=2 b=2 c=2 — topK=2 must take {a, b} (word order)
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    val out = VocabStats.vocabSignals(d, "doc_id", "text",
        rareMax = 1, topK = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out(1L) == 2L && out(2L) == 2L)
    assert(out(3L) == 0L)
  }

  test("word entropy: uniform = ln(types), repeated = 0, empty = null") {
    val d = Seq(
      (1L, "a b c d"),       // uniform over 4 types -> ln 4
      (2L, "spam spam spam"),// one type -> 0
      (3L, ""),              // no tokens -> null entropy
      (4L, "a a b")          // H = ln3 - (2 ln2)/3
    ).toDF("doc_id", "text")
    val out = VocabStats.wordEntropy(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((4L, 4L, Some(r4(math.log(4))))))
    assert(out(2L) == ((3L, 1L, Some(0.0))))
    assert(out(3L) == ((0L, 0L, None)))
    assert(out(4L) ==
      ((3L, 2L, Some(r4(math.log(3) - 2 * math.log(2) / 3)))))
  }

  test("a reference vocabulary marks unseen words as rare (OOV)") {
    val ref = Seq(("the", 100L), ("cat", 50L)).toDF("word", "n")
    val out = VocabStats.vocabSignals(docs, "doc_id", "text",
        rareMax = 1, topK = 10, vocabOf = Some(ref))
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    // doc 3: "the the dog" — dog is OOV (rare), the x2 in top
    assert(out(3L) == ((1L, 2L)))
    // doc 1: sat OOV
    assert(out(1L) == ((1L, 2L)))
  }

  test("token-less documents are absent (no zero-division rows)") {
    val d = Seq((1L, "words here"), (2L, "   ")).toDF("doc_id", "text")
    val out = VocabStats.vocabSignals(d, "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("unigram NLL matches the hand-computed smoothed formula") {
    // vocab: the=4 cat=2 sat=1 mat=1 dog=1 → T=9, V=5, ln(T+V)=ln(14)
    val out = VocabStats.unigramNll(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      .sortBy(_._1)
    def nll(counts: Seq[Long]): Double = {
      val raw = math.log(14) -
        counts.sorted.map(c => math.log(c + 1.0)).sum / counts.size
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.map(_._2) == List(3L, 3L, 3L))
    assert(out(0)._3 == nll(Seq(4, 2, 1)), "doc 1: the cat sat")
    assert(out(1)._3 == nll(Seq(4, 2, 1)), "doc 2 case-folds onto doc 1")
    assert(out(2)._3 == nll(Seq(4, 4, 1)), "doc 3: the the dog")
    // common-word doc scores lower than rare-word doc 3? the+the+dog has
    // MORE mass than the+cat+sat (4,4,1 vs 4,2,1) → lower NLL
    assert(out(2)._3 < out(0)._3)
  }

  test("bigram NLL matches the hand-computed interpolated formula") {
    // words: a=3 b=3 c=1 → T=7, V=3; bigrams: (a,b)=2 (b,a)=1 (b,c)=1
    val d = Seq((1L, "a b a b"), (2L, "a"), (3L, "b c")).toDF("doc_id", "text")
    val out = VocabStats.bigramNll(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val lam = 0.7
    def p(cb: Long, ch: Long, cu: Long): Double =
      lam * (cb.toDouble / ch) + (1.0 - lam) * ((cu + 1.0) / (7 + 3))
    def nll(terms: Seq[(Long, Long, Long)]): Double = {
      val raw = -terms.sorted.map { case (cb, ch, cu) =>
        math.log(p(cb, ch, cu)) }.sum / terms.size
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc 1: (a,b) (b,a) (a,b) → triples (cb, c(w1), c(w2))
    assert(out(1L) ==
      ((3L, Some(nll(Seq((2, 3, 3), (1, 3, 3), (2, 3, 3)))))))
    assert(out(2L) == ((0L, None)), "a single-word doc has no bigrams")
    assert(out(3L) == ((1L, Some(nll(Seq((1, 3, 1)))))))
  }

  test("bigram NLL separates word order where unigram NLL cannot") {
    // identical unigram bags, different order
    val d = Seq((1L, "x y x y"), (2L, "x x y y")).toDF("doc_id", "text")
    val uni = VocabStats.unigramNll(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), "unigram model is order-blind")
    val bi = VocabStats.bigramNll(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bi(1L) != bi(2L), "bigram model sees the order")
    // doc 1 repeats the corpus-frequent (x,y) transition → more likely
    assert(bi(1L) < bi(2L))
  }

  test("unigram NLL against a reference vocab: OOV words raise the score") {
    val ref = Seq(("the", 100L), ("cat", 50L)).toDF("word", "n")
    val out = VocabStats.unigramNll(docs, "doc_id", "text", vocabOf = Some(ref))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 3 ("the the dog") has one OOV (count 0) vs doc 1's one OOV +
    // lower in-vocab mass — both defined, no NaN, OOV-heavier scores higher
    assert(!out.values.exists(_.isNaN))
    assert(out(1L) > out(3L), "cat(50)+OOV beats nothing: doc1 has sat OOV " +
      "and cat=50 < the=100 mass")
  }

  test("inverted index: sorted id:tf postings, df cut drops stopwords") {
    val d = Seq((3L, "cat dog"), (1L, "cat cat fish"), (2L, "cat dog"))
      .toDF("doc_id", "text")
    // df: cat=3/3 docs, dog=2/3, fish=1/3 — cut at 0.7 drops cat
    val out = VocabStats.invertedIndex(d, "doc_id", "text", maxDfFrac = 0.7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(!out.contains("cat"), "df 3 > 0.7 * 3 — stopword cut")
    assert(out("dog") == ((2L, "2:1,3:1")), "postings sort by id")
    assert(out("fish") == ((1L, "1:1")))
  }

  test("inverted index plan: stopword cut happens BELOW the postings " +
      "aggregation (semi join, not cut-after-materialize)") {
    val d = Seq((3L, "cat dog"), (1L, "cat cat fish"), (2L, "cat dog"))
      .toDF("doc_id", "text")
    val plan = VocabStats.invertedIndex(d, "doc_id", "text", maxDfFrac = 0.7)
      .queryExecution.executedPlan.toString
    // the df-only aggregation + broadcast cut feeds a LeftSemi join that
    // drops every stopword's (word, id, tf) triples BEFORE collect_list
    // builds a postings row — a corpus-wide stopword never lands ~N
    // structs in one reducer. Plan prints top-down, so the postings
    // aggregate must appear ABOVE the semi join.
    val semi = plan.indexOf("LeftSemi")
    val postings = plan.indexOf("collect_list")
    assert(semi >= 0, "expected a LeftSemi survivor join in:\n" +
      plan.take(3000))
    assert(postings >= 0 && postings < semi,
      "postings collect_list must consume the semi join's output " +
        "(cut-before-materialize):\n" + plan.take(3000))
  }

  test("bm25SearchIndexed over the prebuilt index ranks identically to " +
      "the from-scratch scan") {
    val d = Seq(
      (1L, "rare cat cat cat"),
      (2L, "cat cat cat cat"),
      (3L, "cat cat cat cat pad pad pad pad pad pad pad pad"),
      (4L, "dog dog")
    ).toDF("doc_id", "text")
    val idx = VocabStats.invertedIndexStructured(d, "doc_id", "text",
      maxDfFrac = 1.0)
    val dl = VocabStats.docLengths(d, "doc_id", "text")
    val indexed = VocabStats.bm25SearchIndexed(idx, dl, "doc_id",
        query = Seq("RARE", "cat"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val scratch = VocabStats.bm25Search(d, "doc_id", "text",
        query = Seq("RARE", "cat"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(indexed.toList == scratch.toList,
      "identical fold + tie-break must reproduce the scan ranking")
  }

  test("bm25SearchIndexed: a term cut from the index contributes nothing") {
    val d = Seq(
      (1L, "rare cat"), (2L, "cat"), (3L, "cat")
    ).toDF("doc_id", "text")
    // cat df=3/3 — cut at 0.7 drops it from the index entirely
    val idx = VocabStats.invertedIndexStructured(d, "doc_id", "text",
      maxDfFrac = 0.7)
    val dl = VocabStats.docLengths(d, "doc_id", "text")
    val out = VocabStats.bm25SearchIndexed(idx, dl, "doc_id",
        query = Seq("rare", "cat"), k = 10)
      .collect().map(_.getLong(0))
    assert(out.toList == List(1L), "only the surviving term can match")
  }

  test("tf-idf keywords: rare words outrank common ones, rank cut is " +
      "deterministic") {
    val d = Seq(
      (1L, "cat cat cat fish"),
      (2L, "cat dog dog"),
      (3L, "cat bird")
    ).toDF("doc_id", "text")
    val out = VocabStats.tfidfKeywords(d, "doc_id", "text",
        k = 2, maxDfFrac = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: fish (tf 1, df 1, idf ln(2)) vs cat (tf 3, df 3, idf 0) —
    // cat's idf is ln(4/4)=0, so fish wins despite tf 1
    assert(out((1L, 1L))._1 == "fish")
    assert(out((1L, 2L))._1 == "cat")
    assert(out((2L, 1L)) == (("dog", 2L, 1L)))
    assert(out((3L, 1L))._1 == "bird")
    // cat scores 0.0 everywhere (df == N) but still ranks by word asc
    assert(out((3L, 2L))._1 == "cat")
  }

  test("bm25: selective terms outrank common ones; length normalization " +
      "penalizes padding; k-cut is deterministic") {
    val d = Seq(
      (1L, "rare cat cat cat"),             // the only 'rare' doc
      (2L, "cat cat cat cat"),              // common term only
      (3L, "cat cat cat cat pad pad pad pad pad pad pad pad"), // padded
      (4L, "dog dog")                       // no query terms — unscored
    ).toDF("doc_id", "text")
    val out = VocabStats.bm25Search(d, "doc_id", "text",
      query = Seq("RARE", "cat"), k = 3) // query case-folds
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L), "doc 4 matches nothing")
    val score = out.toMap
    assert(score(1L) > score(2L), "idf: the rare term dominates")
    assert(score(2L) > score(3L), "same tf, longer doc scores lower (b)")
    // ordered by score desc then id
    assert(out.map(_._1).toList == List(1L, 2L, 3L))
  }

  test("bm25SearchAll: each query's ranking equals its own single-query " +
      "run; the per-query k-cut lowers to WindowGroupLimit") {
    val d = Seq(
      (1L, "rare cat cat cat"),
      (2L, "cat cat cat cat"),
      (3L, "cat cat cat cat pad pad pad pad pad pad pad pad"),
      (4L, "dog dog")
    ).toDF("doc_id", "text")
    val qs = Seq((1L, Seq("RARE", "cat")), (2L, Seq("pad", "dog")))
      .toDF("qid", "terms")
    val all = VocabStats.bm25SearchAll(d, "doc_id", "text",
      qs, "qid", "terms", k = 3)
    assert(all.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"),
      "rank<=k must lower to per-partition top-k pruning")
    val got = all.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    for ((qid, terms) <- Seq(1L -> Seq("RARE", "cat"), 2L -> Seq("pad", "dog"))) {
      val single = VocabStats.bm25Search(d, "doc_id", "text", terms, k = 3)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1L) -> (r.getLong(0), r.getDouble(2)) }
      single.foreach { case (key, want) =>
        assert(got.get(key).contains(want),
          s"batch result for $key must equal the single-query run: " +
            s"got ${got.get(key)}, want $want")
      }
    }
    // query 2 matches docs 3 (pad) and 4 (dog) only
    assert(got.keys.count(_._1 == 2L) == 2)
  }

  test("dsirWeights: target-like docs outscore off-target docs; weights " +
       "are deterministic") {
    import spark.implicits._
    val raw = Seq(
      (1L, "alpha alpha beta alpha beta gamma"),  // target-like words
      (2L, "delta epsilon zeta delta epsilon"),   // off-target words
      (3L, "alpha delta alpha beta epsilon")      // mixed
    ).toDF("doc_id", "text")
    val target = Seq(
      (10L, "alpha beta alpha gamma alpha beta")
    ).toDF("doc_id", "text")
    val w = VocabStats.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"weights must order target-like > mixed > off-target: $w")
    val again = VocabStats.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w == again, "order-pinned folds: bit-identical across runs")
  }

  test("dsirWeights: a doc of words the target never saw scores negative") {
    import spark.implicits._
    val raw = Seq((1L, "unseen words only here"),
      (2L, "common common common target stuff")).toDF("doc_id", "text")
    val target = Seq((10L, "common target stuff common")).toDF("doc_id", "text")
    val w = VocabStats.dsirWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) < 0 && w(2L) > w(1L), s"OOV-vs-target must score low: $w")
  }

  test("nllBuckets tiers documents per language: equal-count, " +
       "quality-ordered, deterministic") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = VocabStats.nllBuckets(docs, "doc_id", "text", "lang",
      buckets = 3)
    val byLang = out.groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // per language: tier sizes differ by at most 1 (ntile contract)
    byLang.keys.map(_._1).toSet.foreach { (l: String) =>
      val sizes = (1L to 3L).map(b => byLang.getOrElse((l, b), 0L))
      assert(sizes.max - sizes.min <= 1, s"$l tiers $sizes")
    }
    // head tier scores strictly no worse (lower nll) than tail tier
    val agg = out.groupBy("lang", "bucket").agg(
        min("nll").as("lo"), max("nll").as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    agg.keys.map(_._1).toSet.foreach { (l: String) =>
      assert(agg((l, 1L))._2 <= agg((l, 3L))._1 + 1e-9,
        s"$l: head max ${agg((l, 1L))._2} must not exceed tail min")
    }
    // deterministic across runs
    val again = VocabStats.nllBuckets(docs, "doc_id", "text", "lang",
      buckets = 3).select("doc_id", "bucket").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(again == out.select("doc_id", "bucket").as[(Long, Long)]
      .collect().sorted.toSeq)
  }

  test("nllBucketsApprox (the no-window scale path) agrees with the " +
       "exact ntile tiers away from boundaries") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = VocabStats.nllBuckets(docs, "doc_id", "text", "lang", 3)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val approx = VocabStats.nllBucketsApprox(docs, "doc_id", "text",
      "lang", 3).select("doc_id", "bucket").as[(Long, Long)]
      .collect().toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= (exact.size * 0.9).toInt,
      s"sketch tiers must track exact tiers: $agree of ${exact.size} agree")
    // and no approx plan window: the pass must stay partial-agg shaped
    val plan = VocabStats.nllBucketsApprox(docs, "doc_id", "text",
      "lang", 3).queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("RunningWindow"),
      "the scale path must not contain a window operator")
  }

  test("knBucketsApprox (the KN tier pass's window-free scale path) " +
       "agrees >=90% with the exact ntile tiers and plans no window") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = VocabStats.knBuckets(docs, "doc_id", "text", "lang", 3)
      .select("doc_id", "bucket").as[(Long, Long)].collect().toMap
    val approxDf = VocabStats.knBucketsApprox(docs, "doc_id", "text",
      "lang", 3)
    val approx = approxDf.select("doc_id", "bucket").as[(Long, Long)]
      .collect().toMap
    assert(approx.keySet == exact.keySet)
    val agree = exact.count { case (id, b) => approx(id) == b }
    assert(agree >= (exact.size * 0.9).toInt,
      s"sketch KN tiers must track exact tiers: $agree of ${exact.size}")
    // unscoreable docs (null nll) land in the LAST tier, like the exact
    // form's nulls-last rule
    approxDf.filter(col("nll").isNull).select("bucket").as[Long]
      .collect().foreach(b => assert(b == 3L))
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("RunningWindow"),
      "the KN scale path must not contain a window operator")
  }
}
