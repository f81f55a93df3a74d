package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("one shared 8-gram contaminates however different the rest is") {
    val secret = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val corpus = Seq(
      (1L, s"totally unrelated preamble $secret and a very long different tail"),
      (2L, "nothing in common with the benchmark at all here"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota: seven-gram only")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"the eval question mentions $secret verbatim"))
      .toDF("doc_id", "text")
    val kept = Decontaminate
      .dropContaminated(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L),
      "doc 1 shares the full 8-gram; doc 3's 7-word prefix must NOT match")
  }

  test("normalization: case, punctuation and whitespace do not hide overlap") {
    val corpus = Seq(
      (1L, "The QUICK---brown fox,,, jumps over the lazy dog today")).toDF("doc_id", "text")
    val bench = Seq(
      (9L, "we ask about: the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    assert(Decontaminate
      .dropContaminated(corpus, bench, "doc_id", "text", n = 8).count() == 0)
  }

  test("short documents (under n words) are never contaminated") {
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "")).toDF("doc_id", "text")
    val bench = Seq((9L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    assert(Decontaminate
      .dropContaminated(corpus, bench, "doc_id", "text", n = 8).count() == 2)
  }

  test("contaminatedIds reports each id once; empty bench keeps everything") {
    val base = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, s"$base $base"), (2L, "other words")).toDF("doc_id", "text")
    val bench = Seq((9L, base)).toDF("doc_id", "text")
    val ids = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", 8)
    assert(ids.collect().map(_.getLong(0)).toSeq == Seq(1L))
    val empty = bench.filter(lit(false))
    assert(Decontaminate
      .dropContaminated(corpus, empty, "doc_id", "text", 8).count() == 2)
  }

  test("the corpus side never shuffles: explode + broadcast semi-join plan") {
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val bench = Seq((9L, "x y z w v u t s")).toDF("doc_id", "text")
    val plan = Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftsemi"),
      s"expected a broadcast semi join, got:\n$plan")
  }

  // ---- fuzzy (shingle-Jaccard) contamination ------------------------

  test("fuzzy catches a paraphrase the exact 8-gram rule misses") {
    // change every 8th word: no 8 consecutive words survive (kills every
    // exact 8-gram) but 20/40 word-3-shingles do (Jaccard 0.5). Words
    // must be letter-only: the tokenizer splits on non-letters, so
    // "w1".."w32" would all collapse to the same token "w".
    val words = (0 until 32).map(i =>
      s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val original = words.mkString(" ")
    val paraphrase = words.zipWithIndex
      .map { case (w, i) =>
        if (i % 8 == 7) s"changed${('a' + i % 26).toChar}" else w }
      .mkString(" ")
    val corpus = Seq(
      (1L, paraphrase),
      (2L, "completely unrelated text about other things entirely")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, original)).toDF("doc_id", "text")
    val exactKept = Decontaminate
      .dropContaminated(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(exactKept == Seq(1L, 2L),
      "the paraphrase shares no exact 8-gram, so exact keeps it")
    // snapshot the cache BEFORE the call: the assertion below is about
    // dropContaminatedFuzzy's own hygiene, and a global-emptiness check
    // would flake on GC timing of other suites' plan-referenced caches
    // (operators that return lazy plans over persisted intermediates —
    // the KN model/tokenization caches — are cleaned by the context
    // cleaner only after their DataFrames are collected)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val fuzzyKept = Decontaminate
      .dropContaminatedFuzzy(corpus, bench, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(fuzzyKept == Seq(2L),
      "shingle Jaccard ~0.54 >= 0.5 must drop the paraphrase")
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet.diff(cachedBefore)
    assert(leaked.isEmpty,
      s"dropContaminatedFuzzy must leave no cached state behind (new " +
        s"cached RDDs: $leaked) — a corpus-sized persist outliving the " +
        "call accumulates executor memory/disk pressure across " +
        "invocations in a long session")
  }

  test("fuzzy equals the exact all-pairs Jaccard on real documents " +
      "(oracle precondition at the declared parameters)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val got = Decontaminate.contaminatedIdsFuzzy(
      corpus, bench, "doc_id", "text", threshold = 0.5)
      .as[Long].collect().toSet
    // exact reference: brute-force Jaccard over the same shingle hashes
    def sets(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.plans.expressions.shingle_hashes(col("text"), 3).as("hh"))
      .as[(Long, Seq[Long])].collect().map { case (id, hh) => (id, hh.toSet) }
    val b = sets(bench)
    val expected = sets(corpus).collect { case (id, cs)
      if b.exists { case (_, bs) =>
        val inter = cs.intersect(bs).size.toDouble
        inter / (cs.size + bs.size - inter) >= 0.5 } => id }.toSet
    assert(got == expected,
      s"LSH fuzzy decontamination diverged: got ${got.size}, " +
        s"expected ${expected.size}")
  }

  test("fuzzy: empty bench keeps everything; ids report once") {
    val corpus = Seq((1L, "one two three four five"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "one two three four five")).toDF("doc_id", "text")
    assert(Decontaminate.dropContaminatedFuzzy(
      corpus, bench.filter(lit(false)), "doc_id", "text").count() == 2)
    val ids = Decontaminate.contaminatedIdsFuzzy(
      corpus, bench, "doc_id", "text", threshold = 0.9)
    assert(ids.as[Long].collect().toSeq == Seq(1L))
  }

  test("contaminationRate: exact gram fractions, short docs report 0/0") {
    val secret = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val corpus = Seq(
      // 9 words = 2 distinct 8-grams, 1 of them benchmark-contaminated
      (1L, s"$secret iota"),
      // 8 clean words = 1 gram, 0 hits
      (2L, "one two three four five six seven eight"),
      // under 8 words: no grams at all
      (3L, "too short to carry any gram")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"quoting $secret here")).toDF("doc_id", "text")
    val rows = Decontaminate.contaminationRate(
        corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows(1L) == ((2L, 1L, Some(0.5))), rows.toString)
    assert(rows(2L) == ((1L, 0L, Some(0.0))), rows.toString)
    assert(rows(3L) == ((0L, 0L, None)), "gram-free doc: 0/0, null rate")
    // every corpus doc appears exactly once
    assert(rows.keySet == Set(1L, 2L, 3L))
    // the binary rule agrees with rate > 0
    val binary = Decontaminate.contaminatedIds(
      corpus, bench, "doc_id", "text", n = 8).as[Long].collect().toSet
    assert(binary == rows.filter(_._2._3.exists(_ > 0)).keySet)
  }
}
