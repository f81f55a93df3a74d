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
}
