package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins real BPE semantics: deterministic merge learning on a tiny
  * hand-checkable corpus, the greedy lowest-rank encode loop, and the
  * pre-tokenizer boundaries.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pre-tokenizer: letter runs, digit runs, single symbols, case fold") {
    assert(Bpe.preTokens("Hello world42! x,y") ==
      Seq("hello", "world", "42", "!", "x", ",", "y"))
    assert(Bpe.preTokens("  ") == Seq.empty)
  }

  test("training learns the most frequent pair first, deterministically") {
    // corpus: "low low low lower" — pair (l,o) freq 4 dominates first
    val d = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val model = Bpe.fit(d, "text", numMerges = 10)
    assert(model.merges.head == (("l", "o")), s"got ${model.merges}")
    // after (l,o): "lo w </w>" x3 + "lo w e r </w>"; (lo,w) freq 4 next
    assert(model.merges(1) == (("lo", "w")), s"got ${model.merges}")
    val model2 = Bpe.fit(d, "text", numMerges = 10)
    assert(model.merges == model2.merges, "training is deterministic")
  }

  test("encoding applies merges greedily by rank; fully-merged word = 1 token") {
    val d = Seq((1L, "low low low low")).toDF("doc_id", "text")
    val model = Bpe.fit(d, "text", numMerges = 10)
    // 'low' occurs 4x: merges should collapse low</w> to a single symbol
    assert(Bpe.countTokens("low", model.ranks) == 1L)
    // unseen word: no merges apply beyond learned prefixes
    val untrained = Bpe.Model(Vector.empty)
    assert(Bpe.countTokens("abc", untrained.ranks) == 4L) // a b c </w>
    assert(Bpe.countTokens("x!y", untrained.ranks) == 2L + 2L + 1L,
      "x</w> + ! + y</w>")
  }

  test("column expression matches the kernel and handles null") {
    val d = Seq((1L, "low lower"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Bpe.fit(d.filter($"text".isNotNull), "text", numMerges = 5)
    val out = Bpe.withTokenCounts(d, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == Bpe.countTokens("low lower", model.ranks))
    assert(out(2L) == -1L, "null text -> null count")
  }

  test("more merges never increase a document's token count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m50 = Bpe.fit(docs, "text", numMerges = 50)
    val m200 = Bpe.fit(docs, "text", numMerges = 200)
    val c = docs.select(
        sum(Bpe.tokenCount(col("text"), m50)).as("c50"),
        sum(Bpe.tokenCount(col("text"), m200)).as("c200"))
      .head()
    assert(c.getLong(1) <= c.getLong(0),
      s"200 merges (${c.getLong(1)}) must compress at least as well as 50 (${c.getLong(0)})")
    // and BPE compresses vs raw chars+1 per word
    val raw = docs.select(sum(Bpe.tokenCount(col("text"),
      Bpe.Model(Vector.empty))).as("raw")).head().getLong(0)
    assert(c.getLong(1) < raw, "learned merges must compress")
  }
}
