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

  test("encodeIds emits real ids: count parity, vocab membership, unk") {
    val d = Seq((1L, "low low low lower news44!")).toDF("doc_id", "text")
    val model = Bpe.fit(d, "text", numMerges = 10)
    // vocab layout: <unk> first, then sorted base chars + </w>, then merges
    assert(model.vocab.head == Bpe.Unk)
    assert(model.ids.get(Bpe.Unk) == 0)
    assert(model.vocab.distinct == model.vocab, "ids are a bijection")
    val texts = Seq("low lower", "news 44 !", "low news low")
    texts.foreach { t =>
      val ids = Bpe.encodeIds(t, model.ranks, model.ids)
      assert(ids.length == Bpe.countTokens(t, model.ranks),
        s"ids and count must walk the same merge loop for '$t'")
      assert(ids.forall(i => i > 0 && i < model.vocab.length),
        s"all in-vocab symbols map to real ids for '$t': ${ids.toSeq}")
    }
    // a character the sample never saw -> unk id 0
    val unkIds = Bpe.encodeIds("zebra", model.ranks, model.ids)
    assert(unkIds.contains(0), s"unseen chars must hit <unk>: ${unkIds.toSeq}")
  }

  test("decodeTokens round-trips encodeIds to the pre-token normal form") {
    val d = Seq((1L, "the cat sat on the mat, the dog ran 42 times!"))
      .toDF("doc_id", "text")
    val model = Bpe.fit(d, "text", numMerges = 30)
    val texts = Seq("the cat sat", "dog ran 42 times", "cat, mat! the dog",
      "ThE CaT") // case folds in the pre-tokenizer
    texts.foreach { t =>
      val ids = Bpe.encodeIds(t, model.ranks, model.ids)
      assert(Bpe.decodeTokens(ids.toIndexedSeq, model) == Bpe.preTokens(t),
        s"round-trip through ids must recover preTokens for '$t'")
    }
  }

  test("column expression encode matches the kernel; vocab/merges surface " +
       "as DataFrames") {
    val d = Seq((1L, "low lower low"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val model = Bpe.fit(d.filter($"text".isNotNull), "text", numMerges = 5)
    val rows = d.select($"doc_id", Bpe.encode($"text", model).as("ids"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    assert(rows(1L) ==
      Bpe.encodeIds("low lower low", model.ranks, model.ids).toSeq)
    assert(rows(2L) == null, "null text -> null ids")
    // the exported tables agree with the model
    val vdf = Bpe.vocabDf(spark, model).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(vdf.size == model.vocab.size)
    model.vocab.zipWithIndex.foreach { case (t, i) => assert(vdf(i) == t) }
    val mdf = Bpe.mergesDf(spark, model).orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(mdf.toVector == model.merges)
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
