package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunking windows overlap and cover every token") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = TextChunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 40, overlap = 10)
      .orderBy("chunk_id").collect()
    // stride 30, ceil((100-10)/30) = 3 chunks starting at tokens 1, 31, 61
    assert(out.length == 3)
    assert(out(0).getString(2).startsWith("w1 ") && out(0).getLong(3) == 40)
    assert(out(1).getString(2).startsWith("w31 "))
    assert(out(2).getString(2).startsWith("w61 ") && out(2).getLong(3) == 40)
    // overlap: chunk 0 ends with the 10 tokens chunk 1 starts with
    assert(out(0).getString(2).endsWith("w40") && out(1).getString(2).contains("w40"))
    // coverage: every token appears in some chunk
    val all = out.flatMap(_.getString(2).split(" ")).toSet
    assert(all == (1 to 100).map(i => s"w$i").toSet)
  }

  test("chunking edge cases: empty, whitespace-only, shorter than one window") {
    val df = Seq((1L, ""), (2L, "   \t "), (3L, "only four tiny tokens"))
      .toDF("doc_id", "text")
    val out = TextChunker.chunk(df, "doc_id", "text", maxTokens = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((3L, 0, "only four tiny tokens")))
  }

  test("token-budget shards fill the budget and overflow by at most one document") {
    val docs = (1 to 300).map(i => (i.toLong, 10L + (i % 23))).toDF("id", "n")
    val out = TextChunker.shardByTokenBudget(docs, "id", "n",
      capacity = 100, groups = 4)
    val shards = out.groupBy("pack_id")
      .agg(sum("n").as("total"), max("n").as("maxdoc"), count(lit(1)).as("cnt"))
      .collect()
    assert(shards.length > 10)
    shards.foreach { s =>
      assert(s.getLong(1) <= 100 + s.getLong(2),
        s"shard $s exceeds capacity + one document")
    }
    // deterministic: same input → identical assignment
    val again = TextChunker.shardByTokenBudget(docs, "id", "n", 100, 4)
      .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }
}
