package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.ManagedTable

case class Doc(doc_id: Long, text: String)

/** Streaming near-dedup against the accumulating signature index:
  * cross-batch duplicates must be dropped, novel docs kept, retries
  * idempotent.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps by the warm fire"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog while the cat sleeps by the warm stove"
  private val other =
    "completely unrelated text about spark partitions shuffles and catalyst optimizer rules"
  private val third =
    "yet another document mentioning streaming state watermarks and incremental processing"

  test("incremental batches dedup against everything seen before (pure core)") {
    val spark0 = spark
    val index = StreamingDedup.openIndex(spark0, tmpDir("sdidx"), "doc_id",
      org.apache.spark.sql.types.LongType)
    val out = ManagedTable.create(
      Seq.empty[Doc].toDF("doc_id", "text"), tmpDir("sdout"))

    // batch 1: base + other (+ an in-batch near-dup of base that must lose)
    val n1 = StreamingDedup.incremental(
      Seq((1L, base), (2L, other), (3L, base + "!")).toDF("doc_id", "text"),
      "doc_id", "text", index, out, threshold = 0.5)
    assert(n1 == 2, "in-batch near-dup must be dropped before indexing")
    assert(out.toDF.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    // batch 2: near-dup of batch 1's base (cross-batch drop) + novel third
    val n2 = StreamingDedup.incremental(
      Seq((10L, nearDup), (11L, third)).toDF("doc_id", "text"),
      "doc_id", "text", index, out, threshold = 0.5)
    assert(n2 == 1, "cross-batch near-dup must be dropped against the index")
    assert(out.toDF.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L))

    // batch 2 REPLAYED (crash-retry): nothing is double-appended
    val n3 = StreamingDedup.incremental(
      Seq((10L, nearDup), (11L, third)).toDF("doc_id", "text"),
      "doc_id", "text", index, out, threshold = 0.5)
    assert(n3 == 0, "a replayed batch must be idempotent")
    assert(out.toDF.count() == 3)
    assert(index.toDF.count() == 3, "index holds one signature per novel doc")
  }

  test("streaming shell wires foreachBatch end-to-end over MemoryStream") {
    implicit val sql = spark.sqlContext
    val indexPath = tmpDir("sdidx2")
    val outPath = tmpDir("sdout2")
    val src = MemoryStream[Doc]
    val q = StreamingDedup.start(src.toDF(), "doc_id", "text",
      indexPath, outPath, tmpDir("sdckpt"), threshold = 0.5)
    try {
      src.addData(Doc(1, base), Doc(2, other))
      q.processAllAvailable()
      src.addData(Doc(10, nearDup), Doc(11, third))
      q.processAllAvailable()
    } finally q.stop()
    val out = ManagedTable.forPath(spark, outPath)
    assert(out.toDF.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L))
    val index = ManagedTable.forPath(spark, indexPath)
    assert(index.toDF.count() == 3)
  }

  test("autoOptimize compacts only past the file threshold") {
    val t = ManagedTable.create(Seq((1L, "a")).toDF("id", "v"), tmpDir("ao"))
    (1 to 5).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))
    val before = t.detail.numFiles
    assert(!graft.operators.TableOps.autoOptimize(t, maxFiles = 100),
      "below threshold: no compaction")
    assert(t.detail.numFiles == before)
    assert(graft.operators.TableOps.autoOptimize(t, maxFiles = 2))
    assert(t.detail.numFiles < before)
    assert(t.toDF.count() == 6)
  }
}
