package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.ManagedTable

/** The managed-table streaming sink (`format("graft")`): micro-batches
  * append through the idempotent-txn path (exactly-once under replay),
  * a missing table is created on the first batch, and the sink composes
  * with the graft-cdf source into an end-to-end incremental pipeline.
  */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches land as txn appends; a replayed batch is a no-op") {
    implicit val sql = spark.sqlContext
    val loc = tmpDir("gsink1")
    val src = MemoryStream[Long]
    val q = src.toDF().select(col("value").as("k"), (col("value") * 2).as("v"))
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gsink1ckpt"))
      .option("txnAppId", "gsink1")
      .start(loc)
    try {
      src.addData(0L until 10L: _*)
      q.processAllAvailable()
      src.addData(10L until 15L: _*)
      q.processAllAvailable()
      val t = ManagedTable.forPath(spark, loc)
      assert(t.toDF.count() == 15)
      assert(t.history.filter(col("operation") === "STREAMING APPEND")
        .count() >= 1)

      // crash-replay: re-delivering an already-committed batch through a
      // fresh sink instance with the same appId must not duplicate rows
      val sink = new GraftSink(spark, loc, Nil, Some("gsink1"),
        mergeSchema = false)
      val replay = spark.range(5).select(col("id").as("k"), lit(0L).as("v"))
      sink.addBatch(0L, replay)
      assert(t.toDF.count() == 15, "replayed batch 0 must be an O(1) no-op")
    } finally q.stop()
  }

  test("restart from the checkpoint does not re-append") {
    implicit val sql = spark.sqlContext
    val loc = tmpDir("gsink2")
    val ckpt = tmpDir("gsink2ckpt")
    val src = MemoryStream[Long]
    def start() = src.toDF().select(col("value").as("k"))
      .writeStream.format("graft").option("checkpointLocation", ckpt)
      .start(loc)
    val q1 = start()
    try { src.addData(1L, 2L, 3L); q1.processAllAvailable() } finally q1.stop()
    assert(ManagedTable.forPath(spark, loc).toDF.count() == 3)
    val q2 = start()
    try {
      src.addData(4L, 5L)
      q2.processAllAvailable()
      assert(ManagedTable.forPath(spark, loc).toDF.as[Long].collect().sorted
        .toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    } finally q2.stop()
  }

  test("a stream column missing from the target schema fails loud " +
       "(no silent drop); mergeSchema widens instead") {
    val loc = tmpDir("gsink4")
    ManagedTable.create(
      spark.range(5).select(col("id").as("k")), loc)
    val sink = new GraftSink(spark, loc, Nil, Some("gsink4"),
      mergeSchema = false)
    val batch = spark.range(5).select(col("id").as("k"), lit(1L).as("v"))
    val e = intercept[IllegalStateException](sink.addBatch(0L, batch))
    assert(e.getMessage.contains("v") && e.getMessage.contains("mergeSchema"))
    val widening = new GraftSink(spark, loc, Nil, Some("gsink4"),
      mergeSchema = true)
    widening.addBatch(0L, batch)
    val t = ManagedTable.forPath(spark, loc)
    assert(t.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(t.toDF.count() == 10)
  }

  test("graft-cdf source into graft sink: an incremental table mirror") {
    val srcLoc = tmpDir("gsink3src")
    val dstLoc = tmpDir("gsink3dst")
    val t = ManagedTable.create(
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")),
      srcLoc, properties = Map(ManagedTable.cdfPropKey -> "true"))
    // mirror INSERTED rows with k >= 100 (appends-only downstream stage)
    val q = spark.readStream.format("graft-cdf").load(srcLoc)
      .filter(col("_change_type") === "insert" && col("k") >= 100)
      .drop("_change_type", "_commit_version", "_commit_timestamp")
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("gsink3ckpt"))
      .start(dstLoc)
    try {
      t.append(Seq((100L, 0L), (101L, 1L)).toDF("k", "v"))
      t.append(Seq((102L, 2L), (3L, 3L)).toDF("k", "v")) // 3 filtered out
      q.processAllAvailable()
      val mirror = ManagedTable.forPath(spark, dstLoc)
      assert(mirror.toDF.select("k").as[Long].collect().sorted.toSeq ==
        Seq(100L, 101L, 102L))
    } finally q.stop()
  }
}
