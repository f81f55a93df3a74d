package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode
import graft.tables.ManagedTable

/** Structured-Streaming sink writing micro-batches into a managed table
  * (Delta's `writeStream.format("delta")` analog):
  *
  * {{{
  *   df.writeStream.format("graft")
  *     .option("checkpointLocation", ckpt)
  *     .option("txnAppId", "my-pipeline")   // optional; default: query id
  *     .start(tablePath)
  * }}}
  *
  * Exactly-once: every batch commits through [[ManagedTable.append]]'s
  * idempotent-txn path with `(appId, batchId)` — a replayed micro-batch
  * (crash between the sink commit and the checkpoint commit, retried
  * batch) is an O(1) snapshot-property no-op, never a duplicate append.
  * The appId defaults to the streaming query's id (stable across
  * restarts from one checkpoint, like Delta's sink); pass `txnAppId` to
  * survive a checkpoint rebuild.
  *
  * A missing table is created EMPTY on the first batch (schema = the
  * stream's schema, partitioning = `partitionBy(...)`), then appended
  * through the same txn path — the create carries no data, so a crash
  * between create and append replays cleanly. An existing table keeps
  * its own partitioning; appends cluster into it.
  *
  * Composes with the [[CdfSourceProvider graft-cdf source]] into an
  * end-to-end incremental pipeline: `readStream("graft-cdf") →
  * transform → writeStream("graft")` — each table in the chain is a
  * replayable, versioned stage.
  *
  * Append mode only: Complete/Update would overwrite or upsert per
  * batch — use `foreachBatch` with [[graft.tables.Merge]] for those
  * shapes (the SCD2/dedup operators show the pattern).
  */
class GraftSinkProvider extends StreamSinkProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  // `format("graft")` is BOTH ends of a pipeline: readStream tails a
  // table (delegated to [[TableSourceProvider]] — one registered class
  // per short name, or lookup reports an ambiguity) and writeStream
  // appends to one.
  private val source = new TableSourceProvider

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[org.apache.spark.sql.types.StructType],
                            providerName: String,
                            parameters: Map[String, String]) =
    source.sourceSchema(sqlContext, schema, providerName, parameters)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[org.apache.spark.sql.types.StructType],
                            providerName: String,
                            parameters: Map[String, String]) =
    source.createSource(sqlContext, metadataPath, schema, providerName, parameters)

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft sink supports Append output mode, got $outputMode " +
        "(use foreachBatch + Merge for update/complete shapes)")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink requires a table path: .start(<path>) or .option(\"path\", …)"))
    new GraftSink(sqlContext.sparkSession, path, partitionColumns,
      parameters.get("txnAppId"),
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean))
  }
}

class GraftSink(spark: SparkSession, path: String,
                partitionColumns: Seq[String],
                txnAppId: Option[String],
                mergeSchema: Boolean) extends Sink {

  private def appId: String = txnAppId
    .orElse(Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
    .getOrElse(throw new IllegalStateException(
      "graft sink: no streaming query id in scope and no txnAppId option"))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is streaming-tagged; rewrap its physical plan
    // as a batch frame so the table's ordinary writer can run it
    val batch = GraftColumnBridge.asBatchDataFrame(data)
    val table =
      if (ManagedTable.exists(path)) ManagedTable.forPath(spark, path)
      else ManagedTable.create(batch.limit(0), path, partitionColumns)
    // append aligns to the TABLE schema, silently discarding unknown
    // stream columns — for a sink that must fail loud (Delta's sink
    // raises on schema mismatch); mergeSchema=true opts into widening
    if (!mergeSchema) {
      val tableCols = table.schema.fieldNames.map(_.toLowerCase).toSet
      val extra = batch.schema.fieldNames.filterNot(c =>
        tableCols(c.toLowerCase))
      if (extra.nonEmpty) throw new IllegalStateException(
        s"graft sink: stream columns ${extra.mkString(", ")} are not in " +
          s"the target table's schema at $path; drop them, or set " +
          "option(\"mergeSchema\", \"true\") to widen the table")
    }
    table.append(batch, mergeSchema = mergeSchema,
      operation = "STREAMING APPEND", txn = Some((s"sink.$appId", batchId)))
  }

  override def toString: String = s"GraftSink[$path]"
}
