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
  * Append mode by default. `.option("mergeKeys", "k1,k2")` switches the
  * sink to MERGE-per-batch (the Delta `foreachBatch` + MERGE upsert
  * pattern, first-class): each micro-batch upserts by key through
  * [[graft.tables.Merge]] with the same idempotent `(appId, batchId)`
  * txn marker riding the merge commit, so replays re-land exactly once.
  * With several rows per key in one batch, `.option("sequenceColumn",
  * "ts")` picks the latest (highest) per key; without it duplicate keys
  * refuse loud (an unordered multi-row upsert is nondeterministic).
  *
  * `.option("applyCdf", "true")` (requires `mergeKeys`) interprets the
  * stream as a change data feed (`_change_type`/`_commit_version`
  * columns — exactly what the graft-cdf source emits): per key the batch
  * reduces to its LATEST change (preimages dropped), deletes delete,
  * everything else upserts. `readStream.format("graft-cdf") →
  * writeStream.format("graft").option("applyCdf", "true")` is therefore
  * a complete exactly-once table replication pipeline.
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
    val mergeKeys = parameters.get("mergeKeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val applyCdf = parameters.get("applyCdf").exists(_.toBoolean)
    require(mergeKeys.nonEmpty || !applyCdf,
      "graft sink: applyCdf requires mergeKeys (the keys the feed's " +
        "changes apply by)")
    require(outputMode == OutputMode.Append() || mergeKeys.nonEmpty,
      s"graft sink supports Append output mode, got $outputMode " +
        "(or set mergeKeys for the upsert shape)")
    require(mergeKeys.isEmpty || !parameters.get("mergeSchema").exists(_.toBoolean),
      "graft sink: mergeSchema composes with the append shape only")
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft sink requires a table path: .start(<path>) or .option(\"path\", …)"))
    new GraftSink(sqlContext.sparkSession, path, partitionColumns,
      parameters.get("txnAppId"),
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean),
      mergeKeys = mergeKeys.getOrElse(Nil),
      sequenceColumn = parameters.get("sequenceColumn"),
      applyCdf = applyCdf)
  }
}

class GraftSink(spark: SparkSession, path: String,
                partitionColumns: Seq[String],
                txnAppId: Option[String],
                mergeSchema: Boolean,
                mergeKeys: Seq[String] = Nil,
                sequenceColumn: Option[String] = None,
                applyCdf: Boolean = false) extends Sink {

  private def appId: String = txnAppId
    .orElse(Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId")))
    .getOrElse(throw new IllegalStateException(
      "graft sink: no streaming query id in scope and no txnAppId option"))

  private val cdfMetaCols = Seq("_change_type", "_commit_version",
    "_commit_timestamp")

  /** MERGE-per-batch (mergeKeys set): reduce the batch to one row per
    * key, then upsert (or CDF-apply) through [[graft.tables.Merge]] with
    * the idempotent txn marker on the merge commit itself.
    */
  private def mergeBatch(batchId: Long, batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    mergeKeys.foreach(k => require(batch.columns.contains(k),
      s"graft sink: merge key '$k' is not a stream column " +
        batch.columns.mkString("[", ", ", "]")))
    val keyCols = mergeKeys.map(col)
    val reduced =
      if (applyCdf) {
        cdfMetaCols.take(2).foreach(c => require(batch.columns.contains(c),
          s"graft sink: applyCdf needs the change feed's '$c' column " +
            "(stream from the graft-cdf source)"))
        // latest change per key wins; preimages are the pre-state of an
        // update, never applied. Within ONE version, a derived (sidecar-
        // less) change feed — e.g. an overwrite commit on a CDF table —
        // emits delete+insert for a key live on both sides; the pair must
        // net to the insert (an upsert), so insert/update_postimage
        // outrank delete at equal versions instead of leaving the
        // row_number tie to shuffle order.
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(col("_commit_version").desc,
            when(col("_change_type") === "delete", 0).otherwise(1).desc)
        batch.filter(col("_change_type") =!= "update_preimage")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .withColumn("__cdf_delete", col("_change_type") === "delete")
          .drop(cdfMetaCols.filter(batch.columns.contains): _*)
      } else sequenceColumn match {
        case Some(sc) =>
          require(batch.columns.contains(sc),
            s"graft sink: sequenceColumn '$sc' is not a stream column")
          val w = Window.partitionBy(keyCols: _*)
            .orderBy(col(sc).desc)
          batch.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
            .withColumn("__cdf_delete", lit(false))
        case None =>
          // duplicate-key guard FOLDED into the merge's own pass: a
          // window count over the merge keys rides the source frame and
          // assert_true raises during the merge's source scan if any key
          // repeats. The former standalone groupBy/collect probe cost a
          // full extra aggregation job on EVERY micro-batch just to
          // build this error message. The guard lives in a filter — a
          // projected-then-dropped column would be deleted by column
          // pruning, silently disarming it.
          val w = Window.partitionBy(keyCols: _*)
          val msg = concat(
            lit(s"graft sink: batch $batchId carries multiple rows for key ("),
            concat_ws(", ", keyCols.map(_.cast("string")): _*),
            lit(") and no sequenceColumn orders them — an unordered " +
              "multi-row upsert is nondeterministic"))
          batch
            .withColumn("__kc", count(lit(1)).over(w))
            .filter(coalesce(assert_true(col("__kc") === 1, msg), lit(true)))
            .drop("__kc")
            .withColumn("__cdf_delete", lit(false))
      }
    val dataCols = reduced.columns.filterNot(_ == "__cdf_delete").toSeq
    val table =
      if (ManagedTable.exists(path)) ManagedTable.forPath(spark, path)
      else ManagedTable.create(
        reduced.select(dataCols.map(col): _*).limit(0), path, partitionColumns)
    val cond = mergeKeys.map(k => col(s"t.$k") <=> col(s"s.$k"))
      .reduce(_ && _)
    val setAll = dataCols.map(c => c -> s"s.`$c`").toMap
    var m = graft.tables.Merge.into(table.toDF, "t")
      .using(reduced, "s", cond)
    if (applyCdf) m = m.whenMatchedDelete("s.__cdf_delete")
    m.whenMatchedUpdate("NOT s.__cdf_delete", setAll)
      .whenNotMatchedInsert("NOT s.__cdf_delete", setAll)
      .withTxn(s"sink.$appId", batchId)
      .execute(table)
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is streaming-tagged; rewrap its physical plan
    // as a batch frame so the table's ordinary writer can run it
    val batch = GraftColumnBridge.asBatchDataFrame(data)
    if (mergeKeys.nonEmpty) return mergeBatch(batchId, batch)
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
