package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{Path => HadoopPath}
import graft.tables.ManagedTable

/** Structured-Streaming SOURCE over a managed table (Delta's
  * `spark.readStream.format("delta")` analog — the most common Delta
  * streaming pattern: tail a table's appends):
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("startingVersion", "3")     // optional: tail from v3, no snapshot
  *     .option("startingTimestamp", "2024-01-01 00:00:00") // or by wall clock
  *     .option("skipChangeCommits", "true") // optional: skip non-append commits
  *     .option("maxVersionsPerTrigger", "10") // commits per micro-batch
  *     .option("maxFilesPerTrigger", "100")   // or by file count
  *     .option("maxBytesPerTrigger", "1g")    // or by bytes (k/m/g)
  *     .load(tablePath)
  * }}}
  *
  * The file/byte caps are Delta's admission-control knobs: on a table
  * whose commits vary wildly in size, a version count says nothing
  * about a trigger's work — the byte budget does. Whole commits are
  * admitted up to the budget (offsets are version-granular), at least
  * one per trigger so an oversized commit can never wedge the stream;
  * commits that stream no rows (OPTIMIZE, skipped change commits)
  * weigh zero.
  *
  * Default semantics match Delta: the first batch is the table's FULL
  * snapshot as of stream start, then each micro-batch carries the rows
  * appended by subsequent commits. Commit classification is STRUCTURAL,
  * not operation-string trust: a commit that removes no (path, dv) file
  * entry is append-shaped and streams its added files; a commit that
  * removes entries (DELETE/UPDATE/MERGE rewrites, DV swaps, OVERWRITE)
  * fails the stream loud — streaming a changed row as if it were an
  * append silently corrupts every downstream aggregate — unless
  * `skipChangeCommits` opts into skipping them (Delta's option of the
  * same name). OPTIMIZE commits rewrite without changing rows and are
  * always skipped. Offsets are table versions; restart replays from the
  * checkpoint within the vacuum retention window, and the initial
  * anchor version is pinned under `metadataPath` exactly like
  * [[CdfSourceProvider]] (crash between offset-log and sink commit must
  * not re-anchor).
  */
class TableSourceProvider extends StreamSourceProvider {
  // NOT a registered DataSourceRegister: [[GraftSinkProvider]] owns the
  // "graft" short name and delegates its read side here — registering a
  // second provider under the same name would make lookup ambiguous.

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a table path: .load(<path>) or .option(\"path\", …)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    ("graft",
      ManagedTable.forPath(sqlContext.sparkSession, pathOf(parameters)).schema)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val table = ManagedTable.forPath(sqlContext.sparkSession, path)
    val hconf = sqlContext.sparkSession.sessionState.newHadoopConf()
    val mPath = new HadoopPath(metadataPath, "graft-table-base")
    val fs = mPath.getFileSystem(hconf)
    val startingVersion = StreamAnchors.startingVersion(parameters, table)
    startingVersion.foreach(v => require(v >= 0,
      s"startingVersion must be >= 0, got $v"))
    // base = highest version NOT part of the stream. Default: snapshot
    // mode — base is the stream-start version and batch 0 reads that
    // whole snapshot. startingVersion=v tails commits >= v, no snapshot
    // (v=0 streams the whole history; commitFileDelta treats version 0
    // as all-added).
    val base = StreamAnchors.pinInitialVersion(fs, mPath,
      startingVersion.map(_ - 1).getOrElse(table.latestVersion))
    val skipChanges = parameters.get("skipChangeCommits").exists(_.toBoolean)
    val caps = StreamAnchors.triggerCaps(parameters)
    val highWater = new StreamHighWater(fs,
      new HadoopPath(metadataPath, "graft-table-hw"), enabled = caps.isDefined)
    new TableSource(sqlContext.sparkSession, table, base,
      initialSnapshot = startingVersion.isEmpty, skipChanges, caps, highWater)
  }
}

class TableSource(spark: org.apache.spark.sql.SparkSession,
                  table: ManagedTable, baseVersion: Long,
                  initialSnapshot: Boolean, skipChangeCommits: Boolean,
                  caps: StreamAnchors.TriggerCaps =
                    StreamAnchors.TriggerCaps(None, None, None),
                  highWater: StreamHighWater =
                    new StreamHighWater(null, null, enabled = false))
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType = table.schema

  // cap base: restored from the persisted high-water on restart so a
  // capped offer can never regress below the checkpointed position (see
  // [[StreamHighWater]]); baseVersion on first start
  @volatile private var offered: Long = highWater.restore(baseVersion)
  // whether batch 0 (which carries the initial snapshot) has been offered
  // or recovered; restart recovery flips it in getBatch before the first
  // getOffset call
  @volatile private var firstBatchDone: Boolean = !initialSnapshot

  // Trigger.AvailableNow anchor: versions past the prepare-time latest
  // are out of scope for this run, so a capped backfill drains the
  // backlog in maxVersionsPerTrigger-bounded batches and STOPS — without
  // the trait, Spark's AvailableNowSourceWrapper snapshots ONE (capped)
  // getOffset at prepare time and the run would end after a single batch
  // with the backlog unread.
  @volatile private var availableNowLimit: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowLimit = Some(table.latestVersion)

  // SupportsTriggerAvailableNow extends SupportsAdmissionControl, which
  // reroutes EVERY trigger's offset discovery to latestOffset — delegate
  // to the V1 logic (rate capping and restart handling live in `offered`
  // + the persisted high-water, so both arguments are already covered).
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  /** End version this trigger admits, walking from `offered` toward
    * `latest` under the caps. Version cap is arithmetic (no log reads);
    * file/byte caps read each candidate commit's log entry and stop
    * BEFORE the commit that would overflow — but always admit at least
    * one version past `offered` (offsets are version-granular; a commit
    * bigger than the cap must still flow, as Delta always admits at
    * least one file). Commits that add nothing (OPTIMIZE, skipped
    * change commits) weigh zero.
    */
  private def admitUpTo(latest: Long): Long = {
    val vCapped = caps.maxVersions match {
      case Some(m) => math.min(latest, offered + m)
      case None => latest
    }
    if (!caps.needsWalk || vCapped <= offered) vCapped
    else {
      val maxF = caps.maxFiles.getOrElse(Long.MaxValue)
      val maxB = caps.maxBytes.getOrElse(Long.MaxValue)
      var end = offered
      var files = 0L
      var bytes = 0L
      var full = false
      while (!full && end < vCapped) {
        val (added, removed, _, _) = table.commitFileDelta(end + 1)
        // a commit that removes entries never streams rows here (it is
        // OPTIMIZE, skipped, or fails the stream in getBatch) — weigh 0
        val weighed = if (removed.nonEmpty) Nil else added
        val f = weighed.size.toLong
        val b = weighed.map(_.bytes).sum
        if (end > offered && (files + f > maxF || bytes + b > maxB)) full = true
        else { files += f; bytes += b; end += 1 }
      }
      end
    }
  }

  override def getOffset: Option[Offset] = {
    val latest = availableNowLimit match {
      case Some(anchor) => math.min(table.latestVersion, anchor)
      case None => table.latestVersion
    }
    val capped = admitUpTo(latest)
    if (!firstBatchDone) {
      // snapshot mode offers batch 0 even when no commit landed since
      // stream start: the initial snapshot IS version `baseVersion`
      firstBatchDone = true
      val end = math.max(capped, baseVersion)
      offered = end
      highWater.record(end)
      Some(LongOffset(end))
    } else if (capped <= offered) None
    else {
      offered = capped
      highWater.record(capped)
      Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val to = CdfSource.version(end)
    // recovery of a checkpoint written before the high-water existed:
    // re-persist so the NEXT restart restores correctly too
    if (to > offered) { offered = to; highWater.record(to) }
    firstBatchDone = true // a recovered batch subsumes (or re-delivers) batch 0
    val from = start.map(CdfSource.version).getOrElse(baseVersion)
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (start.isEmpty && initialSnapshot)
      parts += table.toDF(baseVersion)
    var v = math.max(from, baseVersion) + 1
    while (v <= to) {
      val (added, removed, op, commitSchema) = table.commitFileDelta(v)
      if (removed.nonEmpty) {
        if (op == "OPTIMIZE" || skipChangeCommits) () // rows unchanged / opted out
        else throw new IllegalStateException(
          s"graft streaming source at ${table.location}: commit v$v ($op) " +
            "changed or removed existing rows — a row-append stream cannot " +
            "represent that. Use .option(\"skipChangeCommits\", \"true\") to " +
            "skip such commits, or the graft-cdf source to stream the " +
            "change feed itself.")
      } else if (added.nonEmpty) {
        parts += table.readCommitFiles(added, commitSchema, v)
      }
      v += 1
    }
    val batch =
      if (parts.isEmpty)
        // empty batch from the PINNED schema: building it off
        // toDF(baseVersion) would re-validate the anchor snapshot's files
        // on every all-skipped trigger and die once vacuum/cleanupLog
        // reclaims them — an empty batch needs no files at all
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else parts.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    // fixed output shape: evolved columns only surface after a restart
    // (Delta semantics); pre-evolution commits null-fill
    val projected = batch.select(schema.fields.map { f =>
      if (batch.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    GraftColumnBridge.asStreamingDataFrame(projected)
  }

  override def stop(): Unit = ()
}
