package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import org.apache.hadoop.fs.{Path => HadoopPath}
import graft.tables.ManagedTable

/** Structured-Streaming source over a managed table's change data feed
  * (Delta's `readStream.option("readChangeFeed", "true")` analog):
  *
  * {{{
  *   spark.readStream.format("graft-cdf")
  *     .option("startingVersion", "0")    // optional; default: only NEW commits
  *     .option("startingTimestamp", "2024-01-01") // or by wall clock
  *     .option("maxVersionsPerTrigger", "10") // commits per micro-batch
  *     .option("maxFilesPerTrigger", "100")   // or by file-delta weight
  *     .option("maxBytesPerTrigger", "1g")    // (see TableSourceProvider)
  *     .load(tablePath)
  * }}}
  *
  * Offsets ARE table versions — the commit log is already a totally
  * ordered, replayable stream, so `getBatch(start, end]` is exactly
  * [[ManagedTable.changes]] over that version range: sidecar-backed
  * commits stream their captured net rows, everything else derives from
  * the snapshots. Restart recovery replays from the checkpointed
  * version; the range must still be within the vacuum retention window
  * (reclaimed versions fail loud, like time travel — size retention to
  * the consumer's maximum downtime, as with Delta CDF streams).
  *
  * Schema: the table's columns (as of source creation) +
  * `_change_type`, `_commit_version`, `_commit_timestamp`.
  */
class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdf requires a table path: .load(<path>) or .option(\"path\", …)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), CdfSource.cdfSchema(
      ManagedTable.forPath(sqlContext.sparkSession, pathOf(parameters)).schema))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val table = ManagedTable.forPath(sqlContext.sparkSession, path)
    // exclusive lower bound: startingVersion=v streams commits >= v
    // (Delta's startingVersion semantics); absent = only commits after
    // stream start. The computed base is pinned ONCE under metadataPath
    // and recovered on restart — see [[StreamAnchors.pinInitialVersion]].
    val hconf = sqlContext.sparkSession.sessionState.newHadoopConf()
    val mPath = new HadoopPath(metadataPath, "graft-cdf-base")
    val fs = mPath.getFileSystem(hconf)
    val base = StreamAnchors.pinInitialVersion(fs, mPath,
      StreamAnchors.startingVersion(parameters, table).map(_ - 1)
        .getOrElse(table.latestVersion))
    val caps = StreamAnchors.triggerCaps(parameters)
    val highWater = new StreamHighWater(fs,
      new HadoopPath(metadataPath, "graft-cdf-hw"), enabled = caps.isDefined)
    new CdfSource(table, base, caps, highWater)
  }
}

class CdfSource(table: ManagedTable, baseVersion: Long,
                caps: StreamAnchors.TriggerCaps =
                  StreamAnchors.TriggerCaps(None, None, None),
                highWater: StreamHighWater =
                  new StreamHighWater(null, null, enabled = false))
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType = CdfSource.cdfSchema(table.schema)

  /** High-water mark of versions already OFFERED via [[getOffset]] (or
    * re-committed through [[getBatch]] recovery on restart) — the base
    * the per-trigger cap advances from. Offering is monotone, so a
    * plain volatile is enough (the microbatch thread is the only
    * writer). Restored from the PERSISTED high-water on restart: a
    * capped offer must never regress below the checkpointed position
    * (see [[StreamHighWater]]).
    */
  @volatile private var offered: Long = highWater.restore(baseVersion)

  // Trigger.AvailableNow anchor (see [[TableSource]]): changes past the
  // prepare-time latest version are out of scope, so a capped backfill
  // drains the backlog in bounded batches and stops at the anchor.
  @volatile private var availableNowLimit: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowLimit = Some(table.latestVersion)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  // SupportsAdmissionControl reroutes offset discovery here on every
  // trigger; the V1 getOffset already owns capping + restart handling
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    getOffset.orNull

  override def getOffset: Option[Offset] = {
    val v = availableNowLimit match {
      case Some(anchor) => math.min(table.latestVersion, anchor)
      case None => table.latestVersion
    }
    // cap the batch by commits and/or file-level weight past the last
    // offered offset (maxVersionsPerTrigger / maxFilesPerTrigger /
    // maxBytesPerTrigger): a stream catching up on a long backlog
    // drains it in bounded micro-batches instead of one unbounded
    // replay batch. A change commit's weight is its full file delta
    // (added + removed) — the upper bound of what the change feed
    // reads to produce its rows. At least one version per trigger.
    val vCapped = caps.maxVersions match {
      case Some(m) => math.min(v, offered + m)
      case None => v
    }
    val end =
      if (!caps.needsWalk || vCapped <= offered) vCapped
      else {
        val maxF = caps.maxFiles.getOrElse(Long.MaxValue)
        val maxB = caps.maxBytes.getOrElse(Long.MaxValue)
        var e = offered
        var files = 0L
        var bytes = 0L
        var full = false
        while (!full && e < vCapped) {
          val (added, removed, _, _) = table.commitFileDelta(e + 1)
          val delta = added ++ removed
          val f = delta.size.toLong
          val b = delta.map(_.bytes).sum
          if (e > offered && (files + f > maxF || bytes + b > maxB))
            full = true
          else { files += f; bytes += b; e += 1 }
        }
        e
      }
    if (end <= offered) None
    else { offered = end; highWater.record(end); Some(LongOffset(end)) }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(CdfSource.version).getOrElse(baseVersion)
    val to = CdfSource.version(end)
    // restart recovery replays a checkpointed range before any
    // getOffset call — advance the cap base so the next offer continues
    // from the recovered end, not from baseVersion (and re-persist, for
    // checkpoints written before the high-water existed)
    if (to > offered) { offered = to; highWater.record(to) }
    // project to the declared schema: a mid-stream schema evolution must
    // not change the source's output shape (new columns surface after a
    // stream restart, as with Delta). Changes from commits that PREDATE
    // an evolved column lack it — null-fill, as the batch reader does.
    val ch = table.changes(from, to)
    val batch = ch.select(schema.fields.map { f =>
      if (ch.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
    GraftColumnBridge.asStreamingDataFrame(batch)
  }

  override def stop(): Unit = ()
}

object CdfSource {
  def cdfSchema(tableSchema: StructType): StructType = StructType(
    tableSchema.fields.toSeq :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_version", LongType, nullable = false) :+
      StructField("_commit_timestamp", TimestampType, nullable = false))

  /** Offset → version; restart recovery hands back SerializedOffset
    * (LongOffset's json is the bare number).
    */
  private[streaming] def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }
}
