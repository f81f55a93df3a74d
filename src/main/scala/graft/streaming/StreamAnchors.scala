package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HadoopPath}

/** Shared streaming-source plumbing: the initial-offset anchor pinned
  * under the query's metadataPath, and common option parsing. The anchor
  * must be persisted with a put-if-absent create and recovered on
  * restart — recomputing it from `latestVersion` after a crash between
  * the offset-log commit and the sink commit would re-anchor PAST batch
  * 0's range and silently drop (or fail on) the first batch's rows.
  * File sources persist their initial state under metadataPath for
  * exactly this reason. Used by both the CDF source and the table
  * source.
  */
private[streaming] object StreamAnchors {

  /** Read the pinned anchor, or pin `default` via exclusive create
    * (overwrite = false IS the put-if-absent: a tmp+rename publish would
    * NOT be — local-FS rename silently REPLACES an existing destination,
    * so a racing creator could overwrite the winner's anchor after it
    * was already used). A lost create race defers to the winner's
    * persisted value — both anchors must agree forever.
    */
  def pinInitialVersion(fs: FileSystem, mPath: HadoopPath,
                        default: => Long): Long =
    if (fs.exists(mPath)) read(fs, mPath)
    else {
      val b = default
      val out =
        try fs.create(mPath, false)
        catch { case _: java.io.IOException => null }
      if (out != null) {
        try out.write(b.toString.getBytes("UTF-8")) finally out.close()
        b
      } else {
        if (!fs.exists(mPath)) throw new IllegalStateException(
          s"cannot persist streaming initial offset under $mPath")
        read(fs, mPath)
      }
    }

  private def read(fs: FileSystem, mPath: HadoopPath): Long = {
    val in = fs.open(mPath)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    finally in.close()
  }

  /** `startingTimestamp` option resolved to Delta's startingVersion
    * semantics: the FIRST version committed at or after the timestamp
    * streams (`versionAsOf` returns the last version at-or-before it,
    * so +1 — unless the timestamp predates the table, where streaming
    * starts at version 0). Mutually exclusive with `startingVersion`.
    * Accepts epoch millis or an ISO/SQL timestamp (session-default
    * JVM zone, like a cast).
    */
  def startingVersion(parameters: Map[String, String],
                      table: graft.tables.ManagedTable): Option[Long] = {
    val byVersion = parameters.get("startingVersion").map(_.toLong)
    val byTs = parameters.get("startingTimestamp").map { raw =>
      require(byVersion.isEmpty,
        "use either startingVersion or startingTimestamp, not both")
      val ms =
        if (raw.matches("-?\\d+")) raw.toLong
        else java.sql.Timestamp.valueOf(
          raw.trim.replace("T", " ") match {
            case d if d.matches("\\d{4}-\\d{2}-\\d{2}") => d + " 00:00:00"
            case other => other
          }).getTime
      // first version with timestamp >= ms: versionAsOf is at-or-BEFORE,
      // so probe ms-1 — probing ms itself would skip a commit stamped
      // exactly at the boundary (Delta's startingTimestamp is inclusive)
      try table.versionAsOf(ms - 1) + 1
      catch { case _: IllegalArgumentException => 0L } // predates v0
    }
    byVersion.orElse(byTs)
  }

  /** `maxVersionsPerTrigger` option: positive long or absent. */
  def maxVersionsPerTrigger(parameters: Map[String, String]): Option[Long] =
    parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }

  /** Per-trigger admission caps. `maxVersions` bounds COMMITS per batch;
    * `maxFiles`/`maxBytes` bound the batch's file-level WEIGHT (Delta's
    * `maxFilesPerTrigger`/`maxBytesPerTrigger`) — the knobs that matter
    * when version count says nothing about commit size. Offsets stay
    * version-granular, so at least one version is always admitted (as
    * Delta always admits at least one file): the caps bound batch size,
    * they cannot wedge the stream.
    */
  final case class TriggerCaps(maxVersions: Option[Long],
                               maxFiles: Option[Long],
                               maxBytes: Option[Long]) {
    def isDefined: Boolean =
      maxVersions.isDefined || maxFiles.isDefined || maxBytes.isDefined
    /** Weight-based caps need the per-commit log walk. */
    def needsWalk: Boolean = maxFiles.isDefined || maxBytes.isDefined
  }

  /** Parse the three cap options. `maxBytesPerTrigger` accepts a plain
    * byte count or a `k`/`m`/`g` suffix (binary multiples, Delta-style
    * "10g" strings).
    */
  def triggerCaps(parameters: Map[String, String]): TriggerCaps = {
    val files = parameters.get("maxFilesPerTrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
    val bytes = parameters.get("maxBytesPerTrigger").map { raw =>
      val s = raw.trim.toLowerCase
      val (digits, mult) = s.takeWhile(_.isDigit) match {
        case d if d.isEmpty =>
          throw new IllegalArgumentException(
            s"maxBytesPerTrigger must be <n>[k|m|g][b], got '$raw'")
        case d => (d, s.drop(d.length) match {
          case "" | "b" => 1L
          case "k" | "kb" => 1L << 10
          case "m" | "mb" => 1L << 20
          case "g" | "gb" => 1L << 30
          case other => throw new IllegalArgumentException(
            s"maxBytesPerTrigger: unknown unit '$other' in '$raw'")
        })
      }
      val n = digits.toLong * mult
      require(n > 0, s"maxBytesPerTrigger must be positive, got $raw")
      n
    }
    TriggerCaps(maxVersionsPerTrigger(parameters), files, bytes)
  }
}

/** Persisted high-water of versions OFFERED via `getOffset` — the floor a
  * rate-capped source's cap base restores to across restarts. Without it, a
  * restart from a fully-committed checkpoint re-initializes the cap base to
  * the initial anchor, the first post-restart `getOffset` returns
  * `min(latest, anchor + max)` — potentially BELOW the checkpoint's
  * committed offset — and the engine then re-runs capped batches over
  * versions the sink already received (the engine compares available vs
  * committed offsets by EQUALITY, not ordering, so a regressed offer is
  * "new data"): duplicate rows, exactly-once broken.
  *
  * [[record]] MUST run before the offset escapes `getOffset`: the invariant
  * is hw >= every offset the engine ever wrote to its offset log, so a
  * restart can never re-offer below the checkpointed position. Overshoot
  * (hw past the committed offset after a crash mid-trigger) is safe — the
  * engine always hands `getBatch` its checkpointed start, so a high base
  * only makes the first post-restart batch wider than the cap, never skips.
  *
  * Enabled only when `maxVersionsPerTrigger` is set: an uncapped source
  * offers `latestVersion`, which is always >= the committed offset, so it
  * pays no per-trigger filesystem write.
  */
private[streaming] final class StreamHighWater(fs: FileSystem,
                                               path: HadoopPath,
                                               enabled: Boolean) {
  // lazy: a disabled instance may carry a null path and must never touch it
  private lazy val tmp = new HadoopPath(path.getParent, path.getName + ".tmp")

  /** Highest persisted offer, or `floor` when none exists (or disabled). */
  def restore(floor: Long): Long =
    if (!enabled) floor
    else math.max(floor, math.max(readOrMin(path), readOrMin(tmp)))

  /** Persist an offer. tmp-write then swap keeps at least one parseable
    * file through every crash window ([[restore]] takes the max of both):
    * a torn tmp write leaves the old `path` intact; a crash between delete
    * and rename leaves the new value in tmp. Single writer (the query's
    * microbatch thread), so no create race to defend.
    */
  def record(v: Long): Unit = if (enabled) {
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(path, false)
    fs.rename(tmp, path)
  }

  private def readOrMin(p: HadoopPath): Long =
    try {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => Long.MinValue }
}
