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

  /** `maxVersionsPerTrigger` option: positive long or absent. */
  def maxVersionsPerTrigger(parameters: Map[String, String]): Option[Long] =
    parameters.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }
}
