package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500 — the IIPC format Common Crawl ships,
  * and therefore THE container a pretraining corpus actually arrives
  * in): reader and writer for WARC/1.0 record streams, plain or
  * per-record-gzipped (the `warc.gz` convention: each record is its own
  * gzip member, members concatenated — the layout that lets a reader
  * skip records without decompressing the whole file).
  *
  * A record is CRLF header lines (`WARC/1.0`, then `Name: value` pairs
  * including the mandatory `Content-Length`), a blank line, exactly
  * `Content-Length` payload bytes, and a CRLF CRLF separator. The
  * reader is tolerant of the envelope variants real crawls produce
  * (LF-only headers, missing trailing separators at EOF) and surfaces
  * every record type — `warcinfo` heads, `resource`, `response` — with
  * the payload kept as raw bytes (HTTP parsing, charset sniffing etc.
  * are downstream concerns, as in real pipelines).
  *
  * Scale shape — the Common Crawl processing model: WARC files are the
  * parallelism unit (CC ships ~1 GB gzip files in the tens of
  * thousands per crawl). `read` lists files via Spark's `binaryFile`
  * source (pushdown-pruned by path glob) and parses each file inside
  * `mapPartitions` — no driver-side parsing, no shuffle; per-record
  * gzip is NOT splittable mid-file, so file-level parallelism is the
  * honest (and the industry-standard) distribution.
  *
  * Format reference: ISO 28500 / IIPC warc-specifications (public);
  * the reference repo has no sources — this is part of the
  * training-data-pipeline surface the brief adds.
  */
object Warc {

  final case class Record(warcType: String, recordId: String,
                          targetUri: String, warcDate: String,
                          contentType: String, payload: Array[Byte])

  private val CRLF = "\r\n"

  // ------------------------------------------------------------ writing

  /** Render records as one WARC/1.0 byte stream; `gzipPerRecord` wraps
    * each record in its own gzip member (the `warc.gz` layout).
    */
  def toBytes(records: Seq[Record], gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { r =>
      val payloadOut =
        if (!gzipPerRecord) out
        else new java.io.ByteArrayOutputStream()
      val h = new StringBuilder
      h ++= "WARC/1.0" ++= CRLF
      h ++= "WARC-Type: " ++= r.warcType ++= CRLF
      h ++= "WARC-Record-ID: " ++= r.recordId ++= CRLF
      h ++= "WARC-Date: " ++= r.warcDate ++= CRLF
      if (r.targetUri.nonEmpty)
        h ++= "WARC-Target-URI: " ++= r.targetUri ++= CRLF
      h ++= "Content-Type: " ++= r.contentType ++= CRLF
      h ++= "Content-Length: " ++= r.payload.length.toString ++= CRLF
      h ++= CRLF
      payloadOut.write(h.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      payloadOut.write(r.payload)
      payloadOut.write(CRLF.getBytes); payloadOut.write(CRLF.getBytes)
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(payloadOut.asInstanceOf[java.io.ByteArrayOutputStream].toByteArray)
        gz.finish()
      }
    }
    out.toByteArray
  }

  /** Write a WARC file (driver/test helper; creates parent dirs). */
  def writeFile(path: String, records: Seq[Record],
                gzipPerRecord: Boolean = false): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, toBytes(records, gzipPerRecord))
    ()
  }

  /** One gzip MEMBER (RFC 1952) from a reusable `Deflater`/`CRC32` —
    * the per-record compressor for [[export]]'s `warc.gz` path. A fresh
    * `GZIPOutputStream` per record would allocate (and leak until GC
    * finalization) a native zlib Deflater each time — measured as the
    * dominant cost of a per-record-gzip export at corpus cadence;
    * resetting one Deflater per task keeps the native buffers hot.
    * Wire-identical to GZIPOutputStream's output: the fixed 10-byte
    * header (no mtime/name), raw deflate body, CRC32+ISIZE trailer.
    */
  private def writeGzipMember(data: Array[Byte],
                              deflater: java.util.zip.Deflater,
                              crc: java.util.zip.CRC32,
                              out: java.io.OutputStream,
                              buf: Array[Byte]): Unit = {
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    deflater.reset()
    deflater.setInput(data)
    deflater.finish()
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      if (n > 0) out.write(buf, 0, n)
    }
    crc.reset()
    crc.update(data)
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    le32(crc.getValue)
    le32(data.length.toLong & 0xffffffffL)
  }

  /** Export a corpus as WARC: one file per partition (the CC sharding
    * model in reverse — partition count controls shard size), records
    * written as `resource` entries with the record id derived from the
    * target URI (stable across re-runs). Shards are created through the
    * Hadoop filesystem of `dir` (local paths in local mode, HDFS/shared
    * mounts on a cluster) and records STREAM out as the partition
    * iterator drains — one record in memory per task, never the shard.
    * Nothing shuffles. Per-record gzip reuses ONE native Deflater per
    * task (see [[writeGzipMember]]) and all writes go through a 64 KiB
    * buffer rather than hitting the filesystem stream per header line.
    */
  def export(df: DataFrame, uriCol: String, payloadCol: String, dir: String,
             gzipPerRecord: Boolean = true,
             date: String = "2024-01-01T00:00:00Z",
             contentType: String = "text/plain",
             warcType: String = "resource"): Unit = {
    val ext = if (gzipPerRecord) ".warc.gz" else ".warc"
    val hconf = SerializableHadoopConf.from(df.sparkSession)
    df.select(col(uriCol).cast("string").as("u"),
        col(payloadCol).cast("binary").as("p"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d$ext")
          val fs = path.getFileSystem(hconf.value)
          val out = new java.io.BufferedOutputStream(
            fs.create(path, true), 1 << 16)
          val deflater = if (gzipPerRecord)
            new java.util.zip.Deflater(
              java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          else null
          val crc = new java.util.zip.CRC32()
          val buf = new Array[Byte](1 << 16)
          try it.foreach { r =>
            val uri = r.getString(0)
            val rec = Record(warcType,
              s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(
                uri.getBytes(java.nio.charset.StandardCharsets.UTF_8))}>",
              uri, date, contentType,
              if (r.isNullAt(1)) Array.empty[Byte]
              else r.getAs[Array[Byte]](1))
            val plain = toBytes(Seq(rec), gzipPerRecord = false)
            if (gzipPerRecord) writeGzipMember(plain, deflater, crc, out, buf)
            else out.write(plain)
          } finally {
            out.close()
            if (deflater != null) deflater.end()
          }
        }
      }
  }

  /** WET export (the Common Crawl `*.warc.wet.gz` sibling): the SAME
    * ISO 28500 container carrying `conversion` records whose payload is
    * the EXTRACTED plain text of each page — what most pretraining
    * pipelines actually consume instead of raw WARC. Pure composition:
    * [[graft.text.HtmlText.extract]] (the codegen main-text kernel)
    * runs in-plan on the HTML column and [[export]] streams the
    * records; same one-file-per-partition sharding, no shuffle.
    * Read back with [[read]] — WET needs no sibling parser, the
    * records filter by `warc_type = 'conversion'`.
    */
  def exportWet(df: DataFrame, uriCol: String, htmlCol: String,
                dir: String, gzipPerRecord: Boolean = true,
                date: String = "2024-01-01T00:00:00Z"): Unit =
    export(
      df.select(col(uriCol),
        graft.text.HtmlText.extract(col(htmlCol)).cast("binary")
          .as("__wet_text")),
      uriCol, "__wet_text", dir, gzipPerRecord, date,
      contentType = "text/plain", warcType = "conversion")

  /** WAT export (the `*.warc.wat.gz` metadata sibling): `metadata`
    * records whose JSON payload carries the envelope header and the
    * page's extracted OUTLINKS — the Common Crawl WAT `Envelope/
    * Payload-Metadata/HTTP-Response-Metadata/HTML-Metadata/Links`
    * shape, built in-plan from the [[graft.plans.HtmlLinks]] kernel via
    * `to_json` (no per-row driver work, no UDF). Links serialize as
    * `{"url": href, "text": anchor}` like CC's `{"path","url"}` rows.
    */
  def exportWat(df: DataFrame, uriCol: String, htmlCol: String,
                dir: String, gzipPerRecord: Boolean = true,
                date: String = "2024-01-01T00:00:00Z"): Unit = {
    val links = graft.plans.expressions.html_links(col(htmlCol))
    val meta = to_json(struct(
      struct(
        struct(col(uriCol).as("WARC-Target-URI"))
          .as("WARC-Header-Metadata"),
        struct(struct(struct(
          transform(links, l => struct(
            l.getField("href").as("url"),
            l.getField("anchor").as("text"))).as("Links"))
          .as("HTML-Metadata")).as("HTTP-Response-Metadata"))
          .as("Payload-Metadata"))
        .as("Envelope")))
    export(
      df.select(col(uriCol), meta.cast("binary").as("__wat_json")),
      uriCol, "__wat_json", dir, gzipPerRecord, date,
      contentType = "application/json", warcType = "metadata")
  }

  // ------------------------------------------------------------ parsing

  /** STREAMING record parser — the scale path: only the CURRENT record
    * is ever in memory (headers + one payload), never the file, never
    * the decompressed stream. Detects per-record gzip by magic (java's
    * GZIPInputStream reads concatenated members transparently until
    * EOF). Tolerates LF-only header lines and a missing final
    * separator. The caller owns closing the underlying stream;
    * [[read]] wraps it in a close-on-exhaustion iterator.
    */
  def parseStream(raw: java.io.InputStream): Iterator[Record] = {
    val pb = new java.io.PushbackInputStream(
      new java.io.BufferedInputStream(raw, 1 << 16), 2)
    val h1 = pb.read()
    val h2 = if (h1 < 0) -1 else pb.read()
    if (h2 >= 0) pb.unread(h2)
    if (h1 >= 0) pb.unread(h1)
    val in: java.io.InputStream =
      if (h1 == 0x1f && h2 == 0x8b)
        new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(pb), 1 << 16)
      else pb
    def readLine(): Option[String] = {
      val buf = new java.io.ByteArrayOutputStream(128)
      var c = in.read()
      if (c < 0) return None
      while (c >= 0 && c != '\n') { buf.write(c); c = in.read() }
      val b = buf.toByteArray
      val n = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1
        else b.length
      Some(new String(b, 0, n, java.nio.charset.StandardCharsets.UTF_8))
    }
    def readFully(len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val n = in.read(out, off, len - off)
        require(n >= 0, s"truncated WARC payload: need $len bytes, got $off")
        off += n
      }
      out
    }
    new Iterator[Record] {
      private var nextRec: Record = null
      private def advance(): Unit = {
        nextRec = null
        var first = readLine()
        while (first.exists(_.isEmpty)) first = readLine() // separators
        first.foreach { f =>
          require(f.startsWith("WARC/"),
            s"not a WARC record header: '$f'")
          val headers =
            scala.collection.mutable.LinkedHashMap.empty[String, String]
          var line = readLine()
          while (line.exists(_.nonEmpty)) {
            val l = line.get
            val i = l.indexOf(':')
            require(i > 0, s"malformed WARC header line: '$l'")
            headers(l.substring(0, i).trim.toLowerCase) =
              l.substring(i + 1).trim
            line = readLine()
          }
          val len = headers.getOrElse("content-length",
            sys.error("WARC record missing Content-Length")).toInt
          nextRec = Record(
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-record-id", ""),
            headers.getOrElse("warc-target-uri", ""),
            headers.getOrElse("warc-date", ""),
            headers.getOrElse("content-type", ""),
            readFully(len))
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Record = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Parse one in-memory WARC byte stream (test/tool convenience over
    * [[parseStream]]).
    */
  def parseAll(bytes: Array[Byte]): Vector[Record] =
    parseStream(new java.io.ByteArrayInputStream(bytes)).toVector

  // ------------------------------------------------------------ reading

  /** Read WARC files under `pathGlob` into a DataFrame:
    * `(warc_file, warc_type, record_id, target_uri, warc_date,
    * content_type, payload binary)`. One task per file (the CC
    * distribution model); nothing shuffles. The listing projects ONLY
    * `path` from the `binaryFile` source (column pruning keeps file
    * bytes unread at the listing stage) and each task stream-parses its
    * files record-by-record via [[parseStream]] — peak memory per task
    * is one record, not one decompressed shard.
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("warc_file", StringType, nullable = false),
      StructField("warc_type", StringType, nullable = false),
      StructField("record_id", StringType, nullable = false),
      StructField("target_uri", StringType, nullable = false),
      StructField("warc_date", StringType, nullable = false),
      StructField("content_type", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val pathStr = r.getString(0)
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(hconf.value)
          val in = fs.open(path)
          val recs = parseStream(in)
          // close on exhaustion: the flatMap consumer drains each file's
          // iterator fully before moving to the next row
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = recs.hasNext
              if (!h) in.close()
              h
            }
            override def next(): Row = {
              val rec = recs.next()
              Row(pathStr, rec.warcType, rec.recordId, rec.targetUri,
                rec.warcDate, rec.contentType, rec.payload)
            }
          }
        }
      }(enc)
  }
}
