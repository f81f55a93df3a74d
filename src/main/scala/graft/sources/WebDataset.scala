package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset source and sink — the tar-shard convention multimodal
  * training pipelines standardized on (webdataset.github.io): a shard
  * is a plain POSIX ustar archive, a SAMPLE is the run of adjacent
  * entries sharing a basename key, and each entry's extension names a
  * modality (`000017.jpg`, `000017.txt`, `000017.json`). Plain tar is
  * the whole point: shards stream sequentially off object storage with
  * zero random access, and any tar tool can inspect them.
  *
  * Key rule (webdataset's published `base_plus_ext`): the key is the
  * full path up to the FIRST dot of the basename — the directory
  * prefix stays in the key — and the extension is everything after
  * that dot. So `x.seg.json` groups under key `x` as modality
  * `seg.json`, and a foreign tar's adjacent `a/0001.jpg` /
  * `b/0001.txt` are keys `a/0001` and `b/0001`: two samples, never
  * silently merged.
  *
  * [[export]] writes one `shard-NNNNN.tar[.gz]` per partition through
  * the Hadoop filesystem of `dir`, samples streaming out as the
  * iterator drains (one sample in memory per task); the ustar headers
  * are hand-rolled against the public POSIX.1-1988 layout (octal
  * size/chksum fields, two zero blocks at end). [[read]] lists shards
  * via `binaryFile` (bytes unread at listing), un-tars file-per-task,
  * groups adjacent entries by key, and yields one row per sample with
  * the modalities as an `ext → bytes` map — no shuffle, no driver
  * bytes; the grouping is a streaming pass because the format
  * CONTRACT is adjacency (what makes WebDataset sequential-readable
  * at all). Shard count = write-side partitions, exactly how these
  * pipelines size shards for loader parallelism.
  */
object WebDataset {

  private val Blank = new Array[Byte](512)

  // ----------------------------------------------------------- writing

  private def octal(v: Long, width: Int): Array[Byte] = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - 1 - s.length)) + s
    require(padded.length == width - 1,
      s"tar: value $v overflows a $width-byte octal field")
    (padded.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      :+ 0.toByte)
  }

  /** One ustar header block (POSIX.1-1988 layout). */
  private def header(name: String, size: Long): Array[Byte] = {
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nameBytes.length <= 100,
      s"tar: entry name longer than 100 bytes: '$name'")
    val h = new Array[Byte](512)
    System.arraycopy(nameBytes, 0, h, 0, nameBytes.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime (deterministic)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(262) = 0 // magic NUL; version "00" follows
    h(263) = '0'; h(264) = '0'
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    // chksum: 6 octal digits, NUL, space (the historical layout)
    val c = java.lang.Long.toOctalString(sum)
    val cp = ("0" * (6 - c.length)) + c
    System.arraycopy(cp.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '
    h
  }

  private def writeEntry(out: java.io.OutputStream, name: String,
                         data: Array[Byte]): Unit = {
    out.write(header(name, data.length.toLong))
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    if (pad > 0) out.write(Blank, 0, pad)
  }

  /** Export samples as WebDataset shards: one tar per partition, one
    * entry per `(column, extension)` pair per row, written in the
    * given order so every sample's entries are adjacent (the format's
    * grouping contract). Null cells are skipped (absent modality).
    * Columns must be binary or string (strings write UTF-8).
    */
  def export(df: DataFrame, keyCol: String, extCols: Seq[(String, String)],
             dir: String, gzip: Boolean = false): Unit = {
    require(extCols.nonEmpty, "webdataset: need at least one (col, ext)")
    require(extCols.map(_._2).distinct.size == extCols.size,
      s"webdataset: duplicate extensions in ${extCols.map(_._2)}")
    extCols.foreach { case (_, ext) =>
      require(ext.nonEmpty && !ext.startsWith("."),
        s"webdataset: extension must be non-empty without the dot: '$ext'") }
    val ext0 = if (gzip) ".tar.gz" else ".tar"
    val hconf = SerializableHadoopConf.from(df.sparkSession)
    val sel = col(keyCol).cast("string").as("__k") +:
      extCols.map { case (c, _) => col(c).cast("binary") }
    val exts = extCols.map(_._2)
    df.select(sel: _*)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(
            f"$dir/shard-$pid%05d$ext0")
          val fs = path.getFileSystem(hconf.value)
          val raw = new java.io.BufferedOutputStream(
            fs.create(path, true), 1 << 16)
          val out: java.io.OutputStream =
            if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
          try {
            it.foreach { r =>
              val key = r.getString(0)
              require(key != null && !key.contains(".") && !key.contains("/"),
                s"webdataset: key must be dot- and slash-free: '$key'")
              exts.zipWithIndex.foreach { case (ext, i) =>
                if (!r.isNullAt(i + 1))
                  writeEntry(out, s"$key.$ext", r.getAs[Array[Byte]](i + 1))
              }
            }
            out.write(Blank); out.write(Blank) // end-of-archive
          } finally out.close()
        }
      }
  }

  // ----------------------------------------------------------- reading

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (v << 3) + (b(i) - '0'); i += 1
    }
    v
  }

  /** Iterate `(name, bytes)` entries of one tar stream. */
  private def entries(in: java.io.InputStream):
      Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var nextE: (String, Array[Byte]) = null
      private def readFully(buf: Array[Byte]): Boolean = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) {
            require(off == 0, "tar: truncated block")
            return false
          }
          off += n
        }
        true
      }
      private def advance(): Unit = {
        nextE = null
        val h = new Array[Byte](512)
        var more = true
        while (more) {
          if (!readFully(h)) return
          if (h.forall(_ == 0)) return // end-of-archive block
          var nameEnd = 0
          while (nameEnd < 100 && h(nameEnd) != 0) nameEnd += 1
          val name = new String(h, 0, nameEnd,
            java.nio.charset.StandardCharsets.UTF_8)
          val size = parseOctal(h, 124, 12)
          require(size >= 0 && size <= Int.MaxValue.toLong,
            s"tar: unreasonable entry size $size")
          val stored = parseOctal(h, 148, 8)
          java.util.Arrays.fill(h, 148, 156, ' '.toByte)
          var sum = 0L
          var i = 0
          while (i < 512) { sum += h(i) & 0xff; i += 1 }
          require(sum == stored,
            s"tar: header checksum mismatch for '$name'")
          val data = new Array[Byte](size.toInt)
          require(readFully(data), "tar: truncated entry data")
          val pad = ((512 - size % 512) % 512).toInt
          if (pad > 0) {
            val skip = new Array[Byte](pad)
            require(readFully(skip), "tar: truncated entry padding")
          }
          val typeflag = h(156)
          // long-name mechanisms carry the REAL name out of band; the
          // 100-byte field we just read is truncated, and grouping by a
          // truncated key would silently merge distinct samples —
          // refuse loudly instead (our writer never emits these)
          require(typeflag != 'L' && typeflag != 'K' &&
            typeflag != 'x' && typeflag != 'g',
            s"tar: long-name/pax entry (typeflag '${typeflag.toChar}') " +
              s"near '$name' — names over 100 bytes are not supported")
          if (typeflag == '0' || typeflag == 0) { // regular file only
            nextE = (name, data)
            more = false
          } // else: skip dirs/links and keep scanning
        }
      }
      advance()
      override def hasNext: Boolean = nextE != null
      override def next(): (String, Array[Byte]) = {
        val e = nextE; advance(); e
      }
    }

  /** Group adjacent entries into samples by the first-dot key rule. */
  private def samples(es: Iterator[(String, Array[Byte])]):
      Iterator[(String, Map[String, Array[Byte]])] =
    new Iterator[(String, Map[String, Array[Byte]])] {
      private val buf = es.buffered
      // the published WebDataset key rule (webdataset's base_plus_ext):
      // key = the full path up to the FIRST dot of the BASENAME — the
      // directory prefix stays in the key, so a foreign tar's adjacent
      // 'a/0001.jpg' and 'b/0001.txt' are two samples, never silently
      // merged. Our writer emits dot/slash-free keys, so exports group
      // identically under either rule.
      private def keyExt(name: String): (String, String) = {
        val dot = name.indexOf('.', name.lastIndexOf('/') + 1)
        if (dot < 0) (name, "") else
          (name.substring(0, dot), name.substring(dot + 1))
      }
      override def hasNext: Boolean = buf.hasNext
      override def next(): (String, Map[String, Array[Byte]]) = {
        val (k0, _) = keyExt(buf.head._1)
        var parts = Map.empty[String, Array[Byte]]
        while (buf.hasNext && keyExt(buf.head._1)._1 == k0) {
          val (name, data) = buf.next()
          parts += keyExt(name)._2 -> data
        }
        (k0, parts)
      }
    }

  /** Read WebDataset shards: one row per sample —
    * `(shard, key, parts: map<ext, binary>)`. File-per-task; plain and
    * gzip shards mix under one glob (magic-sniffed).
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val schema = StructType(Seq(
      StructField("shard", StringType, nullable = false),
      StructField("key", StringType, nullable = false),
      StructField("parts", MapType(StringType, BinaryType),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val pathStr = r.getString(0)
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(hconf.value)
          val raw = new java.io.BufferedInputStream(fs.open(path), 1 << 16)
          raw.mark(2)
          val m1 = raw.read(); val m2 = raw.read()
          raw.reset()
          val in: java.io.InputStream =
            if (m1 == 0x1f && m2 == 0x8b)
              new java.util.zip.GZIPInputStream(raw)
            else raw
          val ss = samples(entries(in))
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = ss.hasNext
              if (!h) in.close()
              h
            }
            override def next(): Row = {
              val (k, parts) = ss.next()
              Row(pathStr, k, parts)
            }
          }
        }
      }(enc)
  }
}
