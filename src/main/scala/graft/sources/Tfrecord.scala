package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord source and sink — the TensorFlow training-data container
  * (and the de-facto sharded-example interchange far beyond TF: most
  * data loaders speak it). A file is a stream of framed records:
  *
  * {{{
  *   uint64 length (LE)
  *   uint32 masked crc32c of the 8 length bytes (LE)
  *   byte   data[length]
  *   uint32 masked crc32c of data (LE)
  * }}}
  *
  * with CRC32C (Castagnoli) masked per the published TF spec
  * (`((crc >> 15) | (crc << 17)) + 0xa282ead8`, uint32). Each record
  * payload is a `tf.train.Example` protobuf: a `Features` map from
  * column name to a `bytes_list` / `float_list` / `int64_list`
  * `Feature`. Both layers are hand-coded here against the PUBLIC wire
  * formats (protobuf encoding + the TFRecord framing in the TensorFlow
  * docs) — no TF dependency.
  *
  * Scale shape (same as [[Warc]]): files are the parallelism unit.
  * [[export]] writes one shard per partition through the Hadoop
  * filesystem of `dir`, records streaming out as the iterator drains —
  * one record in memory per task. [[read]] lists shards via
  * `binaryFile` (path-pruned; bytes stay unread at listing) and parses
  * file-per-task — no shuffle, no driver-side bytes. TFRecord framing
  * is not splittable (no sync markers), so file-level parallelism is
  * the honest distribution; shard count = write-side partition count,
  * exactly how TF pipelines size their shards.
  *
  * Column mapping: string/binary → `bytes_list`; byte/short/int/long/
  * boolean → `int64_list`; float → `float_list` (double is REFUSED —
  * `float_list` is IEEE binary32 on the wire, and a silent down-cast
  * would break the bit-exact round-trip contract the [[Npy]]/
  * [[Safetensors]] siblings keep; cast explicitly if lossy is
  * intended); arrays of those → multi-valued lists. Reads verify BOTH
  * frame CRCs and fail loudly on corruption.
  */
object Tfrecord {

  // ------------------------------------------------------------ crc32c

  /** TFRecord's crc mask (uint32 arithmetic — Java int wraps mod 2^32,
    * which is exactly what the spec's unsigned add means).
    */
  private def mask(crc: Int): Int =
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8

  private def maskedCrc(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    mask(c.getValue.toInt)
  }

  // ------------------------------------------------------- proto write

  private final class ProtoOut(initial: Int = 256) {
    val buf = new java.io.ByteArrayOutputStream(initial)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) {
        buf.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      buf.write(v.toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def lenDelim(field: Int, bytes: Array[Byte]): Unit = {
      key(field, 2); varint(bytes.length.toLong); buf.write(bytes)
    }
    def toBytes: Array[Byte] = buf.toByteArray
  }

  private def bytesListFeature(values: Seq[Array[Byte]]): Array[Byte] = {
    val bl = new ProtoOut()
    values.foreach(v => bl.lenDelim(1, v))
    val f = new ProtoOut()
    f.lenDelim(1, bl.toBytes) // Feature.bytes_list = field 1
    f.toBytes
  }

  private def int64ListFeature(values: Seq[Long]): Array[Byte] = {
    val packed = new ProtoOut()
    values.foreach(packed.varint)
    val il = new ProtoOut()
    il.lenDelim(1, packed.toBytes) // Int64List.value, packed varints
    val f = new ProtoOut()
    f.lenDelim(3, il.toBytes) // Feature.int64_list = field 3
    f.toBytes
  }

  private def floatListFeature(values: Seq[Float]): Array[Byte] = {
    val packed = new java.io.ByteArrayOutputStream(values.length * 4)
    values.foreach { v =>
      val bits = java.lang.Float.floatToIntBits(v)
      packed.write(bits & 0xff); packed.write((bits >>> 8) & 0xff)
      packed.write((bits >>> 16) & 0xff); packed.write((bits >>> 24) & 0xff)
    }
    val fl = new ProtoOut()
    fl.lenDelim(1, packed.toByteArray) // FloatList.value, packed fixed32
    val f = new ProtoOut()
    f.lenDelim(2, fl.toBytes) // Feature.float_list = field 2
    f.toBytes
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  private def featureBytes(dt: DataType, v: Any): Array[Byte] = dt match {
    case StringType => bytesListFeature(Seq(v.asInstanceOf[String].getBytes(Utf8)))
    case BinaryType => bytesListFeature(Seq(v.asInstanceOf[Array[Byte]]))
    case LongType => int64ListFeature(Seq(v.asInstanceOf[Long]))
    case IntegerType => int64ListFeature(Seq(v.asInstanceOf[Int].toLong))
    case ShortType => int64ListFeature(Seq(v.asInstanceOf[Short].toLong))
    case ByteType => int64ListFeature(Seq(v.asInstanceOf[Byte].toLong))
    case BooleanType =>
      int64ListFeature(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L))
    case FloatType => floatListFeature(Seq(v.asInstanceOf[Float]))
    case ArrayType(StringType, _) =>
      bytesListFeature(v.asInstanceOf[scala.collection.Seq[String]].toSeq.map(_.getBytes(Utf8)))
    case ArrayType(BinaryType, _) =>
      bytesListFeature(v.asInstanceOf[scala.collection.Seq[Array[Byte]]].toSeq)
    case ArrayType(LongType, _) =>
      int64ListFeature(v.asInstanceOf[scala.collection.Seq[Long]].toSeq)
    case ArrayType(IntegerType, _) =>
      int64ListFeature(v.asInstanceOf[scala.collection.Seq[Int]].toSeq.map(_.toLong))
    case ArrayType(FloatType, _) =>
      floatListFeature(v.asInstanceOf[scala.collection.Seq[Float]].toSeq)
    case other => throw new IllegalArgumentException(
      s"tfrecord: unsupported column type $other " +
        "(double is refused: float_list is binary32 on the wire — " +
        "cast explicitly if a lossy narrow is intended)")
  }

  /** Serialize one row as a `tf.train.Example` (null fields are
    * omitted, the proto convention for absent features).
    */
  private def exampleBytes(schema: StructType, row: Row): Array[Byte] = {
    val features = new ProtoOut(256)
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        val entry = new ProtoOut()
        entry.lenDelim(1, schema(i).name.getBytes(Utf8)) // map key
        entry.lenDelim(2, featureBytes(schema(i).dataType, row.get(i)))
        features.lenDelim(1, entry.toBytes) // Features.feature entry
      }
      i += 1
    }
    val example = new ProtoOut()
    example.lenDelim(1, features.toBytes) // Example.features = field 1
    example.toBytes
  }

  // -------------------------------------------------------- proto read

  /** Decoded feature: exactly one of the three lists is non-null. */
  private final case class Feat(bytes: Vector[Array[Byte]],
                                floats: Vector[Float],
                                ints: Vector[Long])

  private final class ProtoIn(bytes: Array[Byte], var pos: Int,
                              val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        require(pos < end, "tfrecord: truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    // every length/offset is bounds-checked against `end`: a record
    // whose frame CRC is fine but whose proto is malformed (foreign
    // writer, bit rot past the checksum) must fail with the same
    // labeled error contract as the framing layer, not a raw
    // ArrayIndexOutOfBounds from inside the decoder
    private def declared(n0: Long): Int = {
      require(n0 >= 0 && pos + n0 <= end,
        s"tfrecord: truncated proto field (declares $n0 bytes, " +
          s"${end - pos} remain)")
      n0.toInt
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => pos += declared(8L)
      case 2 => pos += declared(varint())
      case 5 => pos += declared(4L)
      case w =>
        throw new IllegalArgumentException(s"tfrecord: wire type $w")
    }
    def sub(): ProtoIn = {
      val n = declared(varint())
      val s = new ProtoIn(bytes, pos, pos + n)
      pos += n
      s
    }
    def slice(): Array[Byte] = {
      val n = declared(varint())
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "tfrecord: truncated fixed32")
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4
      v
    }
    def hasMore: Boolean = pos < end
  }

  /** Parse a Feature message (accepts both packed and unpacked
    * repeated encodings, as protobuf readers must).
    */
  private def parseFeature(p: ProtoIn): Feat = {
    var bytesV = Vector.empty[Array[Byte]]
    var floatsV = Vector.empty[Float]
    var intsV = Vector.empty[Long]
    while (p.hasMore) {
      val k = p.varint(); val field = (k >> 3).toInt; val wire = (k & 7).toInt
      (field, wire) match {
        case (1, 2) => // BytesList
          val bl = p.sub()
          while (bl.hasMore) {
            val k2 = bl.varint()
            if ((k2 >> 3).toInt == 1 && (k2 & 7).toInt == 2)
              bytesV :+= bl.slice()
            else bl.skip((k2 & 7).toInt)
          }
        case (2, 2) => // FloatList
          val fl = p.sub()
          while (fl.hasMore) {
            val k2 = fl.varint()
            val w2 = (k2 & 7).toInt
            if ((k2 >> 3).toInt == 1 && w2 == 2) {
              val packed = fl.sub()
              while (packed.hasMore)
                floatsV :+= java.lang.Float.intBitsToFloat(packed.fixed32())
            } else if ((k2 >> 3).toInt == 1 && w2 == 5) {
              floatsV :+= java.lang.Float.intBitsToFloat(fl.fixed32())
            } else fl.skip(w2)
          }
        case (3, 2) => // Int64List
          val il = p.sub()
          while (il.hasMore) {
            val k2 = il.varint()
            val w2 = (k2 & 7).toInt
            if ((k2 >> 3).toInt == 1 && w2 == 2) {
              val packed = il.sub()
              while (packed.hasMore) intsV :+= packed.varint()
            } else if ((k2 >> 3).toInt == 1 && w2 == 0) {
              intsV :+= il.varint()
            } else il.skip(w2)
          }
        case (_, w) => p.skip(w)
      }
    }
    Feat(bytesV, floatsV, intsV)
  }

  /** Parse one Example payload into (name → Feat). */
  private def parseExample(data: Array[Byte]): Map[String, Feat] = {
    val root = new ProtoIn(data, 0, data.length)
    var out = Map.empty[String, Feat]
    while (root.hasMore) {
      val k = root.varint()
      if ((k >> 3).toInt == 1 && (k & 7).toInt == 2) { // features
        val features = root.sub()
        while (features.hasMore) {
          val k2 = features.varint()
          if ((k2 >> 3).toInt == 1 && (k2 & 7).toInt == 2) { // entry
            val entry = features.sub()
            var name: String = null
            var feat: Feat = null
            while (entry.hasMore) {
              val k3 = entry.varint()
              ((k3 >> 3).toInt, (k3 & 7).toInt) match {
                case (1, 2) => name = new String(entry.slice(), Utf8)
                case (2, 2) => feat = parseFeature(entry.sub())
                case (_, w) => entry.skip(w)
              }
            }
            if (name != null && feat != null) out += name -> feat
          } else features.skip((k2 & 7).toInt)
        }
      } else root.skip((k & 7).toInt)
    }
    out
  }

  // ------------------------------------------------------------ export

  /** Export as sharded TFRecord: one `part-NNNNN.tfrecord[.gz]` per
    * partition (`gzip` = whole-file gzip, TF's `compression_type =
    * "GZIP"` convention — the framing itself has no compressed
    * variant). Records stream out as the iterator drains.
    */
  def export(df: DataFrame, dir: String, gzip: Boolean = false): Unit = {
    val schema = df.schema
    // fail on unsupported types at plan time, not per executor task
    schema.foreach(f => featureProbe(f.dataType))
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    val hconf = SerializableHadoopConf.from(df.sparkSession)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val path = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d$ext")
        val fs = path.getFileSystem(hconf.value)
        val raw = new java.io.BufferedOutputStream(
          fs.create(path, true), 1 << 16)
        val out: java.io.OutputStream =
          if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
        try it.foreach { row =>
          writeFramed(out, exampleBytes(schema, row))
        } finally out.close()
      }
    }
  }

  private def featureProbe(dt: DataType): Unit = dt match {
    case StringType | BinaryType | LongType | IntegerType | ShortType |
         ByteType | BooleanType | FloatType => ()
    case ArrayType(StringType | BinaryType | LongType | IntegerType |
                   FloatType, _) => ()
    case other => throw new IllegalArgumentException(
      s"tfrecord: unsupported column type $other " +
        "(double is refused: float_list is binary32 on the wire — " +
        "cast explicitly if a lossy narrow is intended)")
  }

  private def writeFramed(out: java.io.OutputStream,
                          data: Array[Byte]): Unit = {
    val lenBytes = new Array[Byte](8)
    var v = data.length.toLong
    var i = 0
    while (i < 8) { lenBytes(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    def le32(x: Int): Unit = {
      out.write(x & 0xff); out.write((x >>> 8) & 0xff)
      out.write((x >>> 16) & 0xff); out.write((x >>> 24) & 0xff)
    }
    out.write(lenBytes)
    le32(maskedCrc(lenBytes, 0, 8))
    out.write(data)
    le32(maskedCrc(data, 0, data.length))
  }

  // -------------------------------------------------------------- read

  /** Iterate framed record payloads, verifying both CRCs. */
  private def frames(in: java.io.InputStream): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var nextRec: Array[Byte] = null
      private def readFully(buf: Array[Byte], allowEof: Boolean): Boolean = {
        var off = 0
        while (off < buf.length) {
          val n = in.read(buf, off, buf.length - off)
          if (n < 0) {
            require(off == 0 && allowEof,
              s"tfrecord: truncated frame (got $off of ${buf.length} bytes)")
            return false
          }
          off += n
        }
        true
      }
      private def le32(b: Array[Byte]): Int =
        (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16) |
          ((b(3) & 0xff) << 24)
      private def advance(): Unit = {
        nextRec = null
        val lenBytes = new Array[Byte](8)
        if (!readFully(lenBytes, allowEof = true)) return
        val crcBuf = new Array[Byte](4)
        readFully(crcBuf, allowEof = false)
        require(le32(crcBuf) == maskedCrc(lenBytes, 0, 8),
          "tfrecord: length crc mismatch (corrupt frame header)")
        var len = 0L
        var i = 7
        while (i >= 0) { len = (len << 8) | (lenBytes(i) & 0xffL); i -= 1 }
        require(len >= 0 && len <= Int.MaxValue.toLong,
          s"tfrecord: unreasonable record length $len")
        val data = new Array[Byte](len.toInt)
        readFully(data, allowEof = false)
        readFully(crcBuf, allowEof = false)
        require(le32(crcBuf) == maskedCrc(data, 0, data.length),
          "tfrecord: data crc mismatch (corrupt record)")
        nextRec = data
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): Array[Byte] = {
        val r = nextRec; advance(); r
      }
    }

  // int64 wire values narrowing to a caller-declared smaller type are
  // RANGE-CHECKED: a foreign file carrying 2^40 read under IntegerType
  // must refuse with the framing layer's labeled error contract, not
  // wrap silently — the read side keeps the same bit-exact-or-refuse
  // stance as the export side (which refuses DoubleType for the same
  // reason)
  private def narrow(v: Long, lo: Long, hi: Long, t: String): Long = {
    require(v >= lo && v <= hi,
      s"tfrecord: int64 value $v out of range for declared $t " +
        s"[$lo, $hi] — widen the schema column to LONG")
    v
  }

  private def toValue(dt: DataType, f: Feat): Any = dt match {
    case StringType => f.bytes.headOption.map(new String(_, Utf8)).orNull
    case BinaryType => f.bytes.headOption.orNull
    case LongType => f.ints.headOption.map(java.lang.Long.valueOf).orNull
    case IntegerType =>
      f.ints.headOption.map(v => java.lang.Integer.valueOf(
        narrow(v, Int.MinValue, Int.MaxValue, "INT").toInt)).orNull
    case ShortType =>
      f.ints.headOption.map(v => java.lang.Short.valueOf(
        narrow(v, Short.MinValue, Short.MaxValue, "SHORT").toShort)).orNull
    case ByteType =>
      f.ints.headOption.map(v => java.lang.Byte.valueOf(
        narrow(v, Byte.MinValue, Byte.MaxValue, "BYTE").toByte)).orNull
    case BooleanType =>
      f.ints.headOption.map(v => java.lang.Boolean.valueOf(v != 0L)).orNull
    case FloatType =>
      f.floats.headOption.map(java.lang.Float.valueOf).orNull
    case ArrayType(StringType, _) => f.bytes.map(new String(_, Utf8))
    case ArrayType(BinaryType, _) => f.bytes
    case ArrayType(LongType, _) => f.ints
    case ArrayType(IntegerType, _) =>
      f.ints.map(v => narrow(v, Int.MinValue, Int.MaxValue, "INT").toInt)
    case ArrayType(FloatType, _) => f.floats
    case other => throw new IllegalArgumentException(
      s"tfrecord: unsupported read type $other")
  }

  /** Read TFRecord shards into rows of `schema` (features are looked
    * up by column name; absent features read as null — the proto
    * convention). Gzip shards are detected by magic per file, so plain
    * and `.gz` shards mix freely under one glob.
    */
  def read(spark: SparkSession, pathGlob: String,
           schema: StructType): DataFrame = {
    schema.foreach(f => featureProbe(f.dataType))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    val fields = schema.fields
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val path = new org.apache.hadoop.fs.Path(r.getString(0))
          val fs = path.getFileSystem(hconf.value)
          val raw = new java.io.BufferedInputStream(fs.open(path), 1 << 16)
          raw.mark(2)
          val m1 = raw.read(); val m2 = raw.read()
          raw.reset()
          val in: java.io.InputStream =
            if (m1 == 0x1f && m2 == 0x8b)
              new java.util.zip.GZIPInputStream(raw)
            else raw
          val recs = frames(in)
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = recs.hasNext
              if (!h) in.close()
              h
            }
            override def next(): Row = {
              val feats = parseExample(recs.next())
              Row.fromSeq(fields.toSeq.map { f =>
                feats.get(f.name).map(toValue(f.dataType, _)).orNull
              })
            }
          }
        }
      }(enc)
  }
}
