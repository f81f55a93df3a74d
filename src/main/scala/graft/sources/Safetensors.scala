package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `safetensors` interchange for embedding matrices — the tensor format
  * modern model/data tooling standardizes on (a length-prefixed JSON
  * header naming each tensor's dtype/shape/byte-range, then one
  * contiguous little-endian buffer; nothing executable, O(1) header
  * reads). One shard per Spark partition, each holding two tensors:
  * `vectors` (F32, shape [rows, dim]) and `ids` (I64, shape [rows]) in
  * matrix order — the same paired-array convention as [[Npy]].
  *
  * Format facts (public spec, huggingface/safetensors README): 8-byte
  * little-endian u64 header length; UTF-8 JSON header mapping tensor
  * names to `{"dtype","shape","data_offsets":[begin,end]}` with offsets
  * relative to the byte buffer that starts right after the header;
  * dtypes spelled `"F32"`/`"I64"`; an optional `"__metadata__"` object
  * of string pairs. float32/int64 bits round-trip exactly.
  *
  * Scale shape: identical to [[Npy]] — export buffers one partition to
  * learn its row count, read is file-per-task with streamed vector rows.
  */
object Safetensors {

  /** Export `(idCol: bigint, vecCol: array<float|double>)` as
    * `part-N.safetensors` shards (one per non-empty partition).
    */
  def export(df: DataFrame, idCol: String, vecCol: String,
             dir: String): Unit = {
    val hconf = SerializableHadoopConf.from(df.sparkSession)
    df.select(col(idCol).cast("long").as("i"),
        transform(col(vecCol), x => x.cast("float")).as("v"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val rows = it.map(r =>
            (r.getLong(0), r.getSeq[Float](1).toArray)).toArray
          val d = rows.head._2.length
          require(rows.forall(_._2.length == d),
            s"ragged vectors in one shard: expected dim $d")
          val n = rows.length
          val vecBytes = n.toLong * d * 4
          val idBytes = n.toLong * 8
          val json =
            s"""{"vectors":{"dtype":"F32","shape":[$n,$d],""" +
              s""""data_offsets":[0,$vecBytes]},""" +
              s""""ids":{"dtype":"I64","shape":[$n],""" +
              s""""data_offsets":[$vecBytes,${vecBytes + idBytes}]},""" +
              s""""__metadata__":{"writer":"graft"}}"""
          val jb = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(
            f"$dir/part-$pid%05d.safetensors")
          val fs = path.getFileSystem(hconf.value)
          val out = fs.create(path, true)
          try {
            val len = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              .putLong(jb.length.toLong).array()
            out.write(len)
            out.write(jb)
            val buf = java.nio.ByteBuffer.allocate(d * 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            rows.foreach { case (_, v) =>
              buf.clear(); v.foreach(buf.putFloat)
              out.write(buf.array(), 0, d * 4)
            }
            val ibuf = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            rows.foreach { case (i, _) =>
              ibuf.clear(); ibuf.putLong(i)
              out.write(ibuf.array(), 0, 8)
            }
          } finally out.close()
        }
      }
  }

  /** Minimal JSON slice: the value object of `"name": { ... }` at the
    * header's top level (the header grammar is flat — tensor objects
    * never nest further).
    */
  private def tensorObj(header: String, name: String): String = {
    val key = "\"" + name + "\""
    val at = header.indexOf(key)
    require(at >= 0, s"tensor '$name' not in safetensors header")
    val open = header.indexOf('{', at)
    val close = header.indexOf('}', open)
    header.substring(open, close + 1)
  }

  private def longs(obj: String, field: String): Array[Long] = {
    val m = ("\"" + field + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(obj)
      .getOrElse(sys.error(s"no $field in tensor header: $obj"))
    m.group(1).split(",").map(_.trim.toLong)
  }

  private def dtype(obj: String): String =
    "\"dtype\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(obj)
      .map(_.group(1)).getOrElse(sys.error(s"no dtype in: $obj"))

  /** Read shards back: `(id: bigint, vec: array<float>)`, pairing row i
    * of `vectors` with element i of `ids`. File-per-task; vectors
    * streamed row by row.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    spark.read.format("binaryFile").load(s"$dir/*.safetensors")
      .select(col("path"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val path = new org.apache.hadoop.fs.Path(r.getString(0))
          val fs = path.getFileSystem(hconf.value)
          val in = new java.io.DataInputStream(
            new java.io.BufferedInputStream(fs.open(path), 1 << 16))
          val lenBytes = new Array[Byte](8)
          in.readFully(lenBytes)
          val hlen = java.nio.ByteBuffer.wrap(lenBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          require(hlen > 0 && hlen < (1L << 26),
            s"implausible safetensors header length $hlen — not a " +
              "safetensors file?")
          val hb = new Array[Byte](hlen.toInt)
          in.readFully(hb)
          val header = new String(hb,
            java.nio.charset.StandardCharsets.UTF_8)
          val vObj = tensorObj(header, "vectors")
          val iObj = tensorObj(header, "ids")
          require(dtype(vObj) == "F32" && dtype(iObj) == "I64",
            s"expected F32 vectors + I64 ids, got ${dtype(vObj)}/${dtype(iObj)}")
          val vShape = longs(vObj, "shape")
          val vOff = longs(vObj, "data_offsets")
          val iOff = longs(iObj, "data_offsets")
          require(vShape.length == 2, "vectors tensor must be 2-D")
          val n = vShape(0).toInt
          val d = vShape(1).toInt
          require(longs(iObj, "shape").head == n,
            "ids tensor must pair 1:1 with vector rows")
          // this writer lays vectors first; tolerate any order by
          // seek-reading ids from their recorded offset
          val dataStart = 8L + hlen
          val idsIn = fs.open(path)
          idsIn.seek(dataStart + iOff(0))
          val ids = new Array[Long](n)
          val ibuf = new Array[Byte](8)
          var k = 0
          while (k < n) {
            idsIn.readFully(ibuf)
            ids(k) = java.nio.ByteBuffer.wrap(ibuf)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
            k += 1
          }
          idsIn.close()
          // consume the full gap to the vectors tensor (a foreign file
          // may lay tensors in any order). skip() may short-skip through
          // the BufferedInputStream, and the offset is a long — loop
          // until fully consumed and fail loudly on premature EOF.
          var toSkip = vOff(0)
          while (toSkip > 0) {
            val skipped = in.skip(toSkip)
            if (skipped > 0) toSkip -= skipped
            else if (in.read() < 0)
              sys.error(s"safetensors $path truncated: vectors tensor " +
                s"offset ${vOff(0)} lies past EOF")
            else toSkip -= 1
          }
          val rowBytes = new Array[Byte](d * 4)
          var i = 0
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = i < n
              if (!h) in.close()
              h
            }
            override def next(): Row = {
              in.readFully(rowBytes)
              val bb = java.nio.ByteBuffer.wrap(rowBytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val v = new Array[Float](d)
              var j = 0
              while (j < d) { v(j) = bb.getFloat; j += 1 }
              val out = Row(ids(i), v.toSeq)
              i += 1
              out
            }
          }
        }
      }(enc)
  }
}
