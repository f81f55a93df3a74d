package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NumPy `.npy` interchange for embedding matrices — the format vector
  * dumps actually ship in (faiss tooling, research release artifacts,
  * annotation pipelines). A shard pair per Spark partition:
  * `part-N.vec.npy` (C-order little-endian `float32`, shape (rows, dim))
  * and `part-N.ids.npy` (`int64`, shape (rows,)) carrying the row ids in
  * matrix order — the paired-array convention, since `.npy` itself has
  * no key column.
  *
  * Format notes (NumPy format spec v1.0): magic `\x93NUMPY`, version
  * bytes, little-endian u16 header length, then an ASCII python-dict
  * header `{'descr': '<f4', 'fortran_order': False, 'shape': (N, D), }`
  * padded with spaces so the data section starts 64-byte aligned.
  * float32 bits round-trip EXACTLY (no text formatting anywhere), which
  * is what makes the export → import path hash-verifiable.
  *
  * Scale shape: export streams each partition once (the shard buffers
  * in memory only long enough to learn its row count for the header —
  * shard size is the caller's partitioning decision); read is
  * file-per-task with streamed rows, same as [[Warc.read]] — no driver
  * parsing, no shuffle.
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N', 'U', 'M', 'P', 'Y')

  private def header(descr: String, shape: String): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
    // total = magic(6) + ver(2) + len(2) + dict + pad + '\n', 64-aligned
    val base = 10 + dict.length + 1
    val pad = (64 - base % 64) % 64
    val full = dict + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(1); out.write(0) // version 1.0
    out.write(full.length & 0xff); out.write((full.length >> 8) & 0xff)
    out.write(full.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.toByteArray
  }

  /** Export `(idCol: bigint, vecCol: array<float|double>)` as paired
    * `.vec.npy`/`.ids.npy` shards, one pair per non-empty partition
    * (repartition first to choose shard count/size; a shard buffers in
    * memory, so keep partitions executor-sized). Vectors narrow to
    * float32 — the interchange precision — and every row must share one
    * dimensionality.
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
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val vecPath = new org.apache.hadoop.fs.Path(
            f"$dir/part-$pid%05d.vec.npy")
          val fs = vecPath.getFileSystem(hconf.value)
          val vout = fs.create(vecPath, true)
          try {
            vout.write(header("<f4", s"(${rows.length}, $d)"))
            val buf = java.nio.ByteBuffer.allocate(d * 4)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            rows.foreach { case (_, v) =>
              buf.clear(); v.foreach(buf.putFloat)
              vout.write(buf.array(), 0, d * 4)
            }
          } finally vout.close()
          val idPath = new org.apache.hadoop.fs.Path(
            f"$dir/part-$pid%05d.ids.npy")
          val iout = fs.create(idPath, true)
          try {
            iout.write(header("<i8", s"(${rows.length},)"))
            val buf = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            rows.foreach { case (i, _) =>
              buf.clear(); buf.putLong(i)
              iout.write(buf.array(), 0, 8)
            }
          } finally iout.close()
        }
      }
  }

  private[sources] case class Header(descr: String, rows: Long, cols: Int)

  private[sources] def parseHeader(in: java.io.DataInputStream): Header = {
    val magic = new Array[Byte](6)
    in.readFully(magic)
    require(magic.sameElements(Magic), "not a .npy file (bad magic)")
    val major = in.read(); val minor = in.read()
    require(major == 1 && minor == 0, s"unsupported .npy version $major.$minor")
    val l0 = in.read(); val l1 = in.read()
    val hlen = l0 | (l1 << 8)
    val hb = new Array[Byte](hlen)
    in.readFully(hb)
    val h = new String(hb, java.nio.charset.StandardCharsets.US_ASCII)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(sys.error(s"no descr in .npy header: $h"))
    require("'fortran_order':\\s*False".r.findFirstIn(h).isDefined,
      "fortran-order .npy not supported (transpose on the python side)")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(h)
      .map(_.group(1)).getOrElse(sys.error(s"no shape in .npy header: $h"))
    val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong)
    require(dims.length == 1 || dims.length == 2,
      s"expected 1-D or 2-D .npy, got shape ($shape)")
    Header(descr, dims(0), if (dims.length == 2) dims(1).toInt else 1)
  }

  /** Read paired shards back: `(id: bigint, vec: array<float>)`. Pairing
    * is positional within each shard (row i of `.vec.npy` belongs to
    * element i of `.ids.npy`), file-per-task, rows streamed.
    */
  def readPaired(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    spark.read.format("binaryFile").load(s"$dir/*.vec.npy")
      .select(col("path"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val vecPathStr = r.getString(0)
          val vecPath = new org.apache.hadoop.fs.Path(vecPathStr)
          val fs = vecPath.getFileSystem(hconf.value)
          val idPath = new org.apache.hadoop.fs.Path(
            vecPathStr.replaceAll("\\.vec\\.npy$", ".ids.npy"))
          // ids are rows × 8 bytes — read the sidecar fully, stream vecs
          val iin = new java.io.DataInputStream(
            new java.io.BufferedInputStream(fs.open(idPath), 1 << 16))
          val ih = parseHeader(iin)
          require(ih.descr == "<i8" && ih.cols == 1,
            s"ids sidecar must be 1-D <i8, got ${ih.descr}")
          val ids = new Array[Long](ih.rows.toInt)
          val ibuf = new Array[Byte](8)
          var k = 0
          while (k < ids.length) {
            iin.readFully(ibuf)
            ids(k) = java.nio.ByteBuffer.wrap(ibuf)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
            k += 1
          }
          iin.close()
          val vin = new java.io.DataInputStream(
            new java.io.BufferedInputStream(fs.open(vecPath), 1 << 16))
          val vh = parseHeader(vin)
          require(vh.descr == "<f4",
            s"expected <f4 vectors, got ${vh.descr} (convert on export)")
          require(vh.rows == ids.length,
            s"shard mismatch: ${vh.rows} vectors vs ${ids.length} ids")
          val rowBytes = new Array[Byte](vh.cols * 4)
          var i = 0
          new Iterator[Row] {
            override def hasNext: Boolean = {
              val h = i < vh.rows
              if (!h) vin.close()
              h
            }
            override def next(): Row = {
              vin.readFully(rowBytes)
              val bb = java.nio.ByteBuffer.wrap(rowBytes)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              val v = new Array[Float](vh.cols)
              var j = 0
              while (j < vh.cols) { v(j) = bb.getFloat; j += 1 }
              val out = Row(ids(i), v.toSeq)
              i += 1
              out
            }
          }
        }
      }(enc)
  }
}
