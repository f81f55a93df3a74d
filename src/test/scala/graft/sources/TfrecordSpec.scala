package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class TfrecordSpec extends SparkSpec {
  import spark.implicits._

  private val fullSchema = new StructType()
    .add("id", LongType).add("txt", StringType).add("raw", BinaryType)
    .add("flag", BooleanType).add("f", FloatType)
    .add("ids", ArrayType(LongType)).add("vec", ArrayType(FloatType))
    .add("tags", ArrayType(StringType))

  private def sample() = df(fullSchema, Seq(
    Row(1L, "hello", Array[Byte](1, 2, 0, -1), true, 1.5f,
      Seq(1L, 2L, 3L), Seq(0.25f, -0.5f), Seq("a", "b")),
    Row(2L, "wörld ✓", Array.empty[Byte], false, Float.NaN,
      Seq.empty[Long], Seq(Float.MinPositiveValue), Seq.empty[String]),
    Row(3L, null, null, null, null, null, null, null)))

  test("every supported type round-trips bit-exact; nulls come back null") {
    val dir = tmpDir("tfr_rt")
    Tfrecord.export(sample().repartition(2), dir)
    val back = Tfrecord.read(spark, dir + "/part-*", fullSchema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    val r1 = back(0)
    assert(r1.getString(1) == "hello")
    assert(r1.getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 0, -1))
    assert(r1.getBoolean(3))
    assert(r1.getFloat(4) == 1.5f)
    assert(r1.getSeq[Long](5) == Seq(1L, 2L, 3L))
    assert(r1.getSeq[Float](6) == Seq(0.25f, -0.5f))
    assert(r1.getSeq[String](7) == Seq("a", "b"))
    val r2 = back(1)
    assert(r2.getString(1) == "wörld ✓", "UTF-8 bytes_list")
    assert(java.lang.Float.isNaN(r2.getFloat(4)), "NaN floats survive")
    assert(r2.getSeq[Float](6) == Seq(Float.MinPositiveValue),
      "subnormals survive binary32 exactly")
    assert(r2.getSeq[Long](5).isEmpty)
    val r3 = back(2)
    (1 until 8).foreach(i => assert(r3.isNullAt(i),
      s"null field $i must come back null (absent feature)"))
  }

  test("plain and gzip shards mix under one glob") {
    val dir = tmpDir("tfr_gz")
    val d = (0L until 40L).map(i => (i, s"doc-$i")).toDF("id", "txt")
    Tfrecord.export(d.filter($"id" % 2 === 0).repartition(2), dir)
    Tfrecord.export(d.filter($"id" % 2 === 1).repartition(2), dir,
      gzip = true)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.exists(_.endsWith(".tfrecord")))
    assert(names.exists(_.endsWith(".tfrecord.gz")))
    val schema = new StructType().add("id", LongType).add("txt", StringType)
    val back = Tfrecord.read(spark, dir + "/part-*", schema)
    assert(back.count() == 40)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 40L).sum)
  }

  test("schema superset reads absent features as null") {
    val dir = tmpDir("tfr_abs")
    Tfrecord.export(Seq((7L, "x")).toDF("id", "txt"), dir)
    val wider = new StructType().add("id", LongType)
      .add("txt", StringType).add("bonus", LongType)
    val r = Tfrecord.read(spark, dir + "/part-*", wider).head
    assert(r.getLong(0) == 7L && r.isNullAt(2))
  }

  test("corrupt payload byte fails the data crc loudly") {
    val dir = tmpDir("tfr_bad")
    Tfrecord.export(Seq((1L, "payload-to-corrupt")).toDF("id", "txt"), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(12 + 4) = (bytes(12 + 4) ^ 0x40).toByte // inside the payload
    java.nio.file.Files.write(f.toPath, bytes)
    // drop Hadoop's local-FS .crc sidecar so OUR frame crc (the one
    // that exists on object stores, where there is no sidecar) is the
    // layer under test
    val sidecar = new java.io.File(f.getParentFile, "." + f.getName + ".crc")
    if (sidecar.exists()) assert(sidecar.delete())
    val schema = new StructType().add("id", LongType).add("txt", StringType)
    val e = intercept[org.apache.spark.SparkException] {
      Tfrecord.read(spark, dir + "/part-*", schema).collect()
    }
    assert(e.getMessage.contains("crc mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("crc mismatch")))
  }

  test("double columns are refused at export and at read") {
    val d = Seq((1L, 0.5)).toDF("id", "bad")
    val e1 = intercept[IllegalArgumentException] {
      Tfrecord.export(d, tmpDir("tfr_dbl"))
    }
    assert(e1.getMessage.contains("double is refused"))
    val e2 = intercept[IllegalArgumentException] {
      Tfrecord.read(spark, "/nonexistent/*",
        new StructType().add("bad", DoubleType))
    }
    assert(e2.getMessage.contains("double is refused"))
  }

  test("int64 wire values out of a declared narrow type's range refuse " +
       "loudly instead of wrapping") {
    // write with LONG (the wire type), read back under INT: in-range
    // values narrow fine, a 2^40 value must fail with the labeled
    // error — not wrap to garbage
    val dir = tmpDir("tfr_narrow")
    Tfrecord.export(
      df(new StructType().add("id", LongType).add("v", LongType),
        Seq(Row(1L, 42L), Row(2L, 1L << 40))).coalesce(1), dir)
    val narrow = new StructType().add("id", LongType).add("v", IntegerType)
    val e = intercept[org.apache.spark.SparkException] {
      Tfrecord.read(spark, s"$dir/*.tfrecord", narrow).collect()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("out of range for declared INT"), msg)
    // the in-range sibling narrows cleanly under the same schema
    val okDir = tmpDir("tfr_narrow_ok")
    Tfrecord.export(df(new StructType().add("id", LongType)
        .add("v", LongType), Seq(Row(1L, 42L))).coalesce(1), okDir)
    val back = Tfrecord.read(spark, s"$okDir/*.tfrecord", narrow)
      .select("v").collect().map(_.getInt(0)).toSeq
    assert(back == Seq(42))
  }

  test("frame layout matches the published TFRecord spec byte-for-byte") {
    // independent re-derivation: CRC32C known-answer vector, the
    // published mask formula, and a hand-assembled Example proto for
    // {"a": int64 5} — nothing here calls the writer's helpers
    val kat = new java.util.zip.CRC32C()
    kat.update("123456789".getBytes("US-ASCII"))
    assert(kat.getValue == 0xe3069283L, "CRC32C Castagnoli check vector")

    val dir = tmpDir("tfr_wire")
    Tfrecord.export(Seq(Tuple1(5L)).toDF("a").coalesce(1), dir)
    val bytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".tfrecord")).head.toPath)
    // hand-built Example: Features{ entry{ key:"a" Feature{Int64List
    // {packed [5]}} } } — proto wire bytes from the public spec
    val int64List = Array[Byte](0x0a, 0x01, 0x05) // field1 len1 varint 5
    val feature = Array[Byte](0x1a, int64List.length.toByte) ++ int64List
    val entry = Array[Byte](0x0a, 0x01, 'a'.toByte,
      0x12, feature.length.toByte) ++ feature
    val features = Array[Byte](0x0a, entry.length.toByte) ++ entry
    val example = Array[Byte](0x0a, features.length.toByte) ++ features

    def le32(x: Long): Array[Byte] = Array(
      (x & 0xff).toByte, ((x >> 8) & 0xff).toByte,
      ((x >> 16) & 0xff).toByte, ((x >> 24) & 0xff).toByte)
    def maskedCrc(b: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32C(); c.update(b)
      val crc = c.getValue
      (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xffffffffL
    }
    val lenBytes = Array.tabulate[Byte](8)(i =>
      ((example.length.toLong >> (8 * i)) & 0xff).toByte)
    val expected = lenBytes ++ le32(maskedCrc(lenBytes)) ++
      example ++ le32(maskedCrc(example))
    assert(bytes.toSeq == expected.toSeq,
      "framed record differs from the spec-derived bytes")
  }
}
