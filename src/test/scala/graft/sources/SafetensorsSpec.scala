package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SafetensorsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 40L).map { i =>
    (i + 500L, Array.tabulate(6)(j => i * 0.25f - j * 1.5f))
  }.toDF("vec_id", "embedding")

  test("export → read round-trips ids and float32 bits exactly") {
    val dir = tmpDir("st_rt")
    Safetensors.export(vecs.repartition(3, col("vec_id")),
      "vec_id", "embedding", dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".safetensors")) == 3)
    val back = Safetensors.read(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val want = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(back == want)
  }

  test("the byte layout is the published format: u64 LE header length, " +
       "flat JSON header, offsets relative to the buffer") {
    val dir = tmpDir("st_fmt")
    Safetensors.export(vecs.coalesce(1), "vec_id", "embedding", dir)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".safetensors")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val hlen = java.nio.ByteBuffer.wrap(bytes, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val header = new String(bytes, 8, hlen, "UTF-8")
    assert(header.startsWith("{") && header.contains("\"dtype\":\"F32\"") &&
      header.contains("\"shape\":[40,6]") &&
      header.contains("\"__metadata__\""), header)
    // total size = 8 + header + vectors + ids
    assert(bytes.length == 8 + hlen + 40 * 6 * 4 + 40 * 8)
    // first float of the buffer is row 0, component 0 (C-order, LE)
    val first = java.nio.ByteBuffer.wrap(bytes, 8 + hlen, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getFloat
    assert(first == 0.0f * 0.25f - 0 * 1.5f)
  }

  test("non-finite floats round-trip bit-exactly") {
    val special = Seq(
      (1L, Array(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, -0.0f)),
      (2L, Array(java.lang.Float.intBitsToFloat(0x7fc00001),
        Float.MinPositiveValue, Float.MaxValue, 1.5f)))
      .toDF("vec_id", "embedding")
    val dir = tmpDir("st_nan")
    Safetensors.export(special.coalesce(1), "vec_id", "embedding", dir)
    val back = Safetensors.read(spark, dir)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits)).toMap
    val want = special.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits)).toMap
    assert(back == want)
  }

  test("malformed or foreign files refuse loudly") {
    val dir = tmpDir("st_bad")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // a text file: its first 8 bytes decode to an absurd header length
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "junk.safetensors"),
      "definitely not a safetensors file".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      Safetensors.read(spark, dir).collect()
    }
    assert(e.getMessage.contains("implausible") ||
      Option(e.getCause).exists(_.getMessage.contains("implausible")))
  }
}
