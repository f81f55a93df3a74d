package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NpySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = (0L until 50L).map { i =>
    (i, Array.tabulate(8)(j => (i * 10 + j).toFloat / 7.0f -
      (if (j % 2 == 0) 3.5f else 0f)))
  }.toDF("vec_id", "embedding")

  test("export → readPaired round-trips ids and float32 bits exactly") {
    val dir = tmpDir("npy_rt")
    Npy.export(vecs.repartition(3, col("vec_id")), "vec_id", "embedding", dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.endsWith(".vec.npy")) == 3 &&
      files.count(_.endsWith(".ids.npy")) == 3, files.toSeq.toString)
    val back = Npy.readPaired(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    val want = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toMap
    assert(back == want, "bit-exact float32 round trip with correct pairing")
  }

  test("non-finite floats round-trip bit-exactly (NaN payloads, ±Inf, -0.0)") {
    val special = Seq(
      (1L, Array(Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, -0.0f)),
      (2L, Array(java.lang.Float.intBitsToFloat(0x7fc00001), // payload NaN
        Float.MinPositiveValue, Float.MaxValue, 1.5f)))
      .toDF("vec_id", "embedding")
    val dir = tmpDir("npy_nan")
    Npy.export(special.coalesce(1), "vec_id", "embedding", dir)
    val back = Npy.readPaired(spark, dir)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits)).toMap
    val want = special.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(java.lang.Float.floatToRawIntBits)).toMap
    assert(back == want, "raw float32 bit patterns must survive the container")
  }

  test("the header is NumPy spec v1.0: magic, version, 64-byte alignment") {
    val dir = tmpDir("npy_hdr")
    Npy.export(vecs.coalesce(1), "vec_id", "embedding", dir)
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".vec.npy")).get
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes(0) == 0x93.toByte &&
      new String(bytes.slice(1, 6), "ASCII") == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0, "version 1.0")
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + hlen) % 64 == 0, s"data must start 64-aligned, got ${10 + hlen}")
    val h = new String(bytes.slice(10, 10 + hlen), "ASCII")
    assert(h.contains("'descr': '<f4'") && h.contains("(50, 8)"), h)
    assert(h.endsWith("\n"))
    // total size = header + rows·dim·4
    assert(bytes.length == 10 + hlen + 50 * 8 * 4)
  }

  test("reads files written by REAL NumPy (np.save) — vendored fixtures") {
    // src/test/resources/npy_cross is written by np.save (see
    // tools/gen_npy_fixtures.py: seed-42 float32 (20,8) + int64 ids)
    // and COMMITTED, so the real-NumPy interop runs on every box with
    // no Python toolchain required
    val dir = new java.io.File("src/test/resources/npy_cross")
    assert(dir.exists, s"vendored fixtures missing at $dir — " +
      "regenerate with tools/gen_npy_fixtures.py")
    val back = Npy.readPaired(spark, dir.getAbsolutePath)
    assert(back.count() == 20)
    val ids = back.select("id").as[Long].collect().sorted
    assert(ids.head == 100L && ids.last == 119L)
    val total = back.select(
        org.apache.spark.sql.functions.sum(aggregate(
          transform(col("vec"), x => x.cast("double")),
          lit(0.0), (a, x) => a + x)).as("s"))
      .head().getDouble(0)
    // the reference sum came from numpy's float32 accumulation; ours
    // folds in double — agreement to float32 epsilon proves the BITS
    // round-tripped (a mis-parse would be off by whole values)
    assert(math.abs(total - -10.816282272338867) < 1e-5,
      s"numpy-written payload sum mismatch: $total")
  }

  test("malformed inputs refuse loudly") {
    val dir = tmpDir("npy_bad")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    // bad magic
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.vec.npy"),
      "not a npy file at all".getBytes("ASCII"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.ids.npy"),
      "nor this".getBytes("ASCII"))
    val e = intercept[org.apache.spark.SparkException] {
      Npy.readPaired(spark, dir).collect()
    }
    assert(e.getMessage.contains("bad magic") ||
      Option(e.getCause).exists(_.getMessage.contains("bad magic")))
    // ragged vectors refuse at export
    val ragged = Seq((1L, Array(1.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding").coalesce(1)
    val e2 = intercept[org.apache.spark.SparkException] {
      Npy.export(ragged, "vec_id", "embedding", tmpDir("npy_rag"))
    }
    assert(e2.getMessage.contains("ragged") ||
      Option(e2.getCause).exists(_.getMessage.contains("ragged")))
  }
}
