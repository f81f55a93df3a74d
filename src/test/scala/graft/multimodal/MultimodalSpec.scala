package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20),
    "doc_id", "text")

  test("synthetic media matches the canonical schema") {
    val m = media
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "modality", "content", "meta"))
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.count() == 20)
  }

  test("synthetic payloads are real PNGs; decode round-trips the pixel rule") {
    val rows = Multimodal.decodeImages(media, "content")
      .select("media_id", "content", "meta.width", "meta.height",
        "decoded.width", "decoded.height", "decoded.channels",
        "decoded.mean_r", "decoded.mean_g", "decoded.mean_b")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      val png = r.getAs[Array[Byte]](1)
      // PNG magic: a genuine codec artifact, not echoed text bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      // DECODED dims equal the metadata dims (decode is the authority)
      assert(r.getInt(4) == r.getInt(2) && r.getInt(5) == r.getInt(3))
      assert(r.getInt(6) == 3)
      // planted constants come back exactly from decoded pixels
      assert(r.getDouble(9) == (id % 256).toDouble,
        s"mean_b of $id: got ${r.getDouble(9)}")
      val w = r.getInt(4)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 255)
      assert(w >= 8 && w <= 16 && r.getInt(5) >= 8 && r.getInt(5) <= 12)
    }
  }

  test("undecodable payloads yield null decoded, not a crash") {
    val junk = Seq((1L, "not an image at all".getBytes),
        (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = Multimodal.decodeImages(junk, "content")
      .select("media_id", "decoded").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("batched feature extraction: shape, determinism, null safety") {
    val withNull = media.union(media.limit(1)
      .withColumn("content", lit(null).cast("binary")))
    val f1 = Multimodal.withDecodedFeatures(withNull, "content", dim = 8, batchSize = 4)
    assert(f1.schema("features").dataType.simpleString == "array<float>")
    val rows = f1.select("media_id", "features").collect()
    assert(rows.forall(_.getSeq[Float](1).length == 8))
    // determinism: same bytes → same features across runs
    val f2 = Multimodal.withDecodedFeatures(withNull, "content", dim = 8, batchSize = 7)
      .select("media_id", "features").collect()
    assert(rows.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      == f2.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap)
  }

  test("decoded features feed similarity search end-to-end") {
    val feat = Multimodal.withDecodedFeatures(media, "content", dim = 8)
      .select(col("media_id"), col("features"))
    val out = graft.ml.Similarity.bruteForceTopK(
      feat, "media_id", "features",
      feat.limit(2), "media_id", "features", k = 3)
    assert(out.count() == 6) // 2 queries × k
  }

  test("frame sampling splits payload into indexed frames") {
    val one = Seq((1L, "abcdefghij".getBytes)).toDF("media_id", "content")
    val frames = Multimodal.sampleFrames(one, "content", frameSize = 4)
      .select("frame_idx", "frame").collect()
      .map(r => r.getInt(0) -> new String(r.getAs[Array[Byte]](1)))
    assert(frames.toSeq == Seq(0 -> "abcd", 1 -> "efgh", 2 -> "ij"))
    val every2 = Multimodal.sampleFrames(one, "content", frameSize = 4, every = 2)
      .select("frame_idx", "frame").collect()
      .map(r => r.getInt(0) -> new String(r.getAs[Array[Byte]](1)))
    assert(every2.toSeq == Seq(0 -> "abcd", 1 -> "ij"))
  }

  test("resize pads or truncates to target") {
    val d = Seq((1L, "abcdef".getBytes), (2L, "ab".getBytes))
      .toDF("media_id", "content")
    val out = d.withColumn("resized",
        Multimodal.resizePayload(d, "content", targetBytes = 4))
      .select("media_id", "resized").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L).length == 4 && new String(out(1L)) == "abcd")
    assert(out(2L).length == 4 && out(2L)(0) == 'a' && out(2L)(3) == 0)
  }

  // ---- audio ----------------------------------------------------------

  private def audio = Multimodal.syntheticAudio(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20),
    "doc_id", "text")

  test("synthetic payloads are real WAVs; decode round-trips the sample rule") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val rows = Multimodal.decodeAudio(audio, "content")
      .select("media_id", "content", "decoded_audio.channels",
        "decoded_audio.sample_rate", "decoded_audio.n_samples",
        "decoded_audio.duration_ms", "decoded_audio.mean_sample",
        "decoded_audio.peak")
      .collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val id = r.getLong(0)
      val wav = r.getAs[Array[Byte]](1)
      assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
      val nc = docs(id).codePointCount(0, docs(id).length)
      val rate = (8000 + (id % 4) * 4000).toInt
      val n = 64 + nc % 65
      assert(r.getInt(2) == 1 && r.getInt(3) == rate && r.getInt(4) == n)
      assert(r.getLong(5) == n * 1000L / rate)
      val samples = (0 until n).map(i => ((id * 31 + i * 7 + nc) % 65536) - 32768)
      assert(r.getDouble(6) == samples.sum.toDouble / n,
        s"mean_sample of $id")
      assert(r.getInt(7) == samples.map(math.abs).max.toInt, s"peak of $id")
    }
  }

  test("audio decode chunk-walks: extra chunks before data are skipped; " +
       "junk yields null") {
    // hand-build a WAV with a LIST chunk between fmt and data
    val samples = Array[Short](100, -200, 300)
    val bb = java.nio.ByteBuffer.allocate(44 + 10 + samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 10 + samples.length * 2)
      .put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("LIST".getBytes).putInt(2).put("ok".getBytes)
      .put("data".getBytes).putInt(samples.length * 2)
    samples.foreach(bb.putShort)
    val good = bb.array()
    val rows = Multimodal.decodeAudio(
      Seq((1L, good), (2L, "junk".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "content"), "content")
      .select("media_id", "decoded_audio").collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    assert(rows(2L).isEmpty && rows(3L).isEmpty)
    val d = rows(1L).get
    assert(d.getInt(3) == 3 && d.getInt(6) == 300, // n_samples, peak
      s"got $d")
    assert(d.getDouble(5) == (100 - 200 + 300) / 3.0)
  }
}
