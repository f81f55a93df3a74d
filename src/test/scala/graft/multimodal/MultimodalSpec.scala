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

  test("synthetic payloads are real AVIs; decode round-trips the frame rule") {
    val d = Seq((5L, "hello world"), (8L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeVideo(
      Multimodal.syntheticVideo(d, "doc_id", "text"), "content", every = 2)
      .select("media_id", "decoded_video").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    // id=5, "hello world": nc=11 → w=8+11%9=10, h=8+5%5=8, frames=3+5%4=4
    val v5 = out(5L)
    assert(v5.getInt(0) == 10 && v5.getInt(1) == 8, "decoded dims")
    assert(v5.getInt(2) == 4, "n_frames from movi walk")
    assert(v5.getInt(3) == 40000, "us_per_frame from avih")
    assert(v5.getInt(4) == 2, "every=2 over 4 frames samples f=0,2")
    // green constant = 'h' % 256 = 104; blue = avg((5+0)%256,(5+2)%256) = 6
    assert(v5.getDouble(6) == 104.0, "mean_g")
    assert(v5.getDouble(7) == 6.0, "mean_b")
    // red rows: f=0 → base 11, f=2 → base 13; mean over x<10 of base+x
    assert(math.abs(v5.getDouble(5) - (11 + 13 + 2 * 4.5) / 2) < 1e-9, "mean_r")
    // id=8, empty text: nc=0 → w=8, h=8+3=11, frames=3+0=3, g=0
    val v8 = out(8L)
    assert(v8.getInt(0) == 8 && v8.getInt(1) == 11 && v8.getInt(2) == 3)
    assert(v8.getInt(4) == 2 && v8.getDouble(6) == 0.0)
  }

  test("video decode: every=1 decodes all frames; junk and null yield null") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    val all = Multimodal.decodeVideo(
      Multimodal.syntheticVideo(d, "doc_id", "text"), "content", every = 1)
      .select("decoded_video").head().getStruct(0)
    assert(all.getInt(2) == all.getInt(4), "every=1 samples every frame")
    val bad = Multimodal.decodeVideo(
      Seq((2L, "junk".getBytes), (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("media_id", "content"), "content")
      .select("media_id", "decoded_video").collect()
    assert(bad.forall(_.isNullAt(1)))
    // a RIFF that is not AVI (the WAV from the audio test) is refused too
    val (wav, _, _) = Multimodal.wavFor(1L, "x")
    val notAvi = Multimodal.decodeVideo(
      Seq((4L, wav)).toDF("media_id", "content"), "content")
      .select("decoded_video").head()
    assert(notAvi.isNullAt(0))
  }

  test("real image resize: decoded dims change, constant color survives, " +
       "junk yields null") {
    val media = Multimodal.syntheticMedia(
      Seq((3L, "some text here")).toDF("doc_id", "text"), "doc_id", "text")
    val resized = Multimodal.resizeImages(media, "content", 4, 3)
    val r = Multimodal.decodeImages(resized, "resized")
      .select("resized_width", "resized_height", "decoded").head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 3)
    val d = r.getStruct(2)
    assert(d.getInt(0) == 4 && d.getInt(1) == 3, "re-decoded dims")
    // green/blue are constant planes in the synthetic rule — bilinear
    // resampling of a constant is the same constant
    assert(d.getDouble(4) == ("some text here".codePointAt(0) % 256).toDouble)
    assert(d.getDouble(5) == 3.0)
    val bad = Multimodal.resizeImages(
      Seq((9L, "nope".getBytes)).toDF("media_id", "content"), "content", 4, 4)
      .select("resized").head()
    assert(bad.isNullAt(0))
  }

  test("audio resampling: real WAV out at the target rate, span-exact " +
       "length, peak-bounded, corrupt-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("doc_id", "text")
    val audio = Multimodal.syntheticAudio(docs, "doc_id", "text")
    val orig = Multimodal.decodeAudio(audio, "content")
      .select(col("media_id"), col("decoded_audio").as("d"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val res = Multimodal.decodeAudio(
      Multimodal.resampleAudio(audio, "content", targetRate = 16000)
        .select(col("media_id"), col("resampled_audio").as("content")),
      "content")
      .select(col("media_id"), col("decoded_audio").as("d"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    orig.foreach { case (id, o) =>
      val r = res(id)
      assert(r.getInt(1) == 16000, s"media $id rate")
      val expected = ((o.getInt(3) - 1).toLong * 16000 / o.getInt(1)) + 1
      assert(r.getInt(3).toLong == expected,
        s"media $id: ${r.getInt(3)} samples vs expected $expected " +
          s"(orig ${o.getInt(3)} @ ${o.getInt(1)})")
      assert(r.getInt(6) <= o.getInt(6),
        s"media $id: interpolation must not exceed the input peak")
    }
    // upsampling a rate-8000 row roughly doubles its sample count
    val id8k = orig.collectFirst { case (id, o) if o.getInt(1) == 8000 => id }
    id8k.foreach { id =>
      assert(res(id).getInt(3) >= orig(id).getInt(3) * 2 - 2)
    }
    // corrupt payloads resample to null, not a crash
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val out = Multimodal.resampleAudio(junk, "payload", 16000).head()
    assert(out.isNullAt(2))
  }
}
