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
}
