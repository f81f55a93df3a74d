package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, flowing through the same
  * partition/shuffle machinery as any other column. The expensive media
  * decode is batched per partition — the Scala analog of PySpark's
  * `mapInPandas` — so a real decoder (JNI/FFmpeg/JPEG) would amortize its
  * setup once per partition, not once per row.
  *
  * The decode itself is a clearly-marked DETERMINISTIC STUB (no media
  * libraries in this environment): it derives pseudo-features from the
  * bytes. Everything around it — schema, batching, partitioning, frame
  * sampling, resize bookkeeping — is real and tested, so swapping in a
  * true decoder is a one-function change.
  */
object Multimodal {

  /** Canonical multimodal schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("format", StringType))), nullable = true)))

  // ======================== STUB DECODER =============================
  // Replace with a real decoder (e.g. TwelveMonkeys/JCodec via JNI) in a
  // production image. Deterministic: features depend only on the bytes.
  private[multimodal] def stubDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    if (bytes == null) return Array.fill(dim)(0f)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      // cheap seeded byte-mix — stands in for "model embedding of pixels"
      var h = 1125899906842597L + i * 2654435761L
      var j = i % math.max(bytes.length, 1)
      var steps = 0
      while (steps < 16 && bytes.length > 0) {
        h = h * 6364136223846793005L + bytes(j)
        j = (j + 31) % bytes.length
        steps += 1
      }
      out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      i += 1
    }
    out
  }
  // ===================================================================

  /** Batched per-partition feature extraction: appends `features
    * array<float>` of length `dim` derived from `binCol`. The iterator is
    * consumed in `batchSize` groups to model the arrow-batch shape a real
    * mapInPandas/ONNX decoder would use.
    */
  def withDecodedFeatures(df: DataFrame, binCol: String, dim: Int = 16,
                          batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // (a real decoder would run the whole batch through one session)
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ stubDecodeFeatures(bytes, dim).toSeq)
        }
      }
    }(enc)
  }

  /** Frame sampling: split the payload into `frameSize`-byte frames and
    * keep every `every`-th, exploded one row per sampled frame with its
    * index — pure built-ins (binary substring), no decode needed.
    */
  def sampleFrames(df: DataFrame, binCol: String, frameSize: Int,
                   every: Int = 1): DataFrame = {
    val bin = col(binCol)
    val nFrames = ceil(length(bin).cast("double") / frameSize).cast("int")
    val frames = transform(
      filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => i % every === 0),
      i => substring(bin, (i * frameSize + 1).cast("int"), lit(frameSize)))
    df.withColumn("__frames", when(length(bin) > 0, frames).otherwise(array()))
      .select(col("*"),
        posexplode_outer(col("__frames")).as(Seq("frame_idx", "frame")))
      .drop("__frames")
  }

  /** "Resize": truncate or zero-pad the payload to `targetBytes` —
    * placeholder for a real image resample with identical plumbing.
    */
  def resizePayload(df: DataFrame, binCol: String, targetBytes: Int): Column = {
    val bin = col(binCol)
    val truncated = substring(bin, 1, targetBytes)
    val padding = expr(
      s"CAST(repeat(CHAR(0), GREATEST($targetBytes - length($binCol), 0)) AS BINARY)")
    concat(truncated, padding)
  }

  /** Build a synthetic media table from any text column (for tests and the
    * demo pipeline: payload = utf8 bytes standing in for pixels).
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit("image").as("modality"),
      col(textCol).cast(BinaryType).as("content"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(null).cast(IntegerType).as("sample_rate"),
        lit(1).as("n_frames"),
        lit("fake/rgb8").as("format")).as("meta"))
}
