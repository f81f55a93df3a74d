package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, flowing through the same
  * partition/shuffle machinery as any other column. The expensive media
  * decode is batched per partition — the Scala analog of PySpark's
  * `mapInPandas` — so the decoder amortizes its setup once per
  * partition, not once per row.
  *
  * The image path is REAL end-to-end with JDK-only code: synthetic
  * payloads are genuine PNGs (`javax.imageio.ImageIO` encode) and
  * [[decodeImages]] decodes any PNG/JPEG/BMP/GIF payload back to
  * dimensions and per-channel statistics. Audio/video decode would slot
  * into the same batched shape behind a JNI codec.
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

  /** Decoded-image statistics appended by [[decodeImages]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  // ---- synthetic corpus (real PNGs, derivable pixel rule) --------------

  /** The deterministic pixel rule syntheticMedia plants, written out so an
    * external oracle can DERIVE the decoded statistics instead of echoing
    * them (nc = codepoint length of the text, id = the row id):
    *
    *   width  = 8 + nc % 9            height = 8 + id % 5
    *   red(x) = (nc % 256 + x) % 256  (x-gradient, constant down columns)
    *   green  = first codepoint % 256 (0 for empty text)
    *   blue   = id % 256
    *
    * so mean_g / mean_b equal their constants exactly and
    * mean_r = (Σ_{x<w} (nc%256 + x) % 256) / w, all reachable by integer
    * arithmetic on the source table.
    */
  private[multimodal] def pngFor(id: Long, text: String): (Array[Byte], Int, Int) = {
    val nc = text.codePointCount(0, text.length)
    val w = 8 + nc % 9
    val h = (8 + id % 5).toInt
    val baseR = nc % 256
    val g = if (text.isEmpty) 0 else text.codePointAt(0) % 256
    val b = (id % 256).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((baseR + x) % 256) << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    (baos.toByteArray, w, h)
  }

  /** Build a synthetic media table from any text column: the payload is a
    * REAL PNG (see [[pngFor]] for the planted pixel rule), so downstream
    * decode exercises an actual image codec, not an echo of the input.
    */
  def syntheticMedia(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(StringType).as("__text"))
    val enc = RowEncoder.encoderFor(mediaSchema)
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no tmp files
      it.map { row =>
        val id = row.getLong(0)
        val text = if (row.isNullAt(1)) "" else row.getString(1)
        val (png, w, h) = pngFor(id, text)
        Row(id, "image", png, Row(w, h, null, 1, "image/png"))
      }
    }(enc)
  }

  // ---- real decode (JDK ImageIO) ---------------------------------------

  /** Decode one image payload to (width, height, bands, channel means).
    * Null bytes or an undecodable payload yield null — corrupt media must
    * not kill a 10⁹-row pipeline.
    */
  private[multimodal] def decodeOne(bytes: Array[Byte]): Row = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    Row(w, h, img.getRaster.getNumBands, sr / n, sg / n, sb / n)
  }

  /** Batched per-partition image decode: appends a `decoded` struct
    * ([[decodedSchema]]) actually read back from the payload bytes via
    * `javax.imageio` — dimensions and statistics come from decoded
    * PIXELS, never from metadata. The iterator is consumed in `batchSize`
    * groups to model the arrow-batch shape a vectorized decoder uses.
    */
  def decodeImages(df: DataFrame, binCol: String,
                   batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded", decodedSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        // (a JNI/ONNX decoder would run the whole batch through one session)
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ decodeOne(bytes))
        }
      }
    }(enc)
  }

  /** Batched per-partition feature extraction: appends `features
    * array<float>` of length `dim` — a dim-bin luminance histogram
    * (pixel-count-normalized) of the DECODED image, the simplest real
    * image feature that feeds similarity search. Null/undecodable
    * payloads get a zero vector so downstream joins stay total.
    */
  def withDecodedFeatures(df: DataFrame, binCol: String, dim: Int = 16,
                          batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ histogramFeatures(bytes, dim).toSeq)
        }
      }
    }(enc)
  }

  private[multimodal] def histogramFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) return out
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        out(math.min(lum * dim / 256, dim - 1)) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var i = 0
    while (i < dim) { out(i) /= n; i += 1 }
    out
  }

  // ---- perceptual hash (dHash) ------------------------------------------

  /** 64-bit difference hash of one image payload — dHash, the public
    * pHash-family fingerprint (Krawetz): decode; grayscale each sampled
    * pixel with the ITU-R BT.601 integer luma `(299r + 587g + 114b) / 1000`
    * (truncating division); NEAREST-NEIGHBOR downsample to a 9×8 grid,
    * sample point `(x·w/9, y·h/8)` in integer arithmetic — no area
    * averaging, so an external oracle can replay every bit from the
    * pixel rule; bit `y·8 + x` (from LSB) set iff `gray(x+1, y) >
    * gray(x, y)`. Identical images hash identically; small local edits
    * flip few bits, so Hamming distance is the near-dup metric. Null or
    * undecodable payloads yield null (corrupt media must not kill the
    * pipeline).
    */
  private[multimodal] def dhashOne(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return null
    val w = img.getWidth
    val h = img.getHeight
    val gray = new Array[Int](72) // 9 cols x 8 rows, row-major
    var y = 0
    while (y < 8) {
      val py = ((y.toLong * h) / 8).toInt
      var x = 0
      while (x < 9) {
        val px = ((x.toLong * w) / 9).toInt
        val rgb = img.getRGB(px, py)
        gray(y * 9 + x) =
          (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
            + 114 * (rgb & 0xff)) / 1000
        x += 1
      }
      y += 1
    }
    var hash = 0L
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y * 9 + x + 1) > gray(y * 9 + x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Batched per-partition perceptual hashing: appends `outCol` (nullable
    * long) = [[dhashOne]] of the payload. Same batch shape as
    * [[decodeImages]]; one decode per row, no shuffle — the fingerprint
    * is then the ONLY thing image near-dup ever shuffles.
    */
  def withImageDHash(df: DataFrame, binCol: String,
                     outCol: String = "dhash",
                     batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = true))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ dhashOne(bytes))
        }
      }
    }(enc)
  }

  /** Verified image near-duplicate pairs (`id_a < id_b`,
    * `hamming <= maxDist` over [[withImageDHash]] fingerprints): the
    * SimHash pigeonhole machinery ([[graft.text.SimHashDedup
    * .nearDupPairsFromFingerprints]]) on the image dHash — 64 bits split
    * into `chunks` bands, any pair within `chunks − 1` bits shares an
    * exact band, so candidate generation is a band-value join (no
    * quadratic comparison; payloads and pixels never shuffle — only the
    * 8-byte fingerprint). Null-hash rows (undecodable) never pair.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, binCol: String,
                        maxDist: Int = 3, chunks: Int = 4,
                        maxBucketSize: Int = 1000): DataFrame =
    graft.text.SimHashDedup.nearDupPairsFromFingerprints(
      withImageDHash(df, binCol, "__dhash").filter(col("__dhash").isNotNull),
      idCol, "__dhash", maxDist, chunks, maxBucketSize)

  // ---- real audio (RIFF/WAV PCM, JDK-free codec) -----------------------

  /** Decoded-audio statistics appended by [[decodeAudio]]. */
  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("duration_ms", LongType),
    StructField("mean_sample", DoubleType),
    StructField("peak", IntegerType)))

  /** The deterministic sample rule [[syntheticAudio]] plants (nc =
    * codepoint length of the text, id = the row id), written out so an
    * external oracle can DERIVE the decoded statistics by integer
    * arithmetic:
    *
    *   sample_rate = 8000 + (id % 4) * 4000
    *   n           = 64 + nc % 65                 (samples, mono 16-bit)
    *   sample(i)   = ((id * 31 + i * 7 + nc) % 65536) - 32768
    *
    * so mean_sample = Σ sample(i) / n and peak = max |sample(i)| are
    * reachable from (id, nc) alone — while the payload itself is a real
    * RIFF/WAVE container the decoder must actually parse.
    */
  private[multimodal] def wavFor(id: Long, text: String): (Array[Byte], Int, Int) = {
    val nc = text.codePointCount(0, text.length)
    val rate = (8000 + (id % 4) * 4000).toInt
    val n = 64 + nc % 65
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2)      // block align
      .putShort(16)     // bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      bb.putShort((((id * 31 + i * 7 + nc) % 65536) - 32768).toShort)
      i += 1
    }
    (bb.array(), rate, n)
  }

  /** Synthetic audio table from any text column: payloads are REAL WAV
    * containers (see [[wavFor]] for the planted sample rule), so
    * downstream decode exercises an actual RIFF parser.
    */
  def syntheticAudio(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(StringType).as("__text"))
    val enc = RowEncoder.encoderFor(mediaSchema)
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val text = if (row.isNullAt(1)) "" else row.getString(1)
        val (wav, rate, n) = wavFor(id, text)
        Row(id, "audio", wav, Row(null, null, rate, n, "audio/wav"))
      }
    }(enc)
  }

  /** Decode one RIFF/WAVE PCM payload: chunk-walk the container (extra
    * chunks between `fmt ` and `data` are legal and skipped), then fold
    * the 16-bit little-endian samples to count/duration/mean/peak. Null
    * bytes or a malformed container yield null — corrupt media must not
    * kill a 10⁹-row pipeline.
    */
  private[multimodal] def decodeWavOne(bytes: Array[Byte]): Row = {
    if (bytes == null || bytes.length < 44) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return null
      bb.getInt // riff size (trust the buffer bound instead)
      if (tag() != "WAVE") return null
      var channels = -1; var rate = -1; var bits = -1
      var data: Option[(Int, Int)] = None // (offset, length)
      while (bb.remaining() >= 8 && data.isEmpty) {
        val t = tag(); val len = bb.getInt
        if (len < 0 || len > bb.remaining()) return null
        t match {
          case "fmt " =>
            val p = bb.position()
            val fmt = bb.getShort()
            if (fmt != 1) return null // PCM only
            channels = bb.getShort().toInt
            rate = bb.getInt()
            bb.getInt; bb.getShort // byte rate, block align
            bits = bb.getShort().toInt
            bb.position(p + len)
          case "data" => data = Some((bb.position(), len))
          case _ => bb.position(bb.position() + len + (len & 1))
        }
      }
      if (channels <= 0 || rate <= 0 || bits != 16 || data.isEmpty) return null
      val (off, len) = data.get
      val n = len / 2
      var sum = 0L; var peak = 0
      var i = 0
      while (i < n) {
        val s = bb.getShort(off + i * 2).toInt
        sum += s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 1
      }
      val frames = n / channels
      Row(channels, rate, bits, n, frames * 1000L / rate,
        if (n == 0) 0.0 else sum.toDouble / n, peak)
    } catch { case _: RuntimeException => null }
  }

  /** Batched per-partition audio decode: appends a `decoded_audio`
    * struct ([[decodedAudioSchema]]) parsed from the payload bytes —
    * statistics come from decoded SAMPLES, never from metadata. Same
    * batched `mapPartitions` shape as [[decodeImages]].
    */
  def decodeAudio(df: DataFrame, binCol: String,
                  batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded_audio", decodedAudioSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ decodeWavOne(bytes))
        }
      }
    }(enc)
  }

  /** Resample one mono 16-bit PCM WAV to `targetRate` by linear
    * interpolation (the standard cheap SRC), re-encoded as a real WAV.
    * Output length maps the input span exactly:
    * `outN = floor((n-1)·target/rate) + 1`, so the first and last input
    * samples anchor the resampled signal and |output| never exceeds the
    * input peak (each sample is a convex combination of neighbors).
    * Unsupported shapes (multi-channel, non-16-bit, corrupt) yield null.
    */
  private[multimodal] def resampleWavOne(bytes: Array[Byte],
                                         targetRate: Int): Array[Byte] = {
    val dec = decodeWavOne(bytes)
    if (dec == null || dec.getInt(0) != 1 || dec.getInt(2) != 16) return null
    val rate = dec.getInt(1)
    val n = dec.getInt(3)
    if (n == 0 || rate <= 0) return null
    // re-walk to the samples (decodeWavOne folds them away)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(12)
    var dataOff = -1; var dataLen = 0
    while (bb.remaining() >= 8 && dataOff < 0) {
      val t = new Array[Byte](4); bb.get(t)
      val len = bb.getInt
      if (new String(t, "US-ASCII") == "data") { dataOff = bb.position(); dataLen = len }
      else bb.position(bb.position() + len + (len & 1))
    }
    if (dataOff < 0) return null
    val nIn = dataLen / 2
    val outN = ((nIn - 1).toLong * targetRate / rate).toInt + 1
    val out = java.nio.ByteBuffer
      .allocate(44 + outN * 2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + outN * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(targetRate).putInt(targetRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(outN * 2)
    var j = 0
    while (j < outN) {
      val pos = j.toDouble * rate / targetRate
      val i0 = math.min(pos.toInt, nIn - 1)
      val i1 = math.min(i0 + 1, nIn - 1)
      val frac = pos - i0
      val s0 = bb.getShort(dataOff + i0 * 2).toDouble
      val s1 = bb.getShort(dataOff + i1 * 2).toDouble
      out.putShort(math.rint(s0 + (s1 - s0) * frac).toShort)
      j += 1
    }
    out.array()
  }

  /** Batched per-partition audio resampling: appends `resampled_audio`
    * (a real WAV at `targetRate`, null for unsupported/corrupt inputs).
    * Same batched `mapPartitions` shape as [[decodeAudio]] — the
    * per-row DSP work is where a codec would slot in at scale.
    */
  def resampleAudio(df: DataFrame, binCol: String, targetRate: Int,
                    batchSize: Int = 256): DataFrame = {
    require(targetRate > 0, "targetRate must be positive")
    val outSchema = StructType(df.schema.fields :+
      StructField("resampled_audio", BinaryType))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ resampleWavOne(bytes, targetRate))
        }
      }
    }(enc)
  }

  // ---- real video (RIFF/AVI container, PNG frames) ---------------------

  /** Decoded-video statistics appended by [[decodeVideo]]: container
    * fields (`n_frames` counted from the movi chunk walk, `us_per_frame`
    * from the avih header) plus pixel statistics of the SAMPLED frames
    * decoded through the real image codec.
    */
  val decodedVideoSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("us_per_frame", IntegerType),
    StructField("frames_sampled", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** The deterministic per-frame pixel rule [[syntheticVideo]] plants
    * (nc = codepoint length of the text, id = the row id, f = frame
    * index), written out so an external oracle can DERIVE the decoded
    * statistics by integer arithmetic:
    *
    *   n_frames     = 3 + id % 4        us_per_frame = 40000 + (id%5)*10000
    *   width        = 8 + nc % 9        height       = 8 + id % 5
    *   red(f, x)    = ((nc + f) % 256 + x) % 256   (x-gradient per frame)
    *   green        = first codepoint % 256        (constant)
    *   blue(f)      = (id + f) % 256
    *
    * while the payload itself is a genuine RIFF/AVI container (hdrl with
    * avih + strl, movi with one 00dc chunk per frame) whose frames are
    * real PNGs the decoder must actually parse and decode.
    */
  private[multimodal] def aviFor(id: Long, text: String): Array[Byte] = {
    val nc = text.codePointCount(0, text.length)
    val nFrames = (3 + id % 4).toInt
    val usPerFrame = (40000 + (id % 5) * 10000).toInt
    val w = 8 + nc % 9
    val h = (8 + id % 5).toInt
    val g = if (text.isEmpty) 0 else text.codePointAt(0) % 256
    javax.imageio.ImageIO.setUseCache(false)
    val frames: Seq[Array[Byte]] = (0 until nFrames).map { f =>
      val baseR = (nc + f) % 256
      val b = ((id + f) % 256).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (((baseR + x) % 256) << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    // avih: 14 little-endian ints = 56 bytes
    val avih = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(usPerFrame).putInt(0).putInt(0).putInt(0)
      .putInt(nFrames).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(fourcc("vids")).put(fourcc("MPNG")).putInt(0)
      .putShort(0).putShort(0).putInt(0)
      .putInt(usPerFrame).putInt(1000000) // scale/rate
      .putInt(0).putInt(nFrames).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      .array()
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .put(fourcc("MPNG")).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      .array()
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc(tag)).putInt(body.length).put(body)
      bb.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val len = 4 + bodies.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(8 + len)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("LIST")).putInt(len).put(fourcc(listType))
      bodies.foreach(bb.put)
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih),
      list("strl", chunk("strh", strh), chunk("strf", strf)))
    val movi = list("movi", frames.map(chunk("00dc", _)): _*)
    val body = hdrl ++ movi
    val riff = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put(fourcc("RIFF")).putInt(4 + body.length).put(fourcc("AVI "))
      .put(body)
    riff.array()
  }

  /** Synthetic video table from any text column: payloads are REAL
    * RIFF/AVI containers of real PNG frames (see [[aviFor]] for the
    * planted rules), so downstream decode exercises an actual container
    * walk plus an actual image codec per sampled frame.
    */
  def syntheticVideo(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val in = df.select(col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(StringType).as("__text"))
    val enc = RowEncoder.encoderFor(mediaSchema)
    in.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val text = if (row.isNullAt(1)) "" else row.getString(1)
        val nc = text.codePointCount(0, text.length)
        Row(id, "video", aviFor(id, text),
          Row(8 + nc % 9, (8 + id % 5).toInt, null, (3 + id % 4).toInt,
            "video/avi"))
      }
    }(enc)
  }

  /** Decode one RIFF/AVI payload: walk the container (hdrl → avih for
    * us_per_frame; movi → one `..dc`/`..db` chunk per frame), decode
    * every `every`-th frame through the real image codec, and fold pixel
    * statistics. Frame count comes from COUNTING movi chunks, dimensions
    * from the first DECODED frame — never from header metadata. Null or
    * malformed payloads (or an undecodable sampled frame) yield null.
    */
  private[multimodal] def decodeAviOne(bytes: Array[Byte], every: Int): Row = {
    if (bytes == null || bytes.length < 12) return null
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return null
      bb.getInt // trust the buffer bound instead
      if (tag() != "AVI ") return null
      var usPerFrame = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(end: Int): Unit = {
        while (bb.position() + 8 <= end) {
          val t = tag(); val len = bb.getInt
          if (len < 0 || bb.position() + len > end) throw new RuntimeException("bad chunk")
          val next = bb.position() + len + (len & 1)
          t match {
            case "LIST" =>
              tag() // list type: hdrl/strl/movi — recurse either way
              walk(bb.position() + len - 4)
            case "avih" =>
              usPerFrame = bb.getInt()
            case dc if dc.length == 4 &&
                (dc.endsWith("dc") || dc.endsWith("db")) =>
              frames += ((bb.position(), len))
            case _ => ()
          }
          bb.position(next)
        }
      }
      walk(bytes.length)
      if (frames.isEmpty || usPerFrame < 0) return null
      javax.imageio.ImageIO.setUseCache(false)
      var sr = 0L; var sg = 0L; var sb = 0L; var npix = 0L
      var w = -1; var h = -1; var sampled = 0
      var f = 0
      while (f < frames.size) {
        if (f % every == 0) {
          val (off, len) = frames(f)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes, off, len))
          if (img == null) return null
          if (w < 0) { w = img.getWidth; h = img.getHeight }
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          npix += img.getWidth.toLong * img.getHeight
          sampled += 1
        }
        f += 1
      }
      val n = npix.toDouble
      Row(w, h, frames.size, usPerFrame, sampled, sr / n, sg / n, sb / n)
    } catch { case _: RuntimeException | _: java.io.IOException => null }
  }

  /** Batched per-partition video decode: appends a `decoded_video`
    * struct ([[decodedVideoSchema]]) — container stats from a real chunk
    * walk, pixel stats from really-decoded sampled frames. Same batched
    * `mapPartitions` shape as [[decodeImages]]; frame sampling keeps the
    * codec cost at 1/`every` of full decode, the standard trick for
    * video pipelines where decoding every frame at 100 TB is the
    * dominant cost.
    */
  def decodeVideo(df: DataFrame, binCol: String, every: Int = 2,
                  batchSize: Int = 64): DataFrame = {
    require(every >= 1, "every must be >= 1")
    val outSchema = StructType(df.schema.fields :+
      StructField("decoded_video", decodedVideoSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          Row.fromSeq(row.toSeq :+ decodeAviOne(bytes, every))
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
    * byte-level placeholder where only plumbing shape matters; for a real
    * image resample see [[resizeImages]].
    */
  def resizePayload(df: DataFrame, binCol: String, targetBytes: Int): Column = {
    val bin = col(binCol)
    val truncated = substring(bin, 1, targetBytes)
    val padding = expr(
      s"CAST(repeat(CHAR(0), GREATEST($targetBytes - length($binCol), 0)) AS BINARY)")
    concat(truncated, padding)
  }

  /** REAL image resize: decode the payload, bilinearly resample to
    * `targetW`×`targetH` with JDK `Graphics2D`, re-encode as PNG —
    * appends `resized binary` plus `resized_width`/`resized_height`.
    * Null/undecodable payloads get a null resized column. Same batched
    * `mapPartitions` shape as [[decodeImages]] (codec work amortizes its
    * setup per partition, the multimodal-pipeline norm at scale).
    */
  def resizeImages(df: DataFrame, binCol: String,
                   targetW: Int, targetH: Int,
                   batchSize: Int = 256): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)))
    val binIdx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.get(binIdx).asInstanceOf[Array[Byte]]
          val resized = resizeOne(bytes, targetW, targetH)
          if (resized == null)
            Row.fromSeq(row.toSeq ++ Seq(null, null, null))
          else
            Row.fromSeq(row.toSeq ++ Seq(resized, targetW, targetH))
        }
      }
    }(enc)
  }

  private[multimodal] def resizeOne(bytes: Array[Byte],
                                    w: Int, h: Int): Array[Byte] = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) return null
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = out.createGraphics()
    try {
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, w, h, null)
    } finally gfx.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", baos)
    baos.toByteArray
  }
}
