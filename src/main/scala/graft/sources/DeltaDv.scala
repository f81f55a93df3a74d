package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import java.util.UUID
import java.util.zip.CRC32

/** Delta Lake deletion-vector interop: the on-disk bitmap codec shared by
  * [[DeltaImport]] (reading DV-carrying tables) and
  * [[graft.tables.ManagedTable.exportDelta]] (writing DV-carrying
  * snapshots). Everything here is the PUBLIC Delta PROTOCOL.md
  * ("Deletion Vectors" + "Deletion Vector Format" sections) plus the
  * RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec):
  *
  *   - a deletion vector is a set of 64-bit row indexes, stored as a
  *     "RoaringBitmapArray" — one standard 32-bit Roaring bitmap per
  *     2^32 range, in the "portable" layout: magic `1681511377` (int32
  *     LE), bitmap count (int64 LE), then per bitmap its 32-bit key
  *     (int32 LE) followed by the standard portable Roaring
  *     serialization (RoaringFormatSpec, all little-endian);
  *   - DV files (`deletion_vector_<uuid>.bin`) start with a format
  *     version byte (`1`); each stored DV is `<dataSize:int32 BE>
  *     <data:dataSize bytes> <crc32(data):int32 BE>`, and the
  *     descriptor's `offset` points at the size field;
  *   - descriptors address the payload via `storageType`: `u` (relative
  *     file, `pathOrInlineDv = [<prefix>]<z85-uuid(20 chars)>`), `i`
  *     (inline, `pathOrInlineDv` = Z85 of the bitmap data), `p`
  *     (absolute path);
  *   - Z85 is ZeroMQ base85 (spec 32/Z85): 4-byte big-endian groups to
  *     5 chars of an 85-char alphabet.
  *
  * Writing always emits array/bitmap containers (cookie 12346, offsets
  * present); reading additionally understands run containers (cookie
  * 12347) since real Delta writers `runOptimize()` their bitmaps.
  */
object DeltaDv {

  /** `add.deletionVector` descriptor (PROTOCOL.md "Deletion Vector
    * Descriptor Schema"). `offset` is absent for inline vectors;
    * `sizeInBytes` is the serialized bitmap WITHOUT the length/CRC
    * framing; `cardinality` the number of masked rows.
    */
  final case class Descriptor(storageType: String,
                              pathOrInlineDv: String,
                              offset: Option[Int],
                              sizeInBytes: Int,
                              cardinality: Long) {
    /** The descriptor's identity for log action reconciliation
      * (PROTOCOL.md: a logical file is `(path, deletionVector.uniqueId)`;
      * delta-spark derives it as `storageType + pathOrInlineDv` plus
      * `@offset` when stored with an offset).
      */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.fold("")(o => s"@$o")
    /** Resolve the DV payload file for `u`/`p` storage (None for `i`). */
    def file(tableRoot: Path): Option[Path] = storageType match {
      case "u" =>
        val prefix = pathOrInlineDv.dropRight(20)
        val uuid = Z85.decodeUuid(pathOrInlineDv.takeRight(20))
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) tableRoot.resolve(name)
             else tableRoot.resolve(prefix).resolve(name))
      case "p" => Some(java.nio.file.Paths.get(
        pathOrInlineDv.stripPrefix("file:")))
      case _ => None
    }
  }

  /** The descriptor's masked row indexes, sorted ascending. Inline
    * payloads decode from Z85; stored payloads seek to `offset`, check
    * the size field against the descriptor and the CRC-32 against the
    * data — a mismatched vector refuses rather than resurrecting or
    * over-deleting rows.
    */
  def readPositions(tableRoot: Path, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" => Z85.decode(d.pathOrInlineDv, d.sizeInBytes)
      case "u" | "p" =>
        val f = d.file(tableRoot).get
        require(Files.isRegularFile(f), s"deletion vector file $f is missing")
        val all = Files.readAllBytes(f)
        val off = d.offset.getOrElse(1) // version byte, then first DV
        require(off + 4 <= all.length,
          s"deletion vector offset ${d.offset} is past the end of $f")
        val bb = ByteBuffer.wrap(all) // BE wrapper framing
        val size = bb.getInt(off)
        require(size == d.sizeInBytes,
          s"deletion vector at $f:$off declares $size bytes but the " +
            s"descriptor says ${d.sizeInBytes}")
        require(off + 4 + size + 4 <= all.length,
          s"deletion vector at $f:$off is truncated")
        val payload = java.util.Arrays.copyOfRange(all, off + 4, off + 4 + size)
        val crc = new CRC32(); crc.update(payload)
        require(crc.getValue.toInt == bb.getInt(off + 4 + size),
          s"deletion vector at $f:$off fails its CRC-32 check")
        payload
      case other => throw new IllegalArgumentException(
        s"unknown deletion vector storageType '$other'")
    }
    val pos = RoaringBitmapArray.deserialize(data)
    require(pos.length == d.cardinality,
      s"deletion vector decodes to ${pos.length} rows but the descriptor " +
        s"says ${d.cardinality}")
    pos
  }

  /** One serialized DV destined for a shared `.bin` file: the framing
    * (`offset`, `sizeInBytes`, `cardinality`) for its descriptor. The
    * payload itself is already on disk — holding it here would make an
    * exporter's per-file map O(total DV bytes) on the driver.
    */
  final case class Framed(offset: Int, sizeInBytes: Int, cardinality: Long)

  /** Streaming writer for one DV `.bin` file: version byte up front,
    * then one `size/data/CRC` frame per [[append]]. Lets an exporter
    * stream many files' vectors into one payload holding only ONE
    * file's positions in memory at a time.
    */
  final class FileWriter(target: Path) {
    private val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(target))
    private var at = 0
    out.write(1); at = 1 // format version

    /** Frame one vector (sorted distinct positions); returns its
      * descriptor coordinates.
      */
    def append(positions: Array[Long]): Framed = {
      val data = RoaringBitmapArray.serialize(positions)
      val offset = at
      out.write(ByteBuffer.allocate(4).putInt(data.length).array()) // BE
      out.write(data)
      val crc = new CRC32(); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      at += 4 + data.length + 4
      Framed(offset, data.length, positions.length.toLong)
    }

    def close(): Unit = out.close()
  }

  /** Write `vectors` (per-key sorted position arrays) into one DV file
    * at `target`, returning each key's [[Framed]] entry.
    */
  def writeFile[K](target: Path, vectors: Seq[(K, Array[Long])]): Map[K, Framed] = {
    val w = new FileWriter(target)
    try vectors.map { case (k, positions) => k -> w.append(positions) }.toMap
    finally w.close()
  }

  /** Fresh `u`-storage identity: (pathOrInlineDv = z85 uuid, file name). */
  def freshFileId(): (String, String) = {
    val uuid = UUID.randomUUID()
    (Z85.encodeUuid(uuid), s"deletion_vector_$uuid.bin")
  }

  /** ZeroMQ Z85 (spec 32), the base85 variant Delta uses for inline DV
    * payloads and the UUID in `u` paths.
    */
  object Z85 {
    private val alphabet =
      ("0123456789abcdefghijklmnopqrstuvwxyz" +
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
    private val index: Array[Byte] = {
      val a = Array.fill[Byte](128)(-1)
      alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i.toByte }
      a
    }

    /** Encode, zero-padding the final partial 4-byte group (Delta's
      * convention for inline payloads; the decoder trims by length).
      */
    def encode(bytes: Array[Byte]): String = {
      val padded =
        if (bytes.length % 4 == 0) bytes
        else java.util.Arrays.copyOf(bytes, (bytes.length / 4 + 1) * 4)
      val sb = new java.lang.StringBuilder(padded.length / 4 * 5)
      var i = 0
      while (i < padded.length) {
        var v = 0L
        var j = 0
        while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
        var div = 85L * 85 * 85 * 85
        while (div > 0) {
          sb.append(alphabet(((v / div) % 85).toInt)); div /= 85
        }
        i += 4
      }
      sb.toString
    }

    /** Decode to exactly `outLen` bytes (trims the zero padding). */
    def decode(s: String, outLen: Int): Array[Byte] = {
      require(s.length % 5 == 0, s"Z85 input length ${s.length} not a multiple of 5")
      val full = new Array[Byte](s.length / 5 * 4)
      require(outLen <= full.length,
        s"Z85 input too short for $outLen bytes")
      var i = 0
      while (i < s.length) {
        var v = 0L
        var j = 0
        while (j < 5) {
          val c = s.charAt(i + j)
          val d = if (c < 128) index(c.toInt) else -1
          require(d >= 0, s"invalid Z85 character '$c'")
          v = v * 85 + d
          j += 1
        }
        var k = 0
        while (k < 4) {
          full(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xff).toByte
          k += 1
        }
        i += 5
      }
      if (outLen == full.length) full else java.util.Arrays.copyOf(full, outLen)
    }

    /** UUIDs travel as 16 bytes (msb then lsb, big-endian) → 20 chars. */
    def encodeUuid(u: UUID): String = {
      val bb = ByteBuffer.allocate(16)
      bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
      encode(bb.array())
    }
    def decodeUuid(s: String): UUID = {
      require(s.length == 20, s"Z85 uuid must be 20 chars, got ${s.length}")
      val bb = ByteBuffer.wrap(decode(s, 16))
      new UUID(bb.getLong(), bb.getLong())
    }
  }

  /** The 64-bit "RoaringBitmapArray" in Delta's portable serialization:
    * positions split into a 32-bit Roaring bitmap per 2^32 range.
    */
  object RoaringBitmapArray {
    private val Magic = 1681511377
    private val SerialCookieNoRun = 12346
    private val SerialCookie = 12347
    private val ArrayMaxCardinality = 4096

    /** Serialize sorted, distinct 64-bit positions. Always emits the
      * no-run-container form (cookie 12346) — valid for any content;
      * run compression is a reader-side concern here.
      */
    def serialize(positions: Array[Long]): Array[Byte] = {
      var i = 1
      while (i < positions.length) {
        require(positions(i) > positions(i - 1),
          "positions must be sorted and distinct")
        i += 1
      }
      // group by 32-bit key, then by 16-bit container key
      val byKey = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.LinkedHashMap[Int, scala.collection.mutable.ArrayBuffer[Int]]]
      positions.foreach { p =>
        require(p >= 0, s"negative row index $p")
        val key = (p >>> 32).toInt
        val low = (p & 0xffffffffL).toInt
        val ck = low >>> 16
        byKey.getOrElseUpdate(key,
            scala.collection.mutable.LinkedHashMap.empty)
          .getOrElseUpdate(ck, scala.collection.mutable.ArrayBuffer.empty) +=
          (low & 0xffff)
      }
      val bitmaps = byKey.toSeq.map { case (key, containers) =>
        val cs = containers.toSeq
        val containerBytes = cs.map { case (_, vals) =>
          if (vals.length <= ArrayMaxCardinality) vals.length * 2 else 8192
        }
        val headerBytes = 4 + 4 + cs.length * 4 + cs.length * 4
        val bb = ByteBuffer.allocate(headerBytes + containerBytes.sum)
          .order(ByteOrder.LITTLE_ENDIAN)
        bb.putInt(SerialCookieNoRun)
        bb.putInt(cs.length)
        cs.foreach { case (ck, vals) =>
          bb.putShort(ck.toShort); bb.putShort((vals.length - 1).toShort)
        }
        var off = headerBytes
        containerBytes.foreach { b => bb.putInt(off); off += b }
        cs.foreach { case (_, vals) =>
          if (vals.length <= ArrayMaxCardinality)
            vals.foreach(v => bb.putShort(v.toShort))
          else {
            val words = new Array[Long](1024)
            vals.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
            words.foreach(bb.putLong)
          }
        }
        key -> bb.array()
      }
      val out = ByteBuffer
        .allocate(4 + 8 + bitmaps.map(4 + _._2.length).sum)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.putInt(Magic)
      out.putLong(bitmaps.length.toLong)
      bitmaps.foreach { case (key, bytes) => out.putInt(key); out.put(bytes) }
      out.array()
    }

    /** Deserialize to sorted positions. Understands array, bitmap, AND
      * run containers (both cookies) — real writers run-optimize.
      */
    def deserialize(data: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
      val magic = bb.getInt()
      require(magic == Magic,
        s"not a portable RoaringBitmapArray (magic $magic)")
      val n = bb.getLong()
      require(n >= 0 && n <= Int.MaxValue, s"implausible bitmap count $n")
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var b = 0L
      while (b < n) {
        val key = bb.getInt().toLong & 0xffffffffL
        readBitmapInto(bb, key << 32, out)
        b += 1
      }
      val arr = out.toArray
      java.util.Arrays.sort(arr)
      arr
    }

    /** One standard portable 32-bit Roaring bitmap, starting at `bb`'s
      * position (consumed), each value offset by `base`.
      */
    private def readBitmapInto(bb: ByteBuffer, base: Long,
                               out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
      val start = bb.position()
      val cookie = bb.getInt()
      val (size, runFlags) =
        if ((cookie & 0xffff) == SerialCookie) {
          val s = (cookie >>> 16) + 1
          val flags = new Array[Byte]((s + 7) / 8)
          bb.get(flags)
          (s, Some(flags))
        } else {
          require(cookie == SerialCookieNoRun,
            s"unknown Roaring cookie $cookie")
          (bb.getInt(), None)
        }
      val keys = new Array[Int](size)
      val cards = new Array[Int](size)
      var i = 0
      while (i < size) {
        keys(i) = bb.getShort() & 0xffff
        cards(i) = (bb.getShort() & 0xffff) + 1
        i += 1
      }
      // offset header: always in the no-run form; in the run form only
      // when size >= 4 (RoaringFormatSpec NO_OFFSET_THRESHOLD)
      val hasOffsets = runFlags.isEmpty || size >= 4
      val offsets = if (hasOffsets) {
        val o = new Array[Int](size); var j = 0
        while (j < size) { o(j) = bb.getInt(); j += 1 }
        Some(o)
      } else None
      i = 0
      while (i < size) {
        offsets.foreach(o => bb.position(start + o(i)))
        val cbase = base | (keys(i).toLong << 16)
        val isRun = runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
        if (isRun) {
          val runs = bb.getShort() & 0xffff
          var r = 0
          while (r < runs) {
            val first = bb.getShort() & 0xffff
            val len = bb.getShort() & 0xffff // stored = run length - 1
            var v = first
            while (v <= first + len) { out += (cbase | v.toLong); v += 1 }
            r += 1
          }
        } else if (cards(i) <= ArrayMaxCardinality) {
          var v = 0
          while (v < cards(i)) {
            out += (cbase | (bb.getShort() & 0xffff).toLong); v += 1
          }
        } else {
          var w = 0
          while (w < 1024) {
            var word = bb.getLong()
            val wbase = cbase | (w.toLong << 6)
            while (word != 0) {
              out += (wbase | java.lang.Long.numberOfTrailingZeros(word).toLong)
              word &= word - 1
            }
            w += 1
          }
        }
        i += 1
      }
    }
  }
}
