package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.UUID
import graft.sources.DeltaDv.{RoaringBitmapArray, Z85}

/** The deletion-vector codec alone (no Spark): Z85 against the ZeroMQ
  * spec vector, RoaringBitmapArray round-trips across container types,
  * run-container reads against hand-laid bytes, and the DV file framing
  * (offsets, CRC, corruption refusal).
  */
class DeltaDvSpec extends AnyFunSuite {

  test("Z85 matches the ZeroMQ spec test vector") {
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(Z85.encode(bytes) == "HelloWorld")
    assert(Z85.decode("HelloWorld", 8).toSeq == bytes.toSeq)
  }

  test("Z85 round-trips arbitrary bytes incl. non-multiple-of-4 lengths") {
    val rnd = new scala.util.Random(85)
    (0 until 200).foreach { _ =>
      val a = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(a)
      assert(Z85.decode(Z85.encode(a), a.length).toSeq == a.toSeq)
    }
  }

  test("Z85 uuid encoding is 20 chars and round-trips") {
    (0 until 50).foreach { _ =>
      val u = UUID.randomUUID()
      val s = Z85.encodeUuid(u)
      assert(s.length == 20)
      assert(Z85.decodeUuid(s) == u)
    }
  }

  test("roaring round-trips array containers (sparse positions)") {
    val pos = Array(0L, 1L, 5L, 100L, 65535L, 65536L, 70000L, 1000000L)
    assert(RoaringBitmapArray.deserialize(
      RoaringBitmapArray.serialize(pos)).toSeq == pos.toSeq)
  }

  test("roaring round-trips a bitmap container (dense, >4096 per 64k)") {
    val pos = (0L until 20000L by 2L).toArray // 10000 in one container
    assert(RoaringBitmapArray.deserialize(
      RoaringBitmapArray.serialize(pos)).toSeq == pos.toSeq)
  }

  test("roaring round-trips positions past 2^32 (multiple inner bitmaps)") {
    val pos = Array(3L, (1L << 32) + 7L, (1L << 32) + 65540L, (5L << 32))
    assert(RoaringBitmapArray.deserialize(
      RoaringBitmapArray.serialize(pos)).toSeq == pos.toSeq)
  }

  test("roaring round-trips random position sets") {
    val rnd = new scala.util.Random(12346)
    (0 until 100).foreach { _ =>
      // mixed density: clustered runs + sparse tail, across 2^32 ranges
      val n = rnd.nextInt(3000)
      val pos = (0 until n).map { _ =>
        val base = rnd.nextInt(4).toLong << 32
        base + (rnd.nextLong() % (1L << 20)).abs +
          (if (rnd.nextBoolean()) 0L else 1L << 31)
      }.distinct.sorted.toArray
      assert(RoaringBitmapArray.deserialize(
        RoaringBitmapArray.serialize(pos)).toSeq == pos.toSeq)
    }
  }

  test("reads run containers (cookie 12347) from hand-laid bytes") {
    // one inner bitmap, one run container: runs [10..14] and [20..20]
    val bitmap = {
      val bb = ByteBuffer.allocate(4 + 1 + 4 + 2 + 2 * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, size-1=0
      bb.put(1.toByte) // run flag bitset: container 0 is a run
      bb.putShort(0).putShort(5) // key 0, cardinality-1 = 5
      // size < 4 => no offset header
      bb.putShort(2) // number of runs
      bb.putShort(10).putShort(4) // [10, 10+4]
      bb.putShort(20).putShort(0) // [20]
      bb.array()
    }
    val data = ByteBuffer.allocate(4 + 8 + 4 + bitmap.length)
      .order(ByteOrder.LITTLE_ENDIAN)
      .putInt(1681511377).putLong(1L).putInt(0).put(bitmap).array()
    assert(RoaringBitmapArray.deserialize(data).toSeq ==
      Seq(10L, 11L, 12L, 13L, 14L, 20L))
  }

  private def scratchDir(prefix: String): java.nio.file.Path = {
    val root = java.nio.file.Paths.get("target/tmp").toAbsolutePath
    Files.createDirectories(root)
    Files.createTempDirectory(root, prefix)
  }

  test("DV file framing: offsets line up, CRC validates, corruption refuses") {
    val dir = scratchDir("dv")
    val f = dir.resolve("deletion_vector_test.bin")
    val vs = Seq("a" -> Array(1L, 2L, 3L), "b" -> (0L until 5000L).toArray)
    val framed = DeltaDv.writeFile(f, vs)
    assert(framed("a").offset == 1) // right after the version byte
    vs.foreach { case (k, pos) =>
      val d = DeltaDv.Descriptor("p", f.toString,
        Some(framed(k).offset), framed(k).sizeInBytes, framed(k).cardinality)
      assert(DeltaDv.readPositions(dir, d).toSeq == pos.toSeq)
    }
    // flip one payload byte -> CRC refusal
    val bytes = Files.readAllBytes(f)
    bytes(framed("a").offset + 5) = (bytes(framed("a").offset + 5) ^ 1).toByte
    Files.write(f, bytes)
    val d = DeltaDv.Descriptor("p", f.toString,
      Some(framed("a").offset), framed("a").sizeInBytes, framed("a").cardinality)
    val e = intercept[IllegalArgumentException](DeltaDv.readPositions(dir, d))
    assert(e.getMessage.contains("CRC"))
  }

  test("inline storage round-trips through Z85") {
    val pos = Array(7L, 9L, 1L << 20)
    val data = RoaringBitmapArray.serialize(pos)
    val d = DeltaDv.Descriptor("i", Z85.encode(data), None, data.length,
      pos.length.toLong)
    assert(DeltaDv.readPositions(java.nio.file.Paths.get("."), d).toSeq ==
      pos.toSeq)
  }

  test("'u' storage resolves prefix + z85 uuid to the payload file") {
    val dir = scratchDir("dvu")
    val (pathOrInline, fileName) = DeltaDv.freshFileId()
    Files.createDirectories(dir.resolve("ab"))
    val pos = Array(0L, 42L)
    val framed = DeltaDv.writeFile(dir.resolve("ab").resolve(fileName),
      Seq("x" -> pos))
    val d = DeltaDv.Descriptor("u", "ab/" + pathOrInline,
      Some(framed("x").offset), framed("x").sizeInBytes, framed("x").cardinality)
    assert(DeltaDv.readPositions(dir, d).toSeq == pos.toSeq)
  }
}
