package graft.multimodal

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DHashSpec extends SparkSpec {
  import spark.implicits._

  private def png(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** 9x8 image whose pixel (x, y) gray level is `g(x, y)` — at that
    * exact size the dHash sampling grid IS the pixel grid, so expected
    * bits are hand-computable.
    */
  private def gridImage(g: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9) {
      val v = g(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    png(img)
  }

  test("dHash bits are the horizontal gradient signs, bit y*8+x") {
    // strictly increasing left-to-right -> every comparison true -> all
    // 64 bits set
    val inc = Multimodal.dhashOne(gridImage((x, _) => x * 20))
    assert(inc == -1L) // 0xFFFFFFFFFFFFFFFF
    // strictly decreasing -> no bits
    val dec = Multimodal.dhashOne(gridImage((x, _) => 255 - x * 20))
    assert(dec == 0L)
    // only row 3 increases at column 5: exactly bit 3*8+5
    val one = Multimodal.dhashOne(gridImage((x, y) =>
      if (y == 3 && x == 6) 200 else 100))
    assert(one == (1L << (3 * 8 + 5)))
  }

  test("gray pixels make BT.601 luma the identity (299+587+114 = 1000)") {
    // equal r=g=b=v gives luma (299v+587v+114v)/1000 = v exactly, so the
    // hand-built gray grids above feed the comparison untransformed;
    // a color pixel weights channels: pure red 200 -> 59, pure green
    // 200 -> 117 — green must dominate red under BT.601
    val img = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, if (x % 2 == 0) 200 << 16 else 200 << 8)
    val h = Multimodal.dhashOne(png(img))
    // red(59) -> green(117): rises at even x, falls at odd x
    val expectedRow = (0 until 8).map(x =>
      if (x % 2 == 0) 1L << x else 0L).sum
    val expected = (0 until 8).map(y => expectedRow << (y * 8)).sum
    assert(h == expected)
  }

  test("nearest-neighbor downsample replays by integer arithmetic") {
    // a 18x16 image (2x the grid) sampled at ((x*18)/9, (y*16)/8) =
    // (2x, 2y): plant values so sampled pixels differ from neighbors
    val img = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18) {
      // sampled lattice gets a gradient; off-lattice pixels get noise
      // that MUST NOT leak into the hash
      val v = if (x % 2 == 0 && y % 2 == 0) (x / 2) * 10 else 255
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(Multimodal.dhashOne(png(img)) == -1L) // pure rising gradient
  }

  test("identical images collide; a one-cell edit moves few bits") {
    val base = gridImage((x, _) => x * 10)
    val edit = gridImage((x, y) => if (y == 7 && x == 4) 0 else x * 10)
    val a = Multimodal.dhashOne(base)
    val b = Multimodal.dhashOne(edit)
    assert(a == Multimodal.dhashOne(gridImage((x, _) => x * 10)))
    val ham = java.lang.Long.bitCount(a ^ b)
    assert(ham >= 1 && ham <= 2, s"one-cell edit moved $ham bits")
  }

  test("null and undecodable payloads hash to null") {
    assert(Multimodal.dhashOne(null) == null)
    assert(Multimodal.dhashOne("not a png".getBytes) == null)
  }

  test("imageNearDupPairs: pigeonhole band join finds hamming<=3 pairs " +
      "and never invents one") {
    // four images: two identical (ham 0), one single-bit edit of the
    // pair (ham<=2), one completely different (all-bits distance)
    val base = gridImage((x, _) => x * 10)
    val twin = gridImage((x, _) => x * 10)
    val edit = gridImage((x, y) => if (y == 7 && x == 4) 0 else x * 10)
    val far = gridImage((x, _) => 255 - x * 10)
    val df = Seq((1L, base), (2L, twin), (3L, edit), (4L, far))
      .toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(df, "media_id", "content",
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hamEdit = java.lang.Long.bitCount(
      Multimodal.dhashOne(base) ^ Multimodal.dhashOne(edit))
    val expected =
      if (hamEdit <= 3) Set((1L, 2L, 0), (1L, 3L, hamEdit), (2L, 3L, hamEdit))
      else Set((1L, 2L, 0))
    assert(pairs == expected)
  }

  test("null-hash rows never pair") {
    val good = gridImage((x, _) => x * 10)
    val df = Seq((1L, good), (2L, good),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(df, "media_id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("withImageDHash appends the column and keeps every row") {
    val good = gridImage((x, _) => x * 10)
    val df = Seq((1L, good), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "content")
    val out = Multimodal.withImageDHash(df, "content")
    assert(out.columns.toSeq == Seq("media_id", "content", "dhash"))
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(!rows(0).isNullAt(2) && rows(1).isNullAt(2))
  }
}
