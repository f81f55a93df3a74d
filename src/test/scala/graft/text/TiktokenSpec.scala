package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TiktokenSpec extends SparkSpec {
  import spark.implicits._

  private def segments(s: String): Seq[String] = {
    val p = java.util.regex.Pattern.compile(Tiktoken.Cl100kPattern,
      java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)
    val m = p.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  test("cl100k regex: published behaviors — case-insensitive contractions, " +
      "3-digit number chunks, bare-space token before digits") {
    assert(segments("I'M here 123456") ==
      Seq("I", "'M", " here", " ", "123", "456"))
    // gpt2's regex keeps number runs whole and contractions case-SENSITIVE
    assert(Gpt2Bpe.preTokenize("I'M here 123456") ==
      Seq("I", "'", "M", " here", " 123456"))
  }

  test("cl100k regex tiles every string (no char lost or doubled)") {
    val cases = Seq("I'M here 123456", "a  b\n\ncafé ☕ 42!", "", "   ",
      "emoji 😀 tail", "x\r\ny")
    cases.foreach { s =>
      assert(segments(s).mkString == s, s"regex does not tile '$s'")
    }
  }

  test("fromGpt2 parity: rank-table encode equals merges-list encode, " +
      "decode lossless") {
    val d = Seq(
      "the fast key order keeps the merge deterministic",
      "café ☕ non-bmp 😀 bytes split across units",
      "numbers 12345 and symbols !!! mix").toDF("text")
    val gpt2 = Gpt2Bpe.fit(d, "text", numMerges = 40)
    val table = Tiktoken.fromGpt2(gpt2)
    d.collect().map(_.getString(0)).foreach { t =>
      val viaMerges = Gpt2Bpe.encodeIds(t, gpt2.ranks, gpt2.ids).toSeq
      val viaRanks = Tiktoken.encodeIds(t, table.ids, table.compiled).toSeq
      assert(viaRanks == viaMerges, s"encode diverges on '$t'")
      assert(Tiktoken.decode(viaRanks, table) == t, s"decode loses '$t'")
    }
  }

  test(".tiktoken export/load round-trip preserves ranks byte-exactly") {
    val d = Seq("café byte pairs across utf8 boundaries é é é").toDF("text")
    val table = Tiktoken.fromGpt2(Gpt2Bpe.fit(d, "text", numMerges = 20))
    val reloaded = Tiktoken.load(Tiktoken.export(table),
      pattern = Tiktoken.Gpt2Pattern)
    assert(reloaded.ranks == table.ranks)
    // a second export is byte-identical (stable format)
    assert(Tiktoken.export(reloaded) == Tiktoken.export(table))
  }

  test("load accepts the published line format and validates byte coverage") {
    // tiny synthetic table: all 256 single bytes at ranks 0..255 in the
    // GPT-2 vocab order, plus one merged token "ab" at 256
    val b64 = java.util.Base64.getEncoder
    val units = (0 until 256).map { i =>
      val unit = Gpt2Bpe.byteUnitsInVocabOrder(i)
      val raw = Array(Gpt2Bpe.charToByte(unit.charAt(0).toInt).toByte)
      s"${b64.encodeToString(raw)} $i"
    }
    val content = (units :+ s"${b64.encodeToString("ab".getBytes)} 256")
      .mkString("\n")
    val table = Tiktoken.load(content)
    val ids = Tiktoken.encodeIds("ab ab", table.ids, table.compiled).toSeq
    assert(ids.length == 3, s"'ab' must merge to one token: $ids")
    assert(ids.head == 256 && ids.last == 256)
    assert(Tiktoken.decode(ids, table) == "ab ab")
    // dropping a byte line must be rejected
    val broken = units.tail.mkString("\n")
    val err = intercept[IllegalArgumentException](Tiktoken.load(broken))
    assert(err.getMessage.contains("missing single-byte token"))
  }

  test("column encode runs under codegen and matches the driver loop") {
    val d = Seq((1L, "the fast key"), (2L, "café 😀 42")).toDF("id", "text")
    val table = Tiktoken.fromGpt2(Gpt2Bpe.fit(d, "text", numMerges = 15))
    val viaCol = d.select(col("id"),
        Tiktoken.encode(col("text"), table).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    d.collect().foreach { r =>
      val want = Tiktoken.encodeIds(r.getString(1), table.ids,
        table.compiled).toSeq
      assert(viaCol(r.getLong(0)) == want)
    }
  }
}
