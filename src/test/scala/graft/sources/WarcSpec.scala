package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WarcSpec extends SparkSpec {

  private def rec(i: Int, body: String,
                  tpe: String = "resource") = Warc.Record(
    warcType = tpe,
    recordId = s"<urn:uuid:00000000-0000-0000-0000-${"%012d".format(i)}>",
    targetUri = if (tpe == "warcinfo") "" else s"http://example.org/doc/$i",
    warcDate = "2024-01-01T00:00:00Z",
    contentType = if (tpe == "warcinfo") "application/warc-fields"
      else "text/plain",
    payload = body.getBytes("UTF-8"))

  private val records = Seq(
    rec(0, "software: graft-warc-writer\r\n", tpe = "warcinfo"),
    rec(1, "hello warc world"),
    rec(2, "second document body, a bit longer than the first"),
    rec(3, "")) // zero-length payload is legal

  test("byte round-trip: plain and per-record-gzip parse identically") {
    for (gz <- Seq(false, true)) {
      val got = Warc.parseAll(Warc.toBytes(records, gzipPerRecord = gz))
      assert(got.size == records.size, s"gz=$gz")
      got.zip(records).foreach { case (g, w) =>
        assert(g.warcType == w.warcType && g.recordId == w.recordId &&
          g.targetUri == w.targetUri && g.contentType == w.contentType,
          s"gz=$gz header mismatch on ${w.recordId}")
        assert(java.util.Arrays.equals(g.payload, w.payload),
          s"gz=$gz payload mismatch on ${w.recordId}")
      }
    }
  }

  test("gzip layout is per-record multi-member (skippable), not one stream") {
    val bytes = Warc.toBytes(records, gzipPerRecord = true)
    // count gzip magic headers: one member per record
    val magics = bytes.sliding(2).count(a =>
      (a(0) & 0xff) == 0x1f && (a(1) & 0xff) == 0x8b)
    assert(magics == records.size,
      s"expected ${records.size} gzip members, found $magics")
  }

  test("LF-only headers and a missing final separator still parse") {
    val strict = new String(Warc.toBytes(Seq(rec(1, "lf tolerant body"))),
      "ISO-8859-1")
    val lfOnly = strict.replace("\r\n", "\n")
      .stripSuffix("\n\n") // drop the record separator entirely
    val got = Warc.parseAll(lfOnly.getBytes("ISO-8859-1"))
    assert(got.size == 1)
    assert(new String(got.head.payload, "UTF-8") == "lf tolerant body")
  }

  test("WET-shaped conversion records (the Common Crawl extracted-text " +
      "layout) round-trip like any other type") {
    val wet = Seq(
      rec(0, "software: wet-extractor\r\n", tpe = "warcinfo"),
      rec(1, "Extracted plain text of page one.", tpe = "conversion"),
      rec(2, "Extracted plain text of page two.", tpe = "conversion"))
    val got = Warc.parseAll(Warc.toBytes(wet, gzipPerRecord = true))
    assert(got.map(_.warcType) == Seq("warcinfo", "conversion", "conversion"))
    assert(new String(got(1).payload, "UTF-8")
      == "Extracted plain text of page one.")
  }

  test("exportWet/exportWat: the distributed WET and WAT siblings — " +
      "conversion text equals the in-plan kernel extraction, WAT JSON " +
      "carries the envelope URI and the page's outlinks") {
    import spark.implicits._
    val dir = "target/tmp/warc_spec_wetwat"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(dir))
    val pages = Seq(
      ("http://x.org/p/1",
        """<html><body><h1>One</h1><p>alpha beta</p>""" +
          """<a href="/p/2">next</a><script>x()</script></body></html>"""),
      ("http://x.org/p/2",
        """<html><body><p>gamma &amp; delta</p></body></html>"""))
      .toDF("uri", "html")
    Warc.exportWet(pages, "uri", "html", s"$dir/wet")
    Warc.exportWat(pages, "uri", "html", s"$dir/wat")
    val wet = Warc.read(spark, s"$dir/wet/*.warc*")
      .select("warc_type", "content_type", "target_uri", "payload")
      .collect().map(r => r.getString(2) ->
        (r.getString(0), r.getString(1),
          new String(r.getAs[Array[Byte]](3), "UTF-8"))).toMap
    assert(wet("http://x.org/p/1") ==
      ("conversion", "text/plain", "One alpha beta next"))
    assert(wet("http://x.org/p/2") ==
      ("conversion", "text/plain", "gamma & delta"))
    val wat = Warc.read(spark, s"$dir/wat/*.warc*")
      .select("warc_type", "content_type", "target_uri", "payload")
      .collect().map(r => r.getString(2) ->
        (r.getString(0), r.getString(1),
          new String(r.getAs[Array[Byte]](3), "UTF-8"))).toMap
    val (t1, ct1, j1) = wat("http://x.org/p/1")
    assert(t1 == "metadata" && ct1 == "application/json")
    assert(j1.contains("\"WARC-Target-URI\":\"http://x.org/p/1\""))
    assert(j1.contains("\"url\":\"/p/2\"") && j1.contains("\"text\":\"next\""))
    val (_, _, j2) = wat("http://x.org/p/2")
    assert(j2.contains("\"Links\":[]"), s"no links on page 2: $j2")
  }

  test("read: file-per-task DataFrame surfaces every record of both " +
      "layouts; payload bytes survive") {
    val dir = "target/tmp/warc_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(dir))
    Warc.writeFile(s"$dir/a.warc", records)
    Warc.writeFile(s"$dir/b.warc.gz", records.map(r =>
      r.copy(recordId = r.recordId.replace("0000-0000-0000", "0000-0000-1111"))),
      gzipPerRecord = true)
    val df = Warc.read(spark, s"$dir/*.warc*")
    assert(df.count() == records.size * 2L)
    val byType = df.groupBy("warc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("warcinfo" -> 2L, "resource" -> 6L))
    val body1 = df.filter(col("target_uri") === "http://example.org/doc/1")
      .select(col("payload").cast("string")).collect().map(_.getString(0))
    assert(body1.toSeq == Seq("hello warc world", "hello warc world"))
    // distribution: the plan carries no shuffle — files are the
    // parallelism unit, records flatten map-side
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "WARC read must not shuffle")
  }
}
