package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  private def entries(xml: String): Seq[(String, Option[String], String)] =
    Seq(xml).toDF("x")
      .select(explode(graft.plans.expressions.sitemap_entries(col("x")))
        .as("e"))
      .select("e.loc", "e.lastmod", "e.kind")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getString(1)),
        r.getString(2))).toSeq

  test("urlset entries parse with optional lastmod; <urlset> itself " +
       "never matches as an entry; loc-less entries skip") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://x.org/a</loc><lastmod>2024-01-02</lastmod></url>
        |<url><loc> https://x.org/b?p=1&amp;q=2 </loc></url>
        |<url><priority>0.5</priority></url>
        |</urlset>""".stripMargin
    assert(entries(xml) == Seq(
      ("https://x.org/a", Some("2024-01-02"), "url"),
      ("https://x.org/b?p=1&q=2", None, "url")))
  }

  test("sitemapindex entries parse as kind 'sitemap'; <sitemapindex> " +
       "itself never matches") {
    val xml =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://x.org/maps/s1.xml.gz</loc>
        |<lastmod>2024-02-01</lastmod></sitemap>
        |<sitemap><loc>https://x.org/maps/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(entries(xml) == Seq(
      ("https://x.org/maps/s1.xml.gz", Some("2024-02-01"), "sitemap"),
      ("https://x.org/maps/s2.xml", None, "sitemap")))
  }

  test("SQL registration parity and interpreted-vs-codegen agreement") {
    val xml = "<urlset><url><loc>https://s.ql/1</loc></url></urlset>"
    Seq(xml).toDF("x").createOrReplaceTempView("__sm_probe")
    val viaSql = spark.sql(
      "SELECT e.loc, e.kind FROM __sm_probe " +
        "LATERAL VIEW explode(graft_sitemap_entries(x)) t AS e").head()
    assert((viaSql.getString(0), viaSql.getString(1)) ==
      ("https://s.ql/1", "url"))
    val interp = graft.plans.SitemapEntries(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(xml)))
      .eval(null)
    assert(interp.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].numElements() == 1)
  }

  test("export -> read round-trips both layouts; the index lists every " +
       "shard; gzip shards gunzip transparently") {
    val dir = "target/tmp/sitemap_spec"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(dir))
    val rows = (1L to 20L).map(i =>
      (s"https://site-${i % 3}.org/p/$i?a=1&b=2", f"2024-03-$i%02d"))
      .toDF("loc", "lastmod")
    Sitemap.export(rows.filter(col("lastmod") < "2024-03-11")
      .repartition(2), "loc", Some("lastmod"), dir)
    Sitemap.export(rows.filter(col("lastmod") >= "2024-03-11")
      .repartition(2), "loc", Some("lastmod"), dir, gzip = true)
    Sitemap.writeIndex(spark, dir, "https://site.local/maps",
      lastmod = Some("2024-04-01"))
    val back = Sitemap.read(spark, s"$dir/sitemap*").cache()
    val urls = back.filter(col("kind") === "url")
      .select("loc", "lastmod").as[(String, String)].collect().toSet
    assert(urls == rows.as[(String, String)].collect().toSet,
      "every loc/lastmod (including & in query strings) must round-trip")
    val gzUrls = back.filter(col("kind") === "url" &&
      col("sitemap_file").endsWith(".xml.gz")).count()
    assert(gzUrls == 10L, "the gzip shards must carry their half")
    val idx = back.filter(col("kind") === "sitemap")
      .select("loc", "lastmod").as[(String, String)].collect().toSeq
    val shards = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("sitemap-")).sorted.toSeq
    assert(idx.map(_._1) ==
      shards.map(n => s"https://site.local/maps/$n"),
      "the index must list every shard in name order")
    assert(idx.forall(_._2 == "2024-04-01"))
    back.unpersist()
    ()
  }
}
