package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sitemap.xml source and sink (the public sitemaps.org protocol — the
  * crawl frontier's SEED channel alongside outlink discovery: real
  * crawlers bootstrap from `<urlset>` page lists and follow
  * `<sitemapindex>` shard indirections, both plain and gzip).
  *
  * [[export]] writes one `<urlset>` shard per partition (`.xml`, or
  * `.xml.gz` — the protocol's gzip variant) through the Hadoop
  * filesystem of `dir`, records streaming out as the partition iterator
  * drains; [[writeIndex]] adds the `<sitemapindex>` shard listing (one
  * driver-side file over the shard NAMES — index size is shard count,
  * not corpus size). [[read]] lists files via `binaryFile` (path-pruned,
  * bytes unread at the listing stage), gunzips by magic per task, and
  * parses through the same codegen kernel the column API exposes
  * (`graft_sitemap_entries` / [[graft.plans.SitemapEntries]]) — one
  * task per file, nothing shuffles.
  */
object Sitemap {

  private def xmlEscape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Export `(loc, lastmod)` rows as one `<urlset>` shard per
    * partition. `lastmodCol = None` omits the tag (it is optional in
    * the protocol); `gzip` picks the `.xml.gz` variant.
    */
  def export(df: DataFrame, locCol: String, lastmodCol: Option[String],
             dir: String, gzip: Boolean = false): Unit = {
    val ext = if (gzip) ".xml.gz" else ".xml"
    val hconf = SerializableHadoopConf.from(df.sparkSession)
    val cols = col(locCol).cast("string").as("l") +:
      lastmodCol.map(c => col(c).cast("string").as("m")).toSeq
    df.select(cols: _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = new org.apache.hadoop.fs.Path(
            f"$dir/sitemap-$pid%05d$ext")
          val fs = path.getFileSystem(hconf.value)
          val raw: java.io.OutputStream =
            new java.io.BufferedOutputStream(fs.create(path, true), 1 << 16)
          val out = new java.io.OutputStreamWriter(
            if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw,
            java.nio.charset.StandardCharsets.UTF_8)
          try {
            out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
            out.write("<urlset xmlns=\"http://www.sitemaps.org/" +
              "schemas/sitemap/0.9\">\n")
            it.foreach { r =>
              out.write("<url><loc>")
              out.write(xmlEscape(r.getString(0)))
              out.write("</loc>")
              if (r.length > 1 && !r.isNullAt(1)) {
                out.write("<lastmod>")
                out.write(xmlEscape(r.getString(1)))
                out.write("</lastmod>")
              }
              out.write("</url>\n")
            }
            out.write("</urlset>\n")
          } finally out.close()
        }
      }
  }

  /** Write `dir/sitemap_index.xml` listing every exported shard under
    * `baseUrl` — the `<sitemapindex>` indirection. Driver-side over the
    * shard LISTING (size = shard count).
    */
  def writeIndex(spark: SparkSession, dir: String, baseUrl: String,
                 lastmod: Option[String] = None): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs.listStatus(dirPath).map(_.getPath.getName)
      .filter(n => n.startsWith("sitemap-") &&
        (n.endsWith(".xml") || n.endsWith(".xml.gz"))).sorted
    val out = new java.io.OutputStreamWriter(
      fs.create(new org.apache.hadoop.fs.Path(dir, "sitemap_index.xml"),
        true), java.nio.charset.StandardCharsets.UTF_8)
    try {
      out.write("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
      out.write("<sitemapindex xmlns=\"http://www.sitemaps.org/" +
        "schemas/sitemap/0.9\">\n")
      shards.foreach { n =>
        out.write("<sitemap><loc>")
        out.write(xmlEscape(s"${baseUrl.stripSuffix("/")}/$n"))
        out.write("</loc>")
        lastmod.foreach(m =>
          out.write(s"<lastmod>${xmlEscape(m)}</lastmod>"))
        out.write("</sitemap>\n")
      }
      out.write("</sitemapindex>\n")
    } finally out.close()
  }

  /** Read sitemap / sitemap-index files under `pathGlob` into
    * `(sitemap_file, kind, loc, lastmod)` — `kind` is `url` for page
    * entries and `sitemap` for index indirections.
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("sitemap_file", StringType, nullable = false),
      StructField("xml", StringType, nullable = false)))
    val enc = RowEncoder.encoderFor(schema)
    val hconf = SerializableHadoopConf.from(spark)
    val texts = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"))
      .mapPartitions { it =>
        it.map { r =>
          val pathStr = r.getString(0)
          val path = new org.apache.hadoop.fs.Path(pathStr)
          val fs = path.getFileSystem(hconf.value)
          val in = new java.io.BufferedInputStream(fs.open(path), 1 << 16)
          try {
            in.mark(2)
            val h1 = in.read(); val h2 = in.read()
            in.reset()
            val src: java.io.InputStream =
              if (h1 == 0x1f && h2 == 0x8b)
                new java.util.zip.GZIPInputStream(in)
              else in
            val buf = new java.io.ByteArrayOutputStream(1 << 16)
            val chunk = new Array[Byte](1 << 16)
            var n = src.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = src.read(chunk) }
            Row(pathStr, new String(buf.toByteArray,
              java.nio.charset.StandardCharsets.UTF_8))
          } finally in.close()
        }
      }(enc)
    texts
      .select(col("sitemap_file"),
        explode(graft.plans.expressions.sitemap_entries(col("xml")))
          .as("__e"))
      .select(col("sitemap_file"), col("__e.kind").as("kind"),
        col("__e.loc").as("loc"), col("__e.lastmod").as("lastmod"))
  }
}
