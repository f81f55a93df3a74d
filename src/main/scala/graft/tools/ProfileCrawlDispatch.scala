package graft.tools
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Leg + job-count profile of the crawl_dispatch composition (VERDICT
  * r21 Next #3): links build, the 8-iteration PageRank, freshOrder,
  * and the dispatchOrder range-sort+zipWithIndex — each leg timed
  * through the noop sink with listener job/stage counts, so "what
  * dominates" is attributable independent of the window.
  */
object ProfileCrawlDispatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0); val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
    })
    def timed(name: String)(f: => Unit): Unit = {
      Thread.sleep(300)
      val j0 = jobs.get; val s0 = stages.get; val t0 = System.nanoTime()
      f
      Thread.sleep(300)
      println(f"$name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.limit(1).collect()
    (1 to 2).foreach { r =>
      println(s"--- rep $r")
      // mirrors the declared query's construction (SparkEntry)
      import org.apache.spark.sql.functions._
      val page = concat(
        lit("<html><body><p>seed</p>"),
        lit("<a href=\"https://site-"), (col("doc_id") * 7 + 3) % 101,
        lit(".com/p/"), col("doc_id"), lit("\">next</a>"),
        when(col("doc_id") % 3 === 0,
          concat(lit("<a href='https://site-"), (col("doc_id") + 50) % 101,
            lit(".com/q'>partner</a>"))).otherwise(lit("")),
        lit("<a href=https://cdn-"), col("doc_id") % 13,
        lit(".net/asset.js>cdn</a>"),
        lit("</body></html>"))
      val links = docs
        .select(concat(lit("site-"), col("doc_id") % 101, lit(".com"))
          .as("src"),
          explode(graft.plans.expressions.html_links(page)).as("__l"))
        .select(col("src"),
          graft.plans.expressions.registrable_domain(col("__l.href")).as("dst"))
      timed("links (noop)") {
        links.write.format("noop").mode("overwrite").save()
      }
      var ranks: org.apache.spark.sql.DataFrame = null
      timed("pagerank 8 iters") {
        ranks = graft.operators.PageRank.ranks(links, "src", "dst", 8)
        ranks.write.format("noop").mode("overwrite").save()
      }
      val urls = docs.select(col("doc_id"),
        concat(lit("https://site-"), col("doc_id") % 101, lit(".com/p/"),
          col("doc_id")).as("url"),
        concat(lit("site-"), col("doc_id") % 101, lit(".com")).as("domain"),
        when(col("doc_id") % 11 === 0, lit(null).cast("date"))
          .otherwise(to_date(concat(lit("2024-01-"),
            lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"))))
          .as("lastmod"))
      var fresh: org.apache.spark.sql.DataFrame = null
      timed("freshOrder (noop)") {
        fresh = graft.operators.Frontier.freshOrder(
          urls.join(ranks.select(col("node").as("domain"), col("rank_fp")),
            Seq("domain")),
          "url", "domain", "lastmod", "rank_fp", asOf = "2024-02-15")
        fresh.write.format("noop").mode("overwrite").save()
      }
      timed("dispatchOrder (noop)") {
        graft.operators.Frontier.dispatchOrder(fresh, "fresh_score", "url",
            shards = 8)
          .select(col("doc_id"), col("domain"), col("fresh_score"),
            col("dispatch_order"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.operators.PageRank.release(ranks)
    }
    spark.stop()
  }
}
