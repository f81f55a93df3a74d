package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Leg-by-leg attribution of the round-18 hot queries
  * (`quality_mkn5_arpa`, `lang_id_trained`) — the ProfileStateStore /
  * ProfileIntervalJoin discipline: measure, don't guess.
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def sink(df: DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    val docsAll = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- quality_mkn5_arpa legs ----
    val base = "/root/repo/target/tmp/profile_mkn5_arpa"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    val docs = graft.operators.Sampling.hashSample(docsAll,
      Seq("doc_id"), 1, 20, seed = 7L, portable = true)
    println(s"[profile] sample docs = ${docs.count()}")
    val fit = timed("fitMknModel(5%, order 5)") {
      graft.text.VocabStats.fitMknModel(docs, "text", order = 5)
    }
    println(s"[profile] model rows = ${fit.count()}")
    timed("fit.write.parquet") { fit.write.parquet(s"$base/model") }
    fit.unpersist()
    val served = spark.read.parquet(s"$base/model")
    val arpa = timed("fromMknModel sections (count)") {
      val a = graft.text.Arpa.fromMknModel(served, order = 5).persist()
      println(s"[profile] arpa rows = ${a.count()}")
      a
    }
    timed("Arpa.write (sort + stream)") {
      graft.text.Arpa.write(arpa, s"$base/model.arpa")
    }
    val back = graft.text.Arpa.read(spark, s"$base/model.arpa")
    timed("sig(arpa) from cache") {
      arpa.agg(count(lit(1))).collect()
    }
    timed("sig(back) parse file") {
      back.agg(count(lit(1))).collect()
    }
    arpa.unpersist()
    timed("mknNllFromModel serve (sample)") {
      sink(graft.text.VocabStats.mknNllFromModel(served, docs,
        "doc_id", "text", order = 5))
    }

    // ---- quality_mkn5_from_model legs (full corpus) ----
    val base2 = "/root/repo/target/tmp/profile_mkn5_full"
    rm(new java.io.File(base2))
    val fitF = timed("fitMknModel(full, order 5)") {
      graft.text.VocabStats.fitMknModel(docsAll, "text", order = 5)
    }
    timed("full fit.count (cache-hit probe)") {
      println(s"[profile] full model rows = ${fitF.count()}")
    }
    timed("full fit.count again") { fitF.count() }
    timed("full fit.write.parquet") { fitF.write.parquet(s"$base2/model") }
    timed("full fit.unpersist") { fitF.unpersist(blocking = true) }
    val servedF = spark.read.parquet(s"$base2/model")
    timed("full mknNllFromModel serve") {
      sink(graft.text.VocabStats.mknNllFromModel(servedF, docsAll,
        "doc_id", "text", order = 5))
    }
    timed("full serve again (warm)") {
      sink(graft.text.VocabStats.mknNllFromModel(servedF, docsAll,
        "doc_id", "text", order = 5))
    }

    // ---- lang_id_trained legs ----
    val tf = docsAll.select(col("doc_id"),
        explode(graft.text.LangId.hashedCharNgrams(col("text"),
          Seq(2, 3), 4096, "5")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    timed("tokenize + tf aggregate alone") {
      println(s"[profile] tf rows = ${tf.count()}")
    }
    timed("LangId.trained full") {
      sink(graft.text.LangId.trained(docsAll, "doc_id", "text", "lang"))
    }
    timed("LangId.trained again (warm)") {
      sink(graft.text.LangId.trained(docsAll, "doc_id", "text", "lang"))
    }
    spark.stop()
  }
}
