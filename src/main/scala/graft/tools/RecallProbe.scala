package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.{IvfIndex, Similarity}
import graft.text.MinHashDedup

/** Measures the recall of every approximate path against its exact
  * baseline on the synthetic testdata — the evidence behind the declared
  * query parameters and the recall-gate thresholds in the specs.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // ---- minhash word-shingle pairs: exact vs LSH candidates ----------
    val hashed = docs.select(col("doc_id").as("__id"),
      graft.plans.expressions.shingle_hashes(col("text"), 3).as("__hh"))
    def exactJaccardPairs(h: DataFrame, threshold: Double): DataFrame = {
      val a = h.select(col("__id").as("id_a"), col("__hh").as("__ha"))
      val b = h.select(col("__id").as("id_b"), col("__hh").as("__hb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("j", size(array_intersect(col("__ha"), col("__hb"))).cast("double") /
          size(array_union(col("__ha"), col("__hb"))))
        .filter(col("j") >= threshold)
        .select("id_a", "id_b")
    }
    val exactMh = pairSet(exactJaccardPairs(hashed, 0.5))
    for (bands <- Seq(16, 32)) {
      val got = pairSet(
        MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.5,
          numHashes = 64, bands = bands))
      val miss = exactMh -- got
      println(s"[minhash t=0.5 bands=$bands] exact=${exactMh.size} got=${got.size} missed=${miss.size} ${miss.take(5)}")
    }

    // ---- containment pairs: rare-shingle candidates vs all-pairs ------
    // (a missed pair requires EVERY shared shingle above the df cut)
    val exactCont = pairSet(
      hashed.select(col("__id").as("id_a"), col("__hh").as("__ha"))
        .join(hashed.select(col("__id").as("id_b"), col("__hh").as("__hb")),
          col("id_a") < col("id_b"))
        .withColumn("c", graft.plans.expressions.hash_containment(
          col("__ha"), col("__hb")))
        .filter(col("c") >= 0.9).select("id_a", "id_b"))
    for (maxDf <- Seq(16, 64)) {
      val got = pairSet(MinHashDedup.containmentPairs(
        docs, "doc_id", "text", threshold = 0.9, maxDf = maxDf))
      val miss = exactCont -- got
      println(s"[containment t=0.9 maxDf=$maxDf] exact=${exactCont.size} " +
        s"got=${got.size} missed=${miss.size} ${miss.take(5)}")
    }

    // ---- char-5-gram pairs: exact vs LSH (t=0.7) ----------------------
    val ngHashed = docs.select(col("doc_id").as("__id"),
      graft.plans.expressions.char_ngram_hashes(col("text"), 5).as("__hh"))
    val exactNg = pairSet(exactJaccardPairs(ngHashed, 0.7))
    for (bands <- Seq(8, 16, 32)) {
      val got = pairSet(
        MinHashDedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.7,
          numHashes = 64, bands = bands, charNgram = 5))
      val miss = exactNg -- got
      println(s"[ngram t=0.7 bands=$bands] exact=${exactNg.size} got=${got.size} missed=${miss.size}")
    }

    // ---- simhash dedup: pigeonhole join vs exact all-pairs ------------
    val sh = docs.select(col("doc_id"),
      graft.text.SimHashDedup.simHash64(col("text")).as("__sh"))
    val exactSimhashLosers = {
      val a = sh.select(col("doc_id").as("id_a"), col("__sh").as("sa"))
      val b = sh.select(col("doc_id").as("id_b"), col("__sh").as("sb"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
        .select(col("id_b")).distinct().collect().map(_.getLong(0)).toSet
    }
    val pigeonKept = graft.text.SimHashDedup.dedup(docs, "doc_id", "text", maxDist = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val allIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val pigeonLosers = allIds -- pigeonKept
    println(s"[simhash d<=3] exactLosers=${exactSimhashLosers.size} pigeonLosers=${pigeonLosers.size} equal=${exactSimhashLosers == pigeonLosers}")

    // ---- embedding near-dup pairs: exact vs multi-table LSH -----------
    val exactEmb = pairSet(Similarity.exactNearDupPairs(emb, "vec_id", "embedding", 0.25))
    for ((nbits, tables) <- Seq((4, 16), (4, 24), (4, 32), (3, 16))) {
      val got = pairSet(Similarity.nearDupPairs(emb, "vec_id", "embedding",
        dim = 64, threshold = 0.25, nbits = nbits, tables = tables))
      println(s"[embdup t=0.25 nbits=$nbits tables=$tables] exact=${exactEmb.size} got=${got.size} recall=${if (exactEmb.isEmpty) 1.0 else got.intersect(exactEmb).size.toDouble / exactEmb.size}")
    }

    // ---- lsh top-k recall@10 vs brute force ---------------------------
    val queries = emb.filter(col("vec_id") < 5)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactTopk = topkSet(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    for ((nbits, probes, tables) <- Seq((4, 4, 8), (4, 4, 4), (6, 6, 8), (6, 6, 16))) {
      val got = topkSet(Similarity.lshTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", dim = 64, k = 10,
        nbits = nbits, probes = probes, tables = tables))
      val rec = got.intersect(exactTopk).size.toDouble / exactTopk.size
      println(s"[lshTopK nbits=$nbits probes=$probes tables=$tables] recall@10=$rec")
    }

    // ---- ivf top-k recall@10 vs brute force ---------------------------
    for ((k, nprobe) <- Seq((8, 2), (8, 3), (8, 4), (16, 4))) {
      val model = IvfIndex.fit(emb, "embedding", k = k)
      val got = topkSet(IvfIndex.topK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", model, k = 10, nprobe = nprobe))
      val rec = got.intersect(exactTopk).size.toDouble / exactTopk.size
      println(s"[ivfTopK k=$k nprobe=$nprobe] recall@10=$rec")
    }

    spark.stop()
  }
}
