package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{AhoCorasick, ExprKernels}

/** Kernel-level timing of the blocklist phrase scan: the Aho-Corasick
  * automaton pass vs the per-phrase `indexOf` reference, at realistic
  * blocklist sizes (a public list like LDNOOBW-en is ~400 entries).
  * Pure per-row kernels, so this times exactly the part that runs per
  * corpus row at scale; both paths also cross-check hit totals.
  */
object ProfileBlocklist {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(r =>
        UTF8String.fromString(if (r.isNullAt(0)) "" else r.getString(0)))
    println(s"${texts.length} documents, " +
      s"${texts.map(_.numChars().toLong).sum} chars")

    // phrase lists built from corpus vocabulary so some entries DO hit
    val vocab = Array("the", "fast", "key", "dup", "merge", "batch",
      "line", "small", "join", "order", "scan", "shuffle")
    // vocab^3 index split keeps every phrase distinct up to 1728
    def phrases(p: Int): Array[String] =
      (0 until p).map { i =>
        val a = vocab(i % 12)
        val b = vocab((i / 12) % 12)
        val c = vocab((i / 144) % 12)
        if (i % 3 == 0) s"$a $b" else s"$a $b $c"
      }.distinct.toArray
    val empty = new java.util.HashSet[String]()

    def time(f: UTF8String => Long): (Double, Long) = {
      var best = Double.MaxValue
      var total = 0L
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        total = 0L
        texts.foreach(t => total += f(t))
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, total)
    }
    for (p <- Seq(2, 8, 64, 400)) {
      val ph = phrases(p)
      val ac = new AhoCorasick(ph)
      // full warm pass on both paths before timing
      texts.foreach { t =>
        ExprKernels.blocklistHits(t, empty, ac)
        ExprKernels.blocklistHitsScan(t, empty, ph)
      }
      val (tAc, hAc) = time(ExprKernels.blocklistHits(_, empty, ac))
      val (tBr, hBr) = time(ExprKernels.blocklistHitsScan(_, empty, ph))
      require(hAc == hBr, s"hit mismatch at P=${ph.length}: $hAc vs $hBr")
      println(f"P=${ph.length}%4d  automaton ${tAc}%6.3f s   " +
        f"indexOf ${tBr}%6.3f s   speedup ${tBr / tAc}%5.2fx   hits=$hAc")
    }
    spark.stop()
  }
}
