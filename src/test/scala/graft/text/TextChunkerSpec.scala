package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextChunkerSpec extends SparkSpec {
  import spark.implicits._

  test("chunking windows overlap and cover every token") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = TextChunker.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 40, overlap = 10)
      .orderBy("chunk_id").collect()
    // stride 30, ceil((100-10)/30) = 3 chunks starting at tokens 1, 31, 61
    assert(out.length == 3)
    assert(out(0).getString(2).startsWith("w1 ") && out(0).getLong(3) == 40)
    assert(out(1).getString(2).startsWith("w31 "))
    assert(out(2).getString(2).startsWith("w61 ") && out(2).getLong(3) == 40)
    // overlap: chunk 0 ends with the 10 tokens chunk 1 starts with
    assert(out(0).getString(2).endsWith("w40") && out(1).getString(2).contains("w40"))
    // coverage: every token appears in some chunk
    val all = out.flatMap(_.getString(2).split(" ")).toSet
    assert(all == (1 to 100).map(i => s"w$i").toSet)
  }

  test("chunking edge cases: empty, whitespace-only, shorter than one window") {
    val df = Seq((1L, ""), (2L, "   \t "), (3L, "only four tiny tokens"))
      .toDF("doc_id", "text")
    val out = TextChunker.chunk(df, "doc_id", "text", maxTokens = 40, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq == Seq((3L, 0, "only four tiny tokens")))
  }

  test("token-budget shards fill the budget and overflow by at most one document") {
    val docs = (1 to 300).map(i => (i.toLong, 10L + (i % 23))).toDF("id", "n")
    val out = TextChunker.shardByTokenBudget(docs, "id", "n",
      capacity = 100, groups = 4)
    val shards = out.groupBy("pack_id")
      .agg(sum("n").as("total"), max("n").as("maxdoc"), count(lit(1)).as("cnt"))
      .collect()
    assert(shards.length > 10)
    shards.foreach { s =>
      assert(s.getLong(1) <= 100 + s.getLong(2),
        s"shard $s exceeds capacity + one document")
    }
    // deterministic: same input → identical assignment
    val again = TextChunker.shardByTokenBudget(docs, "id", "n", 100, 4)
      .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("chunkIds windows real token ids with overlap, full coverage, and " +
       "a shuffle-free plan") {
    val ids = (1 to 100).toArray
    val df = Seq((1L, ids), (2L, Array.empty[Int]), (3L, Array(7, 8, 9)))
      .toDF("doc_id", "ids")
    val out = TextChunker.chunkIds(df, "doc_id", "ids",
      maxTokens = 40, overlap = 10)
    val rows = out.orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    // doc 1: stride 30 → chunks at 1, 31, 61 (3 chunks)
    val d1 = rows.filter(_._1 == 1L)
    assert(d1.length == 3)
    assert(d1(0)._3 == (1 to 40) && d1(1)._3 == (31 to 70) &&
      d1(2)._3 == (61 to 100))
    // overlap: each successive chunk repeats the prior's last 10 ids
    assert(d1(0)._3.takeRight(10) == d1(1)._3.take(10))
    // empty docs produce no chunks; short docs one chunk
    assert(!rows.exists(_._1 == 2L))
    assert(rows.filter(_._1 == 3L).map(_._3).toSeq == Seq(Seq(7, 8, 9)))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must not shuffle")
  }

  test("packSequences concatenates real id sequences in id order within " +
       "the budget contract") {
    // deterministic fake "token ids": doc i carries (i*3 % 7) + 1 ids,
    // each id = i*100 + position (globally unique, so flattening is
    // provably order-faithful)
    val docs = (1 to 120).map { i =>
      val n = (i * 3) % 7 + 1
      (i.toLong, (0 until n).map(p => i * 100 + p).toArray)
    }.toDF("id", "ids")
    val out = TextChunker.packSequences(docs, "id", "ids",
      capacity = 20, groups = 4, sepId = Some(-1))
    val packs = out.collect().map(r => (r.getString(0), r.getLong(1),
      r.getSeq[Int](2), r.getLong(3)))
    // every document's ids appear exactly once, in order, ending with sep
    val flat = packs.flatMap(_._3)
    assert(flat.count(_ == -1) == 120, "one separator per document")
    val perDoc = flat.filter(_ != -1).groupBy(_ / 100)
    (1 to 120).foreach { i =>
      val n = (i * 3) % 7 + 1
      assert(perDoc(i).toSeq == (0 until n).map(p => i * 100 + p),
        s"doc $i ids intact and ordered")
    }
    packs.foreach { case (pid, nDocs, ids, nTokens) =>
      assert(ids.length == nTokens, s"$pid n_tokens matches array")
      assert(ids.count(_ == -1) == nDocs, s"$pid one sep per doc")
      // budget: document tokens (net of separators) overflow by at most
      // the last document (max doc size here is 7)
      assert(nTokens - nDocs <= 20 + 7, s"$pid overflows the contract")
      // within a pack, docs appear in ascending id order
      val order = ids.filter(_ != -1).map(_ / 100).distinct
      assert(order.toSeq == order.sorted.toSeq, s"$pid doc order")
    }
    // a pack's docs all share one salt group (packing is per-group)
    packs.foreach { case (pid, _, ids, _) =>
      val g = pid.split("_")(0).toLong
      assert(ids.filter(_ != -1).map(_ / 100).forall(_ % 4 == g),
        s"$pid holds docs of its own salt group only")
    }
  }

  test("BFD sharding: no bin overflows (except oversized single docs), " +
       "placement matches a reference best-fit, and efficiency >= the " +
       "id-ordered baseline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val docs = (0L until 400L).map(i =>
      (i, 1L + rnd.nextInt(99))).toDF("doc_id", "n_tokens")
    val cap = 100L
    val bfd = TextChunker.shardByTokenBudgetBfd(docs, "doc_id", "n_tokens",
      cap, groups = 1)
    val packTotals = bfd.groupBy("pack_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(packTotals.forall { case (_, t, n) => t <= cap || n == 1 },
      "a multi-doc bin overflowed the capacity")
    // reference BFD over the same (length desc, id asc) order
    val sorted = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
    val want = scala.collection.mutable.Map.empty[Long, String]
    sorted.foreach { case (id, n) =>
      val fits = bins.zipWithIndex.filter(_._1 >= n)
      if (fits.isEmpty) { bins += (cap - n); want(id) = s"0_${bins.size - 1}" }
      else {
        val (_, j) = fits.minBy { case (r, i) => (r, i) }
        bins(j) -= n; want(id) = s"0_$j"
      }
    }
    val got = bfd.select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want.toMap)
    // waste: BFD must not be worse than the id-ordered fill
    def waste(sharded: org.apache.spark.sql.DataFrame): Double =
      TextChunker.packingEfficiency(sharded, "n_tokens", cap)
        .head().getDouble(2)
    val idOrdered = TextChunker.shardByTokenBudget(docs, "doc_id",
      "n_tokens", cap, groups = 1)
    assert(waste(bfd) <= waste(idOrdered),
      s"BFD waste ${waste(bfd)} vs id-ordered ${waste(idOrdered)}")
  }

  test("BFD: oversized docs take a bin alone; grouped run is " +
       "deterministic across partitionings and respects salt groups") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, 250L), (2L, 40L), (3L, 80L), (4L, 30L), (5L, 70L),
      (6L, 260L), (7L, 10L), (8L, 55L)).toDF("doc_id", "n_tokens")
    val out = TextChunker.shardByTokenBudgetBfd(docs, "doc_id", "n_tokens",
      capacity = 100L, groups = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("pack_id")).toMap
    // 250 and 260 exceed capacity: alone in their bins
    val oversizedBins = Set(out(1L), out(6L))
    assert(oversizedBins.size == 2)
    assert(out.filterNot(kv => kv._1 == 1L || kv._1 == 6L)
      .values.toSet.intersect(oversizedBins).isEmpty)
    // determinism: 1 vs 13 input partitions, same assignment
    val repartitioned = TextChunker.shardByTokenBudgetBfd(
      docs.repartition(13), "doc_id", "n_tokens", 100L, groups = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("pack_id")).toMap
    assert(repartitioned == out)
    // groups = 3: every pack holds only its own salt group's docs
    val grouped = TextChunker.shardByTokenBudgetBfd(docs, "doc_id",
      "n_tokens", 100L, groups = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("pack_id")))
    grouped.foreach { case (id, pid) =>
      assert(pid.split("_")(0).toLong == id % 3, s"doc $id in pack $pid")
    }
  }

  test("packSequencesBfd assembles id-ordered packs over BFD shards") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // doc i has i tokens (value i repeated), ids 1..12, capacity 20
    val docs = (1 to 12).map(i => (i.toLong, Array.fill(i)(i))).toDF("doc_id", "ids")
    val packs = TextChunker.packSequencesBfd(docs, "doc_id", "ids",
      capacity = 20L, groups = 1, sepId = Some(-1))
      .collect().map(r => (r.getAs[String]("pack_id"),
        r.getAs[Long]("n_docs"),
        r.getAs[scala.collection.Seq[Int]]("input_ids").toArray,
        r.getAs[Long]("n_tokens")))
    // coverage: every doc's ids appear exactly once across all packs
    val allIds = packs.flatMap(_._3).filter(_ != -1)
    assert(allIds.groupBy(identity).map { case (v, a) => v -> a.length } ==
      (1 to 12).map(i => i -> i).toMap)
    packs.foreach { case (pid, nDocs, ids, nTokens) =>
      assert(ids.length == nTokens)
      assert(ids.count(_ == -1) == nDocs, s"$pid one sep per doc")
      assert(nTokens - nDocs <= 20, s"$pid: BFD bins never overflow " +
        "(no doc here exceeds the capacity)")
      val order = ids.filter(_ != -1).distinct
      assert(order.toSeq == order.sorted.toSeq, s"$pid id-ordered concat")
    }
  }
}
