package graft.text

import graft.SparkSpec

/** Property-style invariants of the token-id pipeline (encode → chunk →
  * pack) over seeded random documents and window/budget parameters:
  *   1. chunk reassembly: dropping each successive chunk's leading
  *      `overlap` ids and concatenating reproduces the document's ids
  *      exactly (no token lost, duplicated, or reordered);
  *   2. every chunk except a document's last is exactly `maxTokens`
  *      long, and the last is in (0, maxTokens];
  *   3. packing conservation: every document's ids appear exactly once
  *      across all packs, in document order within the pack;
  *   4. pack budget: document tokens per pack (net of separators)
  *      overflow `capacity` by at most the pack's largest document.
  */
class TokenPipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  test("chunkIds: reassembly, sizing, and coverage over random cases") {
    val rnd = new scala.util.Random(2026L)
    (1 to 8).foreach { caseNo =>
      val maxTokens = 4 + rnd.nextInt(60)
      val overlap = rnd.nextInt(maxTokens)
      val docs = (1 to 30).map { d =>
        val n = rnd.nextInt(200) // 0 allowed: empty docs chunk to nothing
        (d.toLong, (0 until n).map(p => d * 1000 + p).toArray)
      }
      val df = docs.toDF("doc_id", "ids")
      val out = TextChunker.chunkIds(df, "doc_id", "ids",
        maxTokens = maxTokens, overlap = overlap)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
      docs.foreach { case (id, ids) =>
        val chunks = out.getOrElse(id, Array.empty[Seq[Int]]).toSeq
        if (ids.isEmpty) assert(chunks.isEmpty, s"case $caseNo doc $id")
        else {
          // invariant 2: full windows then a bounded tail
          chunks.init.foreach(c => assert(c.length == maxTokens,
            s"case $caseNo ($maxTokens/$overlap) doc $id inner chunk"))
          assert(chunks.last.nonEmpty && chunks.last.length <= maxTokens)
          // invariant 1: overlap-stripped reassembly is exact
          val rebuilt = chunks.head ++
            chunks.tail.flatMap(_.drop(overlap))
          assert(rebuilt == ids.toSeq,
            s"case $caseNo ($maxTokens/$overlap) doc $id reassembly")
        }
      }
    }
  }

  test("packSequences: conservation, order, and bounded overflow over " +
       "random cases") {
    val rnd = new scala.util.Random(777L)
    (1 to 5).foreach { caseNo =>
      val capacity = 20 + rnd.nextInt(300)
      val groups = 1 + rnd.nextInt(6)
      val docs = (1 to 80).map { d =>
        val n = 1 + rnd.nextInt(40)
        (d.toLong, (0 until n).map(p => d * 1000 + p).toArray)
      }
      val df = docs.toDF("id", "ids")
      val packs = TextChunker.packSequences(df, "id", "ids",
        capacity = capacity, groups = groups, sepId = Some(-1))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getSeq[Int](2), r.getLong(3)))
      // invariant 3: exact conservation, in-document order
      val flat = packs.flatMap(_._3).filter(_ != -1)
      val byDoc = flat.groupBy(_ / 1000)
      docs.foreach { case (id, ids) =>
        assert(byDoc.getOrElse(id.toInt, Array.empty[Int]).toSeq == ids.toSeq,
          s"case $caseNo ($capacity/$groups) doc $id conservation")
      }
      assert(flat.length == docs.map(_._2.length).sum, "no extras")
      packs.foreach { case (pid, nDocs, ids, nTokens) =>
        assert(ids.count(_ == -1) == nDocs && ids.length == nTokens)
        // in-pack document order ascends
        val order = ids.filter(_ != -1).map(_ / 1000)
        assert(order.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
          s"case $caseNo pack $pid order")
        // invariant 4: budget overflow bounded by the largest member
        val largest = order.distinct
          .map(d => docs(d - 1)._2.length).maxOption.getOrElse(0)
        assert(nTokens - nDocs <= capacity + largest,
          s"case $caseNo pack $pid overflow: ${nTokens - nDocs} vs " +
            s"$capacity + $largest")
      }
    }
  }
}
