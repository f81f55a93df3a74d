package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L

  private def rankMap(edges: Seq[(String, String)], iters: Int = 8) =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("star graph: the hub all spokes point at collects the mass") {
    // hub↔a form a 2-cycle, so their individual ranks oscillate with
    // iteration parity — assert on what is parity-stable: both crush
    // the bare spokes and jointly hold the non-teleport mass
    val r = rankMap(Seq("a" -> "hub", "b" -> "hub", "c" -> "hub",
      "hub" -> "a"))
    assert(r("b")._2 == r("c")._2, "symmetric spokes rank identically")
    assert(r("hub")._2 > 3 * r("b")._2)
    assert(r("a")._2 > 3 * r("b")._2, "the cycle partner shares the mass")
    assert(r("hub")._2 + r("a")._2 > (Scale * 8) / 10)
    assert(r("b")._1 == 1L && r("hub")._1 == 1L)
  }

  test("mass is conserved up to bounded truncation") {
    val r = rankMap(Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c"))
    val total = r.values.map(_._2).sum
    // each division truncates < 1 unit; with |V| teleports, |E|
    // contributions and one dangling division per iteration the loss
    // is well under 100 units/iteration here
    assert(total <= Scale && total > Scale - 8 * 100,
      s"total fixed-point mass $total out of bounds")
  }

  test("dangling sinks re-inject uniformly (no mass black hole)") {
    // d has no outlinks; without re-injection the cycle a->b->a would
    // keep leaking into d and total mass would collapse toward teleport
    val r = rankMap(Seq("a" -> "b", "b" -> "a", "a" -> "d"))
    val total = r.values.map(_._2).sum
    assert(total > Scale - 8 * 100)
    assert(r("d")._1 == 0L, "sink out-degree is 0")
    assert(r("d")._2 > 0L)
  }

  test("duplicate edges and self-loops are dropped before degrees") {
    val clean = rankMap(Seq("a" -> "b", "b" -> "a"))
    val noisy = rankMap(Seq("a" -> "b", "a" -> "b", "a" -> "a",
      "b" -> "a"))
    assert(clean == noisy)
  }

  test("deterministic under repartitioning (the integer-sum property)") {
    val edges = (0L until 300L)
      .map(i => (s"n${i % 23}", s"n${(i * 7 + 3) % 23}"))
    val once = rankMap(edges)
    val again = PageRank.ranks(
      edges.toDF("src", "dst").repartition(13), "src", "dst", 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(once == again)
  }

  test("more iterations converge: rank vector stabilizes") {
    // a wheel with a one-way rim: hub n0 feeds n1 only, every rim node
    // feeds the hub and its rim successor — equilibrium is strongly
    // non-uniform (n1 ≫ other rim nodes ≫ nothing uniform about it)
    val rim = (1 to 10).flatMap(i =>
      Seq(s"n$i" -> "n0", s"n$i" -> s"n${i % 10 + 1}"))
    val edges = ("n0" -> "n1") +: rim
    val r8 = rankMap(edges, 8)
    val r16 = rankMap(edges, 16)
    assert(r8.exists { case (_, (_, v)) =>
      math.abs(v - Scale / 11) > Scale / 100
    }, "equilibrium should be non-uniform for this graph")
    val drift = r8.map { case (k, (_, v)) =>
      math.abs(v - r16(k)._2)
    }.max
    assert(drift < Scale / 50L,
      s"iterates 8 vs 16 drifted by $drift — not contracting")
  }

  test("reliableEvery: results BIT-identical with reliable checkpoints " +
       "on, and the option refuses without a checkpoint dir") {
    val edges = (0L until 300L)
      .map(i => (s"n${i % 23}", s"n${(i * 7 + 3) % 23}"))
    val df = edges.toDF("src", "dst")
    // no checkpoint dir set -> loud refusal
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val e = intercept[IllegalArgumentException] {
      PageRank.ranks(df, "src", "dst", 8, reliableEvery = 2)
    }
    assert(e.getMessage.contains("setCheckpointDir"))
    // with a dir: every-2-rounds reliable cuts, identical integers
    spark.sparkContext.setCheckpointDir("target/tmp/pr_ckpt")
    try {
      val plain = rankMap(edges)
      val reliable = PageRank.ranks(df, "src", "dst", 8,
          reliableEvery = 2)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(plain == reliable,
        "reliable-checkpoint path must not change a single rank bit")
    } finally {
      // reset so later suites keep the no-dir default
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("release frees the result's checkpoint blocks") {
    val r = PageRank.ranks(Seq("a" -> "b", "b" -> "a").toDF("src", "dst"),
      "src", "dst", 4)
    assert(r.count() == 2)
    PageRank.release(r)
    // the observable contract: every LogicalRDD leaf's storage level
    // dropped to NONE (the blocks are freed; re-reading the released
    // result is the caller's bug, as with any unpersisted checkpoint)
    val rdds = r.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    assert(rdds.nonEmpty)
    assert(rdds.forall(_.getStorageLevel ==
      org.apache.spark.storage.StorageLevel.NONE))
  }
}
