package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is a pure function of the key: repartitioning changes nothing") {
    val d = (1L to 2000L).toDF("id")
    val a = Sampling.hashSample(d, Seq("id"), 3, 10).as[Long].collect().toSet
    val b = Sampling.hashSample(d.repartition(17), Seq("id"), 3, 10)
      .as[Long].collect().toSet
    assert(a == b)
    // and roughly the requested fraction
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"got ${a.size}")
  }

  test("weightedSample mixes per-group rates deterministically") {
    import spark.implicits._
    val d = spark.range(3000).select(col("id"),
      concat(lit("g"), (col("id") % 3)).as("grp"))
    val out = Sampling.weightedSample(d, "grp",
      rates = Map("g0" -> 500, "g1" -> 100), denominator = 1000,
      defaultNumerator = 0, keys = Seq("id"))
    val counts = out.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    // rates hold approximately (hash-Bernoulli over 1000 rows per group)
    assert(math.abs(counts("g0") - 500L) < 100, counts.toString)
    assert(math.abs(counts("g1") - 100L) < 60, counts.toString)
    assert(!counts.contains("g2"), "default rate 0 must drop unlisted groups")
    // pure function of the key: repartitioning changes nothing
    val again = Sampling.weightedSample(d.repartition(13), "grp",
      rates = Map("g0" -> 500, "g1" -> 100), denominator = 1000,
      defaultNumerator = 0, keys = Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // each group's kept set is exactly the per-group hashSample
    val g0 = Sampling.hashSample(d.filter(col("grp") === "g0"),
      Seq("id"), 500, 1000).select("id").as[Long].collect().toSet
    assert(out.filter(col("grp") === "g0")
      .select("id").as[Long].collect().toSet == g0)
    intercept[IllegalArgumentException](
      Sampling.weightedSample(d, "grp", Map("g0" -> 2000), 1000,
        0, Seq("id")))
  }

  test("hashSample aligns across tables sharing the key") {
    val left = (1L to 500L).toDF("id").withColumn("x", col("id") * 2)
    val right = (1L to 500L).toDF("id").withColumn("y", col("id") + 1)
    val ls = Sampling.hashSample(left, Seq("id"), 1, 4).select("id").as[Long].collect().toSet
    val rs = Sampling.hashSample(right, Seq("id"), 1, 4).select("id").as[Long].collect().toSet
    assert(ls == rs, "same keys/seed must select the same ids on both tables")
  }

  test("portable and fast variants are each deterministic; bounds hold") {
    val d = (1L to 300L).toDF("id")
    val p1 = Sampling.hashSample(d, Seq("id"), 1, 2, portable = true).count()
    val p2 = Sampling.hashSample(d, Seq("id"), 1, 2, portable = true).count()
    assert(p1 == p2)
    assert(Sampling.hashSample(d, Seq("id"), 0, 7).count() == 0)
    assert(Sampling.hashSample(d, Seq("id"), 7, 7).count() == 300)
  }

  test("capPerGroup equals the single-window reference (total order)") {
    val d = (1L to 1000L).toDF("id")
      .withColumn("grp", pmod(col("id"), lit(7L)))
      .withColumn("score", col("id") * 13 % 101)
    val order = Seq(col("score").desc, col("id").asc)
    val got = Sampling.capPerGroup(d, Seq("grp"), order, n = 5, salts = 8)
      .select("id").as[Long].collect().toSet
    val want = d.withColumn("rn",
        row_number().over(Window.partitionBy("grp").orderBy(order: _*)))
      .filter(col("rn") <= 5).select("id").as[Long].collect().toSet
    assert(got == want)
  }

  test("capPerGroup survives a hot group of identical-content rows") {
    // one group holds 90% of rows and every row is content-identical except
    // the tiebreaker — the ordinal scatter must still spread phase 1
    val hot = (1L to 9000L).map(i => ("hot", 1L, i))
    val cold = (1L to 1000L).map(i => (s"g${i % 10}", i % 50, 100000L + i))
    val d = (hot ++ cold).toDF("grp", "score", "id")
    val order = Seq(col("score").desc, col("id").asc)
    val got = Sampling.capPerGroup(d, Seq("grp"), order, n = 3, salts = 8)
    assert(got.filter(col("grp") === "hot").count() == 3)
    // exactness: the 3 kept hot rows are the lowest ids (score all equal)
    assert(got.filter(col("grp") === "hot").select("id")
      .as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(got.filter(col("grp") =!= "hot").count() == 10 * 3)
  }

  test("capPerGroup keeps whole groups smaller than the cap") {
    val d = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    val got = Sampling.capPerGroup(d, Seq("grp"), Seq(col("id")), n = 10, salts = 4)
    assert(got.count() == 3)
  }

  test("temperatureSample flattens a skewed mix toward the tail") {
    // head group: 8000 rows; tail group: 1000 rows; equal row weight
    val d = spark.range(9000).select(col("id"),
      when(col("id") < 8000, "head").otherwise("tail").as("grp"),
      lit(100L).as("w"))
    val out = Sampling.temperatureSample(d, "grp", "w", Seq("id"),
      alpha = 0.5, targetRows = 1800L)
    val counts = out.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    // α=0.5 allocation: √8000/(√8000+√1000) ≈ 0.739 of 1800 ≈ 1330 head,
    // 470 tail — the tail keeps ~47% of its rows vs ~17% of the head's
    // (proportional sampling would keep 20% of both)
    assert(math.abs(counts("head") - 1330L) < 140, counts.toString)
    assert(math.abs(counts("tail") - 470L) < 90, counts.toString)

    // α=1 with uniform per-row weight degenerates to one global rate
    val prop = Sampling.temperatureSample(d, "grp", "w", Seq("id"),
      alpha = 1.0, targetRows = 1800L)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(math.abs(prop("head") / 8000.0 - prop("tail") / 1000.0) < 0.05,
      prop.toString)

    // deterministic: repartitioning changes nothing
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(d.repartition(13), "grp", "w",
        Seq("id"), alpha = 0.5, targetRows = 1800L)
      .select("id").as[Long].collect().toSet
    assert(a == b)

    // a target past the corpus size clamps every rate at 1.0
    val all = Sampling.temperatureSample(d, "grp", "w", Seq("id"),
      alpha = 0.5, targetRows = 100000L)
    assert(all.count() == 9000L)
    // column order is preserved
    assert(all.columns.toSeq == Seq("id", "grp", "w"))

    intercept[IllegalArgumentException](
      Sampling.temperatureSample(d, "grp", "w", Seq("id"),
        alpha = 1.5, targetRows = 10L))
  }

  test("assignSplits: total, deterministic, partition-invariant, aligned") {
    import spark.implicits._
    val d = spark.range(0, 2000).toDF("id")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val a = Sampling.assignSplits(d, splits, 100, Seq("id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == Set("train", "val", "test"), "every row assigned")
    assert(a.values.sum == 2000)
    assert(a("train") > a("val") && a("train") > a("test"),
      s"rough proportions hold: $a")
    // pure function of the key: repartitioning changes nothing
    val b = Sampling.assignSplits(d.repartition(7), splits, 100, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Sampling.assignSplits(d, splits, 100, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a2 == b)
    // a second table sharing the key gets the ALIGNED assignment
    val other = spark.range(0, 2000).toDF("id").withColumn("x", col("id") * 2)
    val c = Sampling.assignSplits(other, splits, 100, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(c == a2, "joinable tables split consistently")
    // weights must cover the full denominator
    intercept[IllegalArgumentException](
      Sampling.assignSplits(d, Seq("train" -> 90, "val" -> 5), 100, Seq("id")))
  }

  test("capWeightPerGroup spends each group's budget best-first, " +
       "whole rows only") {
    val d = Seq(
      ("a", 1L, 40L), ("a", 2L, 30L), ("a", 3L, 25L), ("a", 4L, 10L),
      ("b", 5L, 100L), ("b", 6L, 5L),
      ("c", 7L, 200L)) // first row alone exceeds the budget
      .toDF("grp", "id", "w")
    val got = Sampling.capWeightPerGroup(d, Seq("grp"),
        Seq(col("w").desc, col("id").asc), "w", budget = 70L)
      .select("id").as[Long].collect().toSet
    // a: 40 + 30 = 70 fits; 25 would cross -> dropped (and so is 10,
    // prefix semantics). b: 100 > 70 alone? no — ordered desc: 100
    // crosses, so NOTHING from b? cum(100) = 100 > 70 -> dropped;
    // next row's cum is 105 -> also dropped (running sum includes the
    // dropped head: the budget is spent by ORDER, not by fit)
    assert(got == Set(1L, 2L), got.toString)
    // deterministic under repartition
    val again = Sampling.capWeightPerGroup(d.repartition(5), Seq("grp"),
        Seq(col("w").desc, col("id").asc), "w", budget = 70L)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException](
      Sampling.capWeightPerGroup(d, Seq("grp"), Seq(col("w")), "w", 0L))
  }

  test("stratifiedSample keeps exactly ceil(frac·N_g) per stratum, " +
       "deterministically, with telescoping fractions") {
    val d = spark.range(1, 2101).select(col("id"),
      when(col("id") <= 2000, "big")
        .when(col("id") <= 2090, "mid").otherwise("tiny").as("grp"))
    val out = Sampling.stratifiedSample(d, Seq("grp"), 0.25, Seq("id"))
    val counts = out.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    // EXACT sizes — the guarantee rate sampling lacks
    assert(counts == Map("big" -> 500L, "mid" -> 23L, "tiny" -> 3L),
      counts.toString)
    // pure function of the key: repartitioning changes nothing
    val again = Sampling.stratifiedSample(d.repartition(13), Seq("grp"),
      0.25, Seq("id")).select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
    // nested fractions telescope: the 10% sample ⊆ the 25% sample
    val small = Sampling.stratifiedSample(d, Seq("grp"), 0.10, Seq("id"))
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(again), "hash-prefix samples must nest")
    // frac = 1 keeps everything; bad frac rejected
    assert(Sampling.stratifiedSample(d, Seq("grp"), 1.0, Seq("id"))
      .count() == 2100)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(d, Seq("grp"), 0.0, Seq("id")))
  }

  test("stratifiedSampleApprox tracks the exact form and never windows") {
    val d = spark.range(1, 5001).select(col("id"),
      (col("id") % 4).cast("string").as("grp"))
    val approx = Sampling.stratifiedSampleApprox(d, Seq("grp"), 0.2,
      Seq("id"))
    val counts = approx.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    // sketch accuracy: within a few rows of 250 per stratum
    counts.values.foreach(n =>
      assert(math.abs(n - 250L) <= 10, counts.toString))
    // deterministic in the keys
    val again = Sampling.stratifiedSampleApprox(d.repartition(7),
      Seq("grp"), 0.2, Seq("id")).select("id").as[Long].collect().toSet
    assert(again == approx.select("id").as[Long].collect().toSet)
    // column order preserved; no window in the plan (the scale property)
    assert(approx.columns.toSeq == Seq("id", "grp"))
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not window the data")
  }

  test("capWeightPerGroupApprox: >=90% agreement with the exact cap, " +
       "budget never overshot, and no window in the plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(17L)
    // 4 groups x 800 docs, weights 1..200 — keep best (heaviest) first
    val docs = (1 to 3200).map { i =>
      (i.toLong, s"g${i % 4}", 1L + rnd.nextInt(200))
    }.toDF("id", "grp", "w")
    val budget = 8000L
    val exact = Sampling.capWeightPerGroup(docs, Seq("grp"),
      Seq(col("w").desc, col("id").asc), "w", budget)
      .select("id").as[Long].collect().toSet
    val approx = Sampling.capWeightPerGroupApprox(docs, Seq("grp"),
      -col("w"), "w", budget)
    val approxIds = approx.select("id").as[Long].collect().toSet
    // agreement on the union (symmetric): the sets overlap >= 90%
    val overlap = (exact & approxIds).size.toDouble /
      math.max(exact.size, approxIds.size)
    assert(overlap >= 0.9, f"agreement $overlap%.3f (exact ${exact.size}, " +
      f"approx ${approxIds.size})")
    // hard guarantee: kept weight per group never exceeds the budget
    val keptW = approx.groupBy("grp").agg(sum("w").as("kw"))
      .as[(String, Long)].collect().toMap
    keptW.foreach { case (g, kw) =>
      assert(kw <= budget, s"group $g kept weight $kw > budget") }
    // column order preserved; window-free (the scale property)
    assert(approx.columns.toSeq == Seq("id", "grp", "w"))
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "approx path must not window the data")
    // equal scores keep or drop together
    val byW = docs.join(approx.select(col("id").as("kid")),
        col("id") === col("kid"), "left")
      .groupBy("grp", "w")
      .agg(count(lit(1)).as("n"), count(col("kid")).as("k"))
      .filter(col("k") > 0 && col("k") < col("n")).count()
    assert(byW == 0L, "ties straddled the cut")
  }

  test("shuffleShards: balanced shards, positions form a permutation, " +
       "deterministic across partitionings, order decorrelated from keys") {
    import spark.implicits._
    val d = spark.range(0, 4000).select(col("id"))
    val out = Sampling.shuffleShards(d, Seq("id"), shards = 16, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // balance: hash routing keeps shards within ~4 sigma of n/shards
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.size == 16)
    sizes.foreach(n => assert(math.abs(n - 250) < 70, s"shard size $n"))
    // positions are exactly 0..size-1 within each shard
    out.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $s positions")
    }
    // deterministic across input partitionings
    val again = Sampling.shuffleShards(d.repartition(11), Seq("id"),
        shards = 16, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.toSet)
    // a different seed reshuffles
    val other = Sampling.shuffleShards(d, Seq("id"), Seq(16).head, seed = 6L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(other != out.toSet)
    // within-shard order is decorrelated from key order: the id sequence
    // read in position order must not be monotone
    val shard0 = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0.zip(shard0.drop(1)).count { case (a, b) => a < b } <
      shard0.length * 3 / 4, "shuffle left ingest order mostly intact")
    // portable and fast forms agree on the CONTRACT (not the values)
    val p = Sampling.shuffleShards(d, Seq("id"), 16, 5L, portable = true)
      .groupBy("shard").count().collect()
    assert(p.length == 16)
  }

  test("tokenBudgetMix hits each group's weight share; absent groups " +
       "drop; under-provisioned groups keep everything") {
    import spark.implicits._
    // three sources with very different masses
    val docs = (
      (1 to 800).map(i => (i.toLong, "web", 100L)) ++
      (1 to 200).map(i => (1000L + i, "code", 100L)) ++
      (1 to 10).map(i => (2000L + i, "books", 100L))).toDF("id", "src", "w")
    val out = Sampling.tokenBudgetMix(docs, "src", "w", keys = Seq("id"),
      shares = Map("web" -> 1.0, "books" -> 1.0), // 50/50 of the budget
      totalWeight = 20000L, seed = 7L)
    val bySrc = out.groupBy("src").agg(sum("w").as("kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // web: budget share 10000 of 80000 mass -> ~12.5% kept
    assert(bySrc("web") > 6000 && bySrc("web") < 14000,
      s"web should keep ~10000 weight, got ${bySrc.get("web")}")
    // books: allocation 10000 > mass 1000 -> keeps everything
    assert(bySrc("books") == 1000L, s"under-provisioned keeps all: $bySrc")
    // code was not in the recipe -> fully dropped
    assert(!bySrc.contains("code"), s"absent group must drop: $bySrc")
    // deterministic: same seed, same kept set
    val again = Sampling.tokenBudgetMix(docs, "src", "w", keys = Seq("id"),
      shares = Map("web" -> 1.0, "books" -> 1.0),
      totalWeight = 20000L, seed = 7L)
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      again.select("id").as[Long].collect().sorted.toSeq)
  }
}
