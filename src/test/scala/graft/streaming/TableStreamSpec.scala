package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.ManagedTable

/** The managed-table streaming SOURCE (`spark.readStream.format("graft")`):
  * initial snapshot + append tailing, startingVersion mode, structural
  * change-commit refusal and skipChangeCommits, OPTIMIZE transparency,
  * and checkpoint restart.
  */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(name: String, n: Long = 3): (String, ManagedTable) = {
    val loc = tmpDir(name)
    val t = ManagedTable.create(
      spark.range(0, n).selectExpr("id AS k", "id * 10 AS v"), loc)
    (loc, t)
  }

  private def startToMemory(loc: String, ckpt: String, queryName: String,
                            options: Map[String, String] = Map.empty) = {
    var r = spark.readStream.format("graft")
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load(loc).writeStream.format("memory")
      .queryName(queryName).option("checkpointLocation", ckpt).start()
  }

  test("initial snapshot then append tailing") {
    val (loc, t) = mkTable("tsrc1")
    val q = startToMemory(loc, tmpDir("tsrc1ckpt"), "tsrc1")
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc1").count() == 3, "batch 0 = full snapshot")
      t.append(spark.range(3, 5).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      assert(spark.table("tsrc1").as[(Long, Long)].collect().sorted.toSeq ==
        (0L until 5L).map(i => (i, i * 10)).toSeq)
      t.append(spark.range(5, 6).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      assert(spark.table("tsrc1").count() == 6)
    } finally q.stop()
  }

  test("startingVersion tails from the named commit with no snapshot") {
    val (loc, t) = mkTable("tsrc2")
    t.append(spark.range(10, 12).selectExpr("id AS k", "id * 10 AS v")) // v1
    t.append(spark.range(20, 21).selectExpr("id AS k", "id * 10 AS v")) // v2
    val q = startToMemory(loc, tmpDir("tsrc2ckpt"), "tsrc2",
      Map("startingVersion" -> "2"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc2").as[(Long, Long)].collect().toSeq ==
        Seq((20L, 200L)), "only v2's rows, no snapshot, no v1")
    } finally q.stop()
  }

  test("startingVersion=0 streams the full history including the CREATE commit") {
    val (loc, t) = mkTable("tsrc8")
    t.append(spark.range(10, 12).selectExpr("id AS k", "id * 10 AS v"))
    val q = startToMemory(loc, tmpDir("tsrc8ckpt"), "tsrc8",
      Map("startingVersion" -> "0"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc8").count() == 5,
        "v0's 3 rows + v1's 2 rows, via the commit walk (no snapshot read)")
    } finally q.stop()
  }

  test("startingTimestamp tails from the first commit at-or-after the " +
       "wall clock; exclusive with startingVersion") {
    val (loc, t) = mkTable("tsrc12")
    t.append(spark.range(10, 12).selectExpr("id AS k", "id * 10 AS v")) // v1
    Thread.sleep(20)
    t.append(spark.range(20, 21).selectExpr("id AS k", "id * 10 AS v")) // v2
    val hist = t.history.select("version", "timestamp").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(hist(2) > hist(1), "commit timestamps must advance for this probe")
    // a timestamp strictly inside (v1, v2] resolves to startingVersion=2
    val q = startToMemory(loc, tmpDir("tsrc12ckpt"), "tsrc12",
      Map("startingTimestamp" -> (hist(1) + 1).toString))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc12").as[(Long, Long)].collect().toSeq ==
        Seq((20L, 200L)), "only v2 streams: no snapshot, no v1")
    } finally q.stop()
    val e = intercept[Exception] {
      startToMemory(loc, tmpDir("tsrc12ckpt2"), "tsrc12b",
        Map("startingVersion" -> "1",
          "startingTimestamp" -> hist(1).toString)).processAllAvailable()
    }
    assert(e.getMessage.contains("not both") ||
      Option(e.getCause).exists(_.getMessage.contains("not both")),
      s"got: ${e.getMessage}")
    // a timestamp PREDATING the table streams the full history
    val q3 = startToMemory(loc, tmpDir("tsrc12ckpt3"), "tsrc12c",
      Map("startingTimestamp" -> "2000-01-01 00:00:00"))
    try {
      q3.processAllAvailable()
      assert(spark.table("tsrc12c").count() == 6,
        "v0's 3 rows + v1's 2 + v2's 1, via the commit walk")
    } finally q3.stop()
    // BOUNDARY: a timestamp EXACTLY equal to v2's commit timestamp is
    // inclusive (Delta semantics): v2 itself streams, not v3-onwards
    val q4 = startToMemory(loc, tmpDir("tsrc12ckpt4"), "tsrc12d",
      Map("startingTimestamp" -> hist(2).toString))
    try {
      q4.processAllAvailable()
      assert(spark.table("tsrc12d").as[(Long, Long)].collect().toSeq ==
        Seq((20L, 200L)),
        "a commit stamped exactly at the timestamp must stream")
    } finally q4.stop()
  }

  test("an all-skipped trigger emits an empty batch without touching the " +
       "anchor snapshot's files") {
    val (loc, t) = mkTable("tsrc9")
    val q = startToMemory(loc, tmpDir("tsrc9ckpt"), "tsrc9",
      Map("skipChangeCommits" -> "true"))
    try {
      q.processAllAvailable()
      // compact, then VACUUM the anchor snapshot's original files away
      t.optimize(targetFileSizeBytes = 256L * 1024 * 1024)
      t.vacuum(retainVersions = 1)
      t.delete("k = 0") // a change commit the stream skips
      q.processAllAvailable() // all-skipped trigger: must not die on v0's files
      assert(spark.table("tsrc9").count() == 3, "snapshot rows only")
      t.append(spark.range(30, 31).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      assert(spark.table("tsrc9").count() == 4, "stream still alive and tailing")
    } finally q.stop()
  }

  test("a change commit fails the stream loud by default") {
    val (loc, t) = mkTable("tsrc3")
    val q = startToMemory(loc, tmpDir("tsrc3ckpt"), "tsrc3")
    try {
      q.processAllAvailable()
      t.delete("k = 1")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        t.append(spark.range(9, 10).selectExpr("id AS k", "id * 10 AS v"))
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("skipChangeCommits") ||
        Option(e.getCause).exists(_.getMessage.contains("skipChangeCommits")),
        s"error must point at the option: ${e.getMessage}")
    } finally q.stop()
  }

  test("skipChangeCommits skips the change but keeps later appends") {
    val (loc, t) = mkTable("tsrc4")
    val q = startToMemory(loc, tmpDir("tsrc4ckpt"), "tsrc4",
      Map("skipChangeCommits" -> "true"))
    try {
      q.processAllAvailable()
      t.delete("k = 1")                                                  // skipped
      t.append(spark.range(7, 8).selectExpr("id AS k", "id * 10 AS v")) // streams
      q.processAllAvailable()
      val got = spark.table("tsrc4").as[(Long, Long)].collect().map(_._1).sorted
      assert(got.toSeq == Seq(0L, 1L, 2L, 7L),
        "snapshot (incl. later-deleted row) + append; delete skipped")
    } finally q.stop()
  }

  test("OPTIMIZE mid-stream is transparent") {
    val (loc, t) = mkTable("tsrc5")
    // fragment then compact
    (0 until 3).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    val q = startToMemory(loc, tmpDir("tsrc5ckpt"), "tsrc5")
    try {
      q.processAllAvailable()
      val before = spark.table("tsrc5").count()
      t.optimize(targetFileSizeBytes = 1024L * 1024 * 128)
      t.append(spark.range(50, 51).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      assert(spark.table("tsrc5").count() == before + 1,
        "OPTIMIZE emits nothing; the append after it streams")
    } finally q.stop()
  }

  test("checkpoint restart resumes from the committed offset (graft sink " +
       "mirror does not re-deliver the snapshot)") {
    val (loc, t) = mkTable("tsrc6")
    val ckpt = tmpDir("tsrc6ckpt")
    val mirror = tmpDir("tsrc6mirror")
    def start() = spark.readStream.format("graft").load(loc)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt).option("txnAppId", "tsrc6")
      .start(mirror)
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(ManagedTable.forPath(spark, mirror).toDF.count() == 3)
    t.append(spark.range(100, 102).selectExpr("id AS k", "id * 10 AS v"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = ManagedTable.forPath(spark, mirror).toDF
        .select("k").as[Long].collect().sorted
      assert(got.toSeq == Seq(0L, 1L, 2L, 100L, 101L),
        s"restart delivers only the new rows once: ${got.toSeq}")
    } finally q2.stop()
  }

  test("maxVersionsPerTrigger drains a backlog in bounded micro-batches") {
    val (loc, t) = mkTable("tsrc10")
    (0 until 4).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    val q = startToMemory(loc, tmpDir("tsrc10ckpt"), "tsrc10",
      Map("startingVersion" -> "0", "maxVersionsPerTrigger" -> "2"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc10").count() == 7, "3 create rows + 4 appends")
      // the 5-commit backlog must have drained over >= 3 bounded batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"bounded catch-up: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("maxBytesPerTrigger admits whole commits up to the byte budget — " +
      "one commit per trigger at budget 1, whole backlog under a " +
      "large budget, at least one always") {
    val (loc, t) = mkTable("tsrc20")
    (0 until 3).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    // budget 1 byte < any parquet file: every trigger admits exactly one
    // of the 4 backlog commits (v0 create + 3 appends)
    val q = startToMemory(loc, tmpDir("tsrc20ckpt"), "tsrc20",
      Map("startingVersion" -> "0", "maxBytesPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc20").count() == 6, "3 create rows + 3 appends")
      assert(q.recentProgress.count(_.numInputRows > 0) == 4,
        s"one commit per trigger: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
    // a generous budget ("1g") drains the same backlog in ONE batch
    val q2 = startToMemory(loc, tmpDir("tsrc20ckpt2"), "tsrc20b",
      Map("startingVersion" -> "0", "maxBytesPerTrigger" -> "1g"))
    try {
      q2.processAllAvailable()
      assert(spark.table("tsrc20b").count() == 6)
      assert(q2.recentProgress.count(_.numInputRows > 0) == 1,
        s"uncapped-in-practice: ${q2.recentProgress.map(_.numInputRows).toSeq}")
    } finally q2.stop()
  }

  test("maxFilesPerTrigger bounds the batch's file count (two 2-file " +
      "append commits per 4-file trigger)") {
    val (loc, t) = mkTable("tsrc21")
    (0 until 3).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    // this suite's commits measure: CREATE = 4 files, each append = 2 —
    // a 4-file budget admits the create alone, then two appends per
    // trigger: batches of (3, 2, 1) rows
    val q = startToMemory(loc, tmpDir("tsrc21ckpt"), "tsrc21",
      Map("startingVersion" -> "0", "maxFilesPerTrigger" -> "4"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc21").count() == 6)
      assert(q.recentProgress.filter(_.numInputRows > 0)
          .map(_.numInputRows).toSeq == Seq(3, 2, 1),
        s"got: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("maxBytesPerTrigger does not spend budget on OPTIMIZE commits") {
    val (loc, t) = mkTable("tsrc22")
    t.append(spark.range(10, 11).selectExpr("id AS k", "id * 10 AS v")) // v1
    t.optimize()                                                        // v2
    t.append(spark.range(11, 12).selectExpr("id AS k", "id * 10 AS v")) // v3
    // byte budget 1: v1 fills trigger 1; v2 (OPTIMIZE) weighs 0 and must
    // ride ALONG with v3 in trigger 2 instead of consuming one alone
    val q = startToMemory(loc, tmpDir("tsrc22ckpt"), "tsrc22",
      Map("startingVersion" -> "1", "maxBytesPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc22").as[(Long, Long)].collect().sorted.toSeq ==
        Seq((10L, 100L), (11L, 110L)))
      assert(q.recentProgress.count(_.numInputRows > 0) == 2,
        s"OPTIMIZE is free: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("restart with maxVersionsPerTrigger resumes from the committed " +
       "offset, not the anchor (no duplicate re-delivery)") {
    val (loc, t) = mkTable("tsrc11")
    (0 until 4).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    val ckpt = tmpDir("tsrc11ckpt")
    val mirror = tmpDir("tsrc11mirror")
    def start() = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "2")
      .load(loc)
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt).option("txnAppId", "tsrc11")
      .start(mirror)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(ManagedTable.forPath(spark, mirror).toDF.count() == 7)
    t.append(spark.range(100, 101).selectExpr("id AS k", "id * 10 AS v"))
    // restart from a FULLY-COMMITTED checkpoint: a cap base that
    // re-initializes to the anchor would offer min(latest, anchor + 2)
    // BELOW the committed offset and re-deliver already-committed
    // commits in fresh batchIds — duplicates the sink cannot dedupe
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = ManagedTable.forPath(spark, mirror).toDF
        .select("k").as[Long].collect().sorted.toSeq
      assert(got == Seq(0L, 1L, 2L, 10L, 11L, 12L, 13L, 100L),
        s"exactly-once across the capped restart: $got")
    } finally q2.stop()
  }

  test("Trigger.AvailableNow drains the backlog to the prepare-time anchor " +
       "in maxVersionsPerTrigger-bounded batches, then STOPS; a commit " +
       "landing after prepare stays unread") {
    val (loc, t) = mkTable("tsrc12")
    (0 until 4).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    val q = spark.readStream.format("graft")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load(loc)
      .writeStream.format("memory").queryName("tsrc12")
      .option("checkpointLocation", tmpDir("tsrc12ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // land a commit while the bounded drain runs (or just after — either
      // way it postdates the prepare-time anchor and must stay unread)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q.recentProgress.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      t.append(spark.range(900, 905).selectExpr("id AS k", "id * 10 AS v"))
      assert(q.awaitTermination(120000),
        "an AvailableNow run must terminate on its own")
      assert(!q.isActive)
      // exactly the anchored history: 3 create rows + 4 appends, no 900s
      assert(spark.table("tsrc12").as[(Long, Long)].collect().map(_._1)
        .sorted.toSeq == Seq(0L, 1L, 2L, 10L, 11L, 12L, 13L),
        "only commits <= the prepare-time anchor are delivered")
      // the 5-commit backlog drained across bounded batches, not one replay
      assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
        s"cap=1 drain: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("a second AvailableNow run picks up exactly the remainder — " +
       "exactly-once across checkpoint restart (graft sink mirror)") {
    val (loc, t) = mkTable("tsrc13")
    (0 until 4).foreach(i =>
      t.append(spark.range(10 + i, 11 + i).selectExpr("id AS k", "id * 10 AS v")))
    val ckpt = tmpDir("tsrc13ckpt")
    val mirror = tmpDir("tsrc13mirror")
    def run(): Unit = {
      val q = spark.readStream.format("graft")
        .option("startingVersion", "0")
        .option("maxVersionsPerTrigger", "2")
        .load(loc)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt).option("txnAppId", "tsrc13")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(mirror)
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    run()
    assert(ManagedTable.forPath(spark, mirror).toDF.count() == 7,
      "first run drains the full backlog to its anchor")
    t.append(spark.range(100, 102).selectExpr("id AS k", "id * 10 AS v"))
    run()
    val got = ManagedTable.forPath(spark, mirror).toDF
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == Seq(0L, 1L, 2L, 10L, 11L, 12L, 13L, 100L, 101L),
      s"second run delivers ONLY the new commit, once: $got")
  }

  test("AvailableNow in snapshot mode delivers batch 0 (the anchored " +
       "snapshot) and terminates") {
    val (loc, t) = mkTable("tsrc14")
    t.append(spark.range(10, 12).selectExpr("id AS k", "id * 10 AS v")) // v1
    val ckpt = tmpDir("tsrc14ckpt")
    val out = tmpDir("tsrc14out")
    // snapshot-mode AvailableNow: anchor == stream-start version; one
    // batch carrying the whole snapshot, then stop (parquet sink — the
    // memory sink cannot recover a checkpoint for the second run)
    def run(): Unit = {
      val q = spark.readStream.format("graft").load(loc)
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 5, "3 create + 2 appended rows")
    t.append(spark.range(50, 51).selectExpr("id AS k", "id * 10 AS v"))
    run()
    assert(spark.read.parquet(out).as[(Long, Long)].collect().map(_._1)
      .sorted.toSeq == Seq(0L, 1L, 2L, 10L, 11L, 50L),
      "restarted AvailableNow run tails only the post-anchor commit")
  }

  test("continuous-trigger parity: the admission-control reroute does not " +
       "anchor a default-trigger stream — commits landing mid-stream ARE " +
       "read") {
    // SupportsTriggerAvailableNow extends SupportsAdmissionControl, so
    // EVERY trigger's discovery now flows through latestOffset; this pins
    // that the plain path kept its r12 semantics: no prepare-time anchor,
    // appends during the run are picked up, all-skipped triggers emit
    // nothing, and maxVersionsPerTrigger still caps.
    val (loc, t) = mkTable("tsrc15")
    val q = startToMemory(loc, tmpDir("tsrc15ckpt"), "tsrc15",
      Map("maxVersionsPerTrigger" -> "1"))
    try {
      q.processAllAvailable()
      assert(spark.table("tsrc15").count() == 3, "snapshot delivered")
      t.append(spark.range(10, 12).selectExpr("id AS k", "id * 10 AS v"))
      t.append(spark.range(20, 22).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      assert(spark.table("tsrc15").as[(Long, Long)].collect().map(_._1)
        .sorted.toSeq == Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L),
        "mid-stream commits are read — no anchor on the plain path")
      assert(q.isActive, "a default-trigger stream keeps running")
    } finally q.stop()
  }

  test("round-trip: graft source feeding the graft sink mirrors appends") {
    val (loc, t) = mkTable("tsrc7")
    val mirror = tmpDir("tsrc7mirror")
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("graft")
      .option("checkpointLocation", tmpDir("tsrc7ckpt"))
      .option("txnAppId", "tsrc7")
      .start(mirror)
    try {
      q.processAllAvailable()
      t.append(spark.range(3, 6).selectExpr("id AS k", "id * 10 AS v"))
      q.processAllAvailable()
      val m = ManagedTable.forPath(spark, mirror)
      assert(m.toDF.count() == t.toDF.count(),
        "mirror tracks source through snapshot + appends")
    } finally q.stop()
  }
}
