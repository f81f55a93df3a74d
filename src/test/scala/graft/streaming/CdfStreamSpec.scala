package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.tables.ManagedTable

/** The change-feed streaming source (`format("graft-cdf")`): offsets are
  * table versions, batches are `changes(start, end]`, restart recovery
  * resumes from the checkpointed version without re-emitting.
  */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): ManagedTable =
    ManagedTable.create(
      spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v")),
      tmpDir(name), properties = Map(ManagedTable.cdfPropKey -> "true"))

  test("streams DML changes commit-by-commit; default start skips history") {
    val t = fixture("cdfsrc")
    t.append(Seq((900L, 0L)).toDF("k", "v")) // pre-stream commit: not emitted
    val q = spark.readStream.format("graft-cdf").load(t.location)
      .writeStream.format("memory").queryName("cdf_sink")
      .option("checkpointLocation", tmpDir("cdfsrcckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_sink").count() == 0, "history must not replay")
      t.delete("k < 10")
      t.update(Map("v" -> "v + 1"), Some("k BETWEEN 50 AND 52"))
      q.processAllAvailable()
      val got = spark.table("cdf_sink")
      assert(got.filter(col("_change_type") === "delete").count() == 10)
      assert(got.filter(col("_change_type") === "update_preimage").count() == 3)
      assert(got.filter(col("_change_type") === "update_postimage").count() == 3)
      // commit versions tag each batch's rows
      assert(got.select("_commit_version").distinct().count() == 2)
    } finally q.stop()
  }

  test("startingVersion streams the full history; restart resumes from " +
       "the checkpoint without re-emitting") {
    val t = fixture("cdfsrc2")
    t.delete("k >= 90") // v1
    val ckpt = tmpDir("cdfsrc2ckpt")
    val out = tmpDir("cdfsrc2out")
    // a recoverable (file) sink: restart resumes from the checkpointed
    // version and appends — exactly-once across the stop/start
    def start() = spark.readStream.format("graft-cdf")
      .option("startingVersion", "0").load(t.location)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val afterFirst = spark.read.parquet(out).collect()
    // v0 CREATE surfaces as 100 inserts, v1 as 10 deletes
    assert(afterFirst.count(_.getString(2) == "insert") == 100)
    assert(afterFirst.count(_.getString(2) == "delete") == 10)

    t.update(Map("v" -> "v + 1"), Some("k = 1")) // v2, while the stream is down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val afterSecond = spark.read.parquet(out).collect()
    // only v2's pair lands on restart — the checkpoint suppressed v0/v1
    assert(afterSecond.length == afterFirst.length + 2,
      s"restart must resume after v1, got ${afterSecond.length} rows")
    assert(afterSecond.count(_.getString(2) == "update_preimage") == 1)
    assert(afterSecond.count(_.getString(2) == "update_postimage") == 1)
  }

  test("a table without the CDF property still streams (derived feed)") {
    val t = ManagedTable.create(
      spark.range(10).select(col("id").as("k"), col("id").as("v")),
      tmpDir("cdfsrc3"))
    val q = spark.readStream.format("graft-cdf").load(t.location)
      .writeStream.format("memory").queryName("cdf_sink3")
      .option("checkpointLocation", tmpDir("cdfsrc3ckpt")).start()
    try {
      t.delete("k = 3")
      q.processAllAvailable()
      val got = spark.table("cdf_sink3").collect()
      assert(got.length == 1 && got.head.getString(2) == "delete")
    } finally q.stop()
  }

  test("the initial offset anchor survives source re-creation (restart " +
       "before the first sink commit must not skip the first batch)") {
    val t = fixture("cdfanchor")
    val provider = new CdfSourceProvider
    val meta = tmpDir("cdfanchormeta")
    def mkSource() = provider.createSource(spark.sqlContext, meta, None,
      "graft-cdf", Map("path" -> t.location))
    // stream starts: anchor = latest-at-creation (only NEW commits stream)
    val s1 = mkSource()
    assert(s1.getOffset.isEmpty, "no commits since anchor yet")
    // a commit lands, then the driver dies before the sink commit and the
    // source is re-created from the same checkpoint metadataPath
    t.delete("k < 10")
    val s2 = mkSource()
    // a re-anchoring source would report None here (latest == new anchor)
    // and silently skip the delete; the recovered anchor must expose it
    val off = s2.getOffset
    assert(off.nonEmpty, "recovered anchor must surface the pending commit")
    assert(CdfSource.version(off.get) == t.latestVersion)
  }

  test("maxVersionsPerTrigger drains a backlog in bounded micro-batches") {
    val t = fixture("cdfrate")
    (1 to 6).foreach(i => t.delete(s"k = $i")) // v1..v6 backlog
    val q = spark.readStream.format("graft-cdf")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2")
      .load(t.location)
      .writeStream.format("memory").queryName("cdf_rate_sink")
      .option("checkpointLocation", tmpDir("cdfrateckpt")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdf_rate_sink")
      assert(got.count() == 6, "every backlog commit must drain")
      // 6 versions at <=2 per trigger = at least 3 distinct batches:
      // batchIds on the sink prove the cap bounded each micro-batch
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3,
        s"expected >= 3 micro-batches, got ${batches.length}")
      assert(batches.forall(_.numInputRows <= 2),
        "no micro-batch may exceed the version cap's row yield here " +
          "(one row per version in this fixture)")
    } finally q.stop()
  }

  test("maxBytesPerTrigger bounds the change feed's catch-up by commit " +
      "weight — one commit per trigger at budget 1") {
    val t = fixture("cdfbytes")
    (1 to 4).foreach(i => t.delete(s"k = $i")) // v1..v4 backlog
    // every delete commit's file delta outweighs 1 byte, so the
    // at-least-one rule admits exactly one commit per trigger
    val q = spark.readStream.format("graft-cdf")
      .option("startingVersion", "1")
      .option("maxBytesPerTrigger", "1")
      .load(t.location)
      .writeStream.format("memory").queryName("cdf_bytes_sink")
      .option("checkpointLocation", tmpDir("cdfbytesckpt")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_bytes_sink").count() == 4)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 4 && batches.forall(_.numInputRows == 1),
        s"one commit per trigger: ${batches.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("restart with maxVersionsPerTrigger resumes from the committed " +
       "offset, not the anchor (no duplicate re-delivery)") {
    val t = fixture("cdfrate3")
    (1 to 6).foreach(i => t.delete(s"k = $i")) // v1..v6 backlog
    val ckpt = tmpDir("cdfrate3ckpt")
    val out = tmpDir("cdfrate3out")
    def start() = spark.readStream.format("graft-cdf")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "2")
      .load(t.location)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 6)
    t.delete("k = 7") // v7, while the stream is down
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
      assert(rows.length == 7,
        s"capped restart must deliver only v7, got ${rows.length} rows")
      assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 7L).toSeq,
        "one delete per version, none duplicated")
    } finally q2.stop()
  }

  test("a re-created capped source never offers below its prior offers, " +
       "even without the engine's restart getBatch courtesy call") {
    // The engine's V1 restart path happens to call getBatch on the last
    // committed range before the first getOffset, which bumps the
    // in-memory cap base — but that is an undocumented courtesy for
    // sources that assume it, not a contract. The persisted high-water
    // must keep capped offers monotone across re-creation ON ITS OWN:
    // a regressed offer = re-delivery of committed versions.
    val t = fixture("cdfhw")
    (1 to 4).foreach(i => t.delete(s"k = $i")) // v1..v4
    val provider = new CdfSourceProvider
    val meta = tmpDir("cdfhwmeta")
    def mkSource() = provider.createSource(spark.sqlContext, meta, None,
      "graft-cdf", Map("path" -> t.location,
        "startingVersion" -> "1", "maxVersionsPerTrigger" -> "2"))
    val s1 = mkSource()
    assert(CdfSource.version(s1.getOffset.get) == 2, "capped first offer")
    assert(CdfSource.version(s1.getOffset.get) == 4, "capped second offer")
    // driver dies; the source is re-created from the same metadataPath
    // and getOffset runs FIRST (no getBatch recovery call)
    val s2 = mkSource()
    assert(s2.getOffset.isEmpty,
      "all four versions were already offered (and thus possibly " +
        "committed) — a fresh source must not re-offer them")
    t.delete("k = 5") // v5
    assert(CdfSource.version(s2.getOffset.get) == 5,
      "new commits still stream after the recovered high-water")
  }

  test("Trigger.AvailableNow drains the change backlog to the prepare-time " +
       "anchor in bounded batches and stops; post-prepare commits unread") {
    val t = fixture("cdfsrc8")
    t.delete("k < 5")                                    // v1: 5 deletes
    t.update(Map("v" -> "v + 1"), Some("k = 50"))        // v2: pre+post
    t.append(Seq((900L, 0L)).toDF("k", "v"))             // v3: 1 insert
    val q = spark.readStream.format("graft-cdf")
      .option("startingVersion", "1")
      .option("maxVersionsPerTrigger", "1")
      .load(t.location)
      .writeStream.format("memory").queryName("cdf_an")
      .option("checkpointLocation", tmpDir("cdfsrc8ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (q.recentProgress.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      // postdates the anchor — must stay unread in this run
      t.delete("k = 60")
      assert(q.awaitTermination(120000),
        "an AvailableNow run must terminate on its own")
      assert(!q.isActive)
      val got = spark.table("cdf_an")
      assert(got.count() == 8, "5 deletes + pre/post + 1 insert, no k=60")
      assert(got.filter(col("k") === 60).count() == 0,
        "post-prepare commit stays unread")
      // v1..v3 drained across >= 3 bounded (cap=1) batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
        s"bounded drain: ${q.recentProgress.map(_.numInputRows).toSeq}")
    } finally q.stop()
  }

  test("a second AvailableNow CDF run resumes exactly-once from the " +
       "checkpoint and delivers only the remainder") {
    val t = fixture("cdfsrc9")
    t.delete("k < 3") // v1
    val ckpt = tmpDir("cdfsrc9ckpt")
    val out = tmpDir("cdfsrc9out")
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdf")
        .option("startingVersion", "1").load(t.location)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try assert(q.awaitTermination(120000)) finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 3, "v1's 3 deletes")
    t.update(Map("v" -> "v + 10"), Some("k = 40")) // v2, after the anchor
    run()
    val got = spark.read.parquet(out)
    assert(got.count() == 5, "plus exactly v2's pre+post images, once")
    assert(got.filter(col("_change_type").startsWith("update")).count() == 2)
    assert(got.select("_commit_version").distinct().count() == 2)
  }

  test("maxVersionsPerTrigger rejects non-positive values") {
    val t = fixture("cdfrate2")
    val e = intercept[Exception] {
      spark.readStream.format("graft-cdf")
        .option("maxVersionsPerTrigger", "0").load(t.location)
        .writeStream.format("memory").queryName("cdf_rate2_sink")
        .option("checkpointLocation", tmpDir("cdfrate2ckpt")).start()
        .processAllAvailable()
    }
    assert(e.getMessage.contains("maxVersionsPerTrigger"),
      s"got: ${e.getMessage}")
  }
}
