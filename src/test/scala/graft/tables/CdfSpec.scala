package graft.tables

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Change data feed (`ManagedTable.changes` — Delta CDF analog): semantic
  * row deltas per commit, carryover cancellation in net mode, OPTIMIZE
  * emitting nothing, and the replay invariant — applying the feed to the
  * from-snapshot reproduces the to-snapshot.
  */
class CdfSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(name: String): ManagedTable = {
    val base = spark.range(500).select(
      col("id").as("k"), (col("id") % 5).as("grp"), (col("id") * 3).as("v"))
    val t = ManagedTable.create(base, tmpDir(name),
      properties = Map(ManagedTable.cdfPropKey -> "true"))
    t.optimize(targetFileSizeBytes = 2 * 1024, sortBy = Seq("k"))
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("append surfaces as pure inserts at its commit version") {
    val t = fixture("cdfapp")
    val v0 = t.latestVersion
    t.append(Seq((9001L, 1L, 27003L)).toDF("k", "grp", "v"))
    val ch = t.changes(v0)
    assert(ch.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    val got = ch.select("k", "_change_type", "_commit_version").collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 9001L)
    assert(got.head.getString(1) == "insert")
    assert(got.head.getLong(2) == v0 + 1)
  }

  test("net mode: DELETE contributes exactly its deleted rows") {
    val t = fixture("cdfdel")
    val v0 = t.latestVersion
    assert(t.delete("k >= 100 AND k < 110") == 10)
    val ch = t.changes(v0)
    assert(ch.filter(col("_change_type") === "insert").count() == 0)
    val dels = ch.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(dels == (100L until 110L).toSeq)
    // raw (non-net) mode shows the file-diff carryover too
    val raw = t.changes(v0, net = false)
    assert(raw.filter(col("_change_type") === "delete").count() >= 10)
  }

  test("net mode: UPDATE emits pre-image deletes and post-image inserts") {
    val t = fixture("cdfupd")
    val v0 = t.latestVersion
    assert(t.update(Map("v" -> "v + 1"), Some("k BETWEEN 50 AND 54")) == 5)
    val ch = t.changes(v0)
    val pre = ch.filter(col("_change_type") === "update_preimage")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val post = ch.filter(col("_change_type") === "update_postimage")
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pre == (50L to 54L).map(k => (k, k * 3)))
    assert(post == (50L to 54L).map(k => (k, k * 3 + 1)))
  }

  test("OPTIMIZE emits no changes") {
    val t = fixture("cdfopt")
    val v0 = t.latestVersion
    t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
    assert(t.latestVersion == v0 + 1)
    assert(t.changes(v0).count() == 0)
  }

  test("replaying the feed over the from-snapshot reproduces the to-snapshot") {
    val t = fixture("cdfreplay")
    val v0 = t.latestVersion
    t.append(Seq((9001L, 0L, 1L), (9002L, 1L, 2L)).toDF("k", "grp", "v"))
    t.delete("k % 7 = 0")
    t.update(Map("v" -> "v * 10"), Some("grp = 3"))
    t.optimize(targetFileSizeBytes = 64 * 1024)
    t.append(Seq((9003L, 2L, 3L)).toDF("k", "grp", "v"))
    val to = t.latestVersion
    val ch = t.changes(v0, to).persist()
    val dataCols = Seq("k", "grp", "v").map(col)
    var state = t.toDF(v0).select(dataCols: _*)
    ((v0 + 1) to to).foreach { v =>
      val c = ch.filter(col("_commit_version") === v)
      state = state
        .exceptAll(c.filter(col("_change_type")
          .isin("delete", "update_preimage")).select(dataCols: _*))
        .unionAll(c.filter(col("_change_type")
          .isin("insert", "update_postimage")).select(dataCols: _*))
    }
    assert(rows(state) == rows(t.toDF.select(dataCols: _*)))
    ch.unpersist()
  }

  test("change feed spans schema evolution (old rows null-fill new columns)") {
    val t = ManagedTable.create(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), tmpDir("cdfevo"))
    val v0 = t.latestVersion
    t.append(Seq((3L, 30L, "c")).toDF("k", "v", "tag"), mergeSchema = true)
    assert(t.delete("k = 1") == 1)
    val ch = t.changes(v0)
    assert(ch.columns.take(3).toSeq == Seq("k", "v", "tag"))
    val ins = ch.filter(col("_change_type") === "insert").collect()
    assert(ins.length == 1 && ins.head.getString(2) == "c")
    val del = ch.filter(col("_change_type") === "delete").collect()
    // deleted row predates the tag column → null-filled to latest schema
    assert(del.length == 1 && del.head.getLong(0) == 1L && del.head.isNullAt(2))
  }

  test("DML commits persist a change sidecar; sidecar feed ≡ derived feed") {
    val t = fixture("cdfsidecar")
    val v0 = t.latestVersion
    t.append(Seq((9001L, 0L, 1L), (9002L, 1L, 2L)).toDF("k", "grp", "v"))
    t.delete("k % 7 = 0")
    t.update(Map("v" -> "v * 10"), Some("grp = 3"))
    t.update(Map("v" -> "v"), Some("grp = 1")) // no-op set: empty net feed
    t.optimize(targetFileSizeBytes = 64 * 1024)
    val to = t.latestVersion
    // every DML commit in the range carries a sidecar reference
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(t.location, "_graft_cdc")))
    // the sidecar READ reproduces exactly what snapshot derivation computes
    val viaSidecar = t.changesVia(v0, to, net = true, useSidecar = true)
      .drop("_commit_timestamp")
    val derived = t.changesVia(v0, to, net = true, useSidecar = false)
      .drop("_commit_timestamp")
    assert(rows(viaSidecar) == rows(derived))
    // and the no-op UPDATE emitted nothing (documented Delta deviation)
    assert(viaSidecar.filter(col("_change_type").startsWith("update"))
      .filter(col("grp") === 1).count() == 0)
  }

  test("MERGE commits capture clause-accurate CDC: update labels in the " +
       "sidecar, value-equal to the derived insert/delete feed") {
    val t = fixture("cdfmerge")
    val v0 = t.latestVersion
    // update k∈[10,12] (k=12's set is a NO-OP: v stays k*3), delete k∈{40,41},
    // insert 9001 — plus a pass-through match (k=200, no clause applies)
    val src = Seq(
      (10L, 1L, 1000L), (11L, 1L, 1001L), (12L, 1L, 36L),
      (40L, 0L, 0L), (41L, 0L, 0L),
      (200L, 0L, 600L), // matches but no clause condition holds
      (9001L, 7L, 42L)).toDF("k", "grp", "v")
    Merge.into(t.toDF, "base")
      .using(src, "src", "base.k = src.k")
      .whenMatchedUpdate(condition = "src.k BETWEEN 10 AND 12",
        set = Map("v" -> "src.v"))
      .whenMatchedDelete(condition = "src.k IN (40, 41)")
      .whenNotMatchedInsert(Map("k" -> "src.k", "grp" -> "src.grp", "v" -> "src.v"))
      .execute(t)
    val to = t.latestVersion
    assert(to == v0 + 1)

    val sidecar = t.changesVia(v0, to, net = true, useSidecar = true)
    val bySide = sidecar.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // no-op update (k=12) cancels; pass-through (k=200) emits nothing
    assert(bySide == Map("update_preimage" -> 2L, "update_postimage" -> 2L,
      "delete" -> 2L, "insert" -> 1L), s"got $bySide")
    assert(sidecar.filter(col("k") === 12L).count() == 0)
    assert(sidecar.filter(col("k") === 200L).count() == 0)

    // derived feed approximates updates as delete+insert pairs — same
    // rows modulo that label mapping
    val derived = t.changesVia(v0, to, net = true, useSidecar = false)
    def canon(df: DataFrame): Seq[String] = rows(df
      .withColumn("_change_type",
        when(col("_change_type") === "update_postimage", "insert")
          .when(col("_change_type") === "update_preimage", "delete")
          .otherwise(col("_change_type")))
      .drop("_commit_timestamp"))
    assert(canon(sidecar) == canon(derived))
  }

  test("vacuum reclaims unreferenced change sidecars; changes then fails loud") {
    val t = fixture("cdfscvac")
    val v0 = t.latestVersion
    t.delete("k < 50")
    val sidecarRoot = java.nio.file.Paths.get(t.location, "_graft_cdc")
    def sidecars: Long = {
      val s = java.nio.file.Files.list(sidecarRoot)
      try s.count() finally s.close()
    }
    assert(sidecars == 1)
    // still referenced by a retained version: a vacuum keeping it is a no-op
    t.vacuum(retainVersions = 2, minAgeMillis = 0)
    assert(sidecars == 1)
    assert(t.changes(v0).count() == 50)
    // age floor: unreferenced but young sidecars survive
    t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
    t.vacuum(retainVersions = 1)
    assert(sidecars == 1)
    t.vacuum(retainVersions = 1, minAgeMillis = 0)
    assert(sidecars == 0)
    val e = intercept[IllegalStateException](t.changes(v0).count())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("changes on a vacuumed range fails loud") {
    val t = fixture("cdfvac")
    val v0 = t.latestVersion
    t.delete("k < 50")
    t.optimize(targetFileSizeBytes = 128L * 1024 * 1024)
    t.vacuum(retainVersions = 1, minAgeMillis = 0)
    val e = intercept[IllegalStateException](t.changes(v0).count())
    assert(e.getMessage.contains("vacuumed"))
  }

  test("timestamp time travel resolves the version committed at-or-before") {
    val t = ManagedTable.create(Seq((1L, 1L, 1L)).toDF("k", "grp", "v"),
      tmpDir("tsasof"))
    Thread.sleep(15)
    val betweenV0andV1 = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(Seq((2L, 2L, 2L)).toDF("k", "grp", "v"))
    Thread.sleep(15)
    val afterV1 = System.currentTimeMillis()
    assert(t.versionAsOf(betweenV0andV1) == 0L)
    assert(t.versionAsOf(afterV1) == 1L)
    assert(t.toDFAsOf(betweenV0andV1).count() == 1)
    assert(t.toDFAsOf(afterV1).count() == 2)
    intercept[IllegalArgumentException](t.versionAsOf(0L))
  }

  test("range validation and empty ranges") {
    val t = fixture("cdfrange")
    val v = t.latestVersion
    assert(t.changes(v, v).count() == 0) // empty range, CDF schema intact
    intercept[IllegalArgumentException](t.changes(v + 1))
    intercept[IllegalArgumentException](t.changes(0, v + 5))
  }
}
