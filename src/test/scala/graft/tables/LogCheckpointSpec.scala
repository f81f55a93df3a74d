package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Log checkpointing: history stops scanning O(versions) entry files, and
  * the log itself can be truncated without losing history.
  */
class LogCheckpointSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("col1", IntegerType), StructField("col2", StringType)))

  /** One data commit + `n` cheap metadata commits. */
  private def manyCommits(loc: String, n: Int): ManagedTable = {
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    (1 to n).foreach(i => t.setProperties(Map("i" -> i.toString)))
    t
  }

  test("a rolling checkpoint is written and history reads from it") {
    val loc = tmpDir("cp")
    val t = manyCommits(loc, 104) // v0..v104; checkpoints at v20, 40, ..., v100
    assert(Files.isRegularFile(Paths.get(loc, "_graft_log", "checkpoint.json")))
    val h = t.history.collect()
    assert(h.length == 105)
    assert(h.map(_.getLong(0)).sorted.toSeq == (0L to 104L))
    // PROOF history comes from the checkpoint: delete the entry files the
    // checkpoint covers (v0..v99 — beyond any retention) and re-read
    (0L to 99L).foreach(v =>
      Files.delete(Paths.get(loc, "_graft_log", s"v$v.json")))
    val t2 = ManagedTable.forPath(spark, loc)
    assert(t2.history.count() == 105,
      "history must survive the loss of checkpointed entry files")
    assert(t2.toDF.count() == 1, "latest snapshot unaffected")
    // time travel past the cleaned window fails loudly, not with ENOENT
    val e = intercept[IllegalStateException](t2.toDF(50).collect())
    assert(e.getMessage.contains("cleaned"))
  }

  test("cleanupLog truncates old entries; history and reads stay intact") {
    val loc = tmpDir("cp2")
    val t = manyCommits(loc, 44) // v0..v44, checkpoints at v20, v40
    val removed = t.cleanupLog(keepVersions = 10)
    assert(removed == 35, s"v0..v34 should go (≤ min(cp=40, 44-10)), got $removed")
    assert(t.history.count() == 45)
    assert(t.toDF.count() == 1)
    assert(t.latestVersion == 44)
    // retained window still time-travels
    assert(t.toDF(40).count() == 1)
    // vacuum within the kept window still works
    val (_, _) = t.vacuum(retainVersions = 5, minAgeMillis = 0)
    assert(t.toDF.count() == 1)
  }

  test("checkpoint write failures cannot fail commits (derived artifact)") {
    val loc = tmpDir("cp3")
    val t = manyCommits(loc, 19) // next commit (v20) triggers a checkpoint
    // poison: make checkpoint.json a DIRECTORY so the atomic move fails
    Files.createDirectories(Paths.get(loc, "_graft_log", "checkpoint.json"))
    t.setProperties(Map("i" -> "20")) // must not throw
    assert(t.latestVersion == 20)
    assert(t.history.count() == 21) // falls back to per-version reads
  }
}
