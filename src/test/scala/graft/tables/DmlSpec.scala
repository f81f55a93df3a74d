package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DELETE / UPDATE on ManagedTable (Delta `DeltaTable.delete/update`
  * analogs): SQL three-valued semantics, file-granular rewrite (untouched
  * files keep their paths), no-op guards, and conflict commute behavior.
  */
class DmlSpec extends SparkSpec {
  import spark.implicits._

  /** A z-ordered multi-file table over (k, v, tag): k = 0..999. */
  private def fixture(name: String): ManagedTable = {
    val base = spark.range(1000).select(
      col("id").as("k"),
      (col("id") * 2).as("v"),
      concat(lit("t"), (col("id") % 7)).as("tag"))
    val t = ManagedTable.create(base, tmpDir(name))
    t.optimize(targetFileSizeBytes = 2 * 1024, sortBy = Seq("k"))
    assert(t.detail.numFiles >= 4, "fixture must be multi-file")
    t
  }

  private def paths(t: ManagedTable): Set[String] =
    t.fileStats.map(_.path).toSet

  test("delete removes matching rows; only bound-touched files rewrite") {
    val t = fixture("del")
    val before = paths(t)
    val total = t.detail.numFiles
    val n = t.delete("k >= 100 AND k < 150")
    assert(n == 50)
    assertDfEquality(t.toDF,
      spark.range(1000).filter(!(col("id") >= 100 && col("id") < 150))
        .select(col("id").as("k"), (col("id") * 2).as("v"),
          concat(lit("t"), (col("id") % 7)).as("tag")))
    // untouched files survive by path; at least one file was NOT rewritten
    val kept = paths(t) intersect before
    assert(kept.nonEmpty, "expected untouched files kept verbatim")
    assert(kept.size < total, "expected at least one file rewritten")
  }

  test("delete with NULL condition keeps rows (SQL semantics)") {
    val t = ManagedTable.create(
      Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
        .toDF("k", "v"), tmpDir("delnull"))
    // v > 15 is NULL for k=2 → row kept
    assert(t.delete("v > 15") == 1L)
    assertDfEquality(t.toDF,
      Seq((1L, Some(10L)), (2L, Option.empty[Long])).toDF("k", "v"))
  }

  test("delete matching nothing commits nothing (bounds-pruned and counted)") {
    val t = fixture("delnoop")
    val v = t.latestVersion
    assert(t.delete("k > 100000") == 0L) // bounds prove disjoint
    assert(t.delete("k >= 0 AND tag = 'no-such-tag'") == 0L) // counted zero
    assert(t.latestVersion == v, "no-op DML must not burn a version")
  }

  test("delete everything leaves a readable empty table") {
    val t = fixture("delall")
    assert(t.delete("k >= 0") == 1000L)
    assert(t.toDF.count() == 0L)
    assert(t.toDF.columns.toSeq == Seq("k", "v", "tag"))
  }

  test("update applies set expressions over the pre-update row") {
    val t = fixture("upd")
    val before = paths(t)
    val n = t.update(Map("v" -> "v + 1000", "tag" -> "'updated'"),
      Some("k BETWEEN 200 AND 299"))
    assert(n == 100)
    assertDfEquality(t.toDF,
      spark.range(1000).select(
        col("id").as("k"),
        when(col("id").between(200, 299), col("id") * 2 + 1000)
          .otherwise(col("id") * 2).as("v"),
        when(col("id").between(200, 299), lit("updated"))
          .otherwise(concat(lit("t"), (col("id") % 7))).as("tag")))
    assert((paths(t) intersect before).nonEmpty,
      "expected untouched files kept verbatim")
  }

  test("update without condition touches every row; unknown column raises") {
    val t = ManagedTable.create(Seq((1L, 2L)).toDF("k", "v"), tmpDir("updall"))
    assert(t.update(Map("v" -> "v * 10")) == 1L)
    assert(t.toDF.head().getLong(1) == 20L)
    intercept[IllegalArgumentException](t.update(Map("nope" -> "1")))
    intercept[IllegalArgumentException](t.update(Map.empty[String, String]))
  }

  test("history records the DML operations with operation metrics") {
    val t = fixture("hist")
    t.delete("k < 10")
    t.update(Map("v" -> "0"), Some("k > 990"))
    val rows = t.history.orderBy(col("version")).collect()
    val ops = rows.map(_.getString(2)).toSeq
    assert(ops.takeRight(2) == Seq("DELETE", "UPDATE"))
    val metrics = rows.map(r => r.getMap[String, String](3).toMap)
    assert(metrics.last("numUpdatedRows") == "9")
    assert(metrics(rows.length - 2)("numDeletedRows") == "10")
    // every write commit carries the standard output metrics
    assert(metrics.forall(_.contains("numOutputRows")))
    assert(metrics.head("numOutputRows") == "1000") // CREATE
  }

  test("concurrent append with disjoint key bounds commutes with a delete") {
    val t = fixture("delrace")
    // stage the delete's base snapshot, then land an append whose k-bounds
    // are disjoint from the delete's condition before the delete commits
    val base = t.latestEntry
    val extra = Seq((5000L, 1L, "x")).toDF("k", "v", "tag")
    t.append(extra)
    // delete computed against `base` must rebase over the append
    val cond = "k >= 100 AND k < 150"
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(cond)
    val touched = FileStats.prune(base.files, base.schema, parsed)
    val rewritten = t.scanFilesDF(touched, base)
      .filter(!coalesce(expr(cond), lit(false)))
    t.replaceFiles(touched.map(_.path).toSet, rewritten,
      operation = "DELETE", base = base,
      addedMayMatch = added =>
        FileStats.prune(added, base.schema, parsed).nonEmpty)
    assert(t.toDF.count() == 1000 - 50 + 1)
    assert(t.toDF.filter(col("k") === 5000L).count() == 1)
  }

  test("optimize commutes with a concurrent append (both commits land)") {
    val t = fixture("optrace")
    val base = t.latestEntry
    t.append(Seq((7777L, 1L, "x")).toDF("k", "v", "tag"))
    // compaction planned against `base` rebases over the append
    t.optimizeFrom(base, 128L * 1024 * 1024, Nil, Nil)
    assert(t.toDF.count() == 1001)
    assert(t.toDF.filter(col("k") === 7777L).count() == 1)
    val ops = t.history.orderBy(col("version")).collect().map(_.getString(2))
    assert(ops.last == "OPTIMIZE" && ops.init.last == "APPEND")
  }

  test("optimize raises when a concurrent DML rewrote a compacted file") {
    val t = fixture("optconf")
    val base = t.latestEntry
    assert(t.delete("k < 100") > 0) // removes files optimize would compact
    intercept[ConcurrentCommitException](
      t.optimizeFrom(base, 128L * 1024 * 1024, Nil, Nil))
  }

  test("concurrent overlapping append raises for a delete on the same keys") {
    val t = fixture("delconf")
    val base = t.latestEntry
    t.append(Seq((120L, 1L, "x")).toDF("k", "v", "tag")) // inside [100,150)
    val cond = "k >= 100 AND k < 150"
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(cond)
    val touched = FileStats.prune(base.files, base.schema, parsed)
    val rewritten = t.scanFilesDF(touched, base)
      .filter(!coalesce(expr(cond), lit(false)))
    intercept[ConcurrentCommitException] {
      t.replaceFiles(touched.map(_.path).toSet, rewritten,
        operation = "DELETE", base = base,
        addedMayMatch = added =>
          FileStats.prune(added, base.schema, parsed).nonEmpty)
    }
  }
}
