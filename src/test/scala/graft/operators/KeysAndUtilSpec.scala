package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{GraftTypeError, GraftValueError, SparkSpec}
import graft.functions._
import graft.tables.ManagedTable

/** Vectors from tests/test_public_interface.py:673-867 and :1146-1169. */
class KeysAndUtilSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("col1", IntegerType),
    StructField("col2", StringType),
    StructField("col3", StringType)))

  test("is_composite_key_candidate (tests:~440)") {
    val data = df(schema, Seq(
      Row(1, "A", "A"), Row(2, "B", "B"), Row(3, "A", "A")))
    assert(Keys.isCompositeKeyCandidate(data, Seq("col1")))
    assert(!Keys.isCompositeKeyCandidate(data, Seq("col2", "col3")))
    assertThrows[GraftTypeError](Keys.isCompositeKeyCandidate(data, Nil))
    assertThrows[GraftTypeError](Keys.isCompositeKeyCandidate(data, Seq("nope")))
  }

  test("find_composite_key_candidates (tests:737-760)") {
    val data = df(schema, Seq(
      Row(1, "a", "z"), Row(1, "a", "b"), Row(3, "c", "b")))
    // col1 not unique, col2 not unique, col3 not unique; (col1,col3) unique
    assert(Keys.findCompositeKeyCandidates(data) == Seq("col1", "col3"))
  }

  test("find_composite_key_candidates no-candidate raises (tests:763-778)") {
    // every proper subset of columns has a duplicate; only the full set is unique
    val d2 = df(schema, Seq(
      Row(1, "a", "x"), Row(1, "a", "y"), Row(1, "b", "x"), Row(2, "a", "x")))
    assertThrows[GraftValueError](Keys.findCompositeKeyCandidates(d2))
  }

  test("with_md5_cols golden hashes incl. NULL skip (tests:781-812)") {
    val data = df(schema, Seq(Row(1, "a", null), Row(2, "b", "c")))
    val out = withMd5Cols(data, Seq("col2", "col3"))
    assert(out.columns.contains("md5_col2_col3"))
    val got = out.collect().map(r => r.getInt(0) -> r.getString(3)).toMap
    // md5("a") — NULL skipped by concat_ws; md5("b||c")
    assert(got(1) == "0cc175b9c0f1b6a831c399e269772661")
    assert(got(2) == "6b5183c67c92a31a32ad041ebd8ca8f9")
  }

  test("humanize_bytes SI and binary (tests:723-734)") {
    assert(humanizeBytes(12345678L) == "12.35 MB")
    assert(humanizeBytes(1234567890L) == "1.23 GB")
    assert(humanizeBytes(999L) == "1.00 kB") // 999 >= 900 → kB per reference
    assert(humanizeBytes(899L) == "899 B")
    assert(humanizeBytesBinary(12345678L) == "11.77 MB")
    assert(humanizeBytesBinary(899L) == "899 B")
  }

  test("delta_file_sizes + show (tests:673-720)") {
    val loc = tmpDir("fs")
    val t = ManagedTable.create(df(schema, Seq(
      Row(1, "A", "B"), Row(2, "C", "D"))), loc, partitionBy = Seq("col1"))
    val s = TableOps.fileSizes(t)
    assert(s.numberOfFiles == 2)
    assert(s.sizeInBytes > 0)
    assert(s.averageFileSizeInBytes == math.round(s.sizeInBytes.toDouble / 2))
    val line = TableOps.describeFileSizes(t)
    assert(line.startsWith("The delta table contains 2 files with a size of"))
  }

  test("latest_version counts commits (tests:815-839)") {
    val loc = tmpDir("lv")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "A", "B"))), loc)
    t.append(df(schema, Seq(Row(2, "C", "D"))))
    t.append(df(schema, Seq(Row(3, "E", "F"))))
    assert(TableOps.latestVersion(t) == 2L)
  }

  test("copy_table preserves data, partitioning, properties (tests:474-501)") {
    val loc = tmpDir("cp")
    val t = ManagedTable.create(
      df(schema, Seq(Row(1, "A", "B"), Row(2, "C", "D"))), loc,
      partitionBy = Seq("col1"), properties = Map("k" -> "v"))
    val target = tmpDir("cp-out")
    val c = TableOps.copyTable(t, target)
    assertDfEquality(
      c.toDF.select("col2", "col3", "col1"),
      t.toDF.select("col2", "col3", "col1"))
    assert(c.partitionColumns == Seq("col1"))
    assert(c.properties == Map("k" -> "v"))
    assert(c.latestVersion == 0) // history not copied
  }

  test("rename_delta_table (tests:1146-1169)") {
    val loc = tmpDir("rn")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "A", "B"))), loc)
    val t2 = TableOps.renameTable(t, loc + "_new")
    assert(t2.toDF.count() == 1)
  }

  test("copy_table/rename to session catalog (saveAsTable branches)") {
    val loc = tmpDir("cat")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "A", "B"), Row(2, "C", "D"))),
      loc, partitionBy = Seq("col1"))
    TableOps.copyTableToCatalog(t, "graft_copy_test")
    assert(spark.catalog.tableExists("graft_copy_test"))
    assert(spark.table("graft_copy_test").count() == 2)
    TableOps.renameToCatalog(t, "graft_rename_test")
    assert(spark.catalog.tableExists("graft_rename_test"))
    assert(spark.table("graft_rename_test").count() == 2)
    spark.sql("DROP TABLE graft_copy_test")
    spark.sql("DROP TABLE graft_rename_test")
    assertThrows[graft.GraftTypeError](TableOps.copyTableToCatalog(t, ""))
  }



  test("diff classifies inserts/deletes/updates; no-ops are absent") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = new StructType().add("k", LongType).add("a", StringType)
      .add("b", LongType)
    val oldDf = df(schema, Seq(
      Row(1L, "same", 10L), // untouched -> absent
      Row(2L, "was", 20L),  // a changes
      Row(3L, "x", 30L),    // deleted
      Row(4L, null, 40L),   // null -> value: update on a
      Row(5L, "y", null)))  // value -> null: update on b
    val newDf = df(schema, Seq(
      Row(1L, "same", 10L),
      Row(2L, "now", 20L),
      Row(4L, "filled", 40L),
      Row(5L, "y", null),   // null == null under <=>: NOT an update
      Row(6L, "fresh", 60L)))
    val got = TableOps.diff(oldDf, newDf, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (2L, "update", "a"),
      (3L, "delete", ""),
      (4L, "update", "a"),
      (6L, "insert", "")))
  }

  test("diff sees schema evolution as updates on the new column") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val oldDf = df(new StructType().add("k", LongType).add("a", StringType),
      Seq(Row(1L, "x")))
    val newDf = df(new StructType().add("k", LongType).add("a", StringType)
      .add("extra", LongType), Seq(Row(1L, "x", 9L)))
    val got = TableOps.diff(oldDf, newDf, Seq("k")).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "update")
    assert(got.head.getString(2) == "extra")
  }

  test("diff of identical frames is empty; multi-column changes list " +
    "in schema order") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = new StructType().add("k", LongType).add("a", StringType)
      .add("b", LongType)
    val d1 = df(schema, Seq(Row(1L, "x", 1L)))
    assert(TableOps.diff(d1, d1, Seq("k")).count() == 0)
    val d2 = df(schema, Seq(Row(1L, "y", 2L)))
    val r = TableOps.diff(d1, d2, Seq("k")).head()
    assert(r.getString(2) == "a,b")
  }
}
