package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class ManagedTableSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("col1", IntegerType),
    StructField("col2", StringType)))

  test("create / toDF round-trip") {
    val loc = tmpDir("mt")
    val data = df(schema, Seq(Row(1, "a"), Row(2, "b")))
    val t = ManagedTable.create(data, loc)
    assertDfEquality(t.toDF, data)
    assert(t.latestVersion == 0)
  }

  test("append adds rows and bumps version") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    t.append(df(schema, Seq(Row(2, "b"))))
    t.append(df(schema, Seq(Row(3, "c"))))
    assert(t.latestVersion == 2)
    assert(t.toDF.count() == 3)
  }

  test("overwrite replaces contents atomically") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"), Row(2, "b"))), loc)
    t.overwrite(df(schema, Seq(Row(9, "z"))))
    assertDfEquality(t.toDF, df(schema, Seq(Row(9, "z"))))
    assert(t.latestVersion == 1)
  }

  test("mergeSchema append null-fills old rows, keeps union schema") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    val evolved = StructType(schema.fields :+ StructField("col3", StringType))
    t.append(df(evolved, Seq(Row(2, "b", "x"))), mergeSchema = true)
    assertDfEquality(t.toDF,
      df(evolved, Seq(Row(1, "a", null), Row(2, "b", "x"))))
  }

  test("non-mergeSchema append aligns to table schema") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    // append frame missing col2 → null-filled
    t.append(Seq(5).toDF("col1"))
    assertDfEquality(t.toDF, df(schema, Seq(Row(1, "a"), Row(5, null))))
  }

  test("append resolves case-flipped columns; mergeSchema never duplicates " +
       "a case-pair; a genuinely ambiguous frame raises") {
    val loc = tmpDir("mtci")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    // case-flipped frame lands values in the existing columns
    t.append(Seq((2, "b")).toDF("COL1", "Col2"))
    assertDfEquality(t.toDF, df(schema, Seq(Row(1, "a"), Row(2, "b"))))
    // mergeSchema must treat COL1 as col1, not add a duplicate column
    t.append(Seq((3, "c")).toDF("COL1", "col2"), mergeSchema = true)
    assert(t.schema.fieldNames.toSeq == Seq("col1", "col2"),
      "no case-pair duplicate column may be committed")
    assert(t.toDF.count() == 3)
    // two frame columns differing only in case for one table column:
    // raise (as Spark's analyzer would), never silently null-fill
    val e = intercept[IllegalArgumentException](
      t.append(Seq((4, "d", "dd")).toDF("col1", "COL2", "Col2")))
    assert(e.getMessage.contains("Ambiguous"))
    assert(t.toDF.count() == 3, "failed append must not land rows")
  }

  test("partitioned table round-trips partition column") {
    val loc = tmpDir("mt")
    val data = df(schema, Seq(Row(1, "a"), Row(2, "b"), Row(3, "a")))
    val t = ManagedTable.create(data, loc, partitionBy = Seq("col2"))
    assertDfEquality(
      t.toDF.select("col1", "col2"),
      data)
    assert(t.partitionColumns == Seq("col2"))
    assert(t.detail.numFiles >= 2) // one file per partition value at least
  }

  test("properties persist and update") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc,
      properties = Map("delta.constraints.c1" -> "col1 > 0"))
    assert(t.properties("delta.constraints.c1") == "col1 > 0")
    t.setProperties(Map("k" -> "v"))
    assert(t.properties.size == 2)
  }

  test("history and detail") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    t.append(df(schema, Seq(Row(2, "b"))))
    val h = t.history.collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(h.map(_.getString(2)).toSeq == Seq("CREATE", "APPEND"))
    val d = t.detail
    assert(d.numFiles > 0 && d.sizeInBytes > 0)
  }

  test("time travel and restore") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    t.append(df(schema, Seq(Row(2, "b"))))
    t.overwrite(df(schema, Seq(Row(9, "z"))))
    assert(t.toDF(0).count() == 1)
    assert(t.toDF(1).count() == 2)
    assertDfEquality(t.toDF(2), t.toDF)
    assertThrows[IllegalArgumentException](t.toDF(3))
    t.restore(1)
    assert(t.latestVersion == 3)
    assertDfEquality(t.toDF, df(schema, Seq(Row(1, "a"), Row(2, "b"))))
    // original v2 still readable after restore
    assert(t.toDF(2).count() == 1)
  }

  test("concurrent commit to an already-taken version conflicts") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    // two writers race from the same snapshot: writer A commits v1 …
    val stale = t.latestEntry
    t.append(df(schema, Seq(Row(2, "b"))))
    // … writer B, still holding the v0 snapshot, tries to commit v1 too
    val e = intercept[IllegalStateException] {
      t.commit(stale.copy(version = stale.version + 1))
    }
    assert(e.getMessage.contains("Concurrent commit"))
    assert(t.latestVersion == 1) // log unchanged by the failed commit
  }

  test("rename moves the table") {
    val loc = tmpDir("mt")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "a"))), loc)
    val newLoc = loc + "_renamed"
    val t2 = t.rename(newLoc)
    assert(!ManagedTable.exists(loc))
    assert(ManagedTable.exists(newLoc))
    assert(t2.toDF.count() == 1)
  }
}
