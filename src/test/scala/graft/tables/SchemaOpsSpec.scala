package graft.tables

import graft.{GraftValueError, SparkSpec}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Logical DROP COLUMN (schema-only, tombstoned names) and FSCK
  * (missing-file report/repair).
  */
class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("a", IntegerType),
    StructField("b", StringType)))

  test("drop column: reads project it away; data files untouched") {
    val loc = tmpDir("dc1")
    val t = ManagedTable.create(
      df(schema, Seq(Row(1, 10, "x"), Row(2, 20, "y"))), loc)
    t.dropColumn("a")
    assert(t.schema.fieldNames.toSeq == Seq("k", "b"))
    assert(t.toDF.columns.toSeq == Seq("k", "b"))
    assert(t.toDF.count() == 2)
    // time travel BEFORE the drop still sees the column
    assert(t.toDF(0).columns.toSeq == Seq("k", "a", "b"))
    // appends with the remaining schema work; new files lack the column
    t.append(Seq((3, "z")).toDF("k", "b"))
    assert(t.toDF.count() == 3)
  }

  test("dropped names are tombstoned: re-adding refuses (no resurrection)") {
    val loc = tmpDir("dc2")
    val t = ManagedTable.create(df(schema, Seq(Row(1, 10, "x"))), loc)
    t.dropColumn("a")
    intercept[IllegalArgumentException] {
      t.addColumns(Seq(StructField("a", IntegerType)))
    }
    intercept[IllegalArgumentException] {
      t.append(Seq((2, 99, "w")).toDF("k", "a", "b"), mergeSchema = true)
    }
    // a CASE-VARIANT of the dropped name refuses too (reads resolve
    // case-insensitively, so "A" would resurrect "a"'s bytes)
    intercept[IllegalArgumentException] {
      t.addColumns(Seq(StructField("A", IntegerType)))
    }
    // a FRESH name evolves fine
    t.addColumns(Seq(StructField("a2", IntegerType)))
    assert(t.schema.fieldNames.toSeq == Seq("k", "b", "a2"))
  }

  test("drop column guards: partition column, constraint reference, last column") {
    val loc = tmpDir("dc3")
    val t = ManagedTable.create(
      df(schema, Seq(Row(1, 10, "x"))), loc, partitionBy = Seq("b"))
    intercept[IllegalArgumentException] { t.dropColumn("b") }
    t.addCheckConstraint("apos", "a > 0")
    intercept[GraftValueError] { t.dropColumn("a") }
    t.dropCheckConstraint("apos")
    t.dropColumn("a") // now fine
    // NOT NULL bookkeeping retires with the column
    val t2 = ManagedTable.create(
      df(StructType(schema.fields.take(2)), Seq(Row(1, 10))), tmpDir("dc3b"))
    t2.setNotNull("a")
    t2.dropColumn("a")
    assert(t2.checkConstraints.isEmpty, "notnull_a retired with the column")
  }

  test("SQL ALTER TABLE DROP COLUMN routes") {
    val loc = tmpDir("dc4")
    ManagedTable.create(df(schema, Seq(Row(1, 10, "x"))), loc)
    spark.sql(s"ALTER TABLE graft.`$loc` DROP COLUMN a")
    assert(ManagedTable.forPath(spark, loc).schema.fieldNames.toSeq ==
      Seq("k", "b"))
  }

  test("fsck reports and repairs a missing data file; DV loss refuses repair") {
    val loc = tmpDir("fsck1")
    val t = ManagedTable.create(df(schema, Seq(Row(1, 10, "x"))), loc)
    t.append(df(schema, Seq(Row(2, 20, "y"))))
    assert(t.fsck() == Seq.empty, "healthy table reports nothing")
    // delete a ROW-BEARING data file out-of-band (the 2-partition df
    // helper can emit empty part files; deleting one of those would
    // repair back to the full row count)
    val victim = t.latestEntry.files.find(_.rows > 0).get.path
    Files.delete(Paths.get(loc, "data", victim))
    val missing = t.fsck()
    assert(missing == Seq(victim))
    intercept[Exception] { t.toDF.count() } // reads fail until repaired
    val repaired = t.fsck(repair = true)
    assert(repaired == Seq(victim))
    assert(t.toDF.count() == 1, "surviving file's row remains readable")
    assert(t.fsck() == Seq.empty)
  }

  test("SQL FSCK REPAIR TABLE and DRY RUN") {
    val loc = tmpDir("fsck2")
    val t = ManagedTable.create(df(schema, Seq(Row(1, 10, "x"))), loc)
    t.append(df(schema, Seq(Row(2, 20, "y"))))
    val victim = t.latestEntry.files.find(_.rows > 0).get.path
    Files.delete(Paths.get(loc, "data", victim))
    val dry = spark.sql(s"FSCK REPAIR TABLE graft.`$loc` DRY RUN").collect()
    assert(dry.map(_.getString(0)).toSeq == Seq(victim) && !dry.head.getBoolean(1))
    assert(ManagedTable.forPath(spark, loc).fsck().nonEmpty, "dry run repaired nothing")
    val fix = spark.sql(s"FSCK REPAIR TABLE graft.`$loc`").collect()
    assert(fix.head.getBoolean(1))
    assert(ManagedTable.forPath(spark, loc).toDF.count() == 1)
  }
}
