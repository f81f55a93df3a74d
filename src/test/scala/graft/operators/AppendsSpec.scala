package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{GraftTypeError, SparkSpec}
import graft.tables.ManagedTable

/** Vectors from tests/test_public_interface.py:504-652 and :870-1143. */
class AppendsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("col1", IntegerType),
    StructField("col2", StringType),
    StructField("col3", StringType)))

  test("validate_append with schema evolution (tests:541-583)") {
    val loc = tmpDir("va")
    val t = ManagedTable.create(
      df(schema, Seq(Row(1, "A", "B"))), loc)
    val appendSchema = StructType(Seq(
      StructField("col1", IntegerType),
      StructField("col2", StringType),
      StructField("col4", IntegerType)))
    Appends.validateAppend(t, df(appendSchema, Seq(Row(2, "C", 9))),
      requiredCols = Seq("col1", "col2"), optionalCols = Seq("col4"))
    val expected = StructType(schema.fields :+ StructField("col4", IntegerType))
    assertDfEquality(t.toDF, df(expected,
      Seq(Row(1, "A", "B", null), Row(2, "C", null, 9))))
  }

  test("validate_append rejects disallowed and missing-required cols (tests:586-614)") {
    val loc = tmpDir("va")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "A", "B"))), loc)
    val bad = StructType(Seq(
      StructField("col1", IntegerType), StructField("col5", IntegerType)))
    assertThrows[GraftTypeError](
      Appends.validateAppend(t, df(bad, Seq(Row(1, 2))),
        Seq("col1"), Seq("col4")))
    assertThrows[GraftTypeError](
      Appends.validateAppend(t, df(bad, Seq(Row(1, 2))),
        Seq("col1", "col2"), Seq("col5")))
  }

  test("append_without_duplicates single key (tests:504-538)") {
    val loc = tmpDir("awd")
    val t = ManagedTable.create(df(schema, Seq(
      Row(1, "A", "B"), Row(2, "C", "D"), Row(3, "E", "F"))), loc)
    val append = df(schema, Seq(
      Row(2, "R", "T"), // duplicate key vs target
      Row(8, "A", "B"),
      Row(8, "C", "D"), // duplicate key within append
      Row(10, "X", "Y")))
    Appends.appendWithoutDuplicates(t, append, Seq("col1"))
    assert(t.toDF.count() == 5)
    assert(t.toDF.filter("col1 = 2").count() == 1)
    // survivor for key 2 is the original target row
    assertDfEquality(t.toDF.filter("col1 = 2"),
      df(schema, Seq(Row(2, "C", "D"))))
  }

  test("append_without_duplicates composite keys (tests:617-652)") {
    val loc = tmpDir("awd2")
    val t = ManagedTable.create(df(schema, Seq(
      Row(1, "A", "B"), Row(2, "C", "D"))), loc)
    val append = df(schema, Seq(
      Row(2, "C", "X"), // (col1,col2) collides with target
      Row(3, "E", "F")))
    Appends.appendWithoutDuplicates(t, append, Seq("col1", "col2"))
    assertDfEquality(t.toDF, df(schema, Seq(
      Row(1, "A", "B"), Row(2, "C", "D"), Row(3, "E", "F"))))
  }

  test("constraint_append splits pass/fail rows (tests:870-1005)") {
    val loc = tmpDir("ca")
    val qloc = tmpDir("caq")
    val strict = StructType(Seq(
      StructField("col1", IntegerType, nullable = false),
      StructField("col2", StringType),
      StructField("col3", StringType, nullable = false)))
    val t = ManagedTable.create(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], strict), loc,
      properties = Map(
        "delta.constraints.col1" -> "col1 > 0",
        "delta.constraints.col2" -> "col2 != 'Z'"))
    val q = ManagedTable.create(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), qloc)
    val append = df(schema, Seq(
      Row(1, "A", "B"),
      Row(-1, "C", "D"), // violates col1 > 0
      Row(2, "Z", "F"),  // violates col2 != 'Z'
      Row(3, "E", null), // violates col3 not null
      Row(4, "G", "H")))
    Appends.constraintAppend(t, append, q)
    assertDfEquality(t.toDF,
      df(strict, Seq(Row(1, "A", "B"), Row(4, "G", "H"))))
    assertDfEquality(q.toDF,
      df(schema, Seq(Row(-1, "C", "D"), Row(2, "Z", "F"), Row(3, "E", null))))
  }

  test("constraint_append 3VL: NULL in nullable check column drops row from both") {
    val loc = tmpDir("ca2")
    val qloc = tmpDir("caq2")
    val t = ManagedTable.create(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), loc,
      properties = Map("delta.constraints.col2" -> "col2 != 'Z'"))
    val q = ManagedTable.create(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), qloc)
    Appends.constraintAppend(t, df(schema, Seq(Row(1, null, "B"))), q)
    assert(t.toDF.count() == 0) // filter is NULL
    assert(q.toDF.count() == 0) // NOT(filter) is NULL too — faithful pitfall
  }

  test("constraint_append errors without constraints (tests:~1010)") {
    val loc = tmpDir("ca3")
    val t = ManagedTable.create(df(schema, Seq(Row(1, "A", "B"))), loc)
    assertThrows[GraftTypeError](
      Appends.constraintAppend(t, df(schema, Seq(Row(2, "C", "D"))), null))
  }
}
