package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{GraftTypeError, SparkSpec}
import graft.tables.ManagedTable

/** Vectors from tests/test_public_interface.py:372-471. */
class DedupSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("col1", IntegerType),
    StructField("col2", StringType),
    StructField("col3", StringType)))

  test("kill_duplicates removes every member of dup groups (tests:372-398)") {
    val data = df(schema, Seq(
      Row(1, "A", "A"), // duplicate
      Row(2, "A", "B"),
      Row(3, "A", "A"), // duplicate
      Row(4, "A", "A"), // duplicate
      Row(5, "B", "B"), // duplicate
      Row(6, "D", "D"),
      Row(9, "B", "B"))) // duplicate
    val out = Dedup.killDuplicates(data, Seq("col3", "col2"))
    assertDfEquality(out, df(schema, Seq(Row(2, "A", "B"), Row(6, "D", "D"))))
  }

  test("kill_duplicates table shell") {
    val loc = tmpDir("kill")
    val t = ManagedTable.create(
      df(schema, Seq(Row(1, "A", "A"), Row(2, "A", "B"), Row(3, "A", "A"))), loc)
    Dedup.killDuplicates(t, Seq("col2", "col3"))
    assertDfEquality(t.toDF, df(schema, Seq(Row(2, "A", "B"))))
  }

  test("drop_duplicates_pkey keeps min-pkey survivor (tests:401-429)") {
    val s4 = StructType(schema.fields :+ StructField("col4", IntegerType))
    val data = df(s4, Seq(
      Row(1, "A", "A", 1), // duplicate
      Row(2, "A", "B", 2),
      Row(3, "A", "A", 3), // duplicate
      Row(4, "A", "A", 4), // duplicate
      Row(5, "B", "B", 5), // duplicate
      Row(6, "D", "D", 6),
      Row(9, "B", "B", 9))) // duplicate
    val out = Dedup.dropDuplicatesPkey(data, "col1", Seq("col2", "col3"))
    assertDfEquality(out, df(s4, Seq(
      Row(1, "A", "A", 1), Row(2, "A", "B", 2),
      Row(5, "B", "B", 5), Row(6, "D", "D", 6))))
  }

  test("drop_duplicates collapses full duplicates (tests:449-471)") {
    val data = df(schema, Seq(
      Row(1, "A", "A"), Row(1, "A", "A"), Row(1, "A", "A"), Row(1, "A", "A")))
    val out = Dedup.dropDuplicates(data, Seq("col1"))
    assert(out.count() == 1)
  }

  test("validation errors (tests:432-446)") {
    val data = df(schema, Seq(Row(1, "A", "A")))
    assertThrows[GraftTypeError](Dedup.killDuplicates(data, Nil))
    assertThrows[GraftTypeError](Dedup.killDuplicates(data, Seq("nope")))
    assertThrows[GraftTypeError](Dedup.dropDuplicatesPkey(data, "", Seq("col2")))
    assertThrows[GraftTypeError](Dedup.dropDuplicatesPkey(data, "col1", Nil))
    assertThrows[GraftTypeError](
      Dedup.dropDuplicatesPkey(data, "col1", Seq("col1", "col2")))
    assertThrows[GraftTypeError](Dedup.dropDuplicates(data, Nil))
  }
}
