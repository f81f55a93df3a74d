package graft.tables

import graft.{GraftValueError, SparkSpec}
import org.apache.spark.SparkThrowable
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table-level CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT`
  * analog): add-time validation of existing rows, per-row write-time
  * enforcement through EVERY write path (append, overwrite, UPDATE,
  * MERGE), NULL-as-violation semantics, and the SQL statements.
  */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("v", IntegerType)))

  private def fresh(name: String): ManagedTable =
    ManagedTable.create(
      df(schema, Seq(Row(1, 10), Row(2, 20))), tmpDir(name))

  test("add validates existing rows; violating data refuses the constraint") {
    val t = fresh("ck1")
    intercept[GraftValueError] { t.addCheckConstraint("vpos", "v > 15") }
    t.addCheckConstraint("vpos", "v > 0")
    assert(t.checkConstraints == Map("vpos" -> "v > 0"))
    intercept[IllegalArgumentException] {
      t.addCheckConstraint("vpos", "v > 1") // duplicate name
    }
  }

  test("append enforces per row and fails loud; valid appends pass") {
    val t = fresh("ck2")
    t.addCheckConstraint("vpos", "v > 0")
    t.append(df(schema, Seq(Row(3, 30)))) // fine
    val e = intercept[SparkThrowable] {
      t.append(df(schema, Seq(Row(4, 40), Row(5, -1))))
    }
    val msg = e.asInstanceOf[Throwable].getMessage
    assert(msg.contains("vpos"), s"message names the constraint: $msg")
    assert(t.toDF.count() == 3, "failed write must not commit")
  }

  test("NULL check results violate (reference quarantine semantics)") {
    val t = fresh("ck3")
    t.addCheckConstraint("vpos", "v > 0")
    intercept[SparkThrowable] {
      t.append(df(schema, Seq(Row(6, null))))
    }
  }

  test("UPDATE and MERGE enforce too (all writes funnel through one gate)") {
    val t = fresh("ck4")
    t.addCheckConstraint("vpos", "v > 0")
    intercept[SparkThrowable] {
      t.update(Map("v" -> "-v"), Some("k = 1"))
    }
    assert(t.toDF.filter("k = 1").head().getInt(1) == 10, "update rolled back")
    val src = Seq((2, -5)).toDF("k", "v")
    intercept[SparkThrowable] {
      Merge.into(t.toDF, "base").using(src, "source", "base.k = source.k")
        .whenMatchedUpdate(Map("v" -> "source.v"))
        .execute(t)
    }
  }

  test("drop lifts enforcement; IF EXISTS semantics") {
    val t = fresh("ck5")
    t.addCheckConstraint("vpos", "v > 0")
    t.dropCheckConstraint("vpos")
    t.append(df(schema, Seq(Row(7, -7)))) // no longer enforced
    assert(t.toDF.filter("v < 0").count() == 1)
    intercept[GraftValueError] { t.dropCheckConstraint("vpos") }
    t.dropCheckConstraint("vpos", ifExists = true) // no-op
  }

  test("SQL ADD/DROP CONSTRAINT round-trip") {
    val loc = tmpDir("ck6")
    ManagedTable.create(df(schema, Seq(Row(1, 10))), loc)
    spark.sql(s"ALTER TABLE graft.`$loc` ADD CONSTRAINT vpos CHECK (v > 0)")
    val t = ManagedTable.forPath(spark, loc)
    assert(t.checkConstraints == Map("vpos" -> "v > 0"))
    intercept[SparkThrowable] { t.append(df(schema, Seq(Row(2, -2)))) }
    spark.sql(s"ALTER TABLE graft.`$loc` DROP CONSTRAINT vpos")
    assert(ManagedTable.forPath(spark, loc).checkConstraints.isEmpty)
    spark.sql(s"ALTER TABLE graft.`$loc` DROP CONSTRAINT IF EXISTS vpos")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$loc` DROP CONSTRAINT vpos")
    }
  }

  test("SET NOT NULL validates, flips schema nullability, and enforces writes") {
    val t = fresh("ck8")
    intercept[graft.GraftValueError] { t.setNotNull("missing") }
    t.append(df(schema, Seq(Row(3, null))))
    intercept[GraftValueError] { t.setNotNull("v") } // existing NULL refuses
    t.delete("v IS NULL")
    t.setNotNull("v")
    assert(!t.schema("v").nullable, "schema records the constraint " +
      "(reference constraint_append discovers nullability)")
    intercept[SparkThrowable] { t.append(df(schema, Seq(Row(4, null)))) }
    t.setNotNull("v") // idempotent no-op
    t.dropNotNull("v")
    assert(t.schema("v").nullable)
    t.append(df(schema, Seq(Row(5, null)))) // enforcement lifted
    assert(t.toDF.filter("v IS NULL").count() == 1)
  }

  test("the notnull_* constraint namespace is interlocked with the schema") {
    val t = fresh("ck10")
    t.setNotNull("v")
    // dropping the synthesized constraint directly would leave a
    // non-nullable schema with no enforcement — refused
    intercept[GraftValueError] { t.dropCheckConstraint("notnull_v") }
    // and a user CHECK cannot squat on the reserved namespace
    intercept[IllegalArgumentException] {
      t.addCheckConstraint("notnull_k", "k > 0")
    }
    t.dropNotNull("v") // the sanctioned path retires both together
    assert(t.schema("v").nullable && t.checkConstraints.isEmpty)
  }

  test("SQL ALTER COLUMN SET/DROP NOT NULL round-trip") {
    val loc = tmpDir("ck9")
    ManagedTable.create(df(schema, Seq(Row(1, 10))), loc)
    spark.sql(s"ALTER TABLE graft.`$loc` ALTER COLUMN v SET NOT NULL")
    val t = ManagedTable.forPath(spark, loc)
    assert(!t.schema("v").nullable)
    intercept[SparkThrowable] { t.append(df(schema, Seq(Row(2, null)))) }
    spark.sql(s"ALTER TABLE graft.`$loc` ALTER COLUMN v DROP NOT NULL")
    assert(ManagedTable.forPath(spark, loc).schema("v").nullable)
  }

  test("constraint_append discovers table-level constraints end-to-end") {
    val t = fresh("ck7")
    t.addCheckConstraint("vpos", "v > 0")
    val q = ManagedTable.create(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema),
      tmpDir("ck7q"))
    graft.operators.Appends.constraintAppend(t,
      df(schema, Seq(Row(8, 80), Row(9, -9))), q)
    assert(t.toDF.filter("k = 8").count() == 1)
    assert(q.toDF.collect().map(_.getInt(0)).toSeq == Seq(9))
  }
}
