package graft.tables

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

class MergeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("pkey", IntegerType),
    StructField("attr", StringType)))

  private def target = df(schema, Seq(Row(1, "A"), Row(2, "B"), Row(3, "C")))

  test("whenMatchedUpdate rewrites matching rows, 3VL condition") {
    val src = df(schema, Seq(Row(2, "B2"), Row(3, null), Row(4, "D")))
    val out = Merge.into(target, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenMatchedUpdate(
        condition = "src.attr <> base.attr", // NULL for pkey=3 → no-op
        set = Map("attr" -> "src.attr"))
      .result()
    assertDfEquality(out, df(schema,
      Seq(Row(1, "A"), Row(2, "B2"), Row(3, "C"))))
  }

  test("whenMatchedDelete removes matches; others untouched") {
    val src = df(schema, Seq(Row(1, "x"), Row(3, "y")))
    val out = Merge.into(target, "old")
      .using(src, "new", "old.pkey = new.pkey")
      .whenMatchedDelete()
      .result()
    assertDfEquality(out, df(schema, Seq(Row(2, "B"))))
  }

  test("whenNotMatchedInsert with value map; non-matching source rows only") {
    val src = df(schema, Seq(Row(2, "B2"), Row(5, "E")))
    val out = Merge.into(target, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenNotMatchedInsert(Map("pkey" -> "src.pkey", "attr" -> "upper(src.attr)"))
      .result()
    assertDfEquality(out, df(schema,
      Seq(Row(1, "A"), Row(2, "B"), Row(3, "C"), Row(5, "E"))))
  }

  test("whenNotMatchedInsertAll copies source row") {
    val src = df(schema, Seq(Row(5, "E"), Row(1, "dup")))
    val out = Merge.into(target, "old")
      .using(src, "new", "old.pkey = new.pkey")
      .whenNotMatchedInsertAll()
      .result()
    assert(out.count() == 4)
  }

  test("NULL-mergeKey staging rows never match and fall to insert") {
    // the SCD2 staging pattern: source has mergeKey column, NULL rows insert
    val srcSchema = StructType(Seq(
      StructField("mergeKey", IntegerType),
      StructField("pkey", IntegerType),
      StructField("attr", StringType)))
    val src = df(srcSchema, Seq(Row(null, 2, "B2"), Row(2, 2, "B2")))
    val out = Merge.into(target, "base")
      .using(src, "staged", "base.pkey = mergeKey")
      .whenMatchedUpdate(condition = "staged.attr <> base.attr",
        set = Map("attr" -> "staged.attr"))
      .whenNotMatchedInsert(Map("pkey" -> "staged.pkey", "attr" -> "staged.attr"))
      .result()
    // matched row 2 updated to B2; NULL-mergeKey row inserts a second (2,B2)
    assertDfEquality(out, df(schema,
      Seq(Row(1, "A"), Row(2, "B2"), Row(2, "B2"), Row(3, "C"))))
  }

  test("multiple source rows matching one target row errors") {
    val src = df(schema, Seq(Row(2, "x"), Row(2, "y")))
    val b = Merge.into(target, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenMatchedUpdate(Map("attr" -> "src.attr"))
    val e = intercept[Exception](b.result().collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("matched by multiple source rows")),
      s"unexpected error: $e")
  }

  test("clause order: first matching clause wins") {
    val src = df(schema, Seq(Row(1, "del"), Row(2, "upd")))
    val out = Merge.into(target, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenMatchedDelete(condition = "src.attr = 'del'")
      .whenMatchedUpdate(Map("attr" -> "src.attr"))
      .result()
    assertDfEquality(out, df(schema, Seq(Row(2, "upd"), Row(3, "C"))))
  }

  test("execute() overwrites a ManagedTable") {
    val loc = tmpDir("merge")
    val t = ManagedTable.create(target, loc)
    val src = df(schema, Seq(Row(1, "zz")))
    Merge.into(t.toDF, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenMatchedUpdate(Map("attr" -> "src.attr"))
      .execute(t)
    assertDfEquality(t.toDF, df(schema,
      Seq(Row(1, "zz"), Row(2, "B"), Row(3, "C"))))
  }

  private val srcEvoSchema = StructType(Seq(
    StructField("pkey", IntegerType),
    StructField("attr", StringType),
    StructField("tag", StringType)))

  test("a clause column the target lacks raises without withSchemaEvolution") {
    val src = df(srcEvoSchema, Seq(Row(5, "E", "t5")))
    val b = Merge.into(target, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenNotMatchedInsert(Map(
        "pkey" -> "src.pkey", "attr" -> "src.attr", "tag" -> "src.tag"))
    val e = intercept[graft.GraftTypeError](b.result().collect())
    assert(e.getMessage.contains("tag"))
  }

  test("withSchemaEvolution: insert/update clauses evolve one new column " +
       "end-to-end through execute()") {
    val t = ManagedTable.create(target, tmpDir("mergevo"))
    val src = df(srcEvoSchema, Seq(Row(2, "B2", "t2"), Row(5, "E", "t5")))
    Merge.into(t.toDF, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenMatchedUpdate(Map("attr" -> "src.attr", "tag" -> "src.tag"))
      .whenNotMatchedInsert(Map(
        "pkey" -> "src.pkey", "attr" -> "src.attr", "tag" -> "src.tag"))
      .withSchemaEvolution()
      .execute(t)
    // schema is the union, new column nullable; untouched rows read NULL
    assert(t.schema.fieldNames.toSeq == Seq("pkey", "attr", "tag"))
    assert(t.schema("tag").nullable)
    assertDfEquality(t.toDF, df(
      StructType(srcEvoSchema.map(_.copy(nullable = true))),
      Seq(Row(1, "A", null), Row(2, "B2", "t2"), Row(3, "C", null),
        Row(5, "E", "t5"))))
    // the widening is its own auditable commit
    val ops = t.history.select("operation").collect().map(_.getString(0)).toSeq
    assert(ops.contains("ADD COLUMNS"))
    // time travel to the pre-merge version still works (null-filled read)
    assert(t.toDF(0L).count() == 3)
  }

  test("withSchemaEvolution: insertAll widens by every extra source column, " +
       "typed from the source") {
    val wide = StructType(Seq(
      StructField("pkey", IntegerType),
      StructField("attr", StringType),
      StructField("score", DoubleType)))
    val t = ManagedTable.create(target, tmpDir("mergevoall"))
    val src = df(wide, Seq(Row(6, "F", 0.5)))
    Merge.into(t.toDF, "base")
      .using(src, "src", "base.pkey = src.pkey")
      .whenNotMatchedInsertAll()
      .withSchemaEvolution()
      .execute(t)
    assert(t.schema("score").dataType == DoubleType)
    assert(t.toDF.count() == 4)
    assert(t.toDF.filter("pkey = 6").head().getDouble(2) == 0.5)
    assert(t.toDF.filter("pkey = 1").head().isNullAt(2))
  }

  test("withSchemaEvolution is a no-op when no new columns appear") {
    val t = ManagedTable.create(target, tmpDir("mergevonone"))
    val v0 = t.latestVersion
    Merge.into(t.toDF, "base")
      .using(df(schema, Seq(Row(1, "zz"))), "src", "base.pkey = src.pkey")
      .whenMatchedUpdate(Map("attr" -> "src.attr"))
      .withSchemaEvolution()
      .execute(t)
    val ops = t.history.select("operation").collect().map(_.getString(0)).toSeq
    assert(!ops.contains("ADD COLUMNS"), "no widening commit without new columns")
    assert(t.latestVersion == v0 + 1)
    assertDfEquality(t.toDF, df(schema,
      Seq(Row(1, "zz"), Row(2, "B"), Row(3, "C"))))
  }

  test("whenNotMatchedBySourceDelete syncs deletions (full replication)") {
    val src = df(schema, Seq(Row(2, "B2"), Row(5, "E")))
    val out = Merge.into(target, "t")
      .using(src, "s", "t.pkey = s.pkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceDelete()
      .result()
    // target becomes exactly the source: 1/3 deleted, 2 updated, 5 inserted
    assertDfEquality(out, df(schema, Seq(Row(2, "B2"), Row(5, "E"))))
  }

  test("whenNotMatchedBySourceUpdate rewrites only unmatched target rows; " +
       "condition gates per row; first clause wins") {
    val src = df(schema, Seq(Row(2, "B2")))
    val out = Merge.into(target, "t")
      .using(src, "s", "t.pkey = s.pkey")
      .whenNotMatchedBySourceUpdate("t.pkey = 1",
        Map("attr" -> "'AGED'"))
      .whenNotMatchedBySourceUpdate(Map("attr" -> "'STALE'"))
      .result()
    assertDfEquality(out, df(schema,
      Seq(Row(1, "AGED"), Row(2, "B"), Row(3, "STALE"))))
  }

  test("whenNotMatchedBySource executes against a table and captures CDC") {
    import org.apache.spark.sql.functions.col
    val loc = tmpDir("mergebysource")
    val t = ManagedTable.create(target, loc,
      properties = Map(ManagedTable.cdfPropKey -> "true"))
    val src = df(schema, Seq(Row(2, "B2"), Row(5, "E")))
    val v0 = t.latestVersion
    Merge.into(t.toDF, "t")
      .using(src, "s", "t.pkey = s.pkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceDelete("t.pkey = 1")
      .execute(t)
    assertDfEquality(t.toDF, df(schema,
      Seq(Row(2, "B2"), Row(3, "C"), Row(5, "E"))))
    val ch = t.changes(v0).select("pkey", "_change_type")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(ch == Set((1, "delete"), (2, "update_preimage"),
      (2, "update_postimage"), (5, "insert")),
      s"bySource delete must surface in the change feed: $ch")
  }

  test("SQL MERGE supports WHEN NOT MATCHED BY SOURCE") {
    import org.apache.spark.sql.functions.col
    val loc = tmpDir("mergebysourcesql")
    ManagedTable.create(target, loc)
    val src = df(schema, Seq(Row(2, "B2"), Row(5, "E")))
    src.createOrReplaceTempView("bysource_src")
    spark.sql(
      s"""MERGE INTO graft.`$loc` AS t
         |USING bysource_src AS s ON t.pkey = s.pkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.pkey = 3 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET attr = 'STALE'
         |""".stripMargin).collect()
    assertDfEquality(ManagedTable.forPath(spark, loc).toDF, df(schema,
      Seq(Row(1, "STALE"), Row(2, "B2"), Row(5, "E"))))
  }
}
