package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL registration parity: the registered functions must be the SAME
  * expressions the Column API builds, usable from plain SQL.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("SQL and Column API produce identical shingle/minhash/simhash results") {
    Seq(("the quick brown fox jumps over the lazy dog", 1L),
        ("entirely different words here", 2L))
      .toDF("text", "id").createOrReplaceTempView("gf_docs")

    val viaSql = spark.sql(
      """SELECT id,
        |  graft_minhash_sig(graft_shingle_hashes(text, 3), 16) AS sig,
        |  graft_simhash64(graft_char_ngram_hashes(text, 5)) AS sh
        |FROM gf_docs""".stripMargin).collect()

    val viaApi = spark.table("gf_docs").select(col("id"),
      expressions.minhash_sig(expressions.shingle_hashes(col("text"), 3), 16).as("sig"),
      expressions.simhash64(expressions.char_ngram_hashes(col("text"), 5)).as("sh"))
      .collect()

    assert(viaSql.map(_.toString).sorted.toSeq == viaApi.map(_.toString).sorted.toSeq)
  }

  test("SQL vector functions: dot, cosine, zero-vector null") {
    val row = spark.sql(
      """SELECT graft_vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  round(graft_vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
        |  graft_vec_cosine(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS z""".stripMargin)
      .head()
    assert(row.getDouble(0) == 11.0)
    assert(row.getDouble(1) == 1.0)
    assert(row.isNullAt(2))
  }

  test("SQL graft_luhn_redact matches the Column API") {
    val row = spark.sql(
      """SELECT graft_luhn_redact('pay 4111 1111 1111 1111 or 4111 1111 1111 1112') AS r"""
    ).head()
    assert(row.getString(0) == "pay <CARD> or 4111 1111 1111 1112")
  }

  test("hash_jaccard equals the array_intersect/array_union formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    // random multisets with collisions, zeros, and empties — the kernel
    // must match Spark's set semantics on every one
    val rows = (1 to 200).map { i =>
      def arr(n: Int) = Seq.fill(n)(rnd.nextInt(30).toLong - 5L)
      (i.toLong, arr(rnd.nextInt(40)), arr(rnd.nextInt(40)))
    } :+ (900L, Seq(0L, 0L, 1L), Seq(0L, 2L)) :+ (901L, Seq.empty[Long], Seq(1L, 2L))
    val df = rows.toDF("id", "a", "b")
    val both = df.select(col("id"),
      graft.plans.expressions.hash_jaccard(col("a"), col("b")).as("kernel"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("builtin"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id ${r.getLong(0)}: kernel ${r.getDouble(1)} != builtin ${r.getDouble(2)}")
    }
    // both-empty → null
    val z = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("a", "b")
      .select(graft.plans.expressions.hash_jaccard(col("a"), col("b")))
    assert(z.head().isNullAt(0))
  }

  test("hash_containment equals the intersect/least-distinct formulation " +
       "in SQL and Column form") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val rows = (1 to 200).map { i =>
      def arr(n: Int) = Seq.fill(n)(rnd.nextInt(30).toLong - 5L)
      (i.toLong, arr(1 + rnd.nextInt(40)), arr(1 + rnd.nextInt(40)))
    } :+ (900L, Seq(0L, 0L, 1L), Seq(0L, 2L))
    val df = rows.toDF("id", "a", "b")
    df.createOrReplaceTempView("hc")
    val both = spark.sql(
      """SELECT id, graft_hash_containment(a, b) AS kernel,
        |  CAST(size(array_intersect(a, b)) AS DOUBLE) /
        |    least(size(array_distinct(a)), size(array_distinct(b))) AS builtin
        |FROM hc""".stripMargin).collect()
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"id ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
    // SQL == Column API; graft_hash_jaccard is registered too
    val cmp = df.selectExpr("graft_hash_jaccard(a, b) AS s").collect().toSeq
    val api = df.select(
      graft.plans.expressions.hash_jaccard(col("a"), col("b")).as("s"))
      .collect().toSeq
    assert(cmp == api)
    // graft_sign_bits: SQL == Column API on a float vector
    val v = Seq(Tuple1(Array(1.0f, -2.0f, 0.5f))).toDF("v")
    assert(v.selectExpr("graft_sign_bits(v)").head().getSeq[Long](0) ==
      v.select(graft.plans.expressions.sign_bits(col("v")))
        .head().getSeq[Long](0))
  }

  test("non-literal width argument raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('abc', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("SQL statement surface: DELETE / UPDATE / OPTIMIZE ZORDER / " +
       "DESCRIBE HISTORY / VACUUM / table_changes round-trip") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlsurf")
    val t = ManagedTable.create(
      spark.range(100).selectExpr("id AS k", "id * 2 AS v", "'x' AS s"),
      path, properties = Map(ManagedTable.cdfPropKey -> "true"))
    val ref = s"graft.`$path`"
    val v0 = t.latestVersion

    val del = spark.sql(s"DELETE FROM $ref WHERE k < 10").head()
    assert(del.getLong(0) == 10L)
    assert(t.toDF.count() == 90)

    // SET list with a nested function call (a comma inside parens) and a
    // WHERE containing a quoted string — the top-level splitter's job
    val upd = spark.sql(
      s"UPDATE $ref SET v = v + 1, s = concat(s, 'y') WHERE k >= 90 AND s = 'x'")
      .head()
    assert(upd.getLong(0) == 10L)
    assert(t.toDF.filter("s = 'xy'").count() == 10)
    assert(t.toDF.filter("k = 90").head().getLong(1) == 181L)

    val opt = spark.sql(s"OPTIMIZE $ref ZORDER BY (k, v)").head()
    assert(opt.getString(0) == path && opt.getLong(1) >= 1L)

    val hist = spark.sql(s"DESCRIBE HISTORY $ref").collect()
    assert(hist.map(_.getString(2)).toSeq ==
      Seq("CREATE", "DELETE", "UPDATE", "OPTIMIZE"))

    // the TVF reads the same feed the API builds (CDC sidecars included)
    val feed = spark.sql(
      s"SELECT _change_type, count(*) AS n FROM graft_table_changes('$path', $v0) " +
        "GROUP BY _change_type ORDER BY _change_type").collect()
    assert(feed.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(
      ("delete", 10L), ("update_postimage", 10L), ("update_preimage", 10L)))

    val vac = spark.sql(s"VACUUM $ref RETAIN 0.000001 HOURS").head()
    assert(vac.getLong(0) >= 0L) // age floor keeps young files; statement runs

    // a non-graft statement still parses through the delegate
    assert(spark.sql("SELECT 1 + 1").head().getInt(0) == 2)
  }

  test("ALTER TABLE ADD COLUMNS / SET+UNSET TBLPROPERTIES / RENAME TO / " +
       "SHOW PARTITIONS statements") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlalter")
    val t = ManagedTable.create(
      spark.range(20).selectExpr("id AS k", "id % 3 AS p"),
      path, partitionBy = Seq("p"))
    val ref = s"graft.`$path`"

    val parts = spark.sql(s"SHOW PARTITIONS $ref").collect()
      .map(_.getString(0)).toSeq
    assert(parts == Seq("p=0", "p=1", "p=2"))
    // the not-partitioned guard, not the missing-table error
    val flatPath = tmpDir("sqlalter_np")
    ManagedTable.create(spark.range(3).toDF("k"), flatPath)
    val e = intercept[IllegalArgumentException](spark.sql(
      s"SHOW PARTITIONS graft.`$flatPath`").collect())
    assert(e.getMessage.contains("not") &&
      e.getMessage.contains("partitioned"))

    val add = spark.sql(
      s"ALTER TABLE $ref ADD COLUMNS (note STRING, score DOUBLE)").head()
    assert(add.getLong(1) == 4L, "k, p, note, score")
    assert(t.toDF.filter("note IS NULL AND score IS NULL").count() == 20)
    // existing data readable, new columns writable
    spark.sql(s"INSERT INTO $ref SELECT 100 AS k, 0 AS p, 'n' AS note, " +
      "1.5 AS score")
    assert(t.toDF.filter("note = 'n'").count() == 1)

    spark.sql(s"ALTER TABLE $ref SET TBLPROPERTIES " +
      "('owner' = 'pipelines', 'graft.bloom.columns' = 'k')")
    assert(t.properties.get("owner").contains("pipelines"))
    // SHOW TBLPROPERTIES mirrors the snapshot's properties, sorted
    val shown = spark.sql(s"SHOW TBLPROPERTIES $ref").collect()
      .map(r => r.getString(0) -> r.getString(1))
    assert(shown.toMap == t.properties)
    assert(shown.map(_._1).toSeq == shown.map(_._1).sorted.toSeq)
    spark.sql(s"ALTER TABLE $ref UNSET TBLPROPERTIES IF EXISTS " +
      "('owner', 'absent.key')")
    assert(!t.properties.contains("owner"))
    assert(t.properties.get("graft.bloom.columns").contains("k"))
    // without IF EXISTS an absent key raises (Delta semantics)...
    val eMissing = intercept[IllegalArgumentException](spark.sql(
      s"ALTER TABLE $ref UNSET TBLPROPERTIES ('absent.key')").collect())
    assert(eMissing.getMessage.contains("absent.key"))
    // ...and double-quoted keys unset the same property SET wrote
    spark.sql(s"""ALTER TABLE $ref SET TBLPROPERTIES ("dq.key" = 'v')""")
    assert(t.properties.contains("dq.key"))
    spark.sql(s"""ALTER TABLE $ref UNSET TBLPROPERTIES ("dq.key")""")
    assert(!t.properties.contains("dq.key"))
    val histOps = t.history.collect().map(_.getString(2)).toSeq
    assert(histOps.containsSlice(Seq("ADD COLUMNS")) &&
      histOps.contains("SET TBLPROPERTIES") &&
      histOps.contains("UNSET TBLPROPERTIES"))

    val moved = tmpDir("sqlalter_moved") + "_t"
    val ren = spark.sql(s"ALTER TABLE $ref RENAME TO graft.`$moved`").head()
    assert(ren.getString(0) == moved)
    assert(ManagedTable.forPath(spark, moved).toDF.count() == 21)
    assert(!new java.io.File(path).exists())
  }

  test("RESTORE and CLONE statements round-trip") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlrestore")
    val t = ManagedTable.create(
      spark.range(50).selectExpr("id AS k"), path)
    spark.sql(s"DELETE FROM graft.`$path` WHERE k < 25")
    assert(t.toDF.count() == 25)
    // timestamp restore: now = the post-delete snapshot, a no-op restore
    val nowTs = new java.sql.Timestamp(System.currentTimeMillis()).toString
    val rt = spark.sql(
      s"RESTORE graft.`$path` TO TIMESTAMP AS OF '$nowTs'").head()
    assert(rt.getLong(0) == 1L, "timestamp must resolve the delete commit")
    val r = spark.sql(s"RESTORE TABLE graft.`$path` TO VERSION AS OF 0").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 3L)
    assert(t.toDF.count() == 50, "restore must bring the deleted rows back")

    val det = spark.sql(s"DESCRIBE DETAIL graft.`$path`").head()
    assert(det.getString(0) == path)
    assert(det.getLong(5) == 50L, "metadata row count after restore")
    assert(det.getLong(6) == t.latestVersion)

    val clonePath = path + "_clone"
    val c = spark.sql(s"CLONE graft.`$path` TO graft.`$clonePath`").head()
    assert(c.getLong(1) == t.latestVersion, "clone records the source version")
    assert(ManagedTable.forPath(spark, clonePath).toDF.count() == 50)
  }

  test("CONVERT TO GRAFT adopts a parquet directory from SQL") {
    import graft.tables.ManagedTable
    import org.apache.spark.sql.functions.col
    val src = tmpDir("sqlcvt_src")
    spark.range(120).select(col("id").as("k"),
        (col("id") % 3).cast("string").as("p"))
      .write.partitionBy("p").parquet(src)
    val dst = tmpDir("sqlcvt")
    val r = spark.sql(
      s"CONVERT TO GRAFT parquet.`$src` AS graft.`$dst` " +
        "PARTITIONED BY (p)").head()
    assert(r.getLong(0) >= 3L, "one adopted file per partition at least")
    val t = ManagedTable.forPath(spark, dst)
    assert(t.partitionColumns == Seq("p"))
    assert(t.toDF.count() == 120)
    assert(t.history.head().getString(2) == "CONVERT")
  }

  test("CONVERT TO GRAFT imports a delta source through its log; " +
       "PARTITIONED BY on delta is rejected") {
    import graft.tables.ManagedTable
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val src = tmpDir("sqlcvtd_src")
    // a handcrafted-log Delta table: two files, one removed in v1 —
    // CONVERT must see the LOG's live set, not the directory listing
    spark.range(40).select(col("id").as("k"))
      .repartitionByRange(2, col("k")).write.parquet(src)
    val logDir = java.nio.file.Paths.get(src, "_delta_log")
    java.nio.file.Files.createDirectories(logDir)
    val files = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(src))
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSeq.sorted
      finally s.close()
    }
    assert(files.size == 2)
    val meta = {
      val root = mapper.createObjectNode()
      val m = root.putObject("metaData")
      m.put("id", "t")
      m.put("schemaString",
        spark.range(0).select(col("id").as("k")).schema.json)
      m.putArray("partitionColumns")
      mapper.writeValueAsString(root)
    }
    def add(p: String) = s"""{"add":{"path":"$p","size":1,""" +
      """"modificationTime":1,"dataChange":true}}"""
    java.nio.file.Files.writeString(logDir.resolve(f"${0L}%020d.json"),
      (Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        meta) ++ files.map(add)).mkString("\n"))
    java.nio.file.Files.writeString(logDir.resolve(f"${1L}%020d.json"),
      s"""{"remove":{"path":"${files.head}","dataChange":true}}""")

    val dst = tmpDir("sqlcvtd")
    val r = spark.sql(
      s"CONVERT TO GRAFT delta.`$src` AS graft.`$dst`").head()
    assert(r.getLong(0) == 1L, "only the log-live file imports")
    val t = ManagedTable.forPath(spark, dst)
    assert(t.schema.fieldNames.toSeq == Seq("k"))
    assert(t.toDF.count() < 40, "removed file's rows must be absent")
    assert(t.toDF.count() == spark.read.parquet(
      src + "/" + files(1)).count())

    val e = intercept[Exception](spark.sql(
      s"CONVERT TO GRAFT delta.`$src` AS graft.`${dst}_p` " +
        "PARTITIONED BY (k)").head())
    assert(e.getMessage.contains("PARTITIONED BY conflicts"))
  }

  test("statement splitter honors double-quoted literals and escapes; " +
       "table_changes rejects a non-boolean net flag") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlsurf2")
    val t = ManagedTable.create(
      spark.range(10).selectExpr("id AS k", "'x' AS s"), path,
      properties = Map(ManagedTable.cdfPropKey -> "true"))
    val ref = s"graft.`$path`"
    // Spark SQL (ANSI off) treats "…" as a string literal: a WHERE and a
    // comma INSIDE it must not split the statement
    val upd = spark.sql(
      s"""UPDATE $ref SET s = "a , WHERE b" WHERE k = 1""").head()
    assert(upd.getLong(0) == 1L)
    assert(t.toDF.filter("k = 1").head().getString(1) == "a , WHERE b")
    // backslash-escaped quote inside a single-quoted literal
    val upd2 = spark.sql(
      s"UPDATE $ref SET s = 'it\\'s, WHERE' WHERE k = 2").head()
    assert(upd2.getLong(0) == 1L)
    assert(t.toDF.filter("k = 2").head().getString(1) == "it's, WHERE")

    // net flag: booleans work, anything else raises instead of silently
    // flipping to the raw feed
    val n = spark.sql(
      s"SELECT count(*) AS n FROM graft_table_changes('$path', 0, ${t.latestVersion}, true)")
      .head().getLong(0)
    assert(n == 4L, s"two updates emit a pre/post pair each, got $n")
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$path', 0, 1, 'true')").collect()
    }
    assert(e.getMessage.contains("boolean net flag"))
  }

  test("MERGE INTO statement: update/delete/insert clauses with " +
       "conditions, subquery source") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlmerge")
    val t = ManagedTable.create(
      spark.range(10).selectExpr("id AS k", "id * 10 AS v", "'old' AS tag"),
      path)
    // source: k=5..14 → 5..9 match (5 dropped by DELETE cond, 6..9
    // updated), 10..14 insert (12 filtered by the insert condition)
    spark.range(5, 15).selectExpr("id AS k", "id * 100 AS sv")
      .createOrReplaceTempView("merge_src")
    val res = spark.sql(
      s"""MERGE INTO graft.`$path` AS t
         |USING (SELECT k, sv FROM merge_src) AS s
         |ON t.k = s.k
         |WHEN MATCHED AND s.k = 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.sv, tag = 'upd'
         |WHEN NOT MATCHED AND s.k <> 12 THEN INSERT (k, v, tag)
         |  VALUES (s.k, s.sv, 'ins')
         |""".stripMargin).head()
    assert(res.getLong(0) == 1L, "one MERGE commit")
    // 10 - 1 deleted + 4 inserted (10,11,13,14) = 13
    assert(res.getLong(1) == 13L, s"metadata row count, got ${res.getLong(1)}")
    val out = t.toDF.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(!out.exists(_._1 == 5L), "k=5 deleted")
    assert(out.filter(_._3 == "upd").map(_._1) == Seq(6L, 7L, 8L, 9L))
    assert(out.filter(_._3 == "upd").forall(r => r._2 == r._1 * 100))
    assert(out.filter(_._3 == "ins").map(_._1) == Seq(10L, 11L, 13L, 14L))
    assert(out.filter(_._3 == "old").map(_._1) == (0L to 4L))
    val hist = spark.sql(s"DESCRIBE HISTORY graft.`$path`")
      .collect().map(_.getString(2)).toSeq
    assert(hist == Seq("CREATE", "MERGE"))
  }

  test("MERGE INTO: UPDATE SET * / INSERT * / WITH SCHEMA EVOLUTION / " +
       "graft source ref") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlmerge2")
    val srcPath = tmpDir("sqlmerge2_src")
    ManagedTable.create(
      spark.range(3, 6).selectExpr("id AS k", "id * 100 AS v",
        "id * 1000 AS extra"), srcPath)
    val t = ManagedTable.create(
      spark.range(5).selectExpr("id AS k", "id * 10 AS v"), path)
    val res = spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$path` t
         |USING graft.`$srcPath` s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
    assert(res.getLong(1) == 6L, "5 + 1 inserted")
    val widened = ManagedTable.forPath(spark, path)
    assert(widened.schema.fieldNames.contains("extra"),
      "schema evolution must add the source-only column")
    val rows = widened.toDF.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(rows == Seq((0L, 0L, -1L), (1L, 10L, -1L), (2L, 20L, -1L),
      (3L, 300L, 3000L), (4L, 400L, 4000L), (5L, 500L, 5000L)))
  }

  test("graft_table TVF reads snapshots with version and timestamp travel") {
    import graft.tables.ManagedTable
    val path = tmpDir("tvfread")
    val t = ManagedTable.create(spark.range(20).selectExpr("id AS k"), path)
    t.delete("k >= 10") // v1
    val tsAfterV1 = new java.sql.Timestamp(System.currentTimeMillis())
      .toString
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_table('$path')")
      .head().getLong(0) == 10L)
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_table('$path', 0)")
      .head().getLong(0) == 20L, "version travel must read v0")
    // joins compose like any relation
    val joined = spark.sql(
      s"""SELECT count(*) AS n FROM graft_table('$path') a
         |JOIN graft_table('$path', 0) b ON a.k = b.k""".stripMargin)
      .head().getLong(0)
    assert(joined == 10L)
    assert(spark.sql(
      s"SELECT count(*) FROM graft_table('$path', '$tsAfterV1')")
      .head().getLong(0) == 10L, "timestamp travel must resolve v1")
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_table('$path', 99)").collect())
    assert(e.getMessage.toLowerCase.contains("version"),
      s"unknown version must fail loud: ${e.getMessage}")
  }

  test("CTAS and INSERT INTO/OVERWRITE statements round-trip") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlctas")
    val c = spark.sql(
      s"""CREATE TABLE graft.`$path` PARTITIONED BY (p)
         |TBLPROPERTIES (graft.enableChangeDataFeed = 'true', owner = alice)
         |AS SELECT id AS k, id % 2 AS p FROM range(10)""".stripMargin).head()
    assert(c.getLong(1) == 10L, "CTAS row count")
    val t = ManagedTable.forPath(spark, path)
    assert(t.detail.partitionColumns == Seq("p"))
    assert(t.detail.properties("graft.enableChangeDataFeed") == "true")
    assert(t.detail.properties("owner") == "alice")

    val ins = spark.sql(
      s"INSERT INTO graft.`$path` SELECT id AS k, 0 AS p FROM range(100, 103)")
      .head()
    assert(ins.getLong(0) == 1L && ins.getLong(1) == 3L)
    assert(t.toDF.count() == 13)
    // VALUES form parses through the session parser as an inline table
    val ins2 = spark.sql(
      s"INSERT INTO TABLE graft.`$path` VALUES (200, 1), (201, 1)").head()
    assert(ins2.getLong(1) == 2L)
    assert(t.toDF.count() == 15)

    val ovw = spark.sql(
      s"INSERT OVERWRITE graft.`$path` SELECT id AS k, id % 2 AS p FROM range(4)")
      .head()
    assert(ovw.getLong(1) == 4L)
    assert(t.toDF.count() == 4, "overwrite replaces the snapshot")
    // history records every SQL write as its own commit
    assert(spark.sql(s"DESCRIBE HISTORY graft.`$path`")
      .collect().map(_.getString(2)).toSeq ==
      Seq("CREATE", "APPEND", "APPEND", "OVERWRITE"))
    // creating over an existing table fails loud
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE graft.`$path` AS SELECT 1 AS x").head())
    assert(e.getMessage.contains("already exists"))
  }

  test("MERGE INTO rejects malformed clauses loudly") {
    import graft.tables.ManagedTable
    val path = tmpDir("sqlmerge3")
    ManagedTable.create(spark.range(3).selectExpr("id AS k"), path)
    spark.range(1).selectExpr("id AS k").createOrReplaceTempView("m3src")
    def bad(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).head())
      assert(e.getMessage.contains(frag),
        s"expected '$frag' in: ${e.getMessage}")
    }
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k",
      "at least one WHEN")
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN DELETE", "cannot DELETE")
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k " +
      "WHEN MATCHED THEN INSERT *", "can INSERT")
    // BY SOURCE is supported since round 12 — but it cannot INSERT or
    // copy a source row it does not have
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k " +
      "WHEN NOT MATCHED BY SOURCE THEN INSERT *", "can INSERT")
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *", "no source row")
    bad(s"MERGE INTO graft.`$path` t USING m3src s ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k, 1)", "columns but")
  }
}
