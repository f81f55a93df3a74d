package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)),
        Option(r.getString(6)),
        if (r.isNullAt(7)) None else Some(r.getLong(7)))
    }.toMap

  test("null / distinct / min / max / mode per column") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), Some(9)),
      (3L, Some("a"), None),
      (4L, None, Some(10))
    ).toDF("id", "s", "v")
    val out = rows(Profile.profile(df))
    assert(out("id") == ((4L, 0L, 4L, Some("1"), Some("4"), Some("1"), Some(1L))))
    assert(out("s") == ((4L, 1L, 2L, Some("a"), Some("b"), Some("a"), Some(2L))))
    // min/max computed in the NATIVE type: 9 < 10 numerically even
    // though "10" < "9" as strings
    assert(out("v") == ((4L, 1L, 2L, Some("9"), Some("10"), Some("10"), Some(2L))))
  }

  test("an all-null column profiles to zero distinct, null min/max/top") {
    val df = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("id", "s")
    val out = rows(Profile.profile(df, Seq("s")))
    assert(out("s") == ((2L, 2L, 0L, None, None, None, None)))
  }

  test("modal ties break to the smallest value string") {
    val df = Seq("b", "a", "b", "a", "c").toDF("s")
    val out = rows(Profile.profile(df))
    assert(out("s")._6 == Some("a") && out("s")._7 == Some(2L))
  }

  test("column subset keeps request order and rejects unknown columns") {
    val df = Seq((1L, "x", 2.0)).toDF("a", "b", "c")
    assert(Profile.profile(df, Seq("c", "a")).select("column")
      .collect().map(_.getString(0)).toSet == Set("a", "c"))
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
    assert(e.getMessage.contains("no column nope"))
  }

  test("profiles a managed table in place") {
    val base = "/root/repo/target/tmp/spec_profile_tbl"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    val tbl = graft.tables.ManagedTable.create(
      Seq((1L, "x"), (2L, "x")).toDF("k", "v"), base)
    val out = rows(Profile.profile(tbl))
    assert(out("v")._6 == Some("x") && out("v")._7 == Some(2L))
  }


  test("approx profile: one aggregation node, estimates within rsd") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val exact = Profile.profile(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.profileApprox(docs, rsd = 0.05).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      assert(a.getLong(1) == e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) == e.getLong(2), s"$c n_nulls exact in one pass")
      assert(a.getString(4) == e.getString(4), s"$c min is exact")
      assert(a.getString(5) == e.getString(5), s"$c max is exact")
      val nd = e.getLong(3).toDouble
      assert(math.abs(a.getLong(3) - nd) <= math.max(4.0, 4 * 0.05 * nd),
        s"$c distinct estimate ${a.getLong(3)} vs exact $nd beyond 4*rsd")
    }
    // (the melt-free shape is structural: profileApprox builds ONE
    // aggregation over df and nothing else — no explode to assert on,
    // because no second pass exists)
  }
}
