package graft

import org.apache.spark.sql.functions._

/** Bench-harness integrity: a crashed query must surface as an error, not
  * be silently billed ~0 s (which would let a broken build "improve" the
  * bench total).
  */
class BenchHarnessSpec extends SparkSpec {
  import spark.implicits._

  test("a deliberately broken query reports an error from the bench sink") {
    val (_, err) = Bench.timeQuery(spark, "/nonexistent", "broken",
      (s, dir) => s.read.parquet(s"$dir/does_not_exist.parquet"))
    assert(err.isDefined, "a crashing query must carry an error")
  }

  test("a lazily-failing plan (analysis passes, execution throws) still errors") {
    val (_, err) = Bench.timeQuery(spark, "unused", "lazy-fail",
      (s, _) => {
        import s.implicits._
        Seq("x").toDF("v").select(
          assert_true(lit(false), lit("boom")).as("a"), col("v"))
      })
    assert(err.exists(_.contains("boom")))
  }

  test("a healthy query reports no error and positive time") {
    val (sec, err) = Bench.timeQuery(spark, "unused", "ok",
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("v") })
    assert(err.isEmpty && sec > 0)
  }
}
