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

  /** Scripted runner: replays a fixed sequence of (seconds, error). */
  private def scripted(runs: (Double, Option[String])*)
      : (() => (Double, Option[String]), () => Int) = {
    val it = runs.iterator
    var n = 0
    (() => { n += 1; it.next() }, () => n)
  }

  test("robustTime: two agreeing fast runs need no third iteration") {
    val (run, calls) = scripted((1.2, None), (1.1, None))
    val (best, rs, err, flaky) = Bench.robustTime(run)
    assert(best == 1.1 && rs == Seq(1.2, 1.1) && err.isEmpty && flaky.isEmpty)
    assert(calls() == 2)
  }

  test("robustTime: >1.5x disagreement triggers the third run; min wins") {
    val (run, calls) = scripted((4.0, None), (2.0, None), (1.9, None))
    val (best, rs, err, _) = Bench.robustTime(run)
    assert(best == 1.9 && rs.length == 3 && err.isEmpty)
    assert(calls() == 3)
  }

  test("robustTime: a slow query (both runs > 3 s) ALWAYS gets a third " +
       "chance at a warm window, even when the two agree") {
    // the r13 phantom-regression case: both iterations landed cold-ish
    // (5.8 vs 5.5 — under the old 2x gate no third run fired) and the
    // reported min was a cold number 1.7x the query's warm level
    val (run, calls) = scripted((5.8, None), (5.5, None), (3.4, None))
    val (best, rs, _, _) = Bench.robustTime(run)
    assert(best == 3.4 && rs == Seq(5.8, 5.5, 3.4))
    assert(calls() == 3)
  }

  test("robustTime: sub-second jitter never re-runs; fast agreeing pairs " +
       "stay at two iterations") {
    val (run, calls) = scripted((0.2, None), (0.05, None))
    val (best, _, _, _) = Bench.robustTime(run)
    assert(best == 0.05 && calls() == 2)
  }

  test("robustTime: a failed third run keeps the two good timings (the " +
       "fast-fail elapsed cannot become the min) but surfaces in the " +
       "FLAKY slot so intermittent crashes stay visible") {
    val (run, _) = scripted((4.1, None), (3.9, None), (0.01, Some("boom")))
    val (best, rs, err, flaky) = Bench.robustTime(run)
    assert(best == 3.9, s"fast-fail 0.01 must not win the min (got $best)")
    assert(rs == Seq(4.1, 3.9) && err.isEmpty)
    assert(flaky.contains("boom"), "third-run error must not vanish")
  }

  test("robustTime: first-run failure short-circuits; second-run failure " +
       "is reported") {
    val (run1, calls1) = scripted((0.5, Some("crash")))
    val r1 = Bench.robustTime(run1)
    assert(r1._3.contains("crash") && calls1() == 1)
    val (run2, calls2) = scripted((0.5, None), (0.4, Some("late crash")))
    val r2 = Bench.robustTime(run2)
    assert(r2._3.contains("late crash") && calls2() == 2)
  }
}
