package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion semantics (Cormack et al. 2009), pinned on
  * hand-computable lists: the 1/(k0+rank) sum, the union-of-legs
  * domain (absent leg contributes 0), tie-breaks, and the k-cut.
  */
class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def leg(rows: (Long, Long)*) = rows.toDF("id", "rank")

  test("RRF fuses over the union; a missing leg contributes zero") {
    // sparse: a=1, b=2; dense: b=1, c=2
    val out = Fusion.rrfFuse(
      Seq(("s", leg(10L -> 1L, 20L -> 2L), "id", "rank"),
        ("d", leg(20L -> 1L, 30L -> 2L), "id", "rank")),
      outIdCol = "id", k0 = 60, k = 10)
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getDouble(3)))
    // b appears in both legs: 1/62 + 1/61; a only sparse: 1/61; c: 1/62
    val exp = Seq(
      (20L, Some(2L), Some(1L),
        math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6),
      (10L, Some(1L), None, math.rint(1.0 / 61 * 1e6) / 1e6),
      (30L, None, Some(2L), math.rint(1.0 / 62 * 1e6) / 1e6))
    assert(out.toSeq == exp)
  }

  test("equal scores tie-break by ascending id") {
    // two docs each appearing only at rank 1 of one leg: same score
    val out = Fusion.rrfFuse(
      Seq(("s", leg(7L -> 1L), "id", "rank"),
        ("d", leg(3L -> 1L), "id", "rank")),
      outIdCol = "id", k0 = 60, k = 10)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(3L, 7L))
  }

  test("the k-cut keeps the top-k fused rows") {
    val rows = (1L to 8L).map(i => i -> i)
    val out = Fusion.rrfFuse(Seq(("only", leg(rows: _*), "id", "rank")),
      outIdCol = "id", k0 = 60, k = 3)
      .select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("duplicate leg names are rejected") {
    val e = intercept[IllegalArgumentException] {
      Fusion.rrfFuse(Seq(("x", leg(1L -> 1L), "id", "rank"),
        ("x", leg(2L -> 1L), "id", "rank")), outIdCol = "id")
    }
    assert(e.getMessage.contains("duplicate leg names"))
  }

  test("fusion is join-free: union + one pivoting hash aggregate") {
    val plan = Fusion.rrfFuse(
      Seq(("s", leg(1L -> 1L, 2L -> 2L), "id", "rank"),
        ("d", leg(2L -> 1L), "id", "rank")),
      outIdCol = "id", k0 = 60, k = 5)
      .queryExecution.executedPlan.toString
    // a full-outer join formulation would cascade sort-merge joins
    // (full outer cannot broadcast); the union-pivot shape must not
    // plan any join at all
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }
}
