package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Property-style SCD2 invariants (SURVEY §5) over seeded random base /
  * update batches:
  *   1. every key has exactly one current row after upsert;
  *   2. closed rows carry the update's effective version as end version;
  *   3. keys untouched by updates are unchanged;
  *   4. upsert is idempotent for identical update batches.
  */
class Scd2PropertySpec extends SparkSpec {

  private val baseSchema = StructType(Seq(
    StructField("pkey", IntegerType),
    StructField("attr", StringType),
    StructField("is_current", BooleanType),
    StructField("effective_ver", IntegerType),
    StructField("end_ver", IntegerType)))
  private val updSchema = StructType(Seq(
    StructField("pkey", IntegerType),
    StructField("attr", StringType),
    StructField("effective_ver", IntegerType)))

  private val attrPool = Array("A", "B", "C", "Z", null)

  private def genCase(rnd: scala.util.Random) = {
    def keys(n: Int) = rnd.shuffle((1 to 20).toList).take(n)
    val baseRows = keys(rnd.nextInt(13)).map(k => k -> attrPool(rnd.nextInt(4)))
    val updRows = keys(rnd.nextInt(9)).map(k => k -> attrPool(rnd.nextInt(5)))
    (baseRows, updRows)
  }

  private def apply2(baseRows: Seq[(Int, String)], updRows: Seq[(Int, String)]) = {
    val base = df(baseSchema,
      baseRows.map { case (k, a) => Row(k, a, true, 1, null) })
    val upd = df(updSchema, updRows.map { case (k, a) => Row(k, a, 2) })
    Scd2(base, upd, "pkey", Seq("attr"),
      "is_current", "effective_ver", "end_ver")
      .select("pkey", "attr", "is_current", "effective_ver", "end_ver")
      .collect().toSeq
  }

  test("SCD2 invariants hold for 15 random base/update batches") {
    val rnd = new scala.util.Random(2024)
    (1 to 15).foreach { i =>
      val (baseRows, updRows) = genCase(rnd)
      val rows = apply2(baseRows, updRows)
      val byKey = rows.groupBy(_.getInt(0))

      byKey.foreach { case (k, rs) =>
        val current = rs.filter(_.getBoolean(2))
        assert(current.size == 1,
          s"case $i key $k: ${current.size} current rows in $rs " +
            s"(base=$baseRows upd=$updRows)")
      }
      rows.filterNot(_.getBoolean(2)).foreach { r =>
        assert(!r.isNullAt(4) && r.getInt(4) == 2,
          s"case $i: closed row with wrong end_ver: $r")
      }
      val updKeys = updRows.map(_._1).toSet
      baseRows.filterNot(b => updKeys.contains(b._1)).foreach { case (k, _) =>
        val rs = byKey(k)
        assert(rs.size == 1 && rs.head.getBoolean(2) && rs.head.getInt(3) == 1,
          s"case $i: untouched key $k changed: $rs")
      }
      assert(byKey.keySet == (baseRows.map(_._1) ++ updRows.map(_._1)).toSet,
        s"case $i: key set mismatch")
    }
  }

  test("SCD2 upsert is idempotent for identical update batches") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { i =>
      val (baseRows, updRows) = genCase(rnd)
      val once = apply2(baseRows, updRows)
      val postDf = df(baseSchema, once.map(r =>
        Row(r.getInt(0), r.getString(1), r.getBoolean(2),
          r.getInt(3), if (r.isNullAt(4)) null else r.getInt(4))))
      val upd = df(updSchema, updRows.map { case (k, a) => Row(k, a, 2) })
      val twice = Scd2(postDf, upd, "pkey", Seq("attr"),
        "is_current", "effective_ver", "end_ver")
        .select("pkey", "attr", "is_current", "effective_ver", "end_ver")
        .collect().toSeq
      assert(twice.map(_.toString).sorted == once.map(_.toString).sorted,
        s"case $i not idempotent (base=$baseRows upd=$updRows):\n" +
          s" once=${once.sortBy(_.toString)}\n twice=${twice.sortBy(_.toString)}")
    }
  }
}
