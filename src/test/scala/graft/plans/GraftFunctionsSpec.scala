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

  test("non-literal width argument raises a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('abc', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }
}
