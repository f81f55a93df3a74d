package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.plans.expressions.normalized_md5

/** Pins the fused [[NormalizedMd5]] kernel to the unfused Spark chain
  * `md5(trim(lower(regexp_replace(text, "\\s+", " "))))` it replaces —
  * the doc_fingerprint formulation whose DuckDB oracle must keep
  * hash-matching after the fusion.
  */
class NormalizedMd5Spec extends SparkSpec {

  private def unfused(c: org.apache.spark.sql.Column) =
    md5(trim(lower(regexp_replace(c, "\\s+", " "))))

  private val TAB = 9.toChar; private val LF = 10.toChar
  private val VT = 11.toChar; private val FF = 12.toChar
  private val CR = 13.toChar; private val NBSP = 160.toChar
  private val IDEOSP = 0x3000.toChar // ideographic space: NOT Java \s

  private val adversarial = Seq(
    "", // empty
    s" $TAB$LF$VT$FF$CR", // all-whitespace (every Java \s char)
    "hello world",
    "  Hello   WORLD  ", // leading/trailing + inner runs
    s"Tabs${TAB}and${LF}newlines$CR${LF}mixed $TAB $LF here",
    "ὈΔΥΣΣΕΎΣ", // Greek: final sigma context sensitivity
    "ΣΟΦΟΣ ΣΟΦΟΣ", // sigma word-final before space and at end
    " Σ", // sigma at word start after edge space
    "WeißßStraße", // sharp s
    "İstanbul ı İ I", // dotted/dotless I (ICU binary mapping)
    "çağrı ÇAĞRI",
    s"全角スペース${IDEOSP}は空白クラス外", // ideographic space preserved
    s"a${NBSP}b", // NBSP is not Java \s — must be preserved
    "emoji 🎉🎊 and more",
    "x",
    "UPPER lower MiXeD 123 !@#")

  test("fused kernel equals the unfused md5(trim(lower(regexp_replace))) chain") {
    val in = df(StructType(Seq(StructField("t", StringType, nullable = true))),
      adversarial.map(Row(_)) :+ Row(null))
    val both = in.select(
      normalized_md5(col("t")).as("fused"),
      unfused(col("t")).as("unfused"))
    val rows = both.collect()
    assert(rows.length == adversarial.length + 1)
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0))
        assert(r.getString(0) == r.getString(1), s"mismatch on row $r")
    }
    // null in → null out
    assert(both.filter(col("fused").isNull).count() == 1)
  }

  test("fused kernel equals the unfused chain on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.select(
      normalized_md5(col("text")).as("a"), unfused(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(n == 0)
  }

  test("golden vector: known md5 of a normalized string") {
    // md5("hello world") — independently known constant
    val r = spark.range(1)
      .select(normalized_md5(lit(s"  HELLO$TAB${LF}world ")).as("h")).head()
    assert(r.getString(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("runs under forced whole-stage codegen") {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      // the aggregate forces every row through the generated code
      docs.select(normalized_md5(col("text")).as("h"))
        .agg(count(col("h"))).head()
    } finally spark.conf.set(key, prev)
  }
}
