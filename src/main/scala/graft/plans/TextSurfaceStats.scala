package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL surface statistics of a text in ONE pass — the fused scan behind
  * quality scoring, language ID and token counting. The original
  * formulations ran 7+ regex passes plus an interpreted HOF tokenization
  * per row (each `regexp_count` re-scans the string); this computes every
  * counter in a single code-point scan plus one pass over the
  * Spark-`lower`ed text for tokenization. Semantics are replicated
  * built-in-for-built-in (see [[ExprKernels.textSurfaceStats]]) so the
  * Column-level formulas — and their DuckDB oracles — are unchanged.
  *
  * Output struct:
  *  - n_chars, n_alpha, n_punct: code points, `\p{L}` letters, ASCII punct
  *  - cjk/kana/hangul/cyr/arab: script code-point counts
  *  - n_toks, sum_tok_len, n_distinct: letter-run tokens of lower(text)
  *  - n_ws, n_bpe: whitespace-token and BPE-ish pre-token counts
  *  - hits: per-stopword-list distinct-token intersection sizes
  */
case class TextSurfaceStats(child: Expression, stopwords: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = TextSurfaceStats.schema
  override def checkInputDataTypes() =
    expressions.stringCheck(child, "text_surface_stats")

  @transient private lazy val stopwordSets: Array[java.util.HashSet[String]] =
    stopwords.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      s
    }.toArray
  @transient private lazy val langCodes: Array[String] = stopwords.map(_._1).toArray

  override def nullSafeEval(input: Any): Any =
    ExprKernels.textSurfaceStats(input.asInstanceOf[UTF8String], stopwordSets, langCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sets = ctx.addReferenceObj("stopwordSets", stopwordSets,
      "java.util.HashSet[]")
    val codes = ctx.addReferenceObj("langCodes", langCodes, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ExprKernels.textSurfaceStats($c, $sets, $codes);")
  }

  override protected def withNewChildInternal(c: Expression): TextSurfaceStats =
    copy(child = c)
}

object TextSurfaceStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false),
    StructField("kana", LongType, nullable = false),
    StructField("hangul", LongType, nullable = false),
    StructField("cyr", LongType, nullable = false),
    StructField("arab", LongType, nullable = false),
    StructField("n_toks", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("n_ws", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("lang", StringType, nullable = false)))

  import org.apache.spark.sql.GraftColumnBridge.{column, expression => toExpr}

  def apply(text: Column, stopwords: Seq[(String, Seq[String])]): Column =
    column(TextSurfaceStats(toExpr(text), stopwords))
}
