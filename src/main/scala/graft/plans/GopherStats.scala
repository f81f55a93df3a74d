package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher document-quality counters (the non-repetition half of
  * Rae et al. 2021 table A1) in ONE codegen'd pass — words, word-length
  * mass, alphabetic words, symbol occurrences, line/bullet/ellipsis
  * counts and canonical-stopword membership. The unfused Column
  * formulation ran two `split`s plus six interpreted HOF lambdas per
  * struct field reference, re-tokenizing the document each time; this
  * scans the string once per row regardless of how many signals are
  * read. Count semantics are replicated built-in-for-built-in (see
  * [[ExprKernels.gopherStats]]) so the DuckDB oracle formulation is
  * unchanged.
  */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = GopherStats.schema
  override def checkInputDataTypes() =
    expressions.stringCheck(child, "gopher_stats")

  @transient private lazy val stopwordArr: Array[String] = stopwords.toArray

  override def nullSafeEval(input: Any): Any =
    ExprKernels.gopherStats(input.asInstanceOf[UTF8String], stopwordArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("gopherStopwords", stopwordArr,
      "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ExprKernels.gopherStats($c, $sw);")
  }

  override protected def withNewChildInternal(c: Expression): GopherStats =
    copy(child = c)
}

object GopherStats {
  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_word_len", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  import org.apache.spark.sql.GraftColumnBridge.{column, expression => toExpr}

  def apply(text: Column, stopwords: Seq[String]): Column =
    column(GopherStats(toExpr(text), stopwords))
}
