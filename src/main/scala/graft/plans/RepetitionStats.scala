package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition statistics of a text in ONE pass (Rae et al.
  * 2021, table A1 — the public repetition filters used for pretraining
  * corpora). See [[ExprKernels.repetitionStats]] for field semantics; the
  * formulas are also exactly reproducible in SQL (window `lead` n-grams +
  * group-by lines), which is how the DuckDB oracle validates them.
  *
  * Output struct: n_lines, dup_line_frac, dup_line_char_frac,
  * top2gram_char_frac, top3gram_char_frac, dup5gram_char_frac.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema
  override def checkInputDataTypes() =
    expressions.stringCheck(child, "repetition_stats")

  override def nullSafeEval(input: Any): Any =
    ExprKernels.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ExprKernels.repetitionStats($c);")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("dup_line_frac", DoubleType, nullable = false),
    StructField("dup_line_char_frac", DoubleType, nullable = false),
    StructField("top2gram_char_frac", DoubleType, nullable = false),
    StructField("top3gram_char_frac", DoubleType, nullable = false),
    StructField("dup5gram_char_frac", DoubleType, nullable = false)))

  import org.apache.spark.sql.GraftColumnBridge.{column, expression => toExpr}

  def apply(text: Column): Column = column(RepetitionStats(toExpr(text)))
}
