package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `Column.expr` bridge when
  * Column became backend-agnostic (Spark Connect). For a classic-mode
  * library shipping custom Catalyst expressions, this is the supported
  * conversion point (`ExpressionUtils` is `private[sql]`, hence this
  * one-file shim in the sql package — the same pattern third-party Spark
  * extensions use).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
