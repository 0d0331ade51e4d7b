package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column↔Expression conversion (`ExpressionUtils`)
  * `private[sql]`; this shim, compiled into the sql package namespace,
  * re-exports the two conversions the engine's custom Catalyst expressions
  * need. Equivalent public alternative would be FunctionRegistry
  * registration + `expr(...)` strings; this keeps call sites typed.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
