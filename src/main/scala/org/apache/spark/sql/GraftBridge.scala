package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * `new Column(expr)` behind `classic.ExpressionUtils`). Lives in the
  * org.apache.spark.sql package purely for access; no Spark internals are
  * modified. Used by graft's custom Catalyst expressions.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
