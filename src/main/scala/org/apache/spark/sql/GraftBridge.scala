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

  /** Wrap a (resolved) logical plan as a DataFrame — `Dataset.ofRows`
    * is `private[sql]`; graft's custom plan nodes (e.g.
    * [[graft.plans.AsOfJoinNode]]) need it to enter the query engine.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
