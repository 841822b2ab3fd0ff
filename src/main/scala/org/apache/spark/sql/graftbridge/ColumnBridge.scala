package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made the Column API
  * backend-agnostic and scoped the conversion helpers private[sql];
  * extensions hosting native expressions use a same-package bridge
  * (the documented pattern for third-party catalyst extensions).
  */
object ColumnBridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Catalyst's k-bounded Collect aggregate (private[sql] — same
    * same-package bridge as the Column converters). reverse = false
    * keeps the k smallest under the child type's ordering.
    */
  def collectTopK(c: Column, k: Int, reverse: Boolean): Column =
    ExpressionUtils.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        ExpressionUtils.expression(c), k, reverse).toAggregateExpression())
}
