package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for custom Catalyst expressions. The converters
  * live in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]` in Spark 4.x — the established pattern for third-party
  * expression libraries is a one-file accessor inside the sql package. */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
