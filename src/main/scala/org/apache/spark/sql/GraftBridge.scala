package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's custom expressions.
  * `classic.ExpressionUtils` is `private[sql]`, so the bridge lives in this
  * package — the standard pattern for libraries shipping native Catalyst
  * expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
