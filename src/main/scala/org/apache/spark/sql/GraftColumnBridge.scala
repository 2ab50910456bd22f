package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (Column became backend-agnostic). Needed
  * to expose custom Catalyst expressions (graft.functions.
  * FloatDotProduct) through the public Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
