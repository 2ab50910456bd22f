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

  /** Runtime registration of a native expression as a SQL function in
    * an already-running session (the config-driven path is
    * `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
