package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column↔Expression converters.
  * Spark 4 moved Column onto ColumnNode; third-party native Expressions
  * (the preferred extension tier per SURVEY §7) need this one hop. No
  * other internals are touched. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
