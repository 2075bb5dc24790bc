package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column<->Expression converters, so the
  * engine's native expressions can be used as plain `Column`s without a
  * function-registry round-trip (registration requires a live session at column
  * construction time, which pure column-builder APIs don't have). The standard
  * extension-library technique; only these two one-line forwards live here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
