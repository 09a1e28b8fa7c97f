package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge for wrapping a raw Catalyst [[Expression]] in a
  * public [[Column]]: Spark 4 made the Column(expr) constructor and
  * `classic.ExpressionUtils` private[sql], so custom native
  * expressions (graft.functions) route through this one-file shim —
  * the standard extension-library pattern for Column-API exposure
  * without a SparkSessionExtensions registration. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
