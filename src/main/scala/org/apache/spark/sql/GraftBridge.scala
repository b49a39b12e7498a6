package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversions —
  * the standard pattern for libraries adding native Catalyst
  * expressions (a public `Column(expr)` constructor no longer exists
  * in Spark 4's split API). Nothing else from the private surface is
  * touched.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
