package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column ↔ Expression conversion for
  * graft's custom Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor). Standard extension-library practice. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
