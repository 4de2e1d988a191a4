package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column↔Expression converters, which Spark 4 scopes
  * private[sql]. Extensions that define native Catalyst expressions need this
  * to expose them as `Column`s (the old `new Column(expr)` constructor was
  * removed from the public API). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
