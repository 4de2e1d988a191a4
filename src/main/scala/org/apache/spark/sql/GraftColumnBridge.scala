package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the Column↔Expression converters, which Spark 4 scopes
  * private[sql]. Extensions that define native Catalyst expressions need this
  * to expose them as `Column`s (the old `new Column(expr)` constructor was
  * removed from the public API). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Decompose a sort-order Column into (child, ascending, nullsFirst).
    * `expression(c)` returns a LAZY ColumnNodeExpression wrapper (never a
    * catalyst SortOrder), so sort introspection must happen at the ColumnNode
    * layer. Returns None for a non-sort Column. */
  def sortOrderParts(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case so: internal.SortOrder =>
      Some((new Column(so.child),
        so.sortDirection == internal.SortOrder.Ascending,
        so.nullOrdering == internal.SortOrder.NullsFirst))
    case _ => None
  }
}
