package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the private[sql] Column↔Expression converters — the
  * supported pattern for libraries that add custom Catalyst expressions
  * without a SessionExtensions registration (Spark 4 removed the public
  * `new Column(expr)` constructor). */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
