package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 removed the public `new Column(expr)` constructor). Lives in
  * the `org.apache.spark.sql` package purely for visibility — the
  * standard extension-point technique for libraries shipping custom
  * Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
