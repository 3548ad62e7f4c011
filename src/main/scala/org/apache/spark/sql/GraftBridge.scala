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

  /** A real AnalysisException (its error-class constructors are
    * private[sql]) so bad arity on a registered function surfaces as the
    * same WRONG_NUM_ARGS analysis error built-ins throw.
    */
  def wrongNumArgsError(functionName: String, expected: Int,
      actual: Int): AnalysisException =
    new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$functionName`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}
