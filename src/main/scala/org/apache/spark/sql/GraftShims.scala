package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> catalyst Expression converters —
  * the standard extension-point shim for libraries that ship custom Catalyst
  * expressions (Spark 4 classic API: org.apache.spark.sql.classic
  * .ExpressionUtils).
  */
object GraftShims {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Total interpreted ordering over Catalyst internal values of `dt` —
    * what SortExec uses when codegen is off; lets custom aggregates order
    * ids of any orderable type (string, date, numeric, ...). */
  def orderingFor(dt: types.DataType): Ordering[Any] =
    catalyst.util.TypeUtils.getInterpretedOrdering(dt)
}
