package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression conversions so graft
  * can wrap its native codegen'd Catalyst expressions (e.g.
  * [[graft.functions.VecDot]]) as user-facing Columns without registering
  * them in a FunctionRegistry. This is the same mechanism Spark's own
  * `functions` object uses internally (classic/columnNodeSupport.scala).
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
