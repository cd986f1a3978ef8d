package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the classic Column ⇄ Expression converters, which Spark
  * 4.x scopes `private[sql]` (the Connect refactor removed the public
  * `new Column(expr)` constructor). Needed for graft expressions that
  * carry non-Expression state — [[graft.functions.BloomMightContain]]
  * holds a `Broadcast[BloomFilter]`, so it cannot be built through the
  * function registry's `Seq[Expression] => Expression` builders the
  * way the other graft kernels are. Same precedent as
  * [[org.apache.spark.sql.execution.streaming.state.GraftStateStoreAccess]]:
  * a minimal, documented shim in the Spark namespace rather than
  * reflection. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
