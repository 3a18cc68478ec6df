package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one Spark-internal seam graft needs that has no public form:
  * turning a Catalyst [[Expression]] into a [[Column]] (and back)
  * OUTSIDE a function-registry builder. Every other graft expression
  * registers as a SQL function and rides `call_function`, but a
  * function builder only receives child Expressions — an expression
  * carrying a non-Expression payload (the sharded bloom probe's
  * [[org.apache.spark.broadcast.Broadcast]] handle,
  * [[graft.functions.ShardedBloomMightContain]]) must be constructed
  * directly. `ExpressionUtils` is `private[sql]` in Spark 4, so this
  * bridge lives in an `org.apache.spark.sql` subpackage — the same
  * accommodation every Spark-extension library makes (frameless,
  * spark-nlp, delta all ship such a shim). Nothing else of Spark's
  * internals is re-exported here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
