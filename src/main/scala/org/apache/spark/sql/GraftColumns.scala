/*
 * Lives in org.apache.spark.sql ON PURPOSE: the Column ⇄ Expression
 * bridge (`Column(() => ColumnNode)` and `ExpressionColumnNode`) is
 * `private[sql]` in Spark 4, and wrapping a custom Catalyst Expression
 * into a user-facing Column requires it. This is the conventional shim
 * point for libraries that ship native expressions without forcing
 * every SparkSession to be built with injected extensions — the
 * expression then works in ANY session, including ones the caller
 * constructed elsewhere.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for graft's native Catalyst expressions (see
  * `graft.functions`). Keep this object minimal: two conversions plus
  * the registry accessor, no logic — everything interesting belongs in
  * the expressions themselves. */
object GraftColumns {
  def column(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** The session's function registry (`sessionState` is `private[sql]`
    * on the classic session — same shim rationale as above), so
    * `graft.functions.GraftFunctions.register` can install the SQL
    * names into a live session. */
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
