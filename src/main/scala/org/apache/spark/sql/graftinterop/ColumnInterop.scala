package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column <-> catalyst Expression bridge. Spark 4 split the
  * public `Column` API from catalyst; the conversion helpers are
  * `private[sql]`, so this one-file shim lives in a subpackage of
  * `org.apache.spark.sql` — the standard technique for third-party
  * extensions that ship custom expressions. Nothing else in the engine
  * reaches into Spark internals.
  */
object ColumnInterop {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → catalyst conversion. [[expression]] wraps the
    * node lazily (`ExpressionColumnNode`), which DataFrame plan
    * construction converts via the session — but an expression
    * returned from a SQL `FunctionBuilder` never passes through that
    * path, so the wrapper (with `UnresolvedFunction`s still inside)
    * survives to codegen and fails. Converting eagerly yields a plain
    * catalyst tree whose unresolved nodes the analyzer then resolves
    * like any parsed SQL. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
