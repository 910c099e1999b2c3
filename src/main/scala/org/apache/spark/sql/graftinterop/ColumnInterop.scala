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
}
