package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4's Connect refactor made `ExpressionUtils` (and the old
  * `Column(expr)` constructor) `private[sql]`; a one-file shim in an
  * `org.apache.spark.sql` subpackage is the standard pattern used by
  * Spark extension libraries to register custom expressions from
  * library code.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** TRY_CAST as a Column op (ANSI-safe: malformed input → NULL), the
    * exact semantics of DuckDB's TRY_CAST used in the oracles. */
  def tryCast(c: Column, to: org.apache.spark.sql.types.DataType): Column =
    column(org.apache.spark.sql.catalyst.expressions.Cast(
      expression(c), to, None,
      org.apache.spark.sql.catalyst.expressions.EvalMode.TRY))
}
