package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4's Column wraps a
  * ColumnNode and the classic converter (`ExpressionUtils`) is
  * `private[sql]`, so library code that builds Columns DIRECTLY from
  * its own native expressions (graft.functions kernels) needs this
  * one-file shim in the sql package. Direct construction — rather than
  * `call_function` + per-session FunctionRegistry registration — makes
  * kernel-built plans analyze in ANY session, including fresh
  * `newSession()`s without GraftExtensions injected. */
object ColumnBridge {
  /** Wrap a Catalyst expression as a Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression (classic converter). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
