package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `Column(expr)` / `col.expr` bridge; the
  * blessed converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * `private[sql]`. This shim lives under the `org.apache.spark.sql` package
  * solely to re-export those two conversions to the graft library — the
  * standard technique for Catalyst-extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
