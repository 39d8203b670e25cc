package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved the classic bridge behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extensions reach it
  * from an `org.apache.spark.sql` subpackage. This shim is the only place
  * the engine touches a non-public Spark API, and it wraps two one-line
  * pure functions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
