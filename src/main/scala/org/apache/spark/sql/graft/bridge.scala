package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's package-private Column↔Expression
  * converters (Spark 4 moved them behind `private[sql]`). Lives in an
  * `org.apache.spark.sql` subpackage purely to satisfy that scope —
  * the standard technique for custom-Expression libraries. */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
