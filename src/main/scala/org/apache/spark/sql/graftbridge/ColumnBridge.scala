package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridging for custom Catalyst expressions.
  * Spark 4 moved these conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extensions
  * conventionally re-export them from inside the sql package namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
