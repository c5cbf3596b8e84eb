package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression
 * converters, so graft's native Catalyst expressions can be used from the
 * DataFrame API without registering SQL functions. Lives under
 * `org.apache.spark.sql` purely for access; contains no logic.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
