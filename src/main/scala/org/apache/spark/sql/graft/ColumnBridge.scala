package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Minimal bridge into Spark's `private[sql]` Column <-> Expression
 * converters, so graft's native Catalyst expressions can be used from the
 * DataFrame API without registering SQL functions. Lives under
 * `org.apache.spark.sql` purely for access; contains no logic.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /**
   * Release the storage blocks behind a `localCheckpoint`ed Dataset.
   * `Dataset.unpersist` is a NO-OP for checkpoints (it talks to the
   * CacheManager, which never registered the checkpoint RDD), so an
   * iterative algorithm that drops round N-1 after materializing round N
   * must unpersist the underlying RDD itself — reachable only through the
   * `private[sql]` [[LogicalRDD]] leaf of the analyzed plan.
   *
   * Only call this when nothing will read the Dataset again: the blocks ARE
   * its data, there is no lineage to recompute a local checkpoint.
   */
  def freeLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
