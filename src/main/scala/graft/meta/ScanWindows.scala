package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-clean building blocks for the "interval overlap" audits
 * ([[IcebergMeta.sortOrderAudit]], [[DeltaMeta.rowTrackingAudit]]):
 * a cumulative max over a TOTAL order without the single-task global
 * window Spark warns about ("No Partition Defined for Window") — a
 * million-row metadata relation must not funnel through one task.
 */
private[meta] object ScanWindows {

  /**
   * Adds `prev_cummax` = max of `value` (a LONG expression; nulls
   * ignored) over all STRICTLY-PRECEDING rows in `sortCols` order:
   * range-repartition on the sort key itself (RangePartitioner is
   * order-preserving, so partition ids follow key order), run the
   * cumulative max per partition, and fold each partition's boundary
   * max across via a bucket-count-sized broadcast prefix. Identical
   * results to the global-window form, spread over every core.
   */
  def withPrevCummax(
      df: DataFrame, sortCols: Seq[Column], value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the input subtree would otherwise run THREE times (the range
    // partitioner's sampling pass, the boundary-max aggregation, and
    // the final window) — snapshot it once; the relation is
    // metadata-sized (one row per file) by every caller's contract
    val snapped = df.localCheckpoint()
    val bucketed = snapped.repartitionByRange(sortCols: _*)
      .withColumn("__bucket", spark_partition_id())
      .withColumn("__val", value)
    val w = Window.partitionBy(col("__bucket")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-bucket boundary maxima: one row per partition, prefix-folded
    // on the driver (bucket-count-sized, never row-count-sized)
    val bucketMax = bucketed.groupBy(col("__bucket"))
      .agg(max(col("__val")).as("bmax"))
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .sortBy(_._1)
    var acc: Option[Long] = None
    val carrySeq = bucketMax.map { case (b, bmax) =>
      val out = (b, acc) // strictly-earlier buckets' max
      acc = (acc.toSeq ++ bmax.toSeq).maxOption
      out
    }
    val carryDf = broadcast(carrySeq.toSeq.toDF("__bucket", "__carry"))
    bucketed
      .withColumn("__local", max(col("__val")).over(w))
      .join(carryDf, Seq("__bucket"))
      .withColumn("prev_cummax", greatest(col("__local"), col("__carry")))
      .drop("__bucket", "__val", "__local", "__carry")
  }
}
