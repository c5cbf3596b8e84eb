package graft.meta

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/**
 * Custom scan metrics surfaced through the DSv2 metric API: per-task counts
 * of underlying storage read and seek calls made by the page walker's
 * buffered stream. The reference engine keeps equivalent counters privately
 * (numRemoteReads/numRemoteSeeks); here they aggregate into the Spark UI's
 * scan node, where remote-I/O regressions are visible per query.
 */
class RemoteReadsMetric extends CustomSumMetric {
  override def name(): String = "graftRemoteReads"
  override def description(): String = "underlying storage read calls"
}

class RemoteSeeksMetric extends CustomSumMetric {
  override def name(): String = "graftRemoteSeeks"
  override def description(): String = "underlying storage seek calls"
}

/** Files skipped under `ignorecorrupt=true`: at large file counts a skip
  * logged per executor is easy to lose; the aggregated scan-node count is
  * not. */
class SkippedFilesMetric extends CustomSumMetric {
  override def name(): String = "graftSkippedFiles"
  override def description(): String = "corrupt files skipped (ignorecorrupt)"
}

case class TaskMetricValue(metricName: String, metricValue: Long) extends CustomTaskMetric {
  override def name(): String = metricName
  override def value(): Long = metricValue
}

object MetaMetrics {
  def supported: Array[CustomMetric] =
    Array(new RemoteReadsMetric, new RemoteSeeksMetric, new SkippedFilesMetric)
}
