package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/**
 * Shuffle-volume audit: runs selected queries with a listener summing every
 * stage's shuffle write bytes and input bytes, and prints one JSON line per
 * query. This measures the claim the scale-audit table makes qualitatively
 * — WHAT moves at a shuffle boundary — as actual bytes at the benchmark
 * scale: a sketch op whose shuffle bytes stay near-constant while its input
 * bytes track the data size is doing what its plan promises.
 *
 * Usage: `sbt "runMain graft.ShuffleAudit [sfDir [query,query,...]]"`.
 */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val wanted: Seq[String] =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_exact", "dedup_minhash", "kmv_distinct", "kmv_overlap",
        "heavy_hitters", "quantile_hist", "q_percentiles", "weighted_sample",
        "quota_sample", "ann_quantized", "profile_table", "q1_agg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir", EntryHelpers.sparkLocalDir)
      .config("spark.sql.warehouse.dir", EntryHelpers.warehouseDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleWrite = new LongAdder
    val input = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        shuffleWrite.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        input.add(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val queries = SparkEntry.queries
    wanted.foreach { name =>
      queries.get(name) match {
        case None => System.err.println(s"[audit] unknown query: $name")
        case Some(fn) =>
          shuffleWrite.reset(); input.reset()
          val rows = fn(spark, sfDir).queryExecution.toRdd.count()
          // listener events are posted asynchronously (the bus-drain API is
          // private); a settle sleep is accurate enough for an audit tool
          Thread.sleep(2000)
          println(s"""{"query":${Json.str(name)},"rows":$rows,""" +
            s""""input_bytes":${input.sum()},"shuffle_write_bytes":${shuffleWrite.sum()}}""")
      }
    }
    spark.stop()
  }
}
