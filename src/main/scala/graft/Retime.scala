package graft
import org.apache.spark.sql.SparkSession

/** Standalone riser re-time: run the named queries cold + N warm in one JVM.
  *
  * The in-suite bench interleaves 200+ queries, so a single query's figure
  * carries whatever page-cache/classloader state the previous queries left
  * behind. When a query rises >1.5x vs the committed record, the contract
  * (BASELINE.md) is to re-time it here in isolation: the COLD figure bounds
  * the fresh-JVM cost, the WARM figures are the steady-state plan cost that
  * a regression would move.
  *
  * Usage: runMain graft.Retime <query> [<query> ...]   (env as Bench)
  */
object Retime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_WARM", "2").toInt
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
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val out = args.toSeq.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (0 to warmRuns).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      Json.str(name) + ":{\"cold\":" + times.head +
        ",\"warm\":[" + times.tail.mkString(",") + "]}"
    }
    println(s"""{"load":$load,"queries":${out.mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
