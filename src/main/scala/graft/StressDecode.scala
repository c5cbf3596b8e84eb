package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.meta.MetaValues

/**
 * Many-file stress for the zero-knowledge decode tier: N tiny parquet
 * files (default 20,000) with SCHEMA DRIFT — half `(id, k array<long>)`,
 * half `(id, v double, k array<long>)` — in one flat directory, then
 *
 *   1. `MetaValues.leafAccounting` — the footer-cost token census
 *   2. `MetaValues.decodePages`   — full page decode via per-file facts
 *
 * each timed and checked against closed-form totals, with driver heap
 * peak measured across both (pool peaks reset after the fixture write,
 * so the number is the QUERY cost, not the writer's).
 *
 * Usage: runMain graft.StressDecode [nFiles] [dir]
 * Prints one JSON line; a non-zero exit means a total mismatched.
 */
object StressDecode {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(20000)
    val dir = if (args.length > 1) args(1) else "/tmp/graft_stress_decode"
    val rowsPerFile = 10L

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stress-decode")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = new java.io.File(dir)
    val half = nFiles / 2
    val totalRows = nFiles * rowsPerFile
    if (!root.exists() || root.listFiles() == null ||
        root.listFiles().count(_.getName.endsWith(".parquet")) != nFiles) {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      root.mkdirs()
      // family A: (id, k) — one row group per file via repartition;
      // family B drifts: extra v column AHEAD of k
      def writeFamily(sub: String, n: Int, startId: Long, withV: Boolean): Unit = {
        // nulls at BOTH levels so the writer emits SizeStatistics level
        // histograms (a fully-REQUIRED list column gets none — "no
        // evidence" is the accounting contract, not the stress target)
        val base = spark.range(startId, startId + n * rowsPerFile)
          .select(col("id"),
            when(col("id") % 11 === 0, lit(null))
              .otherwise(array(
                when(col("id") % 13 === 0, lit(null)).otherwise(col("id")),
                col("id") + 1)).as("k"))
        val fam = if (withV) base.select(col("id"),
          (col("id") * 0.5).as("v"), col("k")) else base
        val tmp = s"$dir.$sub"
        fam.repartition(n).write.mode("overwrite").parquet(tmp)
        // flatten into the single stress directory
        new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
            case (f, i) => java.nio.file.Files.move(f.toPath,
              new java.io.File(root, s"$sub$i.parquet").toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      }
      writeFamily("a", half, 0L, withV = false)
      writeFamily("b", nFiles - half, half * rowsPerFile, withV = true)
    }

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val heapPools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
    heapPools.foreach(_.resetPeakUsage())

    // 1. footer-cost census: records + leaf entries, zero page I/O
    val t0 = System.nanoTime()
    val acct = MetaValues.leafAccounting(spark, dir)
      .filter(col("path").endsWith("element"))
      .agg(sum(col("n_records")).cast("long"),
        sum(col("n_leaf_values")).cast("long"))
      .collect()(0)
    val leafSec = (System.nanoTime() - t0) / 1e9

    // 2. full zero-knowledge page decode; the id column's PLAIN sum
    // reconstructs the exact closed form sum(0..totalRows-1)
    val t1 = System.nanoTime()
    val dec = MetaValues.decodePages(spark, dir)
      .agg(count(lit(1)).cast("long"),
        sum(when(col("decoded").isNull, 1).otherwise(0)).cast("long"),
        sum(when(col("path") === "id", col("decoded.lsum"))).cast("long"))
      .collect()(0)
    val decodeSec = (System.nanoTime() - t1) / 1e9

    val heapPeakMb = heapPools.map(_.getPeakUsage.getUsed).sum / (1024 * 1024)

    val expectedLeaves = (0L until totalRows).map { id =>
      if (id % 11 == 0) 0L else if (id % 13 == 0) 1L else 2L
    }.sum
    val recordsOk = acct.getLong(0) == totalRows
    val leavesOk = acct.getLong(1) == expectedLeaves
    val idSumExpected = totalRows * (totalRows - 1) / 2
    val decodeOk = dec.getLong(1) == 0L && dec.getLong(2) == idSumExpected
    println(
      s"""{"files":$nFiles,"rows":$totalRows,"leaf_sec":$leafSec,""" +
      s""""decode_sec":$decodeSec,"pages_decoded":${dec.getLong(0)},""" +
      s""""driver_heap_peak_mb":$heapPeakMb,""" +
      s""""records_ok":$recordsOk,"leaves_ok":$leavesOk,"decode_ok":$decodeOk}""")
    spark.stop()
    if (!(recordsOk && leavesOk && decodeOk)) sys.exit(1)
  }
}
