package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

import graft.SparkSpec

/** Pushed-filter file pruning: driver drops whole files before executor I/O. */
class FilePruningSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_prune").toString
    // 4 files with distinct names
    spark.range(0, 100, 1, 4).write.mode("overwrite").parquet(d)
    d
  }

  private def meta(level: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("metadata").option("level", level)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(dir)
  }

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  private def scannedFiles(df: DataFrame): Int =
    scanOf(df).inputPartitions.map(_.asInstanceOf[FilesPartition].spans.length).sum

  test("filename filter prunes files at planning time") {
    val all = meta("file")
    val totalFiles = scannedFiles(all)
    assert(totalFiles >= 4)
    val names = all.select("filename").collect().map(_.getString(0)).filter(_.endsWith(".parquet"))
    val one = meta("file").filter(col("filename") === names.head)
    assert(scannedFiles(one) === 1)
    assert(one.count() === 1)
  }

  test("filepath prefix filter prunes deeper levels before footer reads") {
    val somePath = meta("file").select("filepath").collect()
      .map(_.getString(0)).filter(_.endsWith(".parquet")).head
    val rg = meta("rowgroup").filter(col("filepath") === somePath)
    assert(scannedFiles(rg) === 1)
    assert(rg.count() >= 1)
    val pages = meta("page").filter(col("filepath").startsWith(somePath))
    assert(scannedFiles(pages) === 1)
  }

  test("non-file predicates do not prune (and still answer correctly)") {
    val rg = meta("rowgroup").filter(col("num_rows") > 0)
    assert(scannedFiles(rg) === scannedFiles(meta("rowgroup")))
    assert(rg.agg(sum("num_rows")).collect().head.getLong(0) === 100L)
  }

  test("size/mtime range filters prune at file level") {
    val huge = meta("file").filter(col("size") > Long.MaxValue / 2)
    assert(scannedFiles(huge) === 0)
    assert(huge.count() === 0)
    val nonEmpty = meta("file").filter(col("size") > 0L && col("mtime") > 0L)
    assert(nonEmpty.count() === meta("file").count())
  }

  test("limit pushdown caps planned files at file levels only") {
    val limited = meta("file").limit(2)
    assert(scannedFiles(limited) === 2)
    assert(limited.count() === 2)
    // deeper levels decline the pushdown (files can yield zero rows)
    val rg = meta("rowgroup").limit(2)
    assert(scannedFiles(rg) === scannedFiles(meta("rowgroup")))
    assert(rg.count() === 2)
  }

  test("file-level scans report exact statistics") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val scan = scanOf(meta("file")).scan.asInstanceOf[MetaScan]
    val stats = scan.estimateStatistics()
    assert(stats.numRows.getAsLong === meta("file").count())
    assert(stats.sizeInBytes.isPresent)
    val deep = scanOf(meta("column")).scan.asInstanceOf[MetaScan].estimateStatistics()
    assert(!deep.numRows.isPresent)
  }

  test("count(*) is answered from the driver listing at file levels") {
    val counted = meta("file").count()
    assert(counted === meta("file").collect().length.toLong)
    // the executed plan contains the pushed-count scan, not a row scan
    val agg = meta("file").groupBy().count()
    agg.collect()
    assert(agg.queryExecution.executedPlan.toString.contains("pushed-count"))
    // filtered count still pushes when the filter is fully decidable
    val filteredAgg = meta("file").filter(col("size") > 0L).groupBy().count()
    assert(filteredAgg.collect().head.getLong(0) === counted)
    assert(filteredAgg.queryExecution.executedPlan.toString.contains("pushed-count"),
      filteredAgg.queryExecution.executedPlan.toString)
    // non-decidable filters fall back to the ordinary scan
    val deep = meta("rowgroup").groupBy().count()
    assert(deep.collect().head.getLong(0) === meta("rowgroup").collect().length.toLong)
    assert(!deep.queryExecution.executedPlan.toString.contains("pushed-count"))
    // countpushdown=false forces the ordinary scan (scan-exact error
    // semantics: a corrupt file then throws on count() as it would on
    // collect() — the documented ParquetFile-level divergence escape hatch)
    val off = meta("file", "countpushdown" -> "false").groupBy().count()
    assert(off.collect().head.getLong(0) === counted)
    assert(!off.queryExecution.executedPlan.toString.contains("pushed-count"),
      off.queryExecution.executedPlan.toString)
  }

  test("three-valued evaluation is sound") {
    val f = FileSlice("file:/a/b.parquet", "b.parquet", 10L, 1000L, Map.empty)
    assert(FilePruning.eval(EqualTo("filename", "b.parquet"), f) === Some(true))
    assert(FilePruning.eval(EqualTo("size", 11L), f) === Some(false))
    assert(FilePruning.eval(GreaterThan("size", 5), f) === Some(true))
    assert(FilePruning.eval(StringStartsWith("filepath", "file:/a"), f) === Some(true))
    assert(FilePruning.eval(EqualTo("num_rows", 1L), f) === None)
    // unknown inside NOT must stay unknown, not flip to false
    assert(FilePruning.eval(Not(EqualTo("num_rows", 1L)), f) === None)
    assert(FilePruning.eval(
      And(EqualTo("filename", "b.parquet"), EqualTo("num_rows", 1L)), f) === None)
    assert(FilePruning.eval(
      Or(EqualTo("filename", "b.parquet"), EqualTo("num_rows", 1L)), f) === Some(true))
    assert(FilePruning.eval(In("size", Array(9L, 10L)), f) === Some(true))
    assert(FilePruning.eval(IsNotNull("filepath"), f) === Some(true))
  }
}
