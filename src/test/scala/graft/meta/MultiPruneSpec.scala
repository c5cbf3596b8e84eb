package graft.meta

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Multi-column pruning: the conjunction evaluated per ROW GROUP drops a
 * file that EVERY single-column prune keeps. Layout (row groups exact via
 * [[RowGroupWriter]]):
 *
 *   fileA: rg0 = (Jan dates, k in [0,1000)),  rg1 = (Feb, k in [1000,2000))
 *   fileB: rg0 = (Jan, k in [1000,2000)),     rg1 = (Feb, k in [0,1000))
 *
 * `od in Feb` admits rg1 of both files; `k < 1000` admits a row group of
 * both files; only fileB has a single row group matching BOTH.
 */
class MultiPruneSpec extends SparkSpec {

  private val jan = LocalDate.of(2024, 1, 1)
  private val feb = LocalDate.of(2024, 2, 1)

  private def days(base: LocalDate, i: Int): Int =
    (base.toEpochDay + (i % 28)).toInt

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_multiprune").toString
    val janLow = (0 until 1000).map(i => (days(jan, i), i.toLong))
    val febHigh = (0 until 1000).map(i => (days(feb, i), 1000L + i))
    val janHigh = (0 until 1000).map(i => (days(jan, i), 1000L + i))
    val febLow = (0 until 1000).map(i => (days(feb, i), i.toLong))
    RowGroupWriter.writeDateLongFile(s"$d/fileA.parquet", janLow ++ febHigh, 1000)
    RowGroupWriter.writeDateLongFile(s"$d/fileB.parquet", janHigh ++ febLow, 1000)
    d
  }

  private val predDate = DateRangePred("od", feb, LocalDate.of(2024, 2, 29))
  private val predK = LongRangePred("k", 0L, 999L)

  test("row groups land exactly where declared") {
    val rgs = spark.read.format("metadata").option("level", "rowgroup")
      .load(dir).select(col("filepath"), col("row_group_id"), col("num_rows"))
      .collect()
    assert(rgs.length === 4)
    assert(rgs.forall(_.getLong(2) === 1000L))
  }

  test("each single-column predicate keeps both files") {
    assert(MetaPrune.filesInDateRange(spark, dir, "od",
      predDate.lo, predDate.hi).length === 2)
    assert(MetaPrune.filesInRange(spark, dir, "k",
      predK.lo, predK.hi).length === 2)
  }

  test("the conjunction prunes to one file and stays exact") {
    val pruned = MetaPrune.readPrunedWhere(spark, dir, Seq(predDate, predK))
    // plan-level proof: only fileB is scanned
    val scanned = pruned.inputFiles.toSeq
    assert(scanned.length === 1 && scanned.head.contains("fileB"),
      s"expected only fileB scanned, got $scanned")
    val predicate = col("od").between(
        java.sql.Date.valueOf("2024-02-01"), java.sql.Date.valueOf("2024-02-29")) &&
      col("k") <= 999L
    val got = pruned.filter(predicate)
      .agg(count(lit(1)).as("n"), sum(col("k")).as("ksum")).collect()(0)
    val want = spark.read.parquet(dir).filter(predicate)
      .agg(count(lit(1)).as("n"), sum(col("k")).as("ksum")).collect()(0)
    assert(got === want)
    assert(got.getLong(0) === 1000L)
  }

  test("a missing predicate column keeps every file (sound)") {
    val pruned = MetaPrune.readPrunedWhere(spark, dir,
      Seq(predDate, LongRangePred("no_such_column", 0L, 1L)))
    assert(pruned.inputFiles.length === 2)
  }

  test("INT32 and DOUBLE equality predicates prune through the conjunction") {
    val d = Files.createTempDirectory("graft_multiprune_eq32").toString
    spark.range(0, 2000)
      .select(col("id").cast("int").as("k"),
        (col("id") * lit(0.25d)).as("v"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 50).cast("int")).as("od"))
      .repartition(4, col("k"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "600")
      .option("parquet.bloom.filter.enabled#v", "true")
      .option("parquet.bloom.filter.expected.ndv#v", "600")
      .option("parquet.enable.dictionary#k", "false")
      .option("parquet.enable.dictionary#v", "false")
      .parquet(d)
    val dateAll = DateRangePred("od",
      LocalDate.of(2024, 1, 1), LocalDate.of(2024, 3, 1))
    val prunedI = MetaPrune.readPrunedWhere(spark, d,
      Seq(dateAll, EqIntPred("k", 1234)))
    assert(prunedI.inputFiles.length < 4, "INT32 bloom side pruned nothing")
    assert(prunedI.filter(col("k") === 1234).count() === 1L)
    val prunedD = MetaPrune.readPrunedWhere(spark, d,
      Seq(dateAll, EqDoublePred("v", 308.5d)))
    assert(prunedD.inputFiles.length < 4, "DOUBLE bloom side pruned nothing")
    assert(prunedD.filter(col("v") === 308.5d).count() === 1L)
    // NaN equality keeps every file and matches nothing (SQL semantics)
    val prunedN = MetaPrune.readPrunedWhere(spark, d,
      Seq(EqDoublePred("v", Double.NaN)))
    assert(prunedN.inputFiles.length === 4)
  }

  test("an equality predicate composes bloom pruning per file") {
    // same grid, long column bloom-enabled, hash-scattered key
    val d = Files.createTempDirectory("graft_multiprune_eq").toString
    spark.range(0, 2000)
      .select(col("id").as("k"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("id") % 50).cast("int")).as("od"))
      .repartition(4, col("k"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "600")
      .option("parquet.enable.dictionary#k", "false")
      .parquet(d)
    val pruned = MetaPrune.readPrunedWhere(spark, d,
      Seq(DateRangePred("od", LocalDate.of(2024, 1, 1), LocalDate.of(2024, 3, 1)),
        EqLongPred("k", 1234L)))
    assert(pruned.inputFiles.length < 4, "bloom side of the conjunction pruned nothing")
    assert(pruned.filter(col("k") === 1234L).count() === 1L)
  }

  /** Rows the real reader emitted for `df`, from the scan node's own
    * numOutputRows metric after execution — page-index skipping happens
    * inside the reader, so emitted rows ARE the touched-row ground truth
    * (record-level filtering is off by default; the residual filter sits
    * ABOVE the scan). */
  private def scanEmittedRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("page-skip report is EXTERNALLY validated by Spark's own reader") {
    val dir = Files.createTempDirectory("graft_skipvalid").toString
    // pinned layout: sorted key, 1000-row pages, page indexes on (the
    // parquet-mr default) — the reader's ColumnIndexFilter and our report
    // read the same offset index, so their row accounting must agree
    spark.range(0, 100000)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "1000")
      .parquet(dir)
    val (lo, hi) = (20000L, 23999L)
    val rep = MetaPrune.pageSkipReport(spark, dir, "k", lo, hi).collect()
    val predicted = rep.map(_.getAs[Long]("rows_covered")).sum
    val total = rep.map(_.getAs[Long]("rows_total")).sum
    assert(total === 100000L)
    assert(predicted < total, "pinned layout must predict real skipping")
    assert(predicted >= hi - lo + 1, "prediction cannot undercut the matches")
    val emitted = scanEmittedRows(
      spark.read.parquet(dir).filter(col("k") >= lo && col("k") <= hi)
        .select(col("v")))
    // the reader cannot touch fewer rows than match, and our report is an
    // upper bound on what it touches
    assert(emitted >= hi - lo + 1)
    assert(emitted <= predicted,
      s"reader touched $emitted rows but the report predicted only $predicted")
    // on this pinned layout the bound is TIGHT: same index, same ranges
    assert(emitted === predicted,
      s"report ($predicted) and reader ($emitted) disagree on the pinned layout")

    // conjunction: the multi-column report against the reader's own
    // row-range intersection of both pushed predicates
    val repM = MetaPrune.pageSkipReportMulti(spark, dir,
      Seq(("k", lo, hi), ("v", 0L, 30L))).collect()
    val predictedM = repM.map(_.getAs[Long]("rows_covered")).sum
    assert(predictedM <= predicted, "adding a predicate cannot widen coverage")
    val emittedM = scanEmittedRows(
      spark.read.parquet(dir)
        .filter(col("k") >= lo && col("k") <= hi &&
          col("v") >= 0L && col("v") <= 30L)
        .select(col("v")))
    assert(emittedM <= predictedM,
      s"reader touched $emittedM rows but the multi report predicted $predictedM")
  }
}
