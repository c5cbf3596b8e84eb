package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hudi 1.x (table version 8) timeline layout: completion-time
  * instant names under `.hoodie/timeline/`, the archived-LSM history
  * subdirectory skipped, COW surfaces resolving identically to the
  * 0.x fixture, and the non-blocking-concurrency refusal when
  * completions invert request order. */
class HudiV1xSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (c1, c2) = ("20240101000000000", "20240102000000000")

  private def fresh(): (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft_hudiv1x").toString + "/tbl"
    (d, HudiMeta.writeHudiV1xFixtureTable(spark, d, docs))
  }

  test("timeline: completion-time names parse, history subdir is " +
      "invisible, markers keep their states") {
    val (d, _) = fresh()
    val rows = HudiMeta.timelineReportFull(spark, d).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1),
        r.getString(2), r.getString(3)))
    assert(rows.toSet === Set(
      (c1, "20240101000000500", "commit", "completed"),
      (c1, null, "commit", "requested"),
      (c1, null, "commit", "inflight"),
      (c2, "20240102000000500", "commit", "completed"),
      (c2, null, "commit", "requested"),
      (c2, null, "commit", "inflight"),
      ("20240103000000000", null, "commit", "requested")))
    // the 3-column report stays the stable surface
    assert(HudiMeta.timelineReport(spark, d).columns.toSeq ===
      Seq("instant_time", "action", "state"))
  }

  test("COW resolution on the v8 layout matches the 0.x fixture: live " +
      "view, conformance lie, orphan invisibility, time travel") {
    val (d, rows) = fresh()
    val live = HudiMeta.liveCensus(spark, d).collect()
      .map(r => (r.getString(0) /* file_id */,
        r.getString(3) /* instant */, r.getLong(4), r.getLong(5),
        r.getBoolean(6))).toSet
    assert(live === Set(
      ("fid0", c2, rows(s"p=0/fid0_0-0-0_$c2.parquet"),
        rows(s"p=0/fid0_0-0-0_$c2.parquet"), true),
      ("fid1", c1, rows(s"p=0/fid1_0-0-0_$c1.parquet") + 1,
        rows(s"p=0/fid1_0-0-0_$c1.parquet"), false),
      ("fid2", c2, rows(s"p=1/fid2_0-0-0_$c2.parquet"),
        rows(s"p=1/fid2_0-0-0_$c2.parquet"), true)))
    // time travel to c1: fid0's first slice + fid1, fid2 absent
    val atC1 = HudiMeta.liveFiles(spark, d, Some(c1)).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(atC1 === Set(("fid0", c1), ("fid1", c1)))
    // the orphan never surfaces in the live view, only in the report
    val orphans = HudiMeta.orphanReport(spark, d).collect()
      .map(_.getString(0)).toSet
    assert(orphans === Set("fid3_0-0-0_20240103000000000.parquet"))
    // incremental pull windows resolve on request-time instants
    val pull = HudiMeta.incrementalPull(spark, d, c1, c2).collect()
      .map(_.getString(2)).toSet // file_id
    assert(pull === Set("fid0", "fid2"))
  }

  test("schema history and conformance read v8 instant files") {
    val (d, _) = fresh()
    val hist = HudiMeta.schemaHistory(spark, d).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(hist === Map(c1 -> 3, c2 -> 4))
    val conf = HudiMeta.schemaConformance(spark, d).collect()
      .map(r => r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1)
        -> r.getString(3)).toMap
    // every base file predates the evolved 'quality' column
    assert(conf.values.toSet === Set("quality"))
  }

  test("out-of-request-order completions refuse with the 1.x feature " +
      "named, never a wrong resolution") {
    val (d, _) = fresh()
    // invert: c2 completed BEFORE c1 (overlapping writers)
    val tdir = new java.io.File(d, ".hoodie/timeline")
    val c2f = new java.io.File(tdir, s"${c2}_20240102000000500.commit")
    assert(c2f.renameTo(
      new java.io.File(tdir, s"${c2}_20240101000000100.commit")))
    val e = intercept[UnsupportedOperationException] {
      HudiMeta.liveFiles(spark, d).collect()
    }
    assert(e.getMessage.contains("non-blocking concurrency control"))
  }

  test("cross-layout invariance: the MOR per-row merge resolves " +
      "identically after converting the table to the v8 layout") {
    // build the real-log MOR fixture, merge on the 0.x layout...
    val d = Files.createTempDirectory("graft_v1xmor").toString + "/tbl"
    HudiMeta.writeHudiMorLogFixtureTable(spark, d, docs)
    val before = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    // ...then CONVERT in place: timeline files move to
    // .hoodie/timeline/, completed instants gain completion-time
    // names, table version bumps to 8 (what Hudi's own upgrade does)
    val hoodie = new java.io.File(d, ".hoodie")
    val tdir = new java.io.File(hoodie, "timeline")
    tdir.mkdirs()
    hoodie.listFiles().filter(_.isFile)
      .filter(_.getName.headOption.exists(_.isDigit)).foreach { f =>
        val n = f.getName
        val renamed = n match {
          case s if s.endsWith(".requested") || s.endsWith(".inflight") => s
          case s =>
            val dot = s.indexOf('.')
            s"${s.substring(0, dot)}_${s.substring(0, dot).toLong + 500}" +
              s.substring(dot)
        }
        assert(f.renameTo(new java.io.File(tdir, renamed)))
      }
    val props = new java.io.File(hoodie, "hoodie.properties")
    val ptxt = new String(java.nio.file.Files.readAllBytes(props.toPath),
      "UTF-8")
    java.nio.file.Files.write(props.toPath,
      ptxt.replace("hoodie.table.version=6", "hoodie.table.version=8")
        .getBytes("UTF-8"))
    val after = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    assert(after === before)
  }

  test("a v1x completed name parses in the datasource timeline level") {
    assert(HudiMeta.parseInstantName(
      "20240101000000000_20240101000000500.commit", "/t") ===
      (("20240101000000000", "commit", "completed")))
    // garbage still refuses
    intercept[IllegalArgumentException](
      HudiMeta.parseInstantName("2024_01_02.commit", "/t"))
  }
}
