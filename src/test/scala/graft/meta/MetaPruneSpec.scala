package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stats-driven data-file pruning: footer min/max statistics select the
  * files a range predicate needs; the pruned read is sound (equal rows)
  * and actually skips files. */
class MetaPruneSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_metaprune").toString
    // 4 files with disjoint, sorted id ranges: [0,25), [25,50), [50,75), [75,100)
    spark.range(0, 100).withColumn("part", col("id") / 25)
      .repartitionByRange(4, col("part"))
      .drop("part")
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("decodeLong reads plain little-endian int32/int64 stats") {
    assert(MetaPrune.decodeLong(Array[Byte](7, 0, 0, 0), "INT32") === Some(7L))
    assert(MetaPrune.decodeLong(Array[Byte](-1, -1, -1, -1), "INT32") === Some(-1L))
    assert(MetaPrune.decodeLong(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), "INT64") === Some(1L))
    assert(MetaPrune.decodeLong(Array[Byte](1, 2), "INT64") === None) // short
    assert(MetaPrune.decodeLong(Array[Byte](1, 2, 3, 4), "BYTE_ARRAY") === None)
  }

  test("PlainStatLong codegen expression matches the driver-side decode") {
    import spark.implicits._
    val rows = Seq(
      (Array[Byte](7, 0, 0, 0), "INT32"),
      (Array[Byte](-1, -1, -1, -1), "INT32"),
      (Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), "INT64"),
      (Array[Byte](1, 2), "INT64"),
      (Array[Byte](1, 2, 3, 4), "BYTE_ARRAY"),
      (null.asInstanceOf[Array[Byte]], "INT32"))
    import org.apache.spark.sql.graft.ColumnBridge
    val out = rows.toDF("b", "t")
      .select(ColumnBridge.column(graft.functions.PlainStatLong(
        ColumnBridge.expression(col("b")), ColumnBridge.expression(col("t")))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(7L), Some(-1L), Some(1L), None, None, None))
  }

  test("range pruning selects only the files whose stats admit the range") {
    val all = spark.read.format("metadata").option("level", "file")
      .load(dir).count()
    assert(all === 4)
    val hit = MetaPrune.filesInRange(spark, dir, "id", 30, 40)
    assert(hit.length === 1, s"expected 1 file for [30,40], got $hit")
    val spanning = MetaPrune.filesInRange(spark, dir, "id", 20, 60)
    assert(spanning.length === 3, s"expected 3 files for [20,60], got $spanning")
    val none = MetaPrune.filesInRange(spark, dir, "id", 1000, 2000)
    assert(none.isEmpty)
  }

  test("pruned read plus predicate equals the full scan plus predicate") {
    val full = spark.read.parquet(dir)
      .filter(col("id") >= 30 && col("id") <= 40)
      .collect().map(_.getLong(0)).toSet
    val pruned = MetaPrune.readPruned(spark, dir, "id", 30, 40)
      .filter(col("id") >= 30 && col("id") <= 40)
      .collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(full === (30L to 40L).toSet)
    // empty range keeps the schema
    val empty = MetaPrune.readPruned(spark, dir, "id", 1000, 2000)
    assert(empty.schema.fieldNames.contains("id"))
    assert(empty.count() === 0)
  }

  test("a column absent from the footers keeps every file (soundness)") {
    val kept = MetaPrune.filesInRange(spark, dir, "no_such_column", 0, 1)
    assert(kept.length === 4)
  }

  test("unsigned schema declarations disable pruning (soundness)") {
    assert(MetaPrune.hasUnsigned("optional int32 x (UINT_32);"))
    assert(MetaPrune.hasUnsigned("optional int64 x (INTEGER(64,false));"))
    assert(MetaPrune.hasUnsigned("required int32 y (INTEGER(32, false));"))
    assert(!MetaPrune.hasUnsigned("optional int32 x (INTEGER(32,true));"))
    assert(!MetaPrune.hasUnsigned("optional int64 x; optional binary t (STRING);"))
  }

  // ----- typed statistics: dates, decimals, string prefixes -------------

  test("bigEndianLong decodes two's complement of any width, null on overflow") {
    import graft.functions.PlainStatUnscaled.{bigEndianLong => be}
    assert(be(Array[Byte](0x07)) === 7L)
    assert(be(Array[Byte](-1)) === -1L)
    assert(be(Array[Byte](0x01, 0x00)) === 256L)
    assert(be(Array[Byte](-1, -1)) === -1L)
    // FLBA(9) decimal with sign-extension leading byte (the real shape)
    assert(be(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0x01, 0x00)) === 256L)
    assert(be(Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1, 0x00)) === -256L)
    // genuinely 65-bit magnitude: leading byte is data, not sign extension
    assert(be(Array[Byte](0x01, 0, 0, 0, 0, 0, 0, 0, 0)) === null)
    // 8-byte window opening with the wrong sign bit after positive padding
    assert(be(Array[Byte](0x00, -0x80, 0, 0, 0, 0, 0, 0, 0)) === null)
    assert(be(Array.empty[Byte]) === null)
  }

  test("date pruning opens only the files whose epoch-day stats admit the window") {
    val d = Files.createTempDirectory("graft_metaprune_date").toString
    import spark.implicits._
    val start = java.time.LocalDate.of(2020, 1, 1)
    (0 until 360).map(i => java.sql.Date.valueOf(start.plusDays(i.toLong)))
      .toDF("d")
      .repartitionByRange(4, col("d"))
      .write.mode("overwrite").parquet(d)
    val lo = java.time.LocalDate.of(2020, 7, 1)
    val hi = java.time.LocalDate.of(2020, 7, 31)
    val hit = MetaPrune.filesInDateRange(spark, d, "d", lo, hi)
    assert(hit.nonEmpty && hit.length < 4, s"expected a strict file subset, got $hit")
    val full = spark.read.parquet(d)
      .filter(col("d").between(lit(java.sql.Date.valueOf(lo)), lit(java.sql.Date.valueOf(hi))))
      .collect().map(_.getDate(0).toString).toSet
    val pruned = MetaPrune.readPrunedDate(spark, d, "d", lo, hi)
      .filter(col("d").between(lit(java.sql.Date.valueOf(lo)), lit(java.sql.Date.valueOf(hi))))
      .collect().map(_.getDate(0).toString).toSet
    assert(pruned === full)
    assert(full.size === 31)
  }

  test("decimal pruning decodes FLBA big-endian stats (precision > 18)") {
    val d = Files.createTempDirectory("graft_metaprune_dec").toString
    // price = id + 0.25 as DECIMAL(20,2) -> FIXED_LEN_BYTE_ARRAY(9) physical
    spark.range(0, 100)
      .select(col("id"), (col("id").cast("decimal(18,2)") + lit(BigDecimal("0.25")))
        .cast("decimal(20,2)").as("price"))
      .repartitionByRange(4, col("price"))
      .write.mode("overwrite").parquet(d)
    // [25.00, 50.00] -> unscaled [2500, 5000]
    val hit = MetaPrune.filesInUnscaledRange(spark, d, "price", 2500L, 5000L)
    assert(hit.nonEmpty && hit.length < 4, s"expected a strict file subset, got $hit")
    val pred = col("price").between(lit(BigDecimal("25.00")), lit(BigDecimal("50.00")))
    val full = spark.read.parquet(d).filter(pred)
      .collect().map(_.getLong(0)).toSet
    val pruned = MetaPrune.readPrunedUnscaled(spark, d, "price", 2500L, 5000L)
      .filter(pred).collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(full === (25L to 49L).toSet) // 49.25 in range, 50.25 out
  }

  test("nextPrefix strips trailing 0xFF and bumps the last byte") {
    def np(s: Array[Byte]) = MetaPrune.nextPrefix(s)
    assert(np(Array[Byte]('a')).map(_.toSeq) === Some(Seq[Byte]('b')))
    assert(np(Array[Byte]('a', 'z')).map(_.toSeq) === Some(Seq[Byte]('a', '{')))
    assert(np(Array[Byte]('a', -1)).map(_.toSeq) === Some(Seq[Byte]('b')))
    assert(np(Array[Byte](-1, -1)) === None) // no upper bound exists
  }

  test("string-prefix pruning opens only the files whose byte stats admit the prefix") {
    val d = Files.createTempDirectory("graft_metaprune_str").toString
    import spark.implicits._
    // keys k0_0..k9_99 range-partitioned by key: each file a narrow byte span
    (0 until 100).map(i => (i.toLong, s"k${i % 10}_$i")).toDF("id", "k")
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(d)
    val hit = MetaPrune.filesWithPrefix(spark, d, "k", "k3")
    assert(hit.nonEmpty && hit.length < 4, s"expected a strict file subset, got $hit")
    val full = spark.read.parquet(d).filter(col("k").startsWith("k3"))
      .collect().map(_.getLong(0)).toSet
    val pruned = MetaPrune.readPrunedPrefix(spark, d, "k", "k3")
      .filter(col("k").startsWith("k3")).collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(full === (0 until 100).filter(_ % 10 == 3).map(_.toLong).toSet)
    // a prefix past every key prunes everything
    assert(MetaPrune.filesWithPrefix(spark, d, "k", "z").isEmpty)
    // a numeric column offers no string evidence: all files kept (sound)
    assert(MetaPrune.filesWithPrefix(spark, d, "id", "k3").length === 4)
  }

  test("pageSkipReport counts exactly the pages a range touches") {
    val d = Files.createTempDirectory("graft_pageskip").toString
    // sorted single-partition layout at exactly 100 rows/page
    spark.range(0, 1000, 1, 1)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "100")
      .parquet(d)
    def report(lo: Long, hi: Long): (Long, Long, Long, Long) = {
      val r = MetaPrune.pageSkipReport(spark, d, "id", lo, hi).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("n_pages_total"), r(0).getAs[Long]("n_pages_needed"),
        r(0).getAs[Long]("rows_total"), r(0).getAs[Long]("rows_covered"))
    }
    // [250, 449] lives in pages 2..4 (the 449 boundary is inclusive)
    assert(report(250, 449) === ((10L, 3L, 1000L, 300L)))
    // a range past every value touches nothing
    assert(report(5000, 6000) === ((10L, 0L, 1000L, 0L)))
    // the full domain touches every page
    assert(report(0, 999) === ((10L, 10L, 1000L, 1000L)))
    // an absent column yields no rows rather than a wrong report
    assert(MetaPrune.pageSkipReport(spark, d, "nope", 0, 10).count() === 0L)
  }

  test("pageSkipReportMulti intersects row ranges across predicate columns") {
    val d = Files.createTempDirectory("graft_pageskip_multi").toString
    // a ascends, b descends: their needed pages for overlapping value
    // ranges sit in DIFFERENT row regions, so the conjunction's covered
    // rows are the intersection — strictly smaller than either alone
    spark.range(0, 20000, 1, 1)
      .select(col("id").as("a"), (lit(19999L) - col("id")).as("b"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "1000")
      .parquet(d)
    // a in [3500,7200]  -> pages over rows [3000, 8000)     (5000 rows)
    // b in [15000,17999] -> a-rows [2000,4999] -> [2000, 5000) (3000 rows)
    // conjunction                               -> [3000, 5000) (2000 rows)
    val multi = MetaPrune.pageSkipReportMulti(spark, d,
      Seq(("a", 3500L, 7200L), ("b", 15000L, 17999L))).collect()
    assert(multi.length === 1)
    assert(multi(0).getAs[Long]("rows_total") === 20000L)
    assert(multi(0).getAs[Long]("rows_covered") === 2000L)
    // single-predicate multi == the single-column report
    val single = MetaPrune.pageSkipReportMulti(spark, d,
      Seq(("a", 3500L, 7200L))).collect()(0)
    assert(single.getAs[Long]("rows_covered") === 5000L)
    // disjoint row regions: zero rows to read
    val none = MetaPrune.pageSkipReportMulti(spark, d,
      Seq(("a", 3500L, 7200L), ("b", 500L, 900L))).collect()(0)
    assert(none.getAs[Long]("rows_covered") === 0L)
    // an unindexed predicate column contributes its FULL span (sound):
    // the conjunction degrades to the other predicate's coverage
    val missing = MetaPrune.pageSkipReportMulti(spark, d,
      Seq(("a", 3500L, 7200L), ("no_such", 0L, 1L))).collect()(0)
    assert(missing.getAs[Long]("rows_covered") === 5000L)
  }

  test("pruned read preserves Hive partition columns") {
    val d = Files.createTempDirectory("graft_metaprune_part").toString
    spark.range(0, 40)
      .withColumn("ds", when(col("id") < 20, "a").otherwise("b"))
      .write.partitionBy("ds").mode("overwrite").parquet(d)
    val pruned = MetaPrune.readPruned(spark, d, "id", 0, 100)
    assert(pruned.schema.fieldNames.contains("ds"))
    val full = spark.read.parquet(d)
      .select("id", "ds").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = pruned.select("id", "ds").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === full)
  }

  test("clusteringReport: sorted column depth ~1, shuffled ~n_chunks") {
    val d = Files.createTempDirectory("graft_cluster").toString
    // k sorted across chunks (clustered); r = a bit-reversed permutation
    // of k (every chunk spans nearly the whole r range — unclustered)
    spark.range(0, 4096)
      .select(col("id").as("k"),
        expr("reverse(lpad(bin(id), 12, '0'))").as("rb"))
      .select(col("k"), expr("conv(rb, 2, 10)").cast("long").as("r"))
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("parquet.block.size", "4096")
      .parquet(d)
    val rep = MetaPrune.clusteringReport(spark, d, Seq("k", "r"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val k = rep("k"); val r = rep("r")
    val n = k.getAs[Long]("n_chunks")
    assert(n >= 3, s"fixture must split into several chunks, got $n")
    assert(k.getAs[Long]("n_unbounded") === 0L)
    assert(r.getAs[Long]("n_chunks") === n)
    // sorted k: chunk spans tile the range — depth ≈ 1
    val kDepth = k.getAs[Long]("span_sum").toDouble /
      k.getAs[Long]("global_span")
    assert(kDepth < 1.5, s"clustered depth should be ~1, got $kDepth")
    // bit-reversed r: every chunk spans ~the whole range — depth ≈ n
    val rDepth = r.getAs[Long]("span_sum").toDouble /
      r.getAs[Long]("global_span")
    assert(rDepth > n * 0.7,
      s"unclustered depth should approach n_chunks=$n, got $rDepth")
  }
}
