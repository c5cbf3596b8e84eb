package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.meta.{AvroMeta, DeltaMeta, FooterEdit, IcebergMeta, MetaPrune, MetaValues, OrcPrune}
import graft.ops.{Bpe, Bucketing, Clustering, ConnectedComponents, Decontam, Dedup, Drift, Layout, Lines, MediaRecord, Multimodal, Packing, PageRank, Profile, RangeJoin, Relevance, Sampling, Similarity, Sketches, Skew, SparseSim, SubstrSearch, TemporalJoin, TextOps}
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Driver contract: the full query inventory with DuckDB oracles.
 *
 * Conventions that keep the oracle hash-compare deterministic:
 *  - every computed column is aliased identically in Spark and SQL;
 *  - integer outputs are cast to BIGINT on both sides;
 *  - double aggregates go through exact DECIMAL sums (order-independent)
 *    and only then cast to DOUBLE, so partition order cannot change a bit;
 *  - ANN/similarity queries emit integer ranks, not raw float scores;
 *  - all ratio-style doubles are exact small-integer rationals, identical
 *    in any IEEE-754 engine.
 *
 * The oracle SQL for metadata queries uses DuckDB's
 * `parquet_metadata`/`parquet_file_metadata`/`read_blob` table functions on
 * the sf0.01 files (the scale the driver verifies at).
 */
object SparkEntry {

  /** sf dir the driver's DuckDB verification runs at. */
  private val OracleSf = "/root/testdata/sf0.01"

  private def pq(dir: String, table: String): String = s"$dir/$table.parquet"

  /**
   * The events table with `ts` normalized to epoch NANOSECONDS as a long,
   * whichever way the generator wrote it:
   *  - parquet TIMESTAMP(NANOS) is unreadable by Spark except as raw int64
   *    via `spark.sql.legacy.parquet.nanosAsLong` (strictly enabling — the
   *    flag only affects NANOS columns) — those longs ARE epoch nanos;
   *  - parquet TIMESTAMP(MICROS) reads as a timestamp type and is
   *    converted exactly (`unix_micros * 1000`; the cast pins NTZ wall
   *    time to the session's UTC, matching DuckDB's naive-as-UTC
   *    `epoch_us`/`epoch_ns` on the oracle side).
   * Every event query does exact integer gap/day arithmetic on these
   * nanos, identically across both on-disk flavors.
   */
  private def eventsNs(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = s.read.parquet(pq(dir, "events"))
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => e
      case _ => e.withColumn("ts",
        unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** Make `name` writable as a managed table: drop any registration AND
    * delete an orphaned warehouse location (the metastore is per-session
    * in-memory, so a table written by a previous JVM leaves its directory
    * behind while the new session has no table to overwrite through). */
  private def freshTable(s: SparkSession, name: String): String = {
    s.sql(s"DROP TABLE IF EXISTS `$name`")
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    name
  }

  private def meta(s: SparkSession, path: String, level: String,
      opts: Map[String, String] = Map.empty): DataFrame = {
    val r = s.read.format("metadata").option("level", level)
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  /** Exact, order-independent sum of a double column: decimal-accumulated,
    * surfaced as DOUBLE. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(28,6)")).cast("double")

  /**
   * Run a STREAMING replay under a small `spark.sql.shuffle.partitions`
   * (restored afterwards). Stateful streaming cost at replay scale is
   * dominated by the state store: every trigger commits one delta file
   * PER STATE PARTITION to the checkpoint, so 32 partitions of toy state
   * pay 32 filesystem commits a trigger for kilobytes of actual state.
   * Eight partitions cut that 4x while leaving results identical — state
   * keys hash to partitions, and every stream contract here is
   * partition-independent. (On a real cluster the state would be sized to
   * executors via this same knob; the point is it is a KNOB, not a plan
   * property.) Results are unaffected; only checkpoint-commit fan-out is.
   */
  private def withStreamShuffle[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    try body finally s.conf.set(key, prev)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    meta(spark, pq("/root/testdata/sf0.001", "lineitem"), "rowgroup")

  // ---------------------------------------------------------------------
  // Query inventory
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- metadata datasource: the five levels --------------------------
    "meta_file_level" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "file", Map("source" -> "file"))
        .select(col("filename"), col("size"))),

    "meta_parquet_file_level" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "file")
        .select(col("filename"), col("num_rows"),
          col("num_row_groups").cast("long").as("num_row_groups"),
          col("created_by"))),

    "meta_rowgroup_level" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "rowgroup")
        .select(col("row_group_id").cast("long").as("row_group_id"),
          col("num_rows"),
          col("num_columns").cast("long").as("num_columns"),
          col("total_compressed_size"),
          col("total_uncompressed_size"))),

    "meta_column_level" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "column")
        .select(col("row_group_id").cast("long").as("row_group_id"),
          col("column_id").cast("long").as("column_id"),
          col("path"), col("type"), col("compression"),
          array_join(col("encodings"), ", ").as("encodings"),
          col("num_values"),
          col("total_compressed_size"),
          col("total_uncompressed_size"),
          col("data_page_offset"),
          col("dictionary_page_offset"))),

    // Full page-level scan (no DuckDB page-metadata equivalent -> rows-only
    // check); page byte accounting is oracle-checked by meta_page_bytes.
    "meta_page_level" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "page")
        .select(col("row_group_id"), col("column_id"), col("page_id"),
          col("page_type"), col("page_header_offset"), col("page_header_size"),
          col("page_compressed_size"), col("num_values"), col("encoding"))),

    // Page-level bytes roll exactly up to the column-chunk compressed size.
    "meta_page_bytes" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "page")
        .groupBy(col("row_group_id").cast("long").as("row_group_id"),
          col("column_id").cast("long").as("column_id"))
        .agg(sum(col("page_header_size").cast("long") +
          col("page_compressed_size").cast("long")).as("total_compressed_size"))),

    // Page-level VALUE accounting: per column chunk, the data pages' header
    // num_values must sum to the chunk's footer num_values — the partial
    // oracle DuckDB CAN check for the page walk (it has no page function,
    // but parquet_metadata knows every chunk's value count). Together with
    // meta_page_bytes this pins the page iterator's counts as well as its
    // byte spans against an independent engine.
    "meta_page_rollup" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "page")
        .filter(col("page_type").startsWith("DATA_PAGE"))
        .groupBy(col("row_group_id").cast("long").as("row_group_id"),
          col("column_id").cast("long").as("column_id"))
        .agg(sum(col("num_values").cast("long")).as("n_values"))),

    // Page-walk vs OffsetIndex cross-check on a pinned-layout fixture
    // (20000 rows at exactly 1000 rows/page): the number of data pages the
    // physical page iterator finds and the number of pages the decoded
    // OffsetIndex promises must BOTH equal the closed form the oracle
    // derives from the row-group row count. A missing offset index or a
    // drifting page walk each break the hash, independently.
    "meta_page_oi_match" -> ((s, dir) => {
      val out = "/tmp/graft_pageoi_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      val pages = meta(s, out, "page")
        .filter(col("page_type").startsWith("DATA_PAGE"))
        .groupBy(col("row_group_id"), col("column_id"))
        .agg(count(lit(1)).as("n_pages"))
      val oi = meta(s, out, "offsetindex")
        .groupBy(col("row_group_id"), col("column_id"))
        .agg(count(lit(1)).as("n_oi_pages"))
      pages.join(oi, Seq("row_group_id", "column_id"), "full")
        .select(col("row_group_id").cast("long").as("row_group_id"),
          col("column_id").cast("long").as("column_id"),
          col("n_pages"), col("n_oi_pages"))
    }),

    // Page-granular skip report: on the pinned sorted 1000-rows/page
    // layout, the ColumnIndex+OffsetIndex composition must find exactly
    // the pages a range predicate touches — the oracle re-derives needed
    // pages and covered rows from the DATA (id div 1000 IS the page id on
    // this layout), so a min/max decode bug or a row-span bug each break
    // a different column. The report itself reads zero data pages: it is
    // the row-level I/O bound a page-index-aware 100 TB reader gets.
    "meta_page_skip" -> ((s, dir) => {
      val out = "/tmp/graft_pageskip_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      MetaPrune.pageSkipReport(s, out, "id", 3500L, 7200L)
        .select(col("row_group_id").cast("long").as("row_group_id"),
          col("n_pages_total"), col("n_pages_needed"),
          col("rows_total"), col("rows_covered"))
    }),

    // Data-page PAYLOAD decode proven against the data: on an
    // uncompressed, dictionary-free layout a REQUIRED int64 column's
    // PLAIN data page is nothing but values back to back, so summing the
    // decoded page bytes (wrap-around long addition) must reproduce the
    // engine-independent sum of the column, and the payload byte count
    // must reproduce the row count — the strongest content check the
    // page walk can get: every byte of every data page accounted for by
    // value, not just by size.
    "meta_page_values" -> ((s, dir) => {
      val out = "/tmp/graft_pagevals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("compression", "none")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      val pageSum = ColumnBridge.column(graft.functions.PlainInt64Sum(
        ColumnBridge.expression(col("page_content"))))
      meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("page_type").startsWith("DATA_PAGE") &&
          col("encoding") === "PLAIN")
        .agg(count(lit(1)).as("n_pages"),
          sum(pageSum).as("value_sum"),
          sum(size(col("page_content")).cast("long") / lit(8L)).cast("long")
            .as("n_values"))
    }),

    // MULTI-column pruned read: `date BETWEEN ... AND id <= ...` where
    // NEITHER predicate alone prunes a file but the conjunction does —
    // evaluated per ROW GROUP (strictly stronger than intersecting
    // per-column file sets; MultiPruneSpec proves the single-column sets
    // both keep everything while the pair halves the scan). The grid
    // layout needs exact row-group boundaries, which RowGroupWriter pins;
    // the oracle recomputes the aggregate over ALL files — equality
    // proves per-row-group conjunction dropped no qualifying row.
    "meta_prune_multi" -> ((s, dir) => {
      val out = "/tmp/graft_multiprune_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val od = new java.io.File(out)
      od.mkdirs()
      od.listFiles().foreach(_.delete())
      val jan = java.time.LocalDate.of(2024, 1, 1)
      val feb = java.time.LocalDate.of(2024, 2, 1)
      def days(base: java.time.LocalDate, i: Int): Int =
        (base.toEpochDay + (i % 28)).toInt
      val janLow = (0 until 1000).map(i => (days(jan, i), i.toLong))
      val febHigh = (0 until 1000).map(i => (days(feb, i), 1000L + i))
      val janHigh = (0 until 1000).map(i => (days(jan, i), 1000L + i))
      val febLow = (0 until 1000).map(i => (days(feb, i), i.toLong))
      graft.meta.RowGroupWriter.writeDateLongFile(
        s"$out/fileA.parquet", janLow ++ febHigh, 1000)
      graft.meta.RowGroupWriter.writeDateLongFile(
        s"$out/fileB.parquet", janHigh ++ febLow, 1000)
      MetaPrune.readPrunedWhere(s, out, Seq(
          graft.meta.DateRangePred("od", feb, java.time.LocalDate.of(2024, 2, 29)),
          graft.meta.LongRangePred("k", 0L, 999L)))
        .filter(col("od").between(
            java.sql.Date.valueOf("2024-02-01"), java.sql.Date.valueOf("2024-02-29")) &&
          col("k") <= 999L)
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("k")), lit(0L)).as("k_sum"))
    }),

    // Sorting-column declarations audited against the data. parquet-mr
    // 1.16 has NO writer API for RowGroup.sorting_columns, so the sorted
    // export is finished by FooterEdit: a pure thrift-footer rewrite that
    // declares the sort post-write (data bytes untouched — spec-pinned).
    // The rowgroup level then surfaces the declaration next to each row
    // group's independent min/max stats, and `monotone` re-derives actual
    // sortedness from those stats; DuckDB's own parquet_metadata decode
    // must agree on every row — declaration, bounds, and monotonicity.
    "meta_sorting" -> ((s, dir) => {
      val out = "/tmp/graft_sorting_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "orders"))
        .select(col("o_orderkey").as("k"), col("o_custkey"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536")
        .parquet(out)
      FooterEdit.declareSortingColumnsDir(out,
        Seq(graft.meta.SortingColumnInfo(0, descending = false, nullsFirst = false)))
      MetaPrune.sortAudit(s, out, "k")
        .select(col("row_group_id"), col("sc_idx"), col("sc_desc"),
          col("sc_nulls_first"), col("rg_min"), col("rg_max"), col("monotone"))
    }),

    // Footer encoding stats as a layout audit: per-(page type, encoding)
    // page counts, decoded from ColumnMetaData.encoding_stats without any
    // page I/O, proven against the deterministic page layout the 500-row
    // page limit induces (the per-chunk counts are additionally pinned
    // equal to the physical page walk in FooterEditSpec). The audit that
    // answers "is this column actually dictionary-encoded?" from footers
    // alone — at 100 TB the difference between a metadata scan and
    // re-reading every chunk.
    "meta_encoding_stats" -> ((s, dir) => {
      val out = "/tmp/graft_encstats_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents")).select(col("source"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "500")
        .parquet(out)
      meta(s, out, "column")
        .select(explode(col("encoding_stats")).as("es"))
        .groupBy(col("es.page_type").as("page_type"),
          col("es.encoding").as("encoding"))
        .agg(sum(col("es.count")).cast("long").as("n_pages"))
    }),

    // V2 data pages, integer half: the v2 writer's DEFAULT encoding for
    // int columns is DELTA_BINARY_PACKED (block/miniblock bit-packed
    // deltas — a different format from v1's PLAIN entirely), and v2
    // pages compress ONLY the values region behind the uncompressed
    // level block. PageValuesV2 (levels sliced by the header's byte
    // lengths, codec applied per the is_compressed flag) + DeltaIntSum
    // (bit-parity-pinned against parquet-mr's own delta writers,
    // 32/64-bit modular arithmetic per physical type) roll per-page sums
    // up to the engine-independent column sum.
    "meta_delta_values" -> ((s, dir) => {
      val out = "/tmp/graft_deltavals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"), col("type"))
      val joined = pages.join(codecs,
        Seq("filepath", "row_group_id", "column_id"))
      val levelBytes = col("def_levels_byte_length") + col("rep_levels_byte_length")
      val region = ColumnBridge.column(graft.functions.PageValuesV2(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(levelBytes.cast("int")),
        ColumnBridge.expression(when(col("values_compressed"),
          col("compression")).otherwise(lit("UNCOMPRESSED"))),
        ColumnBridge.expression(
          (col("page_uncompressed_size") - levelBytes).cast("int"))))
      val pageSum = ColumnBridge.column(graft.functions.DeltaIntSum(
        ColumnBridge.expression(region), ColumnBridge.expression(col("type"))))
      joined
        .filter(col("page_type") === "DATA_PAGE_V2" &&
          col("encoding") === "DELTA_BINARY_PACKED")
        .agg(count(lit(1)).as("n_pages"),
          sum(pageSum).as("value_sum"),
          sum(col("num_values")).cast("long").as("n_values"))
    }),

    // THE unified decode entry point over a genuinely MIXED table: one
    // directory holding a v1-written file (PLAIN int64 + dict-encoded
    // strings + PLAIN fp) and a v2-written file (DELTA_BINARY_PACKED +
    // RLE_DICTIONARY + PLAIN fp), every page of every column decoded
    // through the single page_decode dispatcher — no per-encoding
    // recipes. Per-column counts, the int column's exact sum across BOTH
    // encodings, dictionary cardinalities, FP extrema, and the number of
    // distinct decode routes all pinned against DuckDB over the same
    // files.
    "meta_values_any" -> ((s, dir) => {
      val out = "/tmp/graft_valsany_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val base = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id").as("k"),
          when(col("doc_id") % 19 === 0, lit(null))
            .otherwise(col("lang")).as("lang"),
          when(col("doc_id") % 23 === 0, lit(null))
            .otherwise(col("n_chars").cast("double") * 1.5).as("price"))
      def writeHalf(parity: Int, version: String, dest: String): Unit =
        base.filter(col("k") % 2 === parity).coalesce(1)
          .write.mode("overwrite")
          .option("parquet.writer.version", version)
          // per-column dictionary control: k and price stay
          // value-encoded (v1 PLAIN / v2 DELTA+PLAIN); lang dictionary-
          // encodes in both
          .option("parquet.enable.dictionary#k", "false")
          .option("parquet.enable.dictionary#price", "false")
          .option("parquet.page.row.count.limit", "1000")
          .parquet(dest)
      writeHalf(0, "PARQUET_1_0", out + "_v1")
      writeHalf(1, "PARQUET_2_0", out + "_v2")
      // fuse the halves into one table directory with pinned file names
      val outF = new java.io.File(out)
      if (outF.exists()) outF.listFiles().foreach(_.delete())
      outF.mkdirs()
      for ((src, name) <- Seq(out + "_v1" -> "v1.parquet", out + "_v2" -> "v2.parquet")) {
        val part = new java.io.File(src).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(part.toPath,
          new java.io.File(outF, name).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
      val cols = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("path"), col("type"), col("compression"))
      val joined = pages.join(cols,
        Seq("filepath", "row_group_id", "column_id"))
      // v2 data pages flag whether their values region is compressed at
      // all; everything else (v1 pages, dictionary pages) uses the chunk
      // codec for the whole payload
      val codecEff = when(col("page_type") === "DATA_PAGE_V2" &&
          !coalesce(col("values_compressed"), lit(true)),
        lit("UNCOMPRESSED")).otherwise(col("compression"))
      val pd = ColumnBridge.column(graft.functions.PageDecodeExpr(Seq(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("page_type")),
        ColumnBridge.expression(col("encoding")),
        ColumnBridge.expression(codecEff),
        ColumnBridge.expression(col("page_uncompressed_size")),
        ColumnBridge.expression(col("rep_levels_byte_length")),
        ColumnBridge.expression(col("def_levels_byte_length")),
        ColumnBridge.expression(lit(0)),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values")),
        ColumnBridge.expression(col("type")),
        ColumnBridge.expression(lit(0)))))
      val isData = col("page_type").startsWith("DATA_PAGE")
      joined.select(col("path"), col("page_type"), pd.as("pd"))
        .agg(
          sum(when(col("path") === "k" && isData, col("pd.n")))
            .cast("long").as("k_n"),
          sum(when(col("path") === "k" && isData, col("pd.lsum")))
            .cast("long").as("k_sum"),
          sum(when(col("path") === "lang" && isData, col("pd.n")))
            .cast("long").as("lang_n"),
          sum(when(col("path") === "lang" &&
              col("page_type") === "DICTIONARY_PAGE", col("pd.n")))
            .cast("long").as("lang_dict"),
          sum(when(col("path") === "price" && isData, col("pd.n")))
            .cast("long").as("price_n"),
          min(when(col("path") === "price", col("pd.dmn"))).as("price_mn"),
          max(when(col("path") === "price", col("pd.dmx"))).as("price_mx"),
          count_distinct(col("pd.kind")).cast("long").as("n_kinds"))
    }),

    // ORC metadata tier — the second major columnar format a lake audit
    // meets, same shape as the parquet tier: file level (tail summary —
    // rows, stripes, codec, versions, schema) with the source INFERRED
    // from the ORC magic. DuckDB cannot read ORC, so the oracle
    // recomputes every output in closed form from the SOURCE parquet
    // data the fixture was written from — file count from the
    // repartition, row totals from the data, codec/version from the
    // writer contract (Spark 4 writes ZSTD, ORC file version 0.12).
    "meta_orc_file" -> ((s, dir) => {
      val out = "/tmp/graft_orcfile_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .repartition(2)
        .write.mode("overwrite").orc(out)
      meta(s, out, "file") // source inferred from the ORC magic
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(col("num_rows")).cast("long").as("total_rows"),
          count_distinct(col("compression")).cast("long").as("n_codecs"),
          max(col("compression")).as("codec"),
          max(col("file_version")).as("file_version"))
    }),

    // ORC stripe level: the sub-file unit in the parquet row group's
    // role. Stripe counts depend on the writer's memory estimates, so
    // the oracle pins the INVARIANTS that do not: per-file stripe rows
    // roll up to the data's count, and the first stripe of every file
    // starts at offset 3 — directly past the "ORC" magic.
    "meta_orc_stripe" -> ((s, dir) => {
      val out = "/tmp/graft_orcstripe_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_quantity"))
        .repartition(2)
        .write.mode("overwrite")
        .option("orc.stripe.size", "65536")
        .orc(out)
      meta(s, out, "stripe")
        .agg(count_distinct(col("filepath")).cast("long").as("n_files"),
          sum(col("num_rows")).cast("long").as("total_rows"),
          min(col("offset")).cast("long").as("first_offset"))
    }),

    // ORC column statistics — typed footer min/max/sum per column,
    // CROSS-FORMAT checked: the stats ORC's writer computed must equal
    // what DuckDB computes from the SOURCE parquet data the fixture was
    // written from. Integer sums are exact on both sides; the double
    // column pins min/max only (an fp sum is accumulation-order
    // dependent — the same discipline as the parquet FP decodes).
    "meta_orc_column" -> ((s, dir) => {
      val out = "/tmp/graft_orccol_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey"),
          col("l_quantity").cast("double").as("qty"),
          col("l_returnflag"))
        .coalesce(1)
        .write.mode("overwrite").orc(out)
      meta(s, out, "column")
        .filter(col("path").isin("l_orderkey", "qty", "l_returnflag"))
        .select(col("path"), col("num_values"), col("has_null"),
          col("min_long"), col("max_long"), col("sum_long"),
          col("min_double"), col("max_double"),
          col("min_string"), col("max_string"))
    }),

    // MIXED-DIRECTORY lake census: parquet + ORC + Avro files side by
    // side in ONE directory — the case a homogeneity-sniffing scan
    // cannot serve. Each format's scan runs under ignorecorrupt so
    // foreign files skip at their 4-byte magic check; every file
    // censuses under exactly the format that accepts it. Oracle
    // recomputes the three (files, rows) pairs in closed form from the
    // source data and the fixture's parity splits.
    "meta_lake_census" -> ((s, dir) => {
      val out = "/tmp/graft_lakecensus_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val outF = new java.io.File(out)
      if (outF.exists()) {
        org.apache.commons.io.FileUtils.deleteQuietly(outF)
      }
      outF.mkdirs()
      val docs = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("lang"))
      // parquet third: doc_id % 3 == 0, one file copied into the mix
      docs.filter(col("doc_id") % 3 === 0).coalesce(1)
        .write.mode("overwrite").parquet(out + "_pq")
      // orc third: % 3 == 1
      docs.filter(col("doc_id") % 3 === 1).coalesce(1)
        .write.mode("overwrite").orc(out + "_orc")
      for ((src, name) <- Seq(out + "_pq" -> "part.parquet",
          out + "_orc" -> "part.orc")) {
        val part = new java.io.File(src).listFiles()
          .filter(f => f.getName.endsWith(".parquet") || f.getName.endsWith(".orc")).head
        java.nio.file.Files.copy(part.toPath,
          new java.io.File(outF, name).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      // avro third: % 3 == 2, via avro's own writer
      val avroRows = docs.filter(col("doc_id") % 3 === 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
      AvroMeta.writeFixture(new java.io.File(outF, "part.avro"), avroRows)
      MetaValues.lakeCensus(s, out)
        .select(col("format"), col("n_files"), col("total_rows"))
    }),

    // ORC ROW-GROUP INDEX level — the per-10k-row (here stride 1000)
    // statistics ORC's reader consults for its finest-grain skipping.
    // Invariants pinned against the data AND across levels: the one
    // column's entry row counts roll up to the table, entry min/max
    // bounds reconstruct the global extrema (long and double slots),
    // and per stripe the entry count is exactly ceil(rows/stride)
    // (cross-checked against the stripe level — robust to however many
    // stripes the memory-driven flush produced).
    "meta_orc_rowindex" -> ((s, dir) => {
      val out = "/tmp/graft_orcri_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey").as("k"),
          col("l_extendedprice").cast("double").as("price"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("orc.row.index.stride", "1000")
        .orc(out)
      val idx = meta(s, out, "rowindex", Map("source" -> "orc"))
      val kAgg = idx.filter(col("path") === "k").agg(
        sum(col("num_rows")).cast("long").as("rows_rollup"),
        min(col("min_long")).cast("long").as("k_min"),
        max(col("max_long")).cast("long").as("k_max"))
      val pAgg = idx.filter(col("path") === "price").agg(
        min(col("min_double")).as("price_mn"),
        max(col("max_double")).as("price_mx"))
      val perStripe = idx.filter(col("path") === "k")
        .groupBy(col("filepath"), col("stripe_id"))
        .agg(count(lit(1)).as("n"), sum(col("num_rows")).as("r"))
      val stripes = meta(s, out, "stripe", Map("source" -> "orc"))
        .select(col("filepath"), col("stripe_id"),
          col("num_rows").as("stripe_rows"))
      val agree = perStripe.join(stripes, Seq("filepath", "stripe_id"))
        .agg(min(col("n") === ceil(col("stripe_rows") / lit(1000.0)) &&
          col("r") === col("stripe_rows")).as("stripes_agree"))
      kAgg.crossJoin(pAgg).crossJoin(agree)
    }),

    // ORC row-group skip report — the row-index sibling of
    // orc_stripe_skip, one granularity finer, and EXTERNALLY validated
    // in-query: the ORC reader's own scan under the same pushed range
    // must output exactly the rows our report says a row-group-skipping
    // reader decodes (`reader_agrees`). Declarative report (groupBy over
    // the rowindex level), soundness = covered rows bound the true
    // match count from above.
    "orc_rowindex_skip" -> ((s, dir) => {
      val out = "/tmp/graft_orcriskip_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey").as("k"), col("l_quantity").as("q"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("orc.row.index.stride", "1000")
        .orc(out)
      val (lo, hi) = (1000L, 4999L)
      val rep = OrcPrune.rowIndexSkipReport(s, out, "k", lo, hi)
        .agg(sum(col("rows_total")).as("rt"), sum(col("rows_covered")).as("rc"),
          sum(col("n_groups_total")).as("gt"),
          sum(col("n_groups_needed")).as("gn"))
      // external validation: run the real read with the pushed filter
      // and take the scan's output-row metric
      val probe = s.read.orc(out).filter(col("k").between(lo, hi))
      probe.collect()
      val scanRows = probe.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
      val matches = s.read.orc(out).filter(col("k").between(lo, hi))
        .agg(count(lit(1)).as("m"))
      rep.crossJoin(matches).select(
        col("rt").cast("long").as("total_rows"),
        (col("gn") < col("gt")).as("skipped_groups"),
        (col("rc") >= col("m")).as("sound"),
        (col("rc") === lit(scanRows)).as("reader_agrees"),
        col("m").cast("long").as("n_matches"))
    }),

    // ORC BLOOM-FILTER skip report: for a point/IN probe on an UNSORTED
    // high-cardinality column (whose per-group min/max admit nearly
    // everything), the per-row-group bloom streams are what actually
    // skips. Admission = stats ∧ bloom, mirroring the reader's own SARG
    // evaluation — and EXTERNALLY validated in-query: the ORC reader's
    // scan under the same IN filter must output exactly the rows our
    // report covers. Blooms have no false negatives, so covered rows
    // bound the true matches from above (`sound`).
    "orc_bloom_skip" -> ((s, dir) => {
      val out = "/tmp/graft_orcbloom_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey").as("k"), col("l_partkey").as("pk"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("orc.row.index.stride", "1000")
        .option("orc.bloom.filter.columns", "pk")
        .orc(out)
      // deterministic probes: the column's own extrema plus one value
      // that cannot exist — DuckDB recomputes the same set
      val ext = s.read.orc(out).agg(min(col("pk")), max(col("pk"))).collect()(0)
      val probes = Seq(ext.getLong(0), ext.getLong(1), -1L)
      val rep = OrcPrune.bloomSkipReport(s, out, "pk", probes)
        .agg(sum(col("rows_total")).as("rt"), sum(col("rows_covered")).as("rc"),
          sum(col("n_groups_total")).as("gt"),
          sum(col("n_groups_needed")).as("gn"))
      val probe = s.read.orc(out).filter(col("pk").isin(probes: _*))
      probe.collect()
      val scanRows = probe.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
      val matches = s.read.orc(out).filter(col("pk").isin(probes: _*))
        .agg(count(lit(1)).as("m"))
      rep.crossJoin(matches).select(
        col("rt").cast("long").as("total_rows"),
        (col("gn") < col("gt")).as("skipped_groups"),
        (col("rc") >= col("m")).as("sound"),
        (col("rc") === lit(scanRows)).as("reader_agrees"),
        col("m").cast("long").as("n_matches"))
    }),

    // DELTA LAKE metadata tier, log level: one row per _delta_log
    // segment of a hand-written (public-protocol) fixture table —
    // 5 JSON commits + a parquet checkpoint at v2. Commit action counts
    // come from the line-keyed JSON decode; checkpoint counts come AT
    // FOOTER COST from the checkpoint parquet's own null-count
    // statistics. The oracle is a REAL cross-engine check: DuckDB parses
    // the same JSON (read_json_auto) and checkpoint (read_parquet)
    // independently.
    "meta_delta_snapshot" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      meta(s, out, "snapshot", Map("source" -> "delta"))
        .select(col("version"), col("kind"), col("n_add"), col("n_remove"),
          col("operation"), col("op_timestamp"))
    }),

    // DELTA LAKE live-files audit: snapshot reconstruction (checkpoint
    // parquet + JSON tail, reconciled per path by max_by(action,
    // version) — map-side combinable, no window sort) COMPOSED with the
    // parquet metadata tier over the same directory. Only
    // current-snapshot files audit as live; the two removed-but-present
    // files (vacuum-pending) surface as dead with their footer rows — a
    // raw directory census would silently count them as data. The
    // oracle replays the same log in DuckDB SQL (arg_max over the
    // unioned actions) and reads the same footers.
    "meta_delta_live" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val live = DeltaMeta.snapshotFiles(s, out)
        .select(col("abs_path"), col("num_records"))
      val footers = meta(s, out, "file", Map("source" -> "parquet"))
        .select(col("filepath"), col("num_rows"))
      footers.join(live, footers("filepath") === live("abs_path"), "left")
        .agg(
          sum(when(col("abs_path").isNotNull, lit(1)).otherwise(lit(0)))
            .cast("long").as("n_live"),
          sum(when(col("abs_path").isNotNull, col("num_records")))
            .cast("long").as("live_rows"),
          sum(when(col("abs_path").isNotNull, col("num_rows")))
            .cast("long").as("footer_rows"),
          sum(when(col("abs_path").isNull, lit(1)).otherwise(lit(0)))
            .cast("long").as("n_dead"),
          sum(when(col("abs_path").isNull, col("num_rows")))
            .cast("long").as("dead_rows"))
    }),

    // DELTA VACUUM-candidate report: tombstones older than the
    // retention window AND still on disk, with row-exact reclaim from
    // their own footers — f1 (age 8000 > 7500) qualifies, f2 (7000)
    // is protected by the window. Oracle: DuckDB replays the same
    // tombstones and reads the same footers.
    "meta_delta_vacuum" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.vacuumCandidates(s, out, 1700000010000L, 7500L)
        .select(col("path"), col("deleted_at"), col("age_ms"), col("num_rows"))
    }),

    // DELTA setTransaction high-water marks: each streaming writer's
    // latest txn version (later TABLE version wins per appId — the
    // protocol's idempotent-writer resume rule; the fixture's ingest-a
    // advances 10 -> 11 at v3). Oracle: DuckDB reads the same txn
    // actions and applies the same rule.
    "meta_delta_txn" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.latestTransactions(s, out)
    }),

    // DELTA SCHEMA HISTORY: the table's schema evolution read from the
    // log's metaData actions alone — one row per schema change with
    // field names decoded from the action's own schemaString (the
    // fixture evolves doc_id,lang -> +quality at v4). Oracle: DuckDB
    // parses the same schemaString JSON independently.
    "meta_delta_schema" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.schemaHistory(s, out)
    }),

    // DELTA SCHEMA CONFORMANCE: declared (log metaData) vs physical
    // (footer) schema per LIVE file — the backfill audit a schema
    // evolution leaves behind; every fixture file predates the v4
    // +quality column. Oracle: DuckDB replays the live set, reads the
    // same footers via parquet_schema, and diffs the same field lists.
    "meta_delta_conformance" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.schemaConformance(s, out)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
          col("n_declared"), col("n_present"), col("missing_csv"))
    }),

    // DELTA PROTOCOL compatibility report: the latest protocol action's
    // versions + feature lists and the tier's own `supported` verdict
    // (v3 tables are faithful iff every readerFeature is understood —
    // deletionVectors and v2Checkpoint both are; an unknown future
    // feature is predicted up front instead of failing later). Oracle:
    // DuckDB replays the same protocol actions and recomputes the same
    // verdict with list_has_all.
    "meta_delta_protocol" -> ((s, dir) => {
      val out = "/tmp/graft_deltaproto_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeDvFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.protocolInfo(s, out)
        .select(col("min_reader_version"), col("min_writer_version"),
          array_join(col("reader_features"), ",").as("reader_features_csv"),
          array_join(col("writer_features"), ",").as("writer_features_csv"),
          col("supported"))
    }),

    // STREAMING delta live-store maintenance: the commit stream's
    // AvailableNow pass reconciles the log segments into a compact
    // per-path store (decode once per segment, never re-replay); the
    // store's DV-aware numbers must equal DuckDB's independent replay
    // of the same log — the streaming path and the cross-engine batch
    // path answer identically.
    "stream_delta_live" -> ((s, dir) => {
      val sfx = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val out = "/tmp/graft_deltastream_" + sfx
      DeltaMeta.writeDvFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val store = "/tmp/graft_deltastore_" + sfx
      val ckpt = "/tmp/graft_deltastoreck_" + sfx
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      DeltaMeta.maintainLiveStore(s, out, store, ckpt)
      DeltaMeta.readLiveStore(s, store)
        .agg(
          count(lit(1)).cast("long").as("n_live"),
          sum(col("num_records")).cast("long").as("physical_rows"),
          sum(when(col("dv_cardinality") > 0, lit(1)).otherwise(lit(0)))
            .cast("long").as("n_dv_files"),
          sum(col("dv_cardinality")).cast("long").as("dv_deleted"),
          (sum(col("num_records")) - sum(col("dv_cardinality")))
            .cast("long").as("net_rows"))
    }),

    // UNIFIED TABLE CENSUS — one MetaValues.tableCensus call per root:
    // the delta-DV fixture resolves through its log (net = physical −
    // DV), the iceberg fixture through its manifests (delete files
    // subtract), one uniform row each. The oracle recomputes the delta
    // row by replaying the same JSON in DuckDB and both disk sides from
    // the same footers.
    "meta_table_census" -> ((s, dir) => {
      val sfx = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val d = "/tmp/graft_deltadv_" + sfx
      val i = "/tmp/graft_iceberg_" + sfx
      DeltaMeta.writeDvFixtureTable(s, d, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.writeFixtureTable(s, i, s.read.parquet(pq(dir, "documents")))
      MetaValues.tableCensus(s, d).unionByName(MetaValues.tableCensus(s, i))
    }),

    // DELTA PARTITION-PRUNED planning at metadata cost: a partitioned
    // fixture (lang=<x>/ dirs, partitionValues in every add action);
    // "which files serve lang='zh'" answers from the LOG alone, then the
    // pruned path list (a bounded, partition-sized driver boundary —
    // the MetaPrune surviving-paths idiom) drives a parquet-tier footer
    // read that touches ONLY those files (pushed filepath IN-list; the
    // spec pins files=2/10 in the plan). The oracle replays the same
    // JSON partitionValues in DuckDB and reads the same pruned footers.
    "meta_delta_partition_prune" -> ((s, dir) => {
      val out = "/tmp/graft_deltapart_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writePartitionedFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val live = DeltaMeta.snapshotFiles(s, out)
      val pruned = live
        .filter(element_at(col("partition_values"), "lang") === "zh")
      val paths = pruned.select("abs_path").collect().map(_.getString(0))
      val footers = meta(s, out, "file", Map("source" -> "parquet"))
        .filter(col("filepath").isin(paths.toSeq: _*))
      live.agg(count(lit(1)).cast("long").as("n_files"))
        .crossJoin(pruned.agg( // 1x1: two single-row aggregates
          count(lit(1)).cast("long").as("n_pruned"),
          sum(col("num_records")).cast("long").as("pruned_rows")))
        .crossJoin(footers.agg(
          sum(col("num_rows")).cast("long").as("footer_rows")))
    }),

    // DELTA TIME TRAVEL at metadata cost: the live set reconstructed AS
    // OF every version 0..4 — each from the newest checkpoint at or
    // below the target plus its commit tail. The oracle replays the
    // SAME versions in DuckDB from the JSON commits ALONE (a different
    // evidence path than the checkpoint+tail plan), so checkpoint and
    // log must tell the same story at every version.
    "meta_delta_travel" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      (0L to 4L).map { v =>
        DeltaMeta.snapshotFilesAt(s, out, Some(v))
          .agg(
            lit(v).as("version"),
            count(lit(1)).cast("long").as("n_live"),
            sum(col("num_records")).cast("long").as("live_rows"))
      }.reduce(_ unionByName _)
    }),

    // DELTA TIMESTAMP AS OF: three wall-clock probes, each resolved to
    // a version via commitInfo timestamps and replayed — the oracle
    // resolves the SAME probes from the same commitInfo in DuckDB, so
    // the version RESOLUTION itself is cross-engine, not just the
    // replay.
    "meta_delta_time_travel" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val ts0 = 1700000000000L
      Seq(500L, 2500L, 99999L).map { off =>
        val v = DeltaMeta.versionAt(s, out, ts0 + off)
        DeltaMeta.snapshotFilesAt(s, out, Some(v))
          .agg(
            lit(off).as("probe_off"),
            lit(v).as("version"),
            count(lit(1)).cast("long").as("n_live"),
            sum(col("num_records")).cast("long").as("live_rows"))
      }.reduce(_ unionByName _)
    }),

    // DELTA deletion vectors: the protocol-v3 DELETE-without-rewrite —
    // a v5 commit removes f0 and re-adds the SAME file with a
    // deletionVector descriptor (3 logically-deleted rows). The replay
    // must (a) reconcile the same-version remove+add pair to the add
    // (ordering key (version, is_add), not bare version), and (b) report
    // physical vs net rows — a DV-blind audit overcounts by the DV
    // cardinality. The oracle replays the same log in DuckDB with the
    // same composite-rank arg_max.
    "meta_delta_dv" -> ((s, dir) => {
      val out = "/tmp/graft_deltadv_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeDvFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.snapshotFiles(s, out)
        .agg(
          count(lit(1)).cast("long").as("n_live"),
          sum(col("num_records")).cast("long").as("physical_rows"),
          sum(when(col("has_dv"), lit(1)).otherwise(lit(0)))
            .cast("long").as("n_dv_files"),
          sum(col("dv_cardinality")).cast("long").as("dv_deleted"),
          (sum(col("num_records")) - sum(col("dv_cardinality")))
            .cast("long").as("net_rows"))
    }),

    // DELTA V2 (sidecar) CHECKPOINT: the v2Checkpoint layout — the
    // checkpoint MANIFEST carries only pointers + non-file actions;
    // add/remove live in _delta_log/_sidecars parts. Commits 0..2 are
    // log-cleaned, so the live set MUST replay through the sidecars
    // (the manifest's pointer rows are the only route to the
    // checkpointed adds). Oracle: DuckDB reads the SAME sidecar parquet
    // + the surviving JSON tail and applies the same composite-rank
    // arg_max replay.
    "meta_delta_v2ckpt" -> ((s, dir) => {
      val out = "/tmp/graft_deltav2_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeV2CheckpointFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.snapshotFiles(s, out)
        .select(col("path"), col("version"), col("num_records"))
    }),

    // DELTA V2 checkpoint with a JSON MANIFEST: the protocol's other
    // manifest form — <v>.checkpoint.<uuid>.json, ndjson of non-file
    // actions + checkpointMetadata + sidecar pointers; add/remove live
    // in the same _delta_log/_sidecars parquet parts. Commits 0..2 are
    // log-cleaned and NO parquet checkpoint survives: a reader blind
    // to the form replays from nothing. Oracle: DuckDB reads the same
    // sidecars + JSON tail (the manifest's lines carry no file actions
    // and wash out of its replay) with the composite-rank arg_max.
    "meta_delta_v2ckpt_json" -> ((s, dir) => {
      val out = "/tmp/graft_deltav2j_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeV2JsonCheckpointFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.snapshotFiles(s, out)
        .select(col("path"), col("version"), col("num_records"))
    }),

    // DELTA MULTIPART V1 CHECKPOINT: the classic checkpoint split into
    // .checkpoint.<n>.<m>.parquet parts (adds in part 1, everything
    // else in part 2), commits ≤ 2 log-cleaned — the live set MUST
    // replay through the COMPLETE part set (a partial set refuses).
    // Oracle: DuckDB reads the same parts by glob + the surviving JSON
    // tail and applies the same composite-rank arg_max replay.
    "meta_delta_multickpt" -> ((s, dir) => {
      val out = "/tmp/graft_deltamp_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeMultipartCheckpointFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.snapshotFiles(s, out)
        .select(col("path"), col("version"), col("num_records"))
    }),

    // DELTA VERSION-CHECKSUM audit: each surviving <v>.crc declares
    // the post-commit numFiles/tableSizeBytes; the audit replays the
    // log independently (ALL versions in one actions ⋈ broadcast-
    // versions aggregation, no per-version job loop) and flags
    // disagreement. The fixture's v1 crc LIES (numFiles 99) — both
    // engines must flag exactly that row. Oracle: DuckDB reads the
    // same .crc JSONs and replays the same commits with the same
    // composite-rank arg_max.
    "meta_delta_crc_audit" -> ((s, dir) => {
      val out = "/tmp/graft_deltacrc_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeCrcFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.crcAudit(s, out)
    }),

    // DELTA DV ROW-WISE decode: the roaring64 payloads (one inline Z85,
    // one u-storage framed file) decode to actual row POSITIONS, which
    // join each file's own rows by _metadata.row_index — the net-rows
    // audit verified row by row, not by descriptor cardinality. The
    // fixture's files are doc_id-sorted, so the oracle recomputes the
    // SAME deleted doc_ids closed-form: DuckDB ranks rows by doc_id and
    // picks the planted positions.
    "meta_delta_dv_rows" -> ((s, dir) => {
      val out = "/tmp/graft_deltadvb_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeDvBitmapFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val pos = DeltaMeta.deletedPositions(s, out)
      val rows = s.read.parquet(out + "/f0.parquet", out + "/f1.parquet")
        .select(col("doc_id"),
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("file"),
          col("_metadata.row_index").as("ridx"))
      pos.join(rows, pos("path") === rows("file") && pos("pos") === rows("ridx"))
        .groupBy(col("path"))
        .agg(count(lit(1)).cast("long").as("n_deleted"),
          sum(col("doc_id")).cast("long").as("deleted_docid_sum"))
    }),

    // DELTA COLUMN MAPPING (name mode) conformance: data files carry
    // PHYSICAL names (c1), the declared schema speaks LOGICAL names
    // (doc_id/lang/quality -> c1/c2/c3 via each field's
    // delta.columnMapping.physicalName). The audit joins footers by
    // physical name, reports missing columns by logical name, and
    // excludes the partition column (never inside data files). Oracle:
    // DuckDB parses the same schemaString mapping and diffs the same
    // parquet_schema footers.
    "meta_delta_colmap" -> ((s, dir) => {
      val out = "/tmp/graft_deltacm_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeColumnMappedFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.schemaConformance(s, out)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
          col("n_declared"), col("n_present"), col("missing_csv"))
    }),

    // DELTA COLUMN MAPPING in ID mode: footers carry no logical names
    // at all — each column's identity is its parquet FIELD ID (stamped
    // by Spark's own parquet.field.id channel), matched against the
    // schemaString's delta.columnMapping.id. The v2 evolution declares
    // quality (id 3) no file carries. Oracle: DuckDB reads the SAME
    // field ids from parquet_schema and diffs the same declarations.
    "meta_delta_colmap_id" -> ((s, dir) => {
      val out = "/tmp/graft_deltacmid_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeColumnMappedIdFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.schemaConformance(s, out)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
          col("n_declared"), col("n_present"), col("missing_csv"))
    }),

    // DELTA COLUMN MAPPING partition prune: add.partitionValues is
    // keyed by the PHYSICAL partition column name (c2) — the logical
    // probe "lang = 'zh'" must translate through columnMappingInfo
    // before the lookup (mapping-blind pruning silently matches
    // NOTHING). Oracle: DuckDB derives the same physical name from the
    // schemaString and probes the same add actions dynamically.
    "meta_delta_colmap_prune" -> ((s, dir) => {
      val out = "/tmp/graft_deltacm_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeColumnMappedFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val (_, mapping, _) = DeltaMeta.columnMappingInfo(s, out)
      val live = DeltaMeta.snapshotFiles(s, out)
      val pruned = live.filter(
        element_at(col("partition_values"), mapping("lang")) === "zh")
      live.agg(count(lit(1)).cast("long").as("n_files"))
        .crossJoin(pruned.agg( // 1x1: two single-row aggregates
          count(lit(1)).cast("long").as("n_pruned"),
          sum(col("num_records")).cast("long").as("pruned_rows")))
    }),

    // ICEBERG metadata tier, snapshot level: one row per snapshot of a
    // hand-written (public-spec) filesystem table — two snapshots in one
    // v1.metadata.json, the second current. The oracle is a REAL
    // cross-engine check: DuckDB parses the same metadata JSON
    // independently (read_json_auto + unnest of the snapshots list).
    "meta_iceberg_snapshot" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      meta(s, out, "snapshot", Map("source" -> "iceberg"))
        .select(col("snapshot_id"), col("timestamp_ms"), col("operation"),
          col("is_current"), col("format_version"))
    }),

    // ICEBERG live-files audit: the distributed manifest walk (one task
    // per manifest) of the CURRENT snapshot COMPOSED with the parquet
    // metadata tier over the same data directory — live data files
    // (status != DELETED, content = data), the format-v2 position-delete
    // manifest (content=1, counted as deletions, never as data), and a
    // deleted-but-present slice a raw census would overcount. The oracle
    // reads the same data-file footers in DuckDB (parquet_file_metadata)
    // and replays the fixture's manifest contract in closed form — the
    // manifest record counts must equal the files' own footer rows.
    "meta_iceberg_live" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val entries = IcebergMeta.currentFiles(s, out)
      val live = entries
        .filter(col("status") =!= 2 && col("content") === 0)
        .select(col("abs_path"), col("record_count"))
      val footers = meta(s, out + "/data", "file", Map("source" -> "parquet"))
        .select(col("filepath"), col("num_rows"))
      val deletes = entries.filter(col("content") =!= 0)
        .agg(count(lit(1)).cast("long").as("n_delete_files"),
          sum(col("record_count")).cast("long").as("deleted_positions"))
      footers.join(live, footers("filepath") === live("abs_path"), "left")
        .agg(
          sum(when(col("abs_path").isNotNull, lit(1)).otherwise(lit(0)))
            .cast("long").as("n_live"),
          sum(when(col("abs_path").isNotNull, col("record_count")))
            .cast("long").as("live_rows"),
          sum(when(col("abs_path").isNotNull, col("num_rows")))
            .cast("long").as("footer_rows"),
          count(lit(1)).cast("long").as("n_disk"))
        .crossJoin(deletes) // 1×1: two single-row aggregates
        .select(col("n_live"), col("live_rows"), col("footer_rows"),
          (col("live_rows") - col("deleted_positions")).as("net_rows"),
          col("n_delete_files"), col("deleted_positions"), col("n_disk"))
    }),

    // ICEBERG PARTITION-PRUNED planning at metadata cost — the iceberg
    // sibling of meta_delta_partition_prune: the manifest's typed
    // partition records (spec r102) answer "which files serve lang='zh'"
    // without touching data; the pruned path list drives a footer read
    // of only those files. Oracle: DuckDB reads the same pruned
    // partition directory's footers; membership is the fixture contract.
    "meta_iceberg_partition_prune" -> ((s, dir) => {
      val out = "/tmp/graft_icepart_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writePartitionedFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val files = IcebergMeta.currentFiles(s, out)
      val pruned = files
        .filter(element_at(col("partition_values"), "lang") === "zh")
      val paths = pruned.select("abs_path").collect().map(_.getString(0))
      val footers = meta(s, out + "/data", "file", Map("source" -> "parquet"))
        .filter(col("filepath").isin(paths.toSeq: _*))
      files.agg(count(lit(1)).cast("long").as("n_files"))
        .crossJoin(pruned.agg( // 1x1: two single-row aggregates
          count(lit(1)).cast("long").as("n_pruned"),
          sum(col("record_count")).cast("long").as("pruned_rows")))
        .crossJoin(footers.agg(
          sum(col("num_rows")).cast("long").as("footer_rows")))
    }),

    // ICEBERG ORPHAN-file report — remove_orphan_files' delete set at
    // metadata cost: disk files under data/ that NO manifest of ANY
    // listed snapshot references (a DELETED entry still counts);
    // non-parquet debris surfaces via the source=any census. The query
    // plants one stray parquet + one junk blob; the oracle reads the
    // stray's footer in DuckDB, membership is the fixture contract.
    "meta_iceberg_orphans" -> ((s, dir) => {
      val out = "/tmp/graft_iceorph_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val tmp = out + "/data/stray_tmp"
      s.read.parquet(pq(dir, "documents")).limit(7)
        .select(col("doc_id")).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(out + "/data/stray.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      java.nio.file.Files.write(
        new java.io.File(out + "/data/junk.bin").toPath,
        Array[Byte](1, 2, 3, 4, 5))
      IcebergMeta.orphanFiles(s, out)
        .select(col("filename"), col("format"), col("num_rows"))
    }),

    // ICEBERG SCHEMA HISTORY: every schema the table metadata still
    // lists (superseded ones survive in `schemas`; `current-schema-id`
    // flags the live one) — the iceberg counterpart of
    // meta_delta_schema. Oracle: DuckDB unnests the same JSON.
    "meta_iceberg_schema" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.schemaHistory(s, out)
    }),

    // ICEBERG SCHEMA CONFORMANCE: the CURRENT declared schema (the
    // schemas entry named by current-schema-id) vs each live data
    // file's own footer — the same backfill audit as
    // meta_delta_conformance, resolved through the manifest chain
    // instead of a commit log (every fixture file predates the +n_chars
    // evolution). Oracle: DuckDB unnests the same metadata JSON and
    // diffs the same parquet_schema footers over the writer-contract
    // live set.
    "meta_iceberg_conformance" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.schemaConformance(s, out)
        .select(regexp_extract(col("path"), "([^/]+)$", 1).as("path"),
          col("n_declared"), col("n_present"), col("missing_csv"))
    }),

    // ICEBERG POSITION-DELETE row-wise audit: the live delete file's
    // (file_path, pos) rows join f0's own rows by _metadata.row_index —
    // merge-on-read deletion verified row by row (the iceberg sibling
    // of meta_delta_dv_rows). Oracle: DuckDB reads the SAME delete
    // parquet and joins the same file with file_row_number=true — no
    // ordering assumption on either side.
    "meta_iceberg_delete_rows" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val pos = IcebergMeta.positionDeleteRows(s, out)
      val rows = s.read.parquet(out + "/data/f0.parquet")
        .select(col("doc_id"),
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("file"),
          col("_metadata.row_index").as("ridx"))
      pos.join(rows,
        regexp_extract(pos("data_path"), "([^/]+)$", 1) === rows("file") &&
          pos("pos") === rows("ridx"))
        .groupBy(col("file").as("path"))
        .agg(count(lit(1)).cast("long").as("n_deleted"),
          sum(col("doc_id")).cast("long").as("deleted_docid_sum"))
    }),

    // ICEBERG v3 DELETION VECTORS row-wise: both DV blobs live in one
    // Puffin file (the v3 writer layout), addressed by the manifest's
    // content_offset/content_size_in_bytes; [[PuffinCodec]] verifies
    // framing magic + CRC and decodes the roaring64 vectors to row
    // POSITIONS, which join each file's own rows by
    // _metadata.row_index. The fixture's files are doc_id-sorted, so
    // the oracle recomputes the SAME deleted doc_ids closed-form from
    // the planted positions.
    "meta_iceberg_dv_rows" -> ((s, dir) => {
      val out = "/tmp/graft_icedv_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeDvFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val pos = IcebergMeta.positionDeleteRows(s, out)
      val rows = s.read.parquet(out + "/data/f0.parquet", out + "/data/f1.parquet")
        .select(col("doc_id"),
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("file"),
          col("_metadata.row_index").as("ridx"))
      pos.join(rows,
        regexp_extract(pos("data_path"), "([^/]+)$", 1) === rows("file") &&
          pos("pos") === rows("ridx"))
        .groupBy(col("file").as("path"))
        .agg(count(lit(1)).cast("long").as("n_deleted"),
          sum(col("doc_id")).cast("long").as("deleted_docid_sum"))
    }),

    // CLUSTERING-quality report: per-column chunk-stat spans vs the
    // global span — span_sum/global_span IS the average overlap depth
    // a stats-pruned scan pays (1 = perfectly clustered, n_chunks =
    // unclustered). The fixture sorts by k (clustered) while r rides
    // along uncorrelated (every chunk spans the whole r range): the
    // report must show the contrast from footer stats alone. Oracle:
    // DuckDB computes the same integers from parquet_metadata's own
    // stats over the same files.
    "clustering_report" -> ((s, dir) => {
      val out = "/tmp/graft_cluster_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "orders"))
        .select(col("o_orderkey").as("k"), col("o_custkey").as("r"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536")
        .parquet(out)
      MetaPrune.clusteringReport(s, out, Seq("k", "r"))
    }),

    // Z-ORDER vs LINEAR clustering, MEASURED: the same data written
    // sorted by k alone and sorted by the z-interleave of (k, r); the
    // clustering report must show the trade from footer stats alone —
    // linear gives k depth ~1 but r depth ~n_chunks (pruning on r
    // skips nothing), z-order gives BOTH columns intermediate depth
    // (multi-dimension pruning works). Oracle: DuckDB aggregates the
    // same integers from parquet_metadata over both layouts.
    "zorder_clustering" -> ((s, dir) => {
      val sfx = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val base = s.read.parquet(pq(dir, "orders"))
        .select(col("o_custkey").as("k"), col("o_orderkey").as("r"))
      val lin = "/tmp/graft_zclin_" + sfx
      val zo = "/tmp/graft_zczo_" + sfx
      base.repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536").parquet(lin)
      // z-interleave needs BIT-ALIGNED domains: k (custkey, ~1.5k) is
      // scaled into r's range (orderkey, ~15k) before interleaving —
      // raw interleave of mismatched magnitudes degenerates to a sort
      // by the wider column
      base.withColumn("z", Layout.zvalue2(col("k") * lit(10L), col("r")))
        .repartition(1).sortWithinPartitions("z").drop("z")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536").parquet(zo)
      MetaPrune.clusteringReport(s, lin, Seq("k", "r"))
        .withColumn("layout", lit("linear"))
        .unionByName(MetaPrune.clusteringReport(s, zo, Seq("k", "r"))
          .withColumn("layout", lit("zorder")))
    }),

    // COMPACTION PLAN (delta): the OPTIMIZE planning question at
    // metadata cost — bin-pack the snapshot's small files into rewrite
    // groups (path order, group = floor(preceding-bytes/target), the
    // deterministic bin-packing real compactors use), window
    // PARTITIONED BY the table partition so no global sort exists.
    // Oracle: DuckDB replays the same live set from the log and runs
    // the same window arithmetic.
    "compaction_plan_delta" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val files = DeltaMeta.snapshotFiles(s, out).select(
        col("path"), col("size"),
        array_join(array_sort(transform(map_entries(col("partition_values")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))),
          ",").as("partition_key"))
      // target scales WITH the data (3x the smallest live file) so the
      // plan stays non-trivial at every sf — a fixed byte target would
      // declare everything right-sized the moment files grow past it
      val target = 3L * files.agg(min(col("size"))).head().getLong(0)
      MetaValues.compactionPlan(files, target)
    }),

    // COMPACTION PLAN (iceberg): same planner over the manifest
    // chain's live data files, grouped within each lang partition.
    // Oracle: DuckDB rebuilds the same file inventory from the data
    // directory itself (read_blob sizes) and runs the same window.
    "compaction_plan_iceberg" -> ((s, dir) => {
      val out = "/tmp/graft_icepart_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writePartitionedFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val files = IcebergMeta.currentFiles(s, out)
        .filter(col("status") =!= 2 && col("content") === 0)
        .select(
          regexp_extract(col("file_path"), "([^/]+)$", 1).as("path"),
          col("file_size_bytes").as("size"),
          array_join(array_sort(transform(map_entries(col("partition_values")),
            e => concat(e.getField("key"), lit("="), e.getField("value")))),
            ",").as("partition_key"))
      val target = 3L * files.agg(min(col("size"))).head().getLong(0)
      MetaValues.compactionPlan(files, target)
    }),

    // DELTA STATS-based file skipping: which live files can hold
    // doc_id in [100, 299], decided from each add's minValues/
    // maxValues alone (log cost, zero data I/O); the no-bounds file
    // (f4 carries numRecords only) must stay selected — no evidence,
    // a sound pruner reads it. Oracle: DuckDB parses the same stats
    // JSON from the same log and applies the same interval test.
    "meta_delta_stats_prune" -> ((s, dir) => {
      val out = "/tmp/graft_deltasp_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeStatsPruneFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.statsPrune(s, out, "doc_id", 100L, 299L)
    }),

    // DELTA IN-COMMIT TIMESTAMPS: the inCommitTimestamps feature makes
    // commitInfo.inCommitTimestamp the authoritative commit time — the
    // fixture's WALL timestamps are all within 1 ms (writer clock
    // skew), the ICTs 10 s apart; TIMESTAMP AS OF must resolve by ICT
    // (a wall-clock reader sends every probe to the last version).
    // Oracle: DuckDB applies the same coalesce(ict, ts) max-version
    // rule and replays the resolved snapshots.
    "meta_delta_ict" -> ((s, dir) => {
      val out = "/tmp/graft_deltaict_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeIctFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      val ts0 = 1700000000000L
      Seq(5000L, 15000L, 99999L).map { off =>
        val v = DeltaMeta.versionAt(s, out, ts0 + off)
        DeltaMeta.snapshotFilesAt(s, out, Some(v))
          .agg(
            lit(off).as("probe_off"),
            lit(v).as("version"),
            count(lit(1)).cast("long").as("n_live"),
            sum(col("num_records")).cast("long").as("live_rows"))
      }.reduce(_ unionByName _)
    }),

    // DELTA DOMAIN METADATA: the protocol's connector-owned state
    // domains, latest action per domain across commits + checkpoint;
    // a tombstoned domain SURFACES with removed=true (v6 removes
    // delta.clustering) rather than vanishing. Oracle: DuckDB replays
    // the same actions with the same version arg_max.
    "meta_delta_domains" -> ((s, dir) => {
      val out = "/tmp/graft_deltadm_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeDomainMetadataFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.domainMetadataReport(s, out)
    }),

    // ICEBERG SNAPSHOT-SUMMARY audit: declared added-data-files /
    // added-records per snapshot vs the snapshot's own manifest list
    // (data manifests only); the fixture's snap-2 added-records LIES
    // by one — both engines flag exactly that cell. Oracle: DuckDB
    // parses the same summaries; actuals are the fixture's writer
    // contract recomputed from the data files' own footers.
    "meta_iceberg_summary_audit" -> ((s, dir) => {
      val out = "/tmp/graft_icesum_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeSummaryFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.snapshotSummaryAudit(s, out)
    }),

    // ICEBERG NDV audit: the statistics Puffin's theta sketches DECODED
    // (compact-theta serial v3) vs each blob's declared ndv property —
    // the fixture's lang blob declares a +3 LIE over a REAL sketch that
    // encodes the true distinct count; the doc_id blob agrees. Oracle:
    // DuckDB reads the same declarations from the metadata JSON and
    // recomputes the sketch side from the DATA FILES themselves (the
    // writer contract: each sketch encodes its column's exact distinct
    // count over f0..f4) — a real cross-engine check of the binary
    // sketch decode.
    "meta_iceberg_ndv_audit" -> ((s, dir) => {
      val out = "/tmp/graft_icendv_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeNdvFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.ndvAudit(s, out)
    }),

    // ICEBERG METADATA-LOG audit: the current metadata's lineage of
    // previous metadata files vs disk — the fixture's v2 lists the
    // real v1 plus a v0 that never existed (the broken-lineage shape
    // that fails rollback mid-walk). Oracle: DuckDB parses the same
    // metadata-log and derives existence from a glob listing.
    "meta_iceberg_metadata_log" -> ((s, dir) => {
      val out = "/tmp/graft_icemlog_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeMetadataLogFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.metadataLogReport(s, out)
    }),

    // DELTA _last_checkpoint POINTER audit: the reader hint file vs
    // the log's actual contents — declared version/parts, surviving
    // parts, completeness, stale-pointer detection (a newer checkpoint
    // the pointer misses), and the commit count past the declared
    // version. Oracle: DuckDB reads the same pointer JSON and
    // recomputes everything from a glob listing of the same log.
    "meta_delta_last_ckpt" -> ((s, dir) => {
      val out = "/tmp/graft_delta_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      DeltaMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      DeltaMeta.lastCheckpointAudit(s, out)
    }),

    // ICEBERG REFS report: named branches/tags -> snapshot ids, with
    // dangling detection (a ref to an expired snapshot breaks every
    // reader that follows it) and current-snapshot flagging. The
    // fixture plants main/branch, v1/tag, and a stale tag on an
    // expired id. Oracle: DuckDB parses the same refs map (json_each)
    // and the same snapshots list.
    "meta_iceberg_refs" -> ((s, dir) => {
      val out = "/tmp/graft_icerefs_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeRefsFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.refsReport(s, out)
    }),

    // ICEBERG PARTITION-STATISTICS audit: the current snapshot's
    // declared per-partition rollups (a PARQUET stats file named by
    // the metadata's partition-statistics list) vs the manifest
    // chain's own per-partition aggregation; the fixture's first lang
    // LIES about data_file_count — both engines must flag exactly that
    // row. Oracle: DuckDB reads the SAME stats parquet and recomputes
    // the actual side from the data files themselves
    // (parquet_file_metadata rows + read_blob sizes).
    "meta_iceberg_partition_stats" -> ((s, dir) => {
      val out = "/tmp/graft_icepstats_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writePartitionStatsFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.partitionStatsAudit(s, out)
    }),

    // ICEBERG PUFFIN STATISTICS audit: the metadata JSON's statistics
    // entries (Puffin sketch files + declared blob-metadata) verified
    // against each Puffin file's OWN footer — one row per actual blob,
    // declared_match flagging type/snapshot disagreement. The oracle is
    // a REAL cross-engine check: DuckDB independently decodes the
    // Puffin footer from raw bytes (read_blob → LE payload-size word →
    // unhex → JSON) and joins the same metadata JSON's declarations.
    "meta_iceberg_puffin_stats" -> ((s, dir) => {
      val out = "/tmp/graft_icestats_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeStatsFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.statisticsReport(s, out)
    }),

    // STREAMING iceberg current-store maintenance: the metadata
    // stream's AvailableNow pass refreshes a per-snapshot store only
    // when a NEW metadata version arrives; the store's census must
    // equal DuckDB's independent read of the same data-file footers.
    "stream_iceberg_live" -> ((s, dir) => {
      val sfx = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val out = "/tmp/graft_icestream_" + sfx
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val store = "/tmp/graft_icestore_" + sfx
      val ckpt = "/tmp/graft_icestoreck_" + sfx
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      IcebergMeta.maintainCurrentStore(s, out, store, ckpt)
      val entries = IcebergMeta.readCurrentStore(s, store)
      entries.filter(col("status") =!= 2 && col("content") === 0)
        .agg(
          count(lit(1)).cast("long").as("n_live"),
          sum(col("record_count")).cast("long").as("live_rows"))
        .crossJoin(entries.agg( // 1x1: two single-row aggregates
          count(lit(1)).cast("long").as("n_entries"),
          sum(when(col("content") =!= 0, col("record_count")))
            .cast("long").as("deleted_positions")))
    }),

    // ICEBERG EQUALITY-DELETE row-wise audit (format v2, the Flink
    // merge-on-read shape): delete files carry VALUE rows matched on
    // their equality_ids columns, null equals null — resolved as a
    // null-safe semi join of the live data files against the delete
    // files' distinct keys. Oracle: DuckDB reads the SAME delete
    // parquets and data files and joins IS NOT DISTINCT FROM.
    "meta_iceberg_eq_rows" -> ((s, dir) => {
      val out = "/tmp/graft_iceeq_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeEqDeleteFixtureTable(
        s, out, s.read.parquet(pq(dir, "documents")))
      IcebergMeta.equalityDeleteRows(s, out)
        .select(regexp_extract(col("data_path"), "([^/]+)$", 1).as("file"),
          col("eq_cols"), col("key_csv"))
    }),

    // ICEBERG TIMESTAMP AS OF: wall-clock probes resolved from the
    // snapshot list's timestamp-ms — the oracle resolves the SAME
    // probes from the same JSON in DuckDB and cross-checks the rows
    // against the data files' own footers.
    "meta_iceberg_time_travel" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      val ts0 = 1700000000000L
      Seq(500L, 99999L).map { off =>
        val id = IcebergMeta.snapshotIdAt(s, out, ts0 + off)
        IcebergMeta.filesAt(s, out, Some(id))
          .filter(col("status") =!= 2 && col("content") === 0)
          .agg(
            lit(off).as("probe_off"),
            lit(id).as("snapshot_id"),
            count(lit(1)).cast("long").as("n_live"),
            sum(col("record_count")).cast("long").as("data_rows"))
      }.reduce(_ unionByName _)
    }),

    // ICEBERG TIME TRAVEL / snapshot diff at metadata cost: both listed
    // snapshots resolve through their own manifest lists; the per-
    // snapshot live-data census shows exactly what the overwrite
    // changed. The oracle reads the same data-file footers in DuckDB —
    // per-snapshot membership is the fixture contract, the row numbers
    // are the cross-engine check on the manifest decode.
    "meta_iceberg_travel" -> ((s, dir) => {
      val out = "/tmp/graft_iceberg_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      IcebergMeta.writeFixtureTable(s, out, s.read.parquet(pq(dir, "documents")))
      Seq(1L, 2L).map { id =>
        IcebergMeta.filesAt(s, out, Some(id))
          .filter(col("status") =!= 2 && col("content") === 0)
          .agg(
            lit(id).as("snapshot_id"),
            count(lit(1)).cast("long").as("n_live"),
            sum(col("record_count")).cast("long").as("data_rows"))
      }.reduce(_ unionByName _)
    }),

    // ORC stripe-skip report — the ORC sibling of the parquet page-skip
    // report, from per-stripe statistics in the file tail (the structure
    // ORC's own pushdown consults; the spec additionally pins the report
    // against Spark's real ORC reader metrics). The oracle checks the
    // invariants the layout fixes: totals equal the data, a sorted
    // layout skips stripes, coverage never undercuts the matches.
    "orc_stripe_skip" -> ((s, dir) => {
      val out = "/tmp/graft_orcskip_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey").as("k"),
          concat(col("l_returnflag"), lit("_pad_"), col("l_partkey"),
            col("l_shipdate").cast("string")).as("pad"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("orc.stripe.size", "65536")
        .orc(out)
      val (lo, hi) = (1000L, 4999L)
      val rep = OrcPrune.stripeSkipReport(s, out, "k", lo, hi)
        .agg(sum(col("rows_total")).as("rt"),
          sum(col("rows_covered")).as("rc"),
          sum(col("n_stripes_total")).as("st"),
          sum(col("n_stripes_needed")).as("sn"))
      val matches = s.read.orc(out)
        .filter(col("k").between(lo, hi))
        .agg(count(lit(1)).as("m"))
      rep.crossJoin(matches)
        .select(col("rt").cast("long").as("total_rows"),
          (col("rc") < col("rt")).as("skipped_rows"),
          (col("sn") < col("st")).as("skipped_stripes"),
          (col("rc") >= col("m")).as("sound"),
          col("m").cast("long").as("n_matches"))
    }),

    // AVRO metadata tier — the third lake format: Avro has NO footer, so
    // row counts come from the hand-rolled block walk (count/size varint
    // pairs, sync verification), decoded from containers avro's OWN
    // DataFileWriter produced (cross-implementation, not a round trip).
    // The oracle recomputes in closed form from the source data: file
    // count from the parity split, row totals from documents, two
    // distinct codecs by construction, and the file-level totals must
    // agree with the block-level rollup.
    "meta_avro_file" -> ((s, dir) => {
      val out = "/tmp/graft_avrofile_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val outF = new java.io.File(out)
      if (outF.exists()) outF.listFiles().foreach(_.delete())
      outF.mkdirs()
      // fixture-bounded driver-side write through avro's own writer (500
      // rows at the correctness SF) — the decode under test is ours
      val rows = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("lang")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
      val (even, odd) = rows.partition(_._1 % 2 == 0)
      AvroMeta.writeFixture(new java.io.File(outF, "even.avro"), even,
        syncInterval = 1024)
      AvroMeta.writeFixture(new java.io.File(outF, "odd.avro"), odd,
        codec = "deflate", syncInterval = 1024)
      val files = meta(s, out, "file")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(col("num_rows")).cast("long").as("total_rows"),
          count_distinct(col("codec")).cast("long").as("n_codecs"))
      val blocks = meta(s, out, "block")
        .agg(sum(col("num_rows")).cast("long").as("block_rows"))
      files.crossJoin(blocks)
        .select(col("n_files"), col("total_rows"), col("n_codecs"),
          (col("block_rows") === col("total_rows")).as("blocks_agree"))
    }),

    // ORC stats-driven file pruning — the parquet prune story replayed
    // cross-format: a range-clustered ORC layout, footer min/max decide
    // the surviving files, a normal spark.read.orc over those paths, and
    // the filtered result still equals DuckDB over the SOURCE parquet
    // data. The pruned file set is strictly smaller than the layout
    // (range-partitioned: most files cannot hold the probe range).
    "orc_prune_scan" -> ((s, dir) => {
      val out = "/tmp/graft_orcprune_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey").as("k"), col("l_quantity"))
        .repartitionByRange(6, col("k"))
        .write.mode("overwrite").orc(out)
      OrcPrune.readPrunedLong(s, out, "k", 1000L, 4999L)
        .filter(col("k").between(1000L, 4999L))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("k")), lit(0L)).as("k_sum"))
    }),

    // STREAMING token accounting: the metadata STREAMING source at the
    // sizestats level watches an arrival directory — each micro-batch
    // accounts only the newly arrived files' footers (stream-static join
    // with the schema facts), appending per-chunk counts to a running
    // ledger. Two arrival waves with a checkpointed restart between them
    // prove exactly-once accounting; the ledger's totals equal DuckDB
    // over everything that ever arrived. Still zero page I/O — a live
    // corpus's token census at footer cost.
    "stream_token_accounting" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val src = "/tmp/graft_stracct_src_" + suffix
      val out = "/tmp/graft_stracct_out_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_stracct_ckpt").toFile
      for (p <- Seq(src, out)) {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      }
      val docs = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null))
            .otherwise(transform(sequence(lit(0L), col("doc_id") % 7),
              i => when((col("doc_id") + i) % 13 === 0, lit(null))
                .otherwise(col("doc_id") * 31L + i))).as("tokens"))
      def arrive(wave: DataFrame): Unit =
        wave.coalesce(1).write.mode("append").parquet(src)
      def runOnce(): Unit = {
        val stream = s.readStream.format("metadata")
          .option("level", "sizestats").option("source", "parquet")
          .option("streamlagms", "0").load(src)
        val acc = MetaValues.leafAccountingOf(stream,
          MetaValues.schemaFactsDf(s, src))
          .filter(col("path") === "tokens.list.element")
          .select(col("filepath"), col("n_records"), col("n_leaf_values"),
            (element_at(col("definition_level_histogram"), 3) +
              element_at(col("definition_level_histogram"), 4)).as("n_slots"))
        val q = acc.writeStream.format("parquet").outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .option("path", out).start()
        q.awaitTermination(120000)
        q.stop()
      }
      try {
        arrive(docs.filter(col("doc_id") % 2 === 0))
        runOnce()
        arrive(docs.filter(col("doc_id") % 2 === 1))
        runOnce()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.read.parquet(out)
        .agg(sum(col("n_records")).cast("long").as("n_rows"),
          sum(col("n_slots")).cast("long").as("n_slots"),
          sum(col("n_leaf_values")).cast("long").as("n_tokens"))
    }),

    // TOKEN ACCOUNTING AT FOOTER COST: how many documents, list slots,
    // and non-null tokens a nested array<long> corpus holds — from the
    // footer's SizeStatistics level histograms joined with footer-derived
    // schema facts. ZERO page I/O (the page-walk equivalent reads every
    // data page; at 100 TB that difference IS the feature). DuckDB
    // recomputes every count from the data itself.
    "meta_token_accounting" -> ((s, dir) => {
      val out = "/tmp/graft_tokacct_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null))
            .when(col("doc_id") % 11 === 1, array().cast("array<long>"))
            .otherwise(transform(sequence(lit(0L), col("doc_id") % 7),
              i => when((col("doc_id") + i) % 13 === 0, lit(null))
                .otherwise(col("doc_id") * 31L + i))).as("tokens"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", "131072")
        .parquet(out)
      MetaValues.leafAccounting(s, out)
        .filter(col("path") === "tokens.list.element")
        .agg(sum(col("n_records")).cast("long").as("n_rows"),
          sum(element_at(col("definition_level_histogram"), 3) +
            element_at(col("definition_level_histogram"), 4))
            .cast("long").as("n_slots"),
          sum(col("n_leaf_values")).cast("long").as("n_tokens"))
    }),

    // ZERO-KNOWLEDGE whole-table decode: MetaValues.decodePages derives
    // every schema fact (max rep/def levels, physical types, FLBA
    // widths) from each file's OWN footer schema string via parquet's
    // MessageTypeParser — the caller supplies only the path. One fixture,
    // five shapes (PLAIN int64, dict strings, FLBA decimal, NESTED
    // array<long>, PLAIN fp), every per-column invariant recomputed by
    // DuckDB from the data alone.
    "meta_decode_table" -> ((s, dir) => {
      val out = "/tmp/graft_decodetable_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id").as("k"),
          col("lang").as("s"),
          when(col("doc_id") % 23 === 0, lit(null))
            .otherwise(col("n_chars").cast("decimal(20,2)")).as("price"),
          when(col("doc_id") % 11 === 0, lit(null))
            .otherwise(transform(sequence(lit(0L), col("doc_id") % 5),
              i => col("doc_id") * 31L + i)).as("vals"),
          when(col("doc_id") % 13 === 0, lit(null))
            .otherwise(col("n_chars").cast("double") * 0.5).as("p"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary#k", "false")
        .option("parquet.enable.dictionary#vals.list.element", "false")
        .option("parquet.enable.dictionary#p", "false")
        .option("parquet.page.row.count.limit", "1500")
        .parquet(out)
      MetaValues.decodePages(s, out)
        .filter(col("page_type").startsWith("DATA_PAGE"))
        .agg(
          sum(when(col("path") === "k", col("decoded.n")))
            .cast("long").as("k_n"),
          sum(when(col("path") === "k", col("decoded.lsum")))
            .cast("long").as("k_sum"),
          sum(when(col("path") === "s", col("decoded.n")))
            .cast("long").as("s_n"),
          sum(when(col("path") === "price", col("decoded.n")))
            .cast("long").as("price_n"),
          sum(when(col("path") === "price", col("decoded.lsum")))
            .cast("long").as("price_usum"),
          sum(when(col("path") === "vals.list.element", col("decoded.n")))
            .cast("long").as("vals_elems"),
          sum(when(col("path") === "vals.list.element", col("decoded.lsum")))
            .cast("long").as("vals_sum"),
          sum(when(col("path") === "p", col("decoded.n")))
            .cast("long").as("p_n"),
          min(when(col("path") === "p", col("decoded.dmn"))).as("p_mn"),
          max(when(col("path") === "p", col("decoded.dmx"))).as("p_mx"))
    }),

    // INT96 legacy-timestamp decode — the 12-byte nanos+julian layout
    // pre-Spark-3 lakes are full of. Spark's own reader still consumes
    // INT96 but its writer needs the legacy conf, so the fixture writes
    // the events timestamps through outputTimestampType=INT96; per-page
    // (n, min, max) as epoch micros roll up to DuckDB's native INT96
    // read of the same file. Stats cannot oracle this (the format
    // deprecates INT96 statistics and writers omit them) — the payload
    // decode is the only audit path, which is exactly why it exists.
    "meta_int96_values" -> ((s, dir) => {
      val out = "/tmp/graft_int96vals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val prev = s.conf.getOption("spark.sql.parquet.outputTimestampType")
      s.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      try {
        // the raw events ts infers as TIMESTAMP_NTZ (always INT64); only
        // the LTZ timestamp type routes through the INT96 legacy layout
        s.read.parquet(pq(dir, "events"))
          .select(when(col("event_id") % 17 === 0, lit(null))
            .otherwise(col("ts").cast("timestamp")).as("ts"))
          .coalesce(1)
          .write.mode("overwrite")
          .option("parquet.enable.dictionary", "false")
          .option("parquet.page.row.count.limit", "2000")
          .parquet(out)
      } finally {
        prev match {
          case Some(v) => s.conf.set("spark.sql.parquet.outputTimestampType", v)
          case None => s.conf.unset("spark.sql.parquet.outputTimestampType")
        }
      }
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"), col("type"))
      val joined = pages.join(codecs,
          Seq("filepath", "row_group_id", "column_id"))
        .filter(col("page_type") === "DATA_PAGE" && col("type") === "INT96")
      val infl = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      val i96 = ColumnBridge.column(graft.functions.PlainInt96Stats(
        ColumnBridge.expression(infl),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values"))))
      joined.select(i96.as("st"))
        .agg(sum(col("st.n")).cast("long").as("n_values"),
          min(col("st.mn")).cast("long").as("min_micros"),
          max(col("st.mx")).cast("long").as("max_micros"))
    }),

    // FIXED_LEN_BYTE_ARRAY payload decode — the physical type Spark
    // writes for decimals with precision > 18 (here decimal(20,2) →
    // 9-byte big-endian unscaled values). Per-page (n, unscaled sum)
    // through the same level walk as every v1 decode, rolled up and
    // proven against DuckDB's exact decimal arithmetic over the data;
    // nulls exercise the definition-level path. Closes the last payload
    // gap in the physical-type decode matrix.
    "meta_flba_values" -> ((s, dir) => {
      val out = "/tmp/graft_flbavals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(when(col("l_orderkey") % 13 === 0, lit(null))
          .otherwise(col("l_extendedprice").cast("decimal(20,2)")).as("price"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "2000")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
          Seq("filepath", "row_group_id", "column_id"))
        .filter(col("page_type") === "DATA_PAGE")
      val infl = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      // decimal(20,_) → FLBA type_length 9 (minimum bytes for 20 digits)
      val flba = ColumnBridge.column(graft.functions.PlainFlbaSum(
        ColumnBridge.expression(infl),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values")),
        ColumnBridge.expression(lit(9))))
      joined.select(flba.as("fs"))
        .agg(sum(col("fs.n")).cast("long").as("n_values"),
          sum(col("fs.usum")).cast("long").as("usum"))
    }),

    // NESTED (repetition-level) page decode — the LLM-pipeline default
    // layout: an `array<long>` column with nulls at BOTH levels (null
    // arrays, empty arrays, null elements) reconstructs from raw page
    // bytes alone. page_levels walks the repetition+definition blocks
    // (rep==0 counts records — v1 headers carry no row count; the
    // def-level histogram separates null array / empty array / null
    // element / present element), and the values tail after values_off
    // feeds the SAME flat decoders every other query uses. Per-page
    // record counts, list-slot counts, element counts, and the element
    // sum must equal DuckDB's len()/list_sum() over the data itself.
    "meta_nested_values" -> ((s, dir) => {
      val out = "/tmp/graft_nestedvals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null))
            .when(col("doc_id") % 11 === 1, array().cast("array<long>"))
            .otherwise(transform(sequence(lit(0L), col("doc_id") % 7),
              i => when((col("doc_id") + i) % 13 === 0, lit(null))
                .otherwise(col("doc_id") * 1000003L + i))).as("vals"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "500")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
          Seq("filepath", "row_group_id", "column_id"))
        .filter(col("column_id") === 1 && col("page_type") === "DATA_PAGE")
      val infl = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      val staged = joined.withColumn("infl", infl)
        .withColumn("lv", ColumnBridge.column(graft.functions.PageLevels(
          ColumnBridge.expression(col("infl")),
          ColumnBridge.expression(lit(1)),
          ColumnBridge.expression(lit(3)),
          ColumnBridge.expression(col("num_values")))))
      val tail = col("infl").substr(col("lv.values_off") + 1,
        length(col("infl")) - col("lv.values_off"))
      val pageSum = ColumnBridge.column(graft.functions.PlainInt64Sum(
        ColumnBridge.expression(tail)))
      staged.agg(
        sum(col("lv.n_records")).cast("long").as("n_rows"),
        sum(col("lv.def_counts").getItem(2) + col("lv.def_counts").getItem(3))
          .cast("long").as("n_slots"),
        sum(col("lv.def_counts").getItem(3)).cast("long").as("n_elems"),
        sum(pageSum).cast("long").as("val_sum"))
    }),

    // V2 data pages, dictionary half: the same value-counts contract as
    // meta_dict_values but through the v2 layout — RLE_DICTIONARY index
    // runs with NO level prefix (levels sit uncompressed ahead of the
    // values region), non-null counts straight from the v2 header's
    // num_nulls field, which also derives the NULL group.
    "meta_dict_values_v2" -> ((s, dir) => {
      val out = "/tmp/graft_dictvals2_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, lit(null).cast("string"))
            .otherwise(col("lang")).as("v"))
        .coalesce(2)
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .option("parquet.page.row.count.limit", "500")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1)
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
        Seq("filepath", "row_group_id", "column_id"))
      val levelBytes = col("def_levels_byte_length") + col("rep_levels_byte_length")
      val region = ColumnBridge.column(graft.functions.PageValuesV2(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(levelBytes.cast("int")),
        ColumnBridge.expression(when(col("values_compressed"),
          col("compression")).otherwise(lit("UNCOMPRESSED"))),
        ColumnBridge.expression(
          (col("page_uncompressed_size") - levelBytes).cast("int"))))
      val dictEx = ColumnBridge.column(graft.functions.PlainDictStrings(
        ColumnBridge.expression(ColumnBridge.column(graft.functions.PageInflate(
          ColumnBridge.expression(col("page_content")),
          ColumnBridge.expression(col("compression")),
          ColumnBridge.expression(col("page_uncompressed_size")))))))
      val idxEx = ColumnBridge.column(graft.functions.DictIndexes(
        ColumnBridge.expression(region),
        ColumnBridge.expression(lit(0)),
        ColumnBridge.expression((col("num_values") - col("num_nulls")).cast("int"))))
      val dicts = joined.filter(col("page_type") === "DICTIONARY_PAGE")
        .select(col("filepath"), col("row_group_id"), dictEx.as("dict"))
      val data = joined.filter(col("page_type") === "DATA_PAGE_V2" &&
          col("encoding") === "RLE_DICTIONARY")
        .select(col("filepath"), col("row_group_id"),
          idxEx.as("idx"), col("num_nulls"))
      val vals = data.join(dicts, Seq("filepath", "row_group_id"))
        .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
      val nulls = data
        .agg(sum(col("num_nulls")).cast("long").as("n"))
        .select(lit(null).cast("string").as("v"), col("n"))
      vals.unionByName(nulls)
    }),

    // V2 data pages, dictionary-OVERFLOW half: a high-cardinality string
    // column makes the v2 writer fall back to DELTA_BYTE_ARRAY
    // (front-coded prefixes + delta-length suffixes) — the one string
    // layout the dictionary path cannot cover. DeltaStringsExpr decodes
    // it (bit-parity-pinned against parquet-mr's own writer in
    // DeltaDecodeSpec); the decoded multiset's count/distinct/char-mass/
    // extrema must equal DuckDB's over the data. With this, every string
    // encoding a v1/v2 parquet-mr writer emits reconstructs from
    // page_content.
    "meta_v2_strings" -> ((s, dir) => {
      val out = "/tmp/graft_v2strings_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("uniq_"), col("doc_id"), lit("_"),
              col("source"))).as("v"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .option("parquet.page.row.count.limit", "400")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1)
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
        Seq("filepath", "row_group_id", "column_id"))
      val levelBytes = col("def_levels_byte_length") + col("rep_levels_byte_length")
      val region = ColumnBridge.column(graft.functions.PageValuesV2(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(levelBytes.cast("int")),
        ColumnBridge.expression(when(col("values_compressed"),
          col("compression")).otherwise(lit("UNCOMPRESSED"))),
        ColumnBridge.expression(
          (col("page_uncompressed_size") - levelBytes).cast("int"))))
      val strings = ColumnBridge.column(graft.functions.DeltaStringsExpr(
        ColumnBridge.expression(region),
        ColumnBridge.expression(col("encoding"))))
      joined.filter(col("page_type") === "DATA_PAGE_V2" &&
          col("encoding") === "DELTA_BYTE_ARRAY")
        .select(explode(strings).as("v"))
        .agg(count(lit(1)).as("n_values"),
          countDistinct(col("v")).as("n_distinct"),
          sum(length(col("v"))).cast("long").as("char_mass"),
          min(col("v")).as("v_min"), max(col("v")).as("v_max"))
    }),

    // PLAIN BYTE_ARRAY payload statistics — the dictionary-OVERFLOW v1
    // case: unique strings blow through a deliberately small dictionary
    // page mid-write, so parquet-mr keeps the already-flushed
    // dictionary-encoded pages AND falls back to PLAIN for the rest —
    // one chunk, both string layouts. The audit reconstructs every value
    // (dict pages via index→entry join, PLAIN pages via the level walk +
    // PlainDictStrings over the values tail) and pins count/byte-mass/
    // length-extrema against DuckDB's read of the same file; the unified
    // dispatcher's new string invariants (lsum = payload byte mass,
    // lmn/lmx = length extrema) must agree with the reconstruction.
    "meta_plain_strings" -> ((s, dir) => {
      val out = "/tmp/graft_plainstrings_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      // low-cardinality head, unique tail: the dictionary must COMPRESS
      // at the first page flush (all-unique values fail parquet-mr's
      // compression-satisfying check and fall back before any dict page
      // exists) and then OVERFLOW mid-chunk on the unique tail
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, lit(null).cast("string"))
            .when(col("doc_id") < 150, col("lang"))
            .otherwise(concat(lit("uniq_"), col("doc_id"), lit("_"),
              col("source"))).as("v"))
        .sort(col("doc_id")).coalesce(1)
        .write.mode("overwrite")
        .option("parquet.dictionary.page.size", "1024")
        .option("parquet.page.row.count.limit", "100")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1)
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
        Seq("filepath", "row_group_id", "column_id"))
      val raw = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      // dictionary page entries (includes the never-referenced tail the
      // writer buffered past the overflow point — reconstruction only
      // touches entries the indices actually name)
      val dictEx = ColumnBridge.column(graft.functions.PlainDictStrings(
        ColumnBridge.expression(raw)))
      val idxEx = ColumnBridge.column(graft.functions.DictIndexes(
        ColumnBridge.expression(raw),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values"))))
      // PLAIN fallback pages: def-level walk finds the values tail
      val lv = ColumnBridge.column(graft.functions.PageLevels(
        ColumnBridge.expression(raw),
        ColumnBridge.expression(lit(0)),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values"))))
      val staged = joined.withColumn("raw", raw)
      val dicts = staged.filter(col("page_type") === "DICTIONARY_PAGE")
        .select(col("filepath"), col("row_group_id"), dictEx.as("dict"))
      val dictVals = staged
        .filter(col("page_type") === "DATA_PAGE" &&
          col("encoding").isin("PLAIN_DICTIONARY", "RLE_DICTIONARY"))
        .select(col("filepath"), col("row_group_id"), idxEx.as("idx"))
        .join(dicts, Seq("filepath", "row_group_id"))
        .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("v"))
      val plainVals = staged
        .filter(col("page_type") === "DATA_PAGE" && col("encoding") === "PLAIN")
        .withColumn("lv", lv)
        .select(explode(ColumnBridge.column(graft.functions.PlainDictStrings(
          ColumnBridge.expression(col("raw").substr(col("lv.values_off") + 1,
            length(col("raw")) - col("lv.values_off")))))).as("v"))
      val recon = dictVals.unionByName(plainVals)
        .agg(count(lit(1)).cast("long").as("n_values"),
          sum(octet_length(col("v"))).cast("long").as("byte_mass"),
          min(octet_length(col("v"))).cast("long").as("len_mn"),
          max(octet_length(col("v"))).cast("long").as("len_mx"))
      // the unified dispatcher over the same pages: PLAIN_STRINGS mass
      // must equal the PLAIN reconstruction's, and both layouts must
      // actually occur (the fixture really overflowed)
      val disp = MetaValues.decodePages(s, out)
        .filter(col("path") === "v")
        .agg(
          sum(when(col("decoded.kind") === "PLAIN_STRINGS", col("decoded.lsum")))
            .cast("long").as("d_plain_mass"),
          min(when(col("decoded.kind") === "PLAIN_STRINGS", col("decoded.lmn")))
            .cast("long").as("d_plain_mn"),
          sum(when(col("decoded.kind") === "PLAIN_STRINGS", lit(1))
            .otherwise(lit(0))).as("n_plain_pages"),
          sum(when(col("decoded.kind") === "DICT_IDX", lit(1))
            .otherwise(lit(0))).as("n_dict_pages"))
      val plainMass = plainVals
        .agg(sum(octet_length(col("v"))).cast("long").as("p_mass"),
          min(octet_length(col("v"))).cast("long").as("p_mn"))
      recon.crossJoin(disp).crossJoin(plainMass)
        .select(col("n_values"), col("byte_mass"), col("len_mn"), col("len_mx"),
          (col("n_plain_pages") > 0 && col("n_dict_pages") > 0).as("both_layouts"),
          (col("d_plain_mass") === col("p_mass") &&
            col("d_plain_mn") === col("p_mn")).as("dispatcher_agrees"))
    }),

    // Post-write provenance stamping: merge pipeline metadata into an
    // export's key-value footer entries via the footer editor (parquet-mr
    // has no after-the-fact API), then prove BOTH that the stamps landed
    // and that the writer's original keys survived — via DuckDB's
    // independent parquet_kv_metadata decode of the EDITED footer.
    "meta_kv_stamp" -> ((s, dir) => {
      val out = "/tmp/graft_kvstamp_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("source"))
        .coalesce(1).write.mode("overwrite").parquet(out)
      FooterEdit.setKeyValueDir(out, Map(
        "graft.pipeline" -> "round9", "graft.snapshot" -> "2026-08-14"))
      meta(s, out, "file", Map("footercache" -> "false"))
        .select(explode(col("key_value_metadata")))
        .select(col("key"), col("value"))
    }),

    // MULTI-column page-skip report: the row-range INTERSECTION a
    // page-index-aware reader applies to a conjunction (parquet-mr's
    // ColumnIndexFilter semantics). Pages of different columns do not
    // align, so per predicate the needed pages induce row ranges and a
    // row must fall in EVERY union — computed with an event sweep, zero
    // data pages read. The ascending/descending two-column layout makes
    // the conjunction's coverage strictly smaller than either predicate
    // alone; the oracle re-derives it from the data as the page-set
    // INTERSECT under the pinned 1000-row page layout.
    "meta_page_skip_multi" -> ((s, dir) => {
      val out = "/tmp/graft_pageskip2_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .select(col("id").as("a"), (lit(19999L) - col("id")).as("b"))
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      MetaPrune.pageSkipReportMulti(s, out,
          Seq(("a", 3500L, 7200L), ("b", 15000L, 17999L)))
        .select(col("row_group_id").cast("long").as("row_group_id"),
          col("rows_total"), col("rows_covered"))
    }),

    // BOOLEAN page decode: v1 PLAIN packs booleans one bit per value
    // LSB-first behind the definition-level block — BoolTrueCount walks
    // levels (null-aware) and counts set bits; rolled up, the TRUE count
    // and total value count must equal the data's. Through real snappy
    // compression via PageInflate; the v2 RLE boolean form is spec-pinned
    // (PhysicalDecodeSpec runs both writer versions).
    "meta_bool_values" -> ((s, dir) => {
      val out = "/tmp/graft_boolvals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, lit(null).cast("boolean"))
            .otherwise(col("doc_id") % 3 === 0).as("b"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "400")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1 && col("page_type").startsWith("DATA_PAGE"))
      val payload = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(lit("SNAPPY")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      val trues = ColumnBridge.column(graft.functions.BoolTrueCount(
        ColumnBridge.expression(payload),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values")),
        ColumnBridge.expression(col("encoding"))))
      pages.agg(sum(trues).as("n_true"),
        sum(col("num_values")).cast("long").as("n_values"))
    }),

    // FLOAT/DOUBLE page decode: PLAIN FP pages are 4/8-byte little-endian
    // IEEE values behind the level block; count/min/max are the
    // order-INDEPENDENT invariants a floating decode can check exactly
    // (a floating sum would be order-dependent). PlainFpStats decodes
    // per page; the global roll-up must equal DuckDB's count/min/max of
    // the column. Values avoid zeros so ±0.0 rendering cannot diverge.
    "meta_fp_values" -> ((s, dir) => {
      val out = "/tmp/graft_fpvals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 9 === 0, lit(null).cast("double"))
            .otherwise(col("doc_id") * 0.25 + 0.125).as("v"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "400")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1 &&
          col("page_type").startsWith("DATA_PAGE") && col("encoding") === "PLAIN")
      val payload = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(lit("SNAPPY")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      val st = ColumnBridge.column(graft.functions.PlainFpStats(
        ColumnBridge.expression(payload),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values")),
        ColumnBridge.expression(lit("DOUBLE"))))
      pages.select(st.as("st"))
        .agg(sum(col("st.n")).cast("long").as("n_values"),
          min(col("st.mn")).as("v_min"), max(col("st.mx")).as("v_max"))
    }),

    // BYTE_STREAM_SPLIT page decode: the FP encoding that stores byte
    // plane j of every value contiguously (compresses similar floats).
    // parquet-mr 1.16 exposes it only through the writer BUILDER (no
    // Spark option), and Spark's vectorized reader cannot materialize
    // such columns at all — while this metadata-level decode (and DuckDB,
    // which oracles it) can: the transposed read reconstructs the same
    // (count, min, max) invariants PLAIN pages pin.
    "meta_bss_values" -> ((s, dir) => {
      val out = "/tmp/graft_bssvals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val od = new java.io.File(out)
      od.mkdirs()
      od.listFiles().foreach(_.delete())
      graft.meta.RowGroupWriter.writeDoubleFile(s"$out/f.parquet",
        (0 until 5000).map(i =>
          if (i % 9 == 0) None else Some(i * 0.25 + 0.125)),
        byteStreamSplit = true)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("page_type").startsWith("DATA_PAGE") &&
          col("encoding") === "BYTE_STREAM_SPLIT")
      val st = ColumnBridge.column(graft.functions.BssFpStats(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values")),
        ColumnBridge.expression(lit("DOUBLE"))))
      pages.select(st.as("st"))
        .agg(sum(col("st.n")).cast("long").as("n_values"),
          min(col("st.mn")).as("v_min"), max(col("st.mx")).as("v_max"))
    }),

    // Page CRC audit: parquet headers carry an optional CRC-32 over each
    // page's binary data exactly as written (compressed bytes, header
    // excluded), which parquet-mr populates by default — so recomputing
    // java.util.zip.CRC32 over page_content and comparing against the
    // decoded header field is a FULL data-integrity scan at metadata
    // cost, the audit storage teams run after migrations. Closed form:
    // every page carries a crc and every crc verifies (page count derived
    // from the deterministic 1000-row page layout). The snappy-compressed
    // default layout is deliberate — it proves the checksum covers the
    // compressed representation. Detection of actual corruption is
    // spec-pinned (PageCrcSpec flips a byte and the mismatch surfaces).
    "meta_page_crc" -> ((s, dir) => {
      val out = "/tmp/graft_pagecrc_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      val crcOk = ColumnBridge.column(graft.functions.BytesCrc32(
          ColumnBridge.expression(col("page_content")))) ===
        col("crc").cast("long").bitwiseAND(lit(0xFFFFFFFFL))
      meta(s, out, "page", Map("pagecontent" -> "true"))
        .agg(count(lit(1)).as("n_pages"),
          sum(when(col("crc").isNotNull, 1L).otherwise(0L)).as("n_with_crc"),
          sum(when(col("crc").isNotNull && crcOk, 1L).otherwise(0L))
            .as("n_verified"))
    }),

    // Dictionary-INDEXED data pages decoded to full value sequences on
    // the TRUE DEFAULT layout — snappy-compressed, dictionary-encoded,
    // exactly what `df.write.parquet(...)` produces — where
    // meta_page_values pinned a deliberately dictionary-free uncompressed
    // one. Per page: PageInflate (codec from the chunk's footer entry,
    // size from the page header) recovers the raw payload, the
    // DICTIONARY_PAGE decodes to the value list (PlainDictStrings), each
    // DATA_PAGE walks def-levels + RLE/bit-packed index runs
    // (DictIndexes, bit-parity-pinned against parquet-mr's encoder);
    // composed, the per-value COUNTS must equal the group-by DuckDB
    // computes from the data — including the NULL group, derived as
    // header num_values minus decoded indexes. Every data page byte
    // accounted for by value, through real compression.
    "meta_dict_values" -> ((s, dir) => {
      val out = "/tmp/graft_dictvals_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("source")).as("v"))
        .coalesce(2)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "500")
        .parquet(out)
      val pages = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("column_id") === 1) // (doc_id, v) => v is column 1
      val codecs = meta(s, out, "column")
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs,
        Seq("filepath", "row_group_id", "column_id"))
      val raw = ColumnBridge.column(graft.functions.PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size"))))
      val dictEx = ColumnBridge.column(graft.functions.PlainDictStrings(
        ColumnBridge.expression(raw)))
      val idxEx = ColumnBridge.column(graft.functions.DictIndexes(
        ColumnBridge.expression(raw),
        ColumnBridge.expression(lit(1)),
        ColumnBridge.expression(col("num_values"))))
      val dicts = joined.filter(col("page_type") === "DICTIONARY_PAGE")
        .select(col("filepath"), col("row_group_id"), dictEx.as("dict"))
      val data = joined.filter(col("page_type").startsWith("DATA_PAGE") &&
          col("encoding").isin("PLAIN_DICTIONARY", "RLE_DICTIONARY"))
        .select(col("filepath"), col("row_group_id"),
          idxEx.as("idx"), col("num_values"))
      val vals = data.join(dicts, Seq("filepath", "row_group_id"))
        .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
      val nulls = data
        .agg((sum(col("num_values")) - sum(size(col("idx")))).cast("long").as("n"))
        .select(lit(null).cast("string").as("v"), col("n"))
      vals.unionByName(nulls)
    }),

    // Level-to-level join on filepath: parquet-file footer totals vs the
    // rowgroup-level sum — the cross-level consistency query.
    "meta_join" -> ((s, dir) => {
      val f = meta(s, pq(dir, "lineitem"), "file")
        .select(col("filepath"), col("filename"), col("num_rows"))
      val rg = meta(s, pq(dir, "lineitem"), "rowgroup")
        .groupBy(col("filepath"))
        .agg(sum(col("num_rows")).as("rg_rows"),
          count(lit(1)).as("n_row_groups"))
      f.join(rg, "filepath")
        .select(col("filename"), col("num_rows"), col("rg_rows"), col("n_row_groups"))
    }),

    // Filter + aggregate over the column level (delegated-capability demo).
    "meta_filter_agg" -> ((s, dir) =>
      meta(s, pq(dir, "lineitem"), "column")
        .filter(col("type") === "INT64")
        .agg(count(lit(1)).as("n_chunks"), sum(col("num_values")).as("n_values"))),

    // Whole-directory scan: one footer row per table file.
    "meta_multifile" -> ((s, dir) =>
      meta(s, dir, "file")
        .select(col("filename"), col("num_rows"),
          col("num_row_groups").cast("long").as("num_row_groups"))),

    // Metadata joined against the data it describes.
    "meta_vs_data" -> ((s, dir) => {
      val metaRows = meta(s, pq(dir, "orders"), "rowgroup")
        .agg(sum(col("num_rows")).as("meta_rows"))
      val dataRows = s.read.parquet(pq(dir, "orders"))
        .agg(count(lit(1)).as("data_rows"))
      metaRows.crossJoin(dataRows)
    }),

    // One-row table health report: file/rowgroup/byte totals and the
    // overall compression ratio, the at-a-glance summary a table owner
    // asks for first.
    "meta_report" -> ((s, dir) => {
      val cols = meta(s, pq(dir, "lineitem"), "column")
      cols.agg(
        countDistinct(col("row_group_id")).as("n_row_groups"),
        count(lit(1)).as("n_chunks"),
        sum(col("total_compressed_size")).as("compressed_bytes"),
        sum(col("total_uncompressed_size")).as("uncompressed_bytes"),
        floor(sum(col("total_uncompressed_size")).cast("double") /
          sum(col("total_compressed_size")).cast("double") * 10000.0d).as("ratio_x10k"))
    }),

    // Stats-driven pruned data scan: footer min/max statistics select the
    // files a range predicate needs (MetaPrune), then the predicate runs
    // on the survivors — metadata accelerating the data it describes. The
    // result must equal the plain filtered scan (pruning is sound).
    "meta_prune_scan" -> ((s, dir) =>
      MetaPrune.readPruned(s, pq(dir, "lineitem"), "l_orderkey", 100L, 500L)
        .filter(col("l_orderkey") >= 100L && col("l_orderkey") <= 500L)
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"))),

    // DATE-typed pruning: lay orders out date-clustered (range partition by
    // order date -> each file covers a narrow date span, the layout any
    // time-series table converges to), then answer a two-month window by
    // opening only the files whose INT32 epoch-day footer stats admit it.
    // The oracle recomputes the window from ALL written files with an
    // independent engine — equality proves pruning dropped no rows; the
    // MetaPruneSpec proves it drops files.
    "meta_prune_date" -> ((s, dir) => {
      val out = "/tmp/graft_prune_date_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "orders"))
        .select(to_date(col("o_orderdate")).as("od"), col("o_orderkey"))
        .repartitionByRange(6, col("od"))
        .write.mode("overwrite").parquet(out)
      val lo = java.time.LocalDate.parse("1996-03-01")
      val hi = java.time.LocalDate.parse("1996-08-31")
      MetaPrune.readPrunedDate(s, out, "od", lo, hi)
        .filter(col("od") >= lit(java.sql.Date.valueOf(lo)) &&
          col("od") <= lit(java.sql.Date.valueOf(hi)))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("o_orderkey")), lit(0L)).as("key_sum"))
    }),

    // String-prefix pruning over the typed BINARY min/max stats (unsigned
    // lexicographic byte order on both the parquet and the Spark side —
    // the whole admit check is built-in binary comparisons, no decode
    // expression). Prefix "src1" covers src1 and src10..src19, exercising
    // the [prefix, nextPrefix) upper bound.
    "meta_prune_prefix" -> ((s, dir) => {
      val out = "/tmp/graft_prune_prefix_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("source"))
        .repartitionByRange(5, col("source"))
        .write.mode("overwrite").parquet(out)
      MetaPrune.readPrunedPrefix(s, out, "source", "src1")
        .filter(col("source").startsWith("src1"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // DECIMAL pruning: prices as DECIMAL(20,2) force the
    // FIXED_LEN_BYTE_ARRAY physical encoding (precision > 18), whose stats
    // are big-endian two's complement — the PlainStatUnscaled decode path;
    // bounds are unscaled at the declared scale (1000.00 -> 100000).
    "meta_prune_decimal" -> ((s, dir) => {
      val out = "/tmp/graft_prune_decimal_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "lineitem"))
        .select(col("l_orderkey"),
          col("l_extendedprice").cast("decimal(20,2)").as("price"))
        .repartitionByRange(6, col("price"))
        .write.mode("overwrite").parquet(out)
      MetaPrune.readPrunedUnscaled(s, out, "price", 100000L, 500000L)
        .filter(col("price") >= lit(BigDecimal("1000.00")) &&
          col("price") <= lit(BigDecimal("5000.00")))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("l_orderkey")), lit(0L)).as("key_sum"))
    }),

    // Bloom-filter decode proven against the data it guards: write the
    // documents keys with split-block bloom filters, then probe EVERY
    // value actually present in each file through that file's decoded
    // bitset — the filter's no-false-negative guarantee makes the hit
    // count a closed form the oracle recomputes from the data alone
    // (n_hits == n_probes == distinct (file, value) pairs). Probes are one
    // codegen pass (SbbfHash -> SbbfMightContain), no driver loop.
    "meta_bloom_probe" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_probe_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("source"))
        .repartition(4, col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "50000")
        .option("parquet.bloom.filter.enabled#source", "true")
        .option("parquet.bloom.filter.expected.ndv#source", "64")
        // parquet-mr skips blooms for fully dictionary-encoded chunks
        // (the dictionary is already an exact filter): disable dictionary
        // so every chunk carries one
        .option("parquet.enable.dictionary#doc_id", "false")
        .option("parquet.enable.dictionary#source", "false")
        .parquet(out)
      val fname = (c: Column) => regexp_extract(c, "[^/]+$", 0)
      val hash = (c: Column) => ColumnBridge.column(graft.functions.SbbfHash(
        ColumnBridge.expression(c)))
      val probe = (b: Column, h: Column) => ColumnBridge.column(
        graft.functions.SbbfMightContain(
          ColumnBridge.expression(b), ColumnBridge.expression(h)))
      val blooms = meta(s, out, "bloomfilter")
        .select(fname(col("filepath")).as("fname"), col("path"), col("bitset"))
      val data = s.read.parquet(out)
        .select(fname(input_file_name()).as("fname"), col("doc_id"), col("source"))
      val probes = data
        .select(col("fname"), lit("doc_id").as("colname"), hash(col("doc_id")).as("h"))
        .union(data.select(col("fname"), lit("source").as("colname"),
          hash(col("source")).as("h")))
        .distinct()
      // a multi-rowgroup file carries one bloom per row group; a value
      // present in the FILE must hit in at least one of them
      probes.join(blooms,
          probes("fname") === blooms("fname") && probes("colname") === blooms("path"))
        .groupBy(probes("fname"), col("colname"), col("h"))
        .agg(max(probe(col("bitset"), col("h"))).as("hit"))
        .groupBy(col("colname"))
        .agg(countDistinct(col("fname")).as("n_files"),
          count(lit(1)).as("n_probes"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
    }),

    // Bloom-accelerated point lookup: a hash-scattered layout (every
    // file's [min, max] spans every probe, so footer stats prune NOTHING)
    // where certain-absence bitset probes still open only the files that
    // may hold the key — the selective point read a 100 TB table actually
    // serves. The oracle recomputes the lookup over ALL written files;
    // equality proves bloom pruning dropped no rows (BloomFilterSpec
    // proves it drops files).
    "bloom_prune_scan" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_prune_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .repartition(6, col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "50000")
        .option("parquet.enable.dictionary#doc_id", "false")
        .parquet(out)
      MetaPrune.readPrunedEqLong(s, out, "doc_id", 4321L)
        .filter(col("doc_id") === 4321L)
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_sum"))
    }),

    // Size statistics (parquet-format 2.10) proven against the data: the
    // footer's unencoded BYTE_ARRAY payload bytes — the logical string
    // volume, independent of encoding/compression choices — must equal
    // the engine-independent sum of octet lengths over the column
    // itself, per string column. n_nulls sums the level-0
    // definition-histogram counts where a writer emits them (parquet-mr
    // omits histograms for flat schemas, so here the sum must land on
    // the same 0 the oracle derives from the null-free corpus).
    // (fixture re-written by Spark: the pyarrow-written testdata predates
    // SizeStatistics, which a pre-2.10 writer simply omits — itself
    // covered by the zero-rows contract in MetadataSourceSpec)
    "meta_size_stats" -> ((s, dir) => {
      val out = "/tmp/graft_sizestats_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .coalesce(2)
        .write.mode("overwrite").parquet(out)
      meta(s, out, "sizestats")
        .filter(col("type") === "BYTE_ARRAY")
        .groupBy(col("path"))
        .agg(sum(col("unencoded_byte_array_bytes")).as("unenc_bytes"),
          sum(col("num_values")).as("n_values"),
          sum(coalesce(element_at(col("definition_level_histogram"), 1), lit(0L)))
            .as("n_nulls"))
    }),

    // Key-value metadata surfaced as rows: the footer's application
    // annotations (pyarrow writes 'pandas' + 'ARROW:schema' here, Spark
    // writes its row-schema JSON) exploded from the parquet-file level's
    // map — compared byte-for-byte against DuckDB's independent
    // parquet_kv_metadata() decode of the same footer.
    "meta_kv" -> ((s, dir) =>
      meta(s, pq(dir, "documents"), "file")
        .select(explode(col("key_value_metadata")))
        .select(col("key"), col("value"))),

    // Dictionary pages decoded to their VALUE LISTS: for a fully
    // dictionary-encoded column every row group's dictionary page IS its
    // distinct-value list, so the union of decoded entries must equal the
    // data-side DISTINCT the oracle computes without ever parsing a page.
    // Proves the page-content byte walk AND the PLAIN BYTE_ARRAY layout
    // decode (<u32 LE length><bytes>), not just page accounting.
    "meta_dict" -> ((s, dir) => {
      val out = "/tmp/graft_dict_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents")).select(col("source"))
        .repartition(3)
        // uncompressed so page_content is the PLAIN payload itself
        .write.mode("overwrite").option("compression", "none").parquet(out)
      val dicts = meta(s, out, "page", Map("pagecontent" -> "true"))
        .filter(col("page_type") === "DICTIONARY_PAGE")
        .select(col("page_content"))
      dicts.select(explode(ColumnBridge.column(graft.functions.PlainDictStrings(
          ColumnBridge.expression(col("page_content"))))).as("v"))
        .distinct()
    }),

    // Batch point lookup (the fetch-these-N-keys shape): an IN-list over
    // a hash-scattered layout prunes through ONE metadata pass whose
    // per-chunk check is a builtin EXISTS over the codegen bloom probe —
    // N probes per bitset, no join, no per-value rescan. The oracle
    // recomputes the IN-list aggregate over all written files; equality
    // proves no key's file was dropped.
    "bloom_prune_in" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_in_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("n_chars"))
        .repartition(6, col("doc_id"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#doc_id", "true")
        .option("parquet.bloom.filter.expected.ndv#doc_id", "50000")
        .option("parquet.enable.dictionary#doc_id", "false")
        .parquet(out)
      val keys = Seq(101L, 4321L, 7777L, 12345L)
      MetaPrune.readPrunedInLong(s, out, "doc_id", keys)
        .filter(col("doc_id").isin(keys: _*))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_sum"))
    }),

    // INT32 bloom point lookup: same hash-scattered shape as
    // bloom_prune_scan but the key is a 4-byte physical type, whose plain
    // encoding hashes DIFFERENTLY than the same value as INT64 — this is
    // the type-parity path (Sbbf.hashInt, bit-pinned against parquet-mr in
    // BloomFilterSpec) exercised end-to-end through written files.
    "bloom_prune_int" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_int_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id").cast("int").as("k"), col("n_chars"))
        .repartition(6, col("k"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "50000")
        .option("parquet.enable.dictionary#k", "false")
        .parquet(out)
      val keys = Seq(202, 4321, 9876)
      MetaPrune.readPrunedInInt(s, out, "k", keys)
        .filter(col("k").isin(keys: _*))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_sum"))
    }),

    // DECIMAL (FLBA) bloom point lookup: decimal ids with precision > 18
    // live as 9-byte big-endian unscaled values, and parquet hashes that
    // exact fixed-width encoding — the finance-shaped selective lookup.
    // Hash-scattered layout defeats min/max stats, so surviving files
    // come from the bloom side (Sbbf.hashUnscaled, bit-pinned against
    // parquet-mr in BloomFilterSpec) through written files end-to-end.
    "bloom_prune_decimal" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_dec_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select((col("doc_id").cast("decimal(18,2)") +
            lit(java.math.BigDecimal.valueOf(0.25)))
          .cast("decimal(20,2)").as("k"), col("n_chars"), col("doc_id"))
        .repartition(6, col("doc_id")).drop("doc_id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "50000")
        .parquet(out)
      val ids = Seq(202L, 4321L, 9876L)
      val unscaled = ids.map(_ * 100 + 25) // decimal(20,2): value * 100
      val probes = ids.map(i => java.math.BigDecimal.valueOf(i).add(
        java.math.BigDecimal.valueOf(0.25)))
      MetaPrune.readPrunedInDecimal(s, out, "k", unscaled, 9)
        .filter(col("k").isin(probes: _*))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_sum"))
    }),

    // DOUBLE bloom point lookup: floating-point probes carry two hazards
    // integer ones do not — NaN bounds in stats (kept via an explicit
    // guard) and ±0.0 hashing as two distinct plain encodings (a zero
    // probe checks both). The probe values are exact binary fractions so
    // the oracle's literal comparison is bit-identical.
    "bloom_prune_double" -> ((s, dir) => {
      val out = "/tmp/graft_bloom_dbl_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .select((col("doc_id") * lit(0.25d)).as("v"), col("n_chars"),
          col("doc_id"))
        .repartition(6, col("doc_id")).drop("doc_id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#v", "true")
        .option("parquet.bloom.filter.expected.ndv#v", "50000")
        .option("parquet.enable.dictionary#v", "false")
        .parquet(out)
      val vals = Seq(50.5d, 1080.25d, 2469.0d)
      MetaPrune.readPrunedInDouble(s, out, "v", vals)
        .filter(col("v").isin(vals: _*))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("chars_sum"))
    }),

    // End-to-end export audit: write a Hive-partitioned training export
    // (one file per partition via repartition-by-key), then build its
    // MANIFEST — files, rows, bytes per partition — from OUR OWN metadata
    // source scanning the freshly written footers; the oracle re-derives
    // the same manifest by reading the data files with an independent
    // engine. The close-the-loop shape every 100 TB export needs: the
    // audit costs footer reads, not a data rescan.
    "export_manifest" -> ((s, dir) => {
      // path keyed by scale dir so a bench/audit run at another sf cannot
      // overwrite the export the (sf0.01-pinned) oracle reads
      val out = "/tmp/graft_export_manifest_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      meta(s, out, "rowgroup")
        .withColumn("lang",
          regexp_extract(col("filepath"), "lang=([^/]+)", 1))
        .groupBy(col("lang"))
        .agg(countDistinct(col("filepath")).as("n_files"),
          sum(col("num_rows")).as("n_rows"))
    }),

    // Size-targeted output compaction audited from its own footers: the
    // planned-stats sizing (no sampling job, no extra shuffle) writes the
    // documents table toward 256 KB files; the manifest — file count and
    // total rows — is then read from OUR metadata source and the oracle
    // re-derives it from the written files with an independent engine.
    "sized_write" -> ((s, dir) => {
      val out = "/tmp/graft_sized_write_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      Bucketing.writeSized(s.read.parquet(pq(dir, "documents")), out,
        targetBytes = 256L << 10)
      meta(s, out, "rowgroup")
        .agg(countDistinct(col("filepath")).as("n_files"),
          sum(col("num_rows")).as("n_rows"))
    }),

    // Bucketed-layout join: both sides written ONCE as parquet tables
    // bucketed on the join key (Bucketing.writeBucketed), then joined with
    // NO exchange on either side (plan-asserted in BucketingSpec) — the
    // write-once/never-reshuffle fact-table layout. The oracle recomputes
    // the same join from the raw tables, pinning that the bucketed
    // round-trip loses and alters nothing.
    "bucketed_join" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val ct = freshTable(s, "graft_bucketed_customer_" + suffix)
      val ot = freshTable(s, "graft_bucketed_orders_" + suffix)
      Bucketing.writeBucketed(s.read.parquet(pq(dir, "customer")),
        "c_custkey", buckets = 8, table = ct)
      Bucketing.writeBucketed(s.read.parquet(pq(dir, "orders"))
        .withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey", buckets = 8, table = ot)
      s.table(ot).join(s.table(ct), Seq("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),

    // Page-index read-back vs the data it indexes: write a file with a
    // pinned page layout (exactly 1000 rows per page — the row-count limit
    // is checked per record by parquet-mr, unlike the approximate byte
    // threshold), then reconstruct each page's [min,max] from the
    // COLUMN INDEX only (codegen PlainStatLong decode of the raw stat
    // bytes). The oracle derives the same spans by scanning the DATA with
    // an independent engine — the index is pinned against the rows it
    // promises to describe, byte-decoded, never trusted.
    "meta_page_index" -> ((s, dir) => {
      val out = "/tmp/graft_pageindex_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.range(0, 20000, 1, 1)
        .write.mode("overwrite")
        .option("parquet.page.row.count.limit", "1000")
        .parquet(out)
      val statLong = (c: Column) => ColumnBridge.column(
        graft.functions.PlainStatLong(ColumnBridge.expression(c),
          ColumnBridge.expression(lit("INT64"))))
      meta(s, out, "columnindex")
        .filter(col("column_id") === 0 && !col("null_page"))
        .select(col("page_id").cast("long").as("page"),
          statLong(col("min_value")).as("min_id"),
          statLong(col("max_value")).as("max_id"))
    }),

    // ----- delegated relational capabilities (Catalyst-native plans) -----
    "q1_agg" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("count_order"))
    }),

    "q3_topk" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer")).filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(pq(dir, "orders"))
      val l = s.read.parquet(pq(dir, "lineitem"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q5_join" -> ((s, dir) => {
      val n = s.read.parquet(pq(dir, "nation"))
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      val l = s.read.parquet(pq(dir, "lineitem"))
      val su = s.read.parquet(pq(dir, "supplier"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),

    "win_rank" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"), col("o_orderkey"))
    }),

    "win_sessions" -> ((s, dir) => {
      // exact integer gap arithmetic over eventsNs's epoch-nanos ts
      val e = eventsNs(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > 1800L * 1000000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Correlated subquery (Catalyst decorrelates to an aggregate + join):
    // orders priced above 1.5x their customer's average. The comparison is
    // cross-multiplied in exact decimals, so no division order-dependence.
    "q_corr_subquery" -> ((s, dir) => {
      s.read.parquet(pq(dir, "orders")).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT CAST(count(*) AS LONG) AS n_above
        FROM orders_v o
        WHERE (SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey) *
            CAST(o.o_totalprice AS DECIMAL(28,6)) * 2 >
          (SELECT sum(CAST(i.o_totalprice AS DECIMAL(28,6)))
           FROM orders_v i WHERE i.o_custkey = o.o_custkey) * 3""")
    }),

    // Moving-frame window: trailing-3 revenue per supplier over ship dates.
    "win_moving" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem")).filter(col("l_suppkey") < 20)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, 0)
      l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).over(w).cast("double").as("trailing_rev"))
    }),

    "cube_rollup" -> ((s, dir) =>
      s.read.parquet(pq(dir, "orders"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n_orders"), col("total_price"))),

    "q_percentiles" -> ((s, dir) =>
      s.read.parquet(pq(dir, "lineitem"))
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5, 0.9))").getItem(0).as("p50"),
          expr("percentile(l_extendedprice, array(0.5, 0.9))").getItem(1).as("p90"),
          count(lit(1)).as("n"))),

    "semi_join" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_customers_with_orders"))
    }),

    "set_except" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer")).select(col("c_custkey").as("k"))
      val o = s.read.parquet(pq(dir, "orders")).select(col("o_custkey").as("k"))
      c.except(o).agg(count(lit(1)).as("n_customers_without_orders"))
    }),

    "distinct_agg" -> ((s, dir) => {
      val su = s.read.parquet(pq(dir, "supplier"))
      val n = s.read.parquet(pq(dir, "nation"))
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(countDistinct(col("s_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_rows"))
    }),

    // ----- LLM-data-pipeline: dedup ------------------------------------
    // Exact dedup over a corpus with planted duplicate texts: one
    // hash-aggregate on the text key.
    "dedup_exact" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
      Dedup.exact(corpus, col("text"), col("doc_id"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_total"),
          sum(col("rep_id")).as("rep_id_sum"))
    }),

    // MinHash + banded-LSH near-dup detection, verified by exact token-set
    // equality. Identical token sets -> identical signatures -> guaranteed
    // LSH recall at J=1, so the candidate-join result equals the oracle's
    // exact all-pairs answer while the plan stays a bucketed equi-join.
    "dedup_minhash" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      // 4 bands x 16 rows: candidate threshold (1/4)^(1/16) ~= 0.92, so the
      // bucket join stays sparse on vocabulary-dense corpora while recall at
      // J=1 (identical sets -> identical signatures) remains exactly 1.
      // Only a 64-bit hash of the token set rides the band shuffle (three
      // longs per band row, not the set itself); the candidate pairs are
      // tiny by construction, so EXACT set equality is re-verified by
      // broadcasting them back against the corpus — same result, a
      // fraction of the shuffle bytes.
      val withH = corpus.withColumn("wsh", xxhash64(col("ws")))
      val sigs = Dedup.minhashSignatures(withH, col("doc_id"), col("ws"),
        carry = Seq(col("wsh")))
      val bands = Dedup.lshBands(sigs, bands = 4, rowsPerBand = 16)
      val pairs = Dedup.candidatePairs(bands, extraKeys = Seq("wsh"))
      exactPairAgg(corpus.select(col("doc_id"), col("ws")), "doc_id", "ws", pairs)
    }),

    // Duplicate-cluster statistics: identical-token-set groups with sizes
    // and representatives — one hash-aggregate on the set key.
    "dedup_clusters" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      corpus.groupBy(col("ws"))
        .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("rep_id"))
        .filter(col("cluster_size") > 1)
        .agg(count(lit(1)).as("n_clusters"),
          coalesce(sum(col("cluster_size")), lit(0L)).as("n_dup_docs"),
          coalesce(max(col("cluster_size")), lit(0L)).as("max_cluster"),
          coalesce(sum(col("rep_id")), lit(0L)).as("rep_sum"))
    }),

    // SimHash dedup: 64-bit signature equi-join. The self-join carries only
    // (id, simhash, xxhash64(text)) — three longs per row, not the document
    // text — and the (rare) signature+hash-equal candidates are re-verified
    // for EXACT text equality by fetching both texts through broadcast joins
    // of the tiny pair set against the corpus. No false positives (exact
    // final check), no false negatives (equal texts always hash equal), and
    // the wide column never rides a shuffle.
    "dedup_simhash" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      val sh = Dedup.simhash64(corpus, col("doc_id"), col("ws"))
      val keyed = sh.join(
        corpus.select(col("doc_id").as("sh_id"), xxhash64(col("text")).as("th")), "sh_id")
      val l = keyed.select(col("sh_id").as("a_id"), col("simhash").as("h_a"), col("th").as("th_a"))
      val r = keyed.select(col("sh_id").as("b_id"), col("simhash").as("h_b"), col("th").as("th_b"))
      val pairs = l.join(r,
        col("h_a") === col("h_b") && col("th_a") === col("th_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      exactPairAgg(corpus.select(col("doc_id"), col("text")), "doc_id", "text", pairs)
    }),

    // Cross-corpus dedup: scrub an incoming corpus B against reference
    // corpus A (the new-crawl-vs-already-trained shape). B = 30 exact
    // copies of A docs (shifted ids) + 20 A docs made unique by a
    // per-doc suffix token. Banded cross-equi-join candidates (hash-only
    // carry), broadcast exact token-set verification -> the 30 copies,
    // exactly, DuckDB-checkable.
    "dedup_cross" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val b = d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
        .union(d.filter(col("doc_id") >= 30 && col("doc_id") < 50)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" uniquesuffix"), col("doc_id").cast("string")).as("text")))
      def bands(df: DataFrame): DataFrame = {
        val c = df.withColumn("ws", TextOps.tokenSet(col("text")))
          .withColumn("wsh", xxhash64(col("ws")))
        Dedup.lshBands(
          Dedup.minhashSignatures(c, col("doc_id"), col("ws"), carry = Seq(col("wsh"))),
          bands = 4, rowsPerBand = 16)
      }
      val pairs = Dedup.crossCandidatePairs(bands(d), bands(b), extraKeys = Seq("wsh"))
      val va = d.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val vb = b.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val withA = va.join(broadcast(pairs), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      vb.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("b_id")).distinct()
        .agg(count(lit(1)).as("n_dup_docs"),
          coalesce(sum(col("b_id")), lit(0L)).as("id_sum"))
    }),

    // Incremental dedup against a PERSISTED band store: the reference
    // corpus's LSH bands are written once as a parquet table bucketed by
    // band hash (zero store-side shuffle on every future scrub,
    // plan-asserted in DedupStoreSpec), then an increment with planted
    // exact copies (docs <20, +400000) and near-miss edits (20..39,
    // unique suffix) scrubs against it. Candidates exact-verify by
    // token-set equality over the broadcast candidate set.
    "dedup_store_scrub" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_band_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      Dedup.writeBandStore(d, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      val inc = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text"))
        .union(d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
          .select((col("doc_id") + 400000L).as("doc_id"),
            concat(col("text"), lit(" storesuffix"), col("doc_id").cast("string")).as("text")))
      val pairs = Dedup.scrubAgainstBandStore(s, tbl, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
      val va = d.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val vb = inc.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val withA = va.join(broadcast(pairs), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      vb.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("b_id")).distinct()
        .agg(count(lit(1)).as("n_dup_docs"),
          coalesce(sum(col("b_id")), lit(0L)).as("id_sum"))
    }),

    // Transitive duplicate clustering: near-dup pairs only say "a ~ b";
    // the group a pipeline keeps ONE representative of is a connected
    // component of the duplicate graph (a~b, b~c => {a,b,c}). Edges are
    // exact-duplicate pairs (token-set-hash equi-join, exact verification
    // by broadcasting the tiny candidate set — only longs ride the
    // shuffle) plus a chain relation (doc_id -> doc_id+1 within runs of
    // five) that forces MULTI-HOP transitivity, which pairwise dedup
    // queries never exercise. Components via alternating large-star/
    // small-star — O(log n) rounds regardless of component diameter.
    "dedup_cc" -> ((s, dir) => {
      // Tokenize ONCE: the set column is consumed by three separate scans
      // (hash self-join plus two verification joins); without the
      // materialization each scan would re-run the tokenizer over the
      // corpus. persist keeps it lineage-backed and freeable.
      val sets = plantedCorpus(s, dir)
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hashes = sets.select(col("doc_id"), xxhash64(col("ws")).as("wsh"))
      val cand = hashes.select(col("doc_id").as("a_id"), col("wsh").as("h_a"))
        .join(hashes.select(col("doc_id").as("b_id"), col("wsh").as("h_b")),
          col("h_a") === col("h_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      val withA = sets.join(broadcast(cand), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      val dupEdges = sets.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val chainEdges = sets
        .filter(col("doc_id") < 299 && col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("src"), (col("doc_id") + 1L).as("dst"))
      val cc = ConnectedComponents.run(dupEdges.union(chainEdges), "src", "dst")
      cc.groupBy(col("component")).agg(count(lit(1)).as("csize"))
        .agg(count(lit(1)).as("n_components"),
          coalesce(sum(col("csize")), lit(0L)).as("n_nodes"),
          coalesce(max(col("csize")), lit(0L)).as("max_size"),
          coalesce(sum(col("component")), lit(0L)).as("comp_id_sum"))
    }),

    // Graph centrality for corpus quality weighting: exact-integer
    // PageRank over the symmetrized customer-supplier trade graph (the
    // web-pipeline shape: rank the link graph, weight documents by their
    // page's centrality). Fixed-point long arithmetic end to end, so three
    // distributed iterations are bit-identical to the oracle's unrolled
    // SQL replay — no float summation order anywhere.
    "pagerank" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders")).select(col("o_orderkey"), col("o_custkey"))
      val l = s.read.parquet(pq(dir, "lineitem")).select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.run(edges, "src", "dst", iters = 3)
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // Mergeable distinct-count sketch (KMV bottom-k): per language, the 8
    // smallest distinct arithmetic hashes of doc_id, the k-th minimum, and
    // the integer-exact cardinality estimate. Bounded-heap aggregation —
    // the sketch, not the key set, is what shuffles.
    "kmv_distinct" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sketches.kmvEstimateMicro(
          Sketches.kmvSketch(d, col("lang"), Sampling.arithHash(col("doc_id")), k = 8), k = 8)
        .withColumnRenamed("g", "lang")
    }),

    // Tokenizer coverage: out-of-vocabulary fraction per document against
    // the corpus top-16 vocabulary (the synthetic corpus has 31 distinct
    // tokens, so a larger cut would cover everything). The vocabulary is
    // one token-keyed aggregate collected to the driver (constant-size);
    // scoring is then a fused codegen membership pass (`count_in`) — a
    // narrow projection, no join, no second shuffle of the corpus.
    "text_oov" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val vocab = d.select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(16)
        .collect().map(_.getString(0)).toSeq
      d.filter(col("doc_id") < 50)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
          TextOps.stopwordScoreOn(col("t"), vocab).cast("long").as("known"))
        .select(col("doc_id"), col("n_tokens"),
          expr("((n_tokens - known) * 1000000L) div n_tokens").as("oov_micro"))
    }),

    // Statistical LM quality filter (the CCNet/RedPajama perplexity-filter
    // shape in exact integers): a bigram count LM trained on the held-out
    // reference split (doc_id >= 50) scores the evaluation split — average
    // training-corpus occurrence of each doc's bigrams plus its OOV count.
    // The LM is vocabulary-sized; scoring is one exploded equi-join
    // against it and a per-doc re-aggregate.
    "text_lm_score" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.ngramFamiliarity(
          d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
          col("doc_id"), col("text"), n = 2)
        .select(col("id").as("doc_id"), col("n_ngrams"),
          col("oov_ngrams"), col("fam_micro"))
    }),

    // Corpus report card: doc counts and exact char statistics rolled up
    // over (source, lang) — integer-exact means in micro-units, so any
    // engine reproduces them bit-for-bit.
    "corpus_report" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
        .withColumn("mean_chars_micro", expr("(chars_sum * 1000000L) div n_docs"))),

    // Snapshot delta between two corpus versions — the daily-crawl
    // incremental audit: which documents were added, removed, changed, or
    // carried over, as one full-outer id join comparing SHA-256 content
    // digests computed in-scan — the text itself never shuffles (measured
    // 1.6 MB → digest-rows-only at sf0.1), which is the whole game at
    // 100 TB where both sides live in id-bucketed stores with digests
    // already materialized (zero-exchange join, no payload movement). The
    // "new" crawl is simulated in-query (drop ids ≡ 0 mod 17, rewrite text
    // for ids ≡ 0 mod 13, add fresh ids) so both engines derive the same
    // pair of versions; the oracle compares raw text — equal by digest
    // collision-freeness.
    "corpus_diff" -> ((s, dir) => {
      val old = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val nw = old.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .union(old.filter(col("doc_id") < 30)
          .select(col("doc_id") + 1000000L, col("text")))
      def dig(df: DataFrame, as: String) = df.select(col("doc_id"),
        sha2(encode(col("text"), "UTF-8"), 256).as(as))
      dig(old, "d_old")
        .join(dig(nw, "d_new"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("d_old").isNull, "added")
            .when(col("d_new").isNull, "removed")
            .when(col("d_old") =!= col("d_new"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),

    // Deterministic global shuffle for training export: shard by an
    // engine-portable arithmetic hash, order by (hash, id) within shard —
    // a reproducible pseudo-random layout with parallelism = shard count
    // (no unpartitioned window, no zipWithIndex, no RNG).
    "shard_order" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"))
      Packing.shardAndOrder(d, col("doc_id"),
          Sampling.arithHash(col("doc_id")), nShards = 8)
        .select(col("doc_id"), col("shard"), col("shuffle_pos"))
    }),

    // Substring-level dedup signal (the suffix-array pass of exact
    // training-data dedup, re-expressed shuffle-native): per document, the
    // count of word 8-gram spans occurring more than once in the corpus.
    // The corpus-wide occurrence count aggregates 8-byte span hashes; span
    // STRINGS only re-group inside the tiny >1-occurrence candidate set
    // (exact despite hashing — collisions die in the string re-group).
    "span_dedup" -> ((s, dir) =>
      Dedup.duplicatedSpanStats(plantedCorpus(s, dir), "doc_id", "text", n = 8)
        .filter(col("n_dup_spans") > 0)),

    // Reproducible corpus clustering: grid-quantized Lloyd k-means
    // (exact-integer arithmetic end to end, so labels are bit-stable
    // across engines and run orders — the oracle replays the identical
    // iterations in SQL). Assignment is a codegen narrow projection
    // against driver-resident centroids; each Lloyd update is one
    // map-side-combinable k-row aggregate. Zero corpus shuffles.
    "cluster_kmeans" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      Clustering.kmeansGridAssign(e, "vec_id", "embedding", k = 8, iters = 2)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("csize"), sum(col("id")).as("id_sum"))
    }),

    // Word-bigram Jaccard similarity over a bounded pair set.
    "ngram_jaccard" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), sort_array(array_distinct(TextOps.wordNgrams(col("text"), 2))).as("ng"))
      val a = d.select(col("doc_id").as("a_id"), col("ng").as("ng_a"))
      val b = d.select(col("doc_id").as("b_id"), col("ng").as("ng_b"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          floor(Dedup.jaccardSorted(col("ng_a"), col("ng_b")) * 1000000.0d).as("j_micro"))
        .filter(col("j_micro") >= 100000L)
    }),

    // Containment near-dup: the ASYMMETRIC |A∩B|/|A| over word-bigram sets,
    // catching excerpt-in-page duplication that symmetric Jaccard
    // structurally misses. Planted: for each doc < 20, its 30-token prefix
    // as a new doc (id+100000) — a contiguous token slice, so every planted
    // bigram occurs in the source: containment exactly 1.0 while Jaccard
    // stays far below any dedup threshold (both reported to pin the
    // asymmetry). Pairing is over a bounded id set like ngram_jaccard; the
    // corpus-scale path reuses the MinHash band store for candidates and
    // this containment verify in place of the Jaccard verify.
    "ngram_containment" -> ((s, dir) => {
      val toks = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val corpus = toks.union(
        toks.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000L).as("doc_id"), slice(col("toks"), 1, 30).as("toks")))
      val ng = corpus
        .select(col("doc_id"),
          sort_array(array_distinct(TextOps.wordNgramsOn(col("toks"), 2))).as("ng"))
        .filter(size(col("ng")) > 0)
      val a = ng.select(col("doc_id").as("a_id"), col("ng").as("ng_a"))
      val b = ng.select(col("doc_id").as("b_id"), col("ng").as("ng_b"))
      a.join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          floor(Dedup.containment(col("ng_a"), col("ng_b")) * 1000000.0d).as("c_micro"),
          floor(Dedup.jaccardSorted(col("ng_a"), col("ng_b")) * 1000000.0d).as("j_micro"))
        .filter(col("c_micro") >= 900000L)
    }),

    // ----- LLM-data-pipeline: text analysis ----------------------------
    "text_tokens" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))),

    "text_quality" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          floor(TextOps.qualityScore(col("text")) * 1000000.0d).as("q_micro"))),

    // Gopher-style quality-rule audit: five integer-exact keep/drop rules
    // evaluated as one narrow bitmask projection, rolled up per source with
    // per-rule failure counts — the WHY of every dropped document, which is
    // what threshold tuning actually needs. Planted failures: every 17th
    // doc becomes pure repetition (no stopwords, 1 distinct token), every
    // 13th gets a digit/symbol tail (alphabetic-ratio hit on short docs).
    "quality_rules" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 17 === 0, repeat(lit("zz "), 40)).otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 13 === 0,
            concat(col("t1"),
              lit(" 0123456789 #### $$$$ %%%% ^^^^ &&&& 1111 2222 3333 4444 5555")))
            .otherwise(col("t1")))
      planted.select(col("source"), TextOps.qualityFlags(col("text2")).as("flags"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("flags") === 0, 1)).as("n_kept"),
          count(when(col("flags").bitwiseAND(lit(1L)) =!= 0L, 1)).as("n_wordcount"),
          count(when(col("flags").bitwiseAND(lit(2L)) =!= 0L, 1)).as("n_wordlen"),
          count(when(col("flags").bitwiseAND(lit(4L)) =!= 0L, 1)).as("n_alpha"),
          count(when(col("flags").bitwiseAND(lit(8L)) =!= 0L, 1)).as("n_nostop"),
          count(when(col("flags").bitwiseAND(lit(16L)) =!= 0L, 1)).as("n_repetitive"))
    }),

    // BPE-ish subword tokenization: letter runs, digit runs, or single
    // non-space symbols — the pre-tokenization regex family BPE vocabularies
    // are trained over.
    "text_bpe_tokens" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")).as("n_subwords"))),

    "text_langid" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .select(TextOps.tokens(col("text")).as("toks"))
        .select(TextOps.langIdOn(col("toks")).as("pred_lang"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))),

    "text_langid_ngram" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        // materialize trigrams once per row; the five profile scores share it
        .select(TextOps.charNgrams(col("text"), 3).as("tg"))
        .select(TextOps.langIdNgramOn(col("tg")).as("pred_lang"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))),

    "text_fingerprint" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),

    // PII scrub: plant synthetic PII deterministically (an email on every
    // 7th doc, an IPv4 + phone on every 11th), redact with the shared
    // Java/RE2-compatible patterns, and account for every removed
    // character. The redaction is a narrow regexp projection; the
    // accounting is one map-side-combining hash aggregate on lang.
    "text_redact" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 11 === 0,
            concat(col("t1"), lit(" via 10.0.3.77 call 555-867-5309")))
            .otherwise(col("t1")))
      planted
        .select(col("lang"), col("text2"),
          TextOps.redactPii(col("text2")).as("red"))
        .groupBy(col("lang"))
        .agg(
          count(when(col("red") =!= col("text2"), 1)).as("n_redacted_docs"),
          coalesce(sum((length(col("text2")) - length(col("red"))).cast("long")),
            lit(0L)).as("chars_removed"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.EmailRe)).cast("long")),
            lit(0L)).as("n_emails"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.Ipv4Re)).cast("long")),
            lit(0L)).as("n_ips"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.PhoneRe)).cast("long")),
            lit(0L)).as("n_phones"))
    }),

    // Quality-aware dedup: of each near-identical family, keep the BEST-
    // scoring document rather than the first-crawled one. Families are
    // keyed by a 6-token prefix; every doc<60 gets a degraded copy (digit
    // noise + symbol spam lowers the alphabetic ratio), and the argmax
    // rides the one cluster-key aggregate as a (score, -id) struct max —
    // bounded state per group, ties to the smallest id.
    "dedup_keep_best" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val corpus = d.union(d.filter(col("doc_id") < 60)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" 1234 !!!! ####")).as("text")))
      val scored = corpus.select(col("doc_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 6), " ").as("pfx"),
        floor(TextOps.qualityScore(col("text")) * 1000000.0d).as("q_micro"))
      Dedup.keepBest(scored, col("pfx"), col("doc_id"), col("q_micro"))
        .filter(col("n_copies") > 1)
        .select(col("dedup_key"), col("n_copies"),
          col("best_score").as("best_q_micro"), col("rep_id"))
    }),

    // CCNet-style line-level boilerplate removal: lines repeated across
    // many pages (navigation menus, copyright footers — planted here on
    // every 3rd/4th doc) are deleted in place, preserving document order.
    // Counting shuffles 8-byte line hashes only (map-side combined); the
    // exact string threshold is re-applied to the small candidate set, and
    // removal is a broadcast join — no corpus shuffle anywhere. Carrying
    // `source` inside the group key keeps the rebuild single-aggregate.
    "line_dedup" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 3 === 0,
            concat(lit("shared navigation header menu\n"), col("text")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 4 === 0,
            concat(col("t1"), lit("\ncopyright footer all rights reserved")))
            .otherwise(col("t1")))
      Lines.removeBoilerplate(planted,
          struct(col("doc_id"), col("source")), col("text2"), minCount = 100L)
        .groupBy(col("id.source").as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_lines_kept")).as("lines_kept"),
          sum(col("n_lines_removed")).as("lines_removed"),
          sum(length(col("clean_text")).cast("long")).as("chars_after"))
    }),

    // Weighted dataset mixture: deterministic per-source sampling rates
    // (80% web / 50% books / 20% code) as a narrow key-hash filter — the
    // training-mix composition step; reproducible under repartitioning,
    // retries and backfills because the kept set is a pure function of
    // (source, key).
    "mix_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .withColumn("source",
          when(col("doc_id") % 3 === 0, lit("web"))
            .when(col("doc_id") % 3 === 1, lit("books"))
            .otherwise(lit("code")))
      Sampling.mixture(d, col("source"), col("doc_id"),
          Map("web" -> 80, "books" -> 50, "code" -> 20))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // Temperature-scaled mixture (alpha = 1/2): keep probability
    // proportional to sqrt(source size) — the multilingual/low-resource
    // flattening recipe. Weights are EXACT integer sqrts of the per-source
    // counts (one counter-scale aggregate, BigInt permille arithmetic
    // driver-side), then a zero-shuffle arithHash gate over the corpus;
    // the skewed 60/30/10 source split makes the flattening visible
    // (small sources keep a higher rate than large ones).
    "temp_mixture" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .withColumn("src",
          when(col("doc_id") % 10 < 6, lit("web"))
            .when(col("doc_id") % 10 < 9, lit("books"))
            .otherwise(lit("code")))
      Sampling.temperatureMixture(d, col("src"), col("doc_id"), 250L)
        .groupBy(col("src").as("source"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // Per-group quota: at most 25 docs per language, picked by descending
    // deterministic hash with id tie-break — domain/language capping via
    // the bounded top-k heap aggregate, so no per-group window sort and
    // shuffle volume of at most mappers x groups x 25 rows.
    "quota_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.quotaPerGroup(d, col("lang"), col("doc_id"), 25)
        .groupBy(col("group").as("lang"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("id")), lit(0L)).as("id_sum"))
    }),

    // Deterministic train/val/test carving: disjoint, exhaustive hash bands
    // (80/10/10) as a narrow CASE projection — every row lands in exactly
    // one split, stable under repartitioning/retries/backfills, no
    // train-eval leakage by construction.
    "sample_split" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      d.withColumn("split", Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // xxhash64 hash-band carving: the bucket values cannot be replayed by
    // another engine (the hash is Spark's), but the CONTRACT is closed-form
    // and that is what the oracle checks — bands of one seed are exactly
    // disjoint and exactly exhaustive. Carving [0,.1)/[.1,.37)/[.37,.62)/
    // [.62,1) and unioning back must hit every document exactly once: an
    // off-by-one at any band edge double-counts (n_in_bands) or drops
    // (n_distinct) a row; both totals must equal the table count.
    "hash_bands" -> ((s, dir) => {
      val docs = s.read.parquet(pq(dir, "documents"))
      val cuts = Seq(0.0, 0.1, 0.37, 0.62, 1.0)
      val banded = cuts.sliding(2).toSeq.map { c =>
        Sampling.hashBand(docs, col("doc_id"), c.head, c.last)
          .select(col("doc_id"))
      }.reduce(_.unionAll(_))
      banded.agg(count(lit(1)).as("n_in_bands"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
    }),

    // Leakage-FREE split: duplicate families must not straddle train/eval
    // (a train-side copy of an eval doc is benchmark contamination), so the
    // split key is the family REPRESENTATIVE, not the document — every
    // member of a family inherits the same band and co-travels by
    // construction. Families are exact token-set groups via one keyed
    // window min; the split itself stays the narrow hash-band CASE.
    "group_split" -> ((s, dir) => {
      val c = plantedCorpus(s, dir)
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      c.withColumn("rep_id",
          min(col("doc_id")).over(Window.partitionBy(col("ws"))))
        .withColumn("split", Sampling.splitColumn(col("rep_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep_id")).as("n_families"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // Token-budget carve: "exactly N training tokens" as a deterministic
    // pseudo-random prefix. The plan is the 100 TB shape: a counter-scale
    // bucket ledger + ONE driver row, narrow filter for whole buckets, a
    // keyed window only over the single crossing bucket — never a global
    // sort or corpus-wide running total (the oracle's window IS that
    // non-scalable formulation, which is the point of the comparison).
    "budget_carve" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.budgetCarve(d, col("doc_id"), col("n_chars"), 75000L)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    // Quality-mass (top-p) carve: the longest documents covering 80% of
    // each source's total chars — the relative-mass counterpart of the
    // budget carves, with the crossing-bucket plan laid along the MASS
    // axis (per-(source, mass-bin) counter ledger; only crossing-bin rows
    // pay a window; never a per-group sort of the corpus).
    "mass_carve" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.massCarve(d, col("source"), col("doc_id"), col("n_chars"),
          permille = 800, binWidth = 64L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars_kept"))
    }),

    // Streaming budget gate: per-source budgets fill ACROSS increments
    // (arrival-order priority, remaining-budget state carried between
    // batches); driven here as the deterministic three-batch direct loop
    // the streaming wrapper replays. src2's budget exceeds its totals
    // (never gated), src0/src1/src3 close mid-stream, 16 sources have no
    // budget and never pass.
    "stream_budget_gate" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val out = freshTable(s, "graft_bg_out_" + suffix)
      val state = freshTable(s, "graft_bg_state_" + suffix)
      val log = freshTable(s, "graft_bg_log_" + suffix)
      val d = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("source"), col("n_chars"))
      val budgets = Map("src0" -> 5000L, "src1" -> 3000L,
        "src2" -> 100000L, "src3" -> 9000L)
      for (b <- 0 until 3)
        graft.streaming.StreamOps.budgetGateBatch(
          d.filter(pmod(col("doc_id"), lit(3)) === b),
          col("source"), col("doc_id"), col("n_chars"), budgets,
          out, state, log, b.toLong)
      s.table(out).groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars_kept"))
    }),

    // Budgeted mixture: absolute per-source token budgets (mix_sample's
    // rates say 80%; this says "exactly 40k chars of src2") — budgets that
    // exceed a source keep it whole, sources without a budget drop, and
    // only each source's single crossing hash-bucket pays a row-level
    // window. Aggregated per source for an order-free compare.
    "budget_mixture" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.budgetCarvePerGroup(d, col("source"), col("doc_id"), col("n_chars"),
          Map("src0" -> 100000L, "src1" -> 4000L, "src2" -> 40000L, "src3" -> 12000L))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars_kept"))
    }),

    // Histogram-sketch quantiles: the quantile plan that survives 100 TB —
    // one narrow integer-bin projection + one (group, bin) counter
    // aggregate (shuffle carries at most groups x nbins rows, never the
    // values), vs q_percentiles' exact per-group percentile over the data.
    // Emits exact-integer quantile upper bounds (within one bin width).
    "quantile_hist" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
      val hist = Sketches.histogram(l, col("l_returnflag"), col("l_extendedprice"),
        width = 5000L, nbins = 24)
      Sketches.histQuantilesMicro(hist, width = 5000L,
          Seq("p50_ub" -> 500000L, "p90_ub" -> 900000L, "p99_ub" -> 990000L))
        .withColumnRenamed("g", "l_returnflag")
    }),

    // BPE tokenizer induction, round-1 statistics: the corpus-wide
    // adjacent-pair counts every merge decision is made from — a narrow
    // zip-of-shifted-slices projection + one map-side-combined aggregate
    // (shuffle = distinct-pair vocabulary, never the corpus). The greedy
    // merge LOOP is spec-tested against a sequential reference
    // implementation (BpeSpec); this query pins its decision input.
    "bpe_pairs" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Bpe.pairCounts(d, TextOps.tokens(col("text")))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(20)
    }),

    // Full tokenizer-induction pin: the ordered merge list trainOnWords
    // learns (one corpus aggregate + driver loop over the vocabulary-sized
    // word-frequency table). The oracle replays every round in SQL —
    // weighted pair counts, the (cnt desc, left, right) argmax, and the
    // greedy left-to-right merge via non-overlapping string replace over
    // bracket-delimited symbols (exact because replace() scans left to
    // right and never matches inside a bracketed symbol).
    "bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val d = s.read.parquet(pq(dir, "documents"))
      Bpe.trainOnWords(d, col("text"), nMerges = 8)
        .zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r) }
        .toDF("rank", "left", "right")
    }),

    // Tokenize-with-trained-vocabulary accounting — the token-budget
    // primitive every mixture/packing stage consumes: train 8 merges, then
    // encode the evaluation docs (per-word greedy merge application as ONE
    // codegen expression with the constant merge table inlined — a narrow
    // projection, zero extra shuffles beyond the per-doc re-aggregate).
    // The oracle needs no encode replay: applying merges in rank order to
    // a raw word reproduces the training-time progressive state, so each
    // word's encoding IS its row in the replay's final vocabulary table.
    "bpe_encode" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      d.filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("doc_id"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges)).as("n_sym"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sym").cast("long")).as("n_bpe_tokens"))
    }),

    // EMBEDDING drift per label between two snapshot halves (even/odd
    // vec_id): exact cross-multiplied L1 between mean quantized vectors —
    // division-free integers end to end, the re-index-the-vector-store
    // alarm. One dim-sized-buffer aggregate per side; only groups x dim
    // sums reach the driver.
    "drift_vector" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      Drift.vectorDriftI8(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1),
        col("label"), col("embedding"), scale = 64)
    }),

    // Tokenizer fertility per domain: chars-per-BPE-token in exact micro
    // units for each source — the tokenizer-QA table that shows which
    // domains a trained vocabulary serves poorly (low chars/token = more
    // tokens per char = more compute per char). Same trained merges and
    // narrow codegen encode as bpe_encode; one counter-scale aggregate.
    "bpe_efficiency" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      d.select(col("source"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("source"), length(col("word")).cast("long").as("nc"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges))
            .cast("long").as("ns"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
          sum(col("ns")).as("n_bpe_tokens"))
        .withColumn("chars_per_tok_micro",
          expr("n_chars * 1000000L div n_bpe_tokens"))
    }),

    // Distribution-drift monitor: per-day event-type distributions and
    // the integer L1 distance between consecutive days — the upstream-
    // source-changed alarm, computed from one counter aggregate (shuffle
    // = days x types rows, never the events), exact micro-units.
    "drift_l1" -> ((s, dir) => {
      // see eventsNs for the ts normalization;
      // day index = nanos since 2024-01-01 UTC div 86400e9, exact integers
      val e = eventsNs(s, dir)
        // FLOOR division (div truncates toward zero): a pre-epoch event
        // must land in day -1, matching the oracle's calendar datediff
        .withColumn("day", expr(
          "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
            "86400000000000L)) div 86400000000000L"))
      Drift.l1Drift(Drift.categoricalShares(e, col("day"), col("event_type")))
        .select(col("w").as("day"), col("l1_micro"))
    }),

    // Ordered conversion funnel (view → click → purchase) with first-touch
    // anchoring: stage k+1 is the user's earliest qualifying event
    // STRICTLY AFTER their stage-k anchor, ordered by (ts, event_id) so
    // ties are deterministic. Three user-keyed min-struct aggregates (all
    // map-side combinable) and two users-sized equi-joins — the corpus
    // shuffles once per stage on user_id, anchors are one struct per user.
    "event_funnel" -> ((s, dir) => {
      val e = eventsNs(s, dir)
        .select(col("user_id"), col("event_type"),
          struct(col("ts"), col("event_id")).as("k"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("k")).as("s1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("k") > col("s1"))
        .groupBy(col("user_id")).agg(min(col("k")).as("s2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("k") > col("s2"))
        .groupBy(col("user_id")).agg(min(col("k")).as("s3"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("stage"), col("n_users"))
        .union(c.agg(count(lit(1)).as("n_users")).select(lit(2L).as("stage"), col("n_users")))
        .union(p.agg(count(lit(1)).as("n_users")).select(lit(3L).as("stage"), col("n_users")))
    }),

    // Cohort retention: users grouped by first-active day, counted on each
    // later active day offset — two keyed aggregates (distinct user-days,
    // then per-user min) and one users-sized join; the classic product-
    // analytics table from one pass over the event log.
    "event_retention" -> ((s, dir) => {
      val e = eventsNs(s, dir).withColumn("day", expr(
        "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
          "86400000000000L)) div 86400000000000L"))
      val ud = e.select(col("user_id"), col("day")).distinct()
      val fd = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ud.join(fd, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Numeric drift: the same consecutive-day L1 over fixed-width value
    // bins of events.value — the value-distribution-shifted alarm, same
    // constant-size counter-aggregate plan as the categorical monitor.
    "drift_hist" -> ((s, dir) => {
      val e = eventsNs(s, dir)
        .withColumn("day", expr(
          "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
            "86400000000000L)) div 86400000000000L"))
      Drift.histL1Drift(e, col("day"), col("value"), width = 10L, nbins = 12)
        .select(col("w").as("day"), col("l1_micro"))
    }),

    // Salted skew join: the hot-key mitigation produces EXACTLY the same
    // rows as the plain equi-join it replaces (the oracle is the plain
    // join), while spreading each hot key across 8 sub-keys — proven here
    // by aggregate equality on a join whose left side is artificially
    // skewed onto one customer.
    "skew_join" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders"))
        .withColumn("cust", when(col("o_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("o_custkey"))) // hot key: ~1/3 of rows on cust 1
        .select(col("cust"), col("o_totalprice"))
      val c = s.read.parquet(pq(dir, "customer"))
        .select(col("c_custkey").as("cust"), col("c_mktsegment"))
      Skew.saltedJoin(o, c, "cust", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
    }),

    // One-pass table profile: every per-column statistic of 6 mixed-type
    // lineitem columns from ONE scan and ONE aggregate (map-side partials;
    // the per-column pivot runs on the 1-row result). Decimal-exact sums
    // make even the double columns' profile hash-pinnable.
    "profile_table" -> ((s, dir) =>
      Profile.profile(s.read.parquet(pq(dir, "lineitem")),
        Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_shipdate", "l_linestatus"))),

    // Misra-Gries heavy hitters per language: constant executor memory per
    // group no matter the vocabulary size. capacity=64 exceeds the
    // synthetic corpus's distinct-token count, so the sketch is provably
    // eviction-free here: exact counts, count_lb == count_ub, any merge
    // order — the deterministic regime the gate can hash-pin (the eviction
    // regime's error bound is spec-asserted instead).
    "heavy_hitters" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val toks = d.select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      Sketches.heavyHitters(toks, col("lang"), col("token"), capacity = 64)
        .withColumnRenamed("g", "lang")
    }),

    // The SAME heavy-hitter question answered by the STREAMING operator:
    // token events replayed through Trigger.AvailableNow into the
    // Misra-Gries flatMapGroupsWithState sketch (bounded state per group
    // forever), landed in a memory sink. In the eviction-free regime the
    // stream's final sketch must equal the batch exact counts — batch
    // parity as an oracle row, not just a spec. Update-mode emissions
    // accumulate one row per (group, item) per trigger and counts only
    // grow here, so max() per key is the final sketch no matter how
    // AvailableNow batched the replay.
    "stream_heavy_hitters" -> ((s, dir) => withStreamShuffle(s) {
      import s.implicits._
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_hh_" + suffix
      s.read.parquet(pq(dir, "documents"))
        .select(col("lang").as("group"), explode(TextOps.tokens(col("text"))).as("item"))
        .write.mode("overwrite").parquet(staging)
      val events = s.readStream.schema("group STRING, item STRING")
        .parquet(staging).as[graft.streaming.ItemEvent]
      val sink = "graft_stream_hh_sink_" + suffix
      // private per-run checkpoint (no cross-process sharing to race on),
      // deleted after the replay completes: the memory-sink contents
      // outlive it, and the next run replays from scratch anyway
      val ckpt = java.nio.file.Files.createTempDirectory("graft_hh_ckpt").toFile
      try {
        graft.streaming.StreamOps.streamingHeavyHitters(events, capacity = 64)
          .writeStream.format("memory").queryName(sink).outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink)
        .groupBy(col("group").as("lang"), col("item"))
        .agg(max(col("count_lb")).as("count_lb"),
          max(col("count_ub")).as("count_ub"))
    }),

    // Deterministic weighted sampling without replacement (priority
    // sampling, hash-derived draws): 20 documents weighted by length —
    // integer-exact priorities, bounded-heap selection, no global sort.
    "weighted_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.weightedPriority(d, col("doc_id"), length(col("text")), n = 20)
    }),

    // Bottom-k overlap sketch: Jaccard/containment estimate between the
    // customer key set and the order-customer key set from two constant-
    // size KMV sketches — join-cardinality profiling without moving either
    // key set; everything integer-exact and hash-pinned.
    "kmv_overlap" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      Sketches.kmvOverlap(
        c, Sampling.arithHash(col("c_custkey")),
        o, Sampling.arithHash(col("o_custkey")), k = 16)
    }),

    // Keyword extraction: each document's 3 most DISTINCTIVE tokens — high
    // term frequency, low document frequency (the exact-integer tf-idf
    // ordering: tf desc, df asc, token asc). Document frequency is one
    // corpus-wide aggregate (map-side partial, vocabulary-sized result);
    // per-doc ranking windows over the 30 selected docs only.
    "text_keywords" -> ((s, dir) => {
      val toks = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val docFreq = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val tf = toks.filter(col("doc_id") < 30)
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("token"))
      tf.join(docFreq, "token")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("token"), col("tf"), col("df"))
    }),

    // Vocabulary building: corpus-wide token frequencies, top 20 with a
    // deterministic tie-break. Explode + map-side-partial hash aggregate +
    // TakeOrdered — the BPE/vocab-training preparation scan.
    "text_vocab" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),

    // Embedding-cosine near-dup: plant exact-duplicate vectors, bucket both
    // sides with sign-pattern LSH (identical vectors share a bucket, so
    // recall at cos=1 is exact), then verify candidates with the exact
    // cosine kernel. Random 64-dim embeddings have pairwise cosine far
    // below the 0.99 threshold, so the answer is exactly the planted set.
    "dedup_embedding" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 25).select(col("vec_id") + 100000L, col("embedding")))
      val b = corpus.withColumn("bucket", Similarity.lshBucket(col("embedding"), 64, 16))
      val l = b.select(col("vec_id").as("a_id"), col("embedding").as("v_a"), col("bucket"))
      val r = b.select(col("vec_id").as("b_id"), col("embedding").as("v_b"), col("bucket"))
      l.join(r, Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .filter(Similarity.cosine(col("v_a"), col("v_b")) > 0.99d)
        .agg(count(lit(1)).as("dup_pairs"),
          coalesce(sum(col("a_id") + col("b_id")), lit(0L)).as("id_sum"))
    }),

    // Semantic dedup (the SemDeDup shape): k-means partitions the corpus,
    // near-dup pairs are found only WITHIN a cluster (the quadratic stage
    // confined to (cluster, LSH-bucket) cells — k grows with n at 100 TB
    // so cluster size stays bounded), and each semantic group keeps its
    // min-id representative. Planted exact duplicates land in their
    // source's cluster (identical quantized vector) and bucket (identical
    // sign pattern), so the drop set is exactly the planted ids;
    // per-cluster stats pin both the assignment and the drop rule.
    "dedup_semantic" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 25).select(col("vec_id") + 100000L, col("embedding")))
      Clustering.semanticDedup(corpus, "vec_id", "embedding",
          k = 8, iters = 2, dim = 64, numPlanes = 16, threshold = 0.99d)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(!col("is_dup"), col("id")).otherwise(0L)).as("keep_id_sum"))
    }),

    // Composed cleaning pipeline: exact-dedup to representatives, drop
    // low-quality docs, aggregate corpus statistics — the full
    // training-data-cleaning shape in a single declarative plan (one
    // dedup shuffle + one final aggregate).
    "pipeline_clean" -> ((s, dir) => {
      val reps = plantedCorpus(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      reps
        .withColumn("q_micro", floor(TextOps.qualityScore(col("text")) * 1000000.0d))
        .filter(col("q_micro") >= 800000L)
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          coalesce(sum(col("q_micro")), lit(0L)).as("q_micro_sum"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // The INGEST composition — the daily-crawl loop at 100 TB: scrub an
    // increment against the PERSISTED reference band store, exact-verify
    // candidates by token-set equality, drop confirmed duplicates, ABSORB
    // the survivors into the store (bucket-spec-preserving append), and
    // audit the grown store from the table itself. Every stage is
    // individually proven (dedup_store_scrub, the append spec); this pins
    // the loop end to end, including the store's post-absorb row count
    // ((ref + survivors) x 16 band rows).
    "pipeline_ingest" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ingest_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      // increment: docs <70 re-labeled — 50..69 are literal store members
      // (guaranteed duplicates); <50 are novel unless their text happens
      // to repeat a stored doc's (the oracle recomputes exactly that)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 600000L).as("doc_id"), col("text"))
      // ONE shared verify body (dupsVerifiedBy), with the verification
      // token sets sourced from the RAW reference corpus; the decision is
      // pinned (localCheckpoint) so the append and both audit aggregates
      // reuse a single scrub run — unpinned, the post-append aggregates
      // would re-scrub against the grown store
      val dupIds = Dedup.dupsVerifiedBy(s, tbl,
          ref.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws")),
          inc, col("doc_id"), TextOps.tokenSet(col("text")))
        .withColumnRenamed("doc_id", "dup_id")
        .localCheckpoint()
      val survivors = inc.join(broadcast(dupIds),
        col("doc_id") === col("dup_id"), "left_anti")
      Dedup.appendToBandStore(survivors, col("doc_id"),
        TextOps.tokenSet(col("text")), tbl, buckets = 8)
      dupIds.agg(count(lit(1)).as("n_dups"),
          coalesce(sum(col("dup_id")), lit(0L)).as("dup_id_sum"))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(col("doc_id")), lit(0L)).as("surv_id_sum")))
        .crossJoin(s.table(tbl).agg(count(lit(1)).as("store_band_rows")))
    }),

    // Band-store COMPACTION: every absorb lays down one file per bucket,
    // so a store that has taken N increments carries N x buckets files —
    // the small-file storm relocated inside the store. compactBucketed
    // rewrites it to one file per bucket through a same-bucket-spec
    // staging table + catalog swap. The audit composes two subsystems:
    // file counts before/after come from OUR metadata source over the
    // store's own directory (the export_manifest pattern), and semantic
    // preservation is pinned by scrubbing the absorbed increment against
    // the compacted store — every literal member must still surface as
    // its own (ref, relabeled) candidate pair.
    "store_compact" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_compact_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "__compacting")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
      Dedup.appendToBandStore(inc, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      def loc: String = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location.toString
      val filesBefore = meta(s, loc, "file").count()
      Bucketing.compactBucketed(s, tbl, "band_hash", buckets = 8)
      val filesAfter = meta(s, loc, "file").count()
      val pairs = Dedup.scrubAgainstBandStore(s, tbl, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
      pairs.filter(col("b_id") >= 900050L && col("a_id") === col("b_id") - 900000L)
        .agg(count(lit(1)).as("n_literal_pairs"))
        .crossJoin(s.table(tbl).agg(count(lit(1)).as("store_rows")))
        .select(lit(filesBefore).as("n_files_before"),
          lit(filesAfter).as("n_files_after"),
          col("store_rows"), col("n_literal_pairs"))
    }),

    // Duplicate PROVENANCE: for each increment doc dropped as a duplicate,
    // WHICH stored document it collided with (smallest matching store id)
    // — the audit view the drop path's distinct() discards; per-row
    // output, not an aggregate, so the pairing itself is hash-pinned.
    "dedup_provenance" -> ((s, dir) => {
      val band = freshTable(s, "graft_prov_band_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val docs = freshTable(s, band + "_docs")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        band, buckets = 8)
      Dedup.writeDocStore(ref, col("doc_id"), TextOps.tokenSet(col("text")), docs)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 850000L).as("doc_id"), col("text"))
      Dedup.dupProvenance(s, band, docs, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
    }),

    // CROSS-MODAL ingest: one increment carrying text AND its embedding
    // under a shared id, deduplicated on the text side (scrub against the
    // band/doc store pair via dupsAgainstStore — the doc store supplies
    // the verification token sets, no raw-corpus re-read), then ABSORBED
    // on both sides: surviving texts into the dedup store pair, surviving
    // embeddings into the IVF index under its persisted geometry. The
    // retrieval proof closes the loop: probing the grown index with the
    // ORIGINALS of queries 0..9 must hit the absorbed copy at rank 1
    // exactly when the query's text survived the scrub — the dedup
    // decision and the index contents agree, per modality, per id.
    "pipeline_crossmodal" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val band = freshTable(s, "graft_xm_band_" + suffix)
      val docs = freshTable(s, "graft_xm_docs_" + suffix)
      val ivf = freshTable(s, "graft_xm_ivf_" + suffix)
      freshTable(s, ivf + "_centroids")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        band, buckets = 8)
      Dedup.writeDocStore(ref, col("doc_id"), TextOps.tokenSet(col("text")), docs)
      Similarity.writeIvfStore(e.filter(col("vec_id") >= 50), "vec_id", "embedding",
        ivf, k = 16, iters = 1, scale = 64, buckets = 8)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 950000L).as("doc_id"), col("text"))
      val incE = e.filter(col("vec_id") < 70)
        .select((col("vec_id") + 950000L).as("vec_id"), col("embedding"))
      val dups = Dedup.dupsAgainstStore(s, band, docs, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
        .withColumnRenamed("doc_id", "dup_id")
      // materialize BEFORE absorbing: the scrub reads the stores lazily,
      // so any post-absorb re-evaluation would re-scrub against the GROWN
      // store, where every survivor matches its own absorbed copy and the
      // anti-join collapses to empty. localCheckpoint (eager) pins the
      // decision — batch-sized storage, the increment by contract.
      val survivors = inc.join(broadcast(dups),
        col("doc_id") === col("dup_id"), "left_anti")
        .localCheckpoint()
      Dedup.absorbIntoStore(survivors, col("doc_id"), TextOps.tokenSet(col("text")),
        band, docs, buckets = 8)
      val survE = incE.join(
        broadcast(survivors.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_semi")
      Similarity.appendToIvfStore(s, ivf, survE, "vec_id", "embedding", buckets = 8)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val hits = Similarity.searchIvfStore(s, ivf, queries, "q_id", "q_vec",
          nprobe = 4, k = 1)
        .filter(col("rank") === 1 && col("neighbor_id") === col("query_id") + 950000L)
      survivors.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(col("doc_id")), lit(0L)).as("surv_id_sum"))
        .crossJoin(s.table(band).agg(count(lit(1)).as("store_band_rows")))
        .crossJoin(s.table(docs).agg(count(lit(1)).as("doc_store_rows")))
        .crossJoin(s.table(ivf).agg(count(lit(1)).as("ivf_rows")))
        .crossJoin(hits.agg(count(lit(1)).as("n_rank1_hits")))
    }),

    // The full composition flagship: one DAG through the pipeline stages —
    // exact dedup (representative = min id, carrying its lang via min_by)
    // -> quality gate -> deterministic train/val/test carve -> per-(lang,
    // split) doc/token rollup. Every stage is individually oracle-proven;
    // this pins their COMPOSITION end to end. Plan: one dedup shuffle, the
    // rest narrow until the final small rollup.
    "pipeline_train" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val reps = d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), expr("min_by(lang, doc_id)").as("lang"))
      reps
        .withColumn("q_micro", floor(TextOps.qualityScore(col("text")) * 1000000.0d))
        .filter(col("q_micro") >= 800000L)
        .withColumn("split", Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // Benchmark decontamination: corpus docs sharing any word 8-gram with
    // the benchmark set (docs 0-19), with planted contamination (benchmark
    // texts re-inserted at id + 200000). Bloom prefilter (narrow, no
    // corpus shuffle, no false negatives) + exact shingle-join verification
    // -> the answer is exact and DuckDB-checkable.
    "decontam" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val corpus = d.filter(col("doc_id") >= 20)
        .union(bench.select(col("doc_id") + 200000L, col("text")))
      Decontam.contaminatedIds(corpus, "doc_id", "text", bench, "text", n = 8)
        .agg(count(lit(1)).as("n_contaminated"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),

    // Repetition-based quality filter (the Gopher-style duplicate-n-gram
    // fraction): 1 - distinct/total over word bigrams, exact micro-units.
    "text_repetition" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), {
          val ng = TextOps.wordNgrams(col("text"), 2)
          when(size(ng) === 0, lit(0L)).otherwise(
            floor((lit(1.0d) -
              size(array_distinct(ng)).cast("double") / size(ng).cast("double")) *
              1000000.0d)).as("rep_micro")
        })),

    // Training-sequence packing: concat documents per source in doc_id
    // order, cut every 4096 tokens; per-sequence doc/token stats. One
    // window cumsum partitioned by the shard key (see Packing scaladoc).
    "pack_sequences" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      Packing.sequenceStats(d, col("source"), col("doc_id"), col("n_tok"), budget = 4096L)
        .select(col("source"), col("seq_id").cast("long").as("seq_id"),
          col("n_docs"), col("n_tokens"))
    }),

    // The full pre-training tokenize-and-pack composition: induce the
    // tokenizer (one corpus aggregate + driver merge loop), encode every
    // document with the trained vocabulary (narrow codegen constant-table
    // pass), pack the REAL token counts into fixed-budget context windows
    // per source. This is the pipeline a 100 TB corpus runs nightly; the
    // only corpus shuffles are the per-doc count re-aggregate and the one
    // shard-keyed window packing needs anyway.
    "pipeline_tokenize" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      val toks = d
        .select(col("source"), col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("source"), col("doc_id"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges)).as("n_sym"))
        .groupBy(col("source"), col("doc_id"))
        .agg(sum(col("n_sym").cast("long")).as("n_tok"))
      Packing.sequenceStats(toks, col("source"), col("doc_id"), col("n_tok"), budget = 2048L)
        .select(col("source"), col("seq_id").cast("long").as("seq_id"),
          col("n_docs"), col("n_tokens"))
    }),

    // ----- LLM-data-pipeline: similarity search ------------------------
    // Exact brute-force cosine top-3 (integer ranks; the scores order the
    // rows but are not emitted, keeping the hash compare float-free).
    "ann_cosine_topk" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec", 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // Int8-quantized exact ANN: the memory/bandwidth scale path (4x smaller
    // corpus, integer multiply-adds). Fixed power-of-two scale keeps scores
    // comparable across rows AND integer-exact, so unlike the float-scored
    // ANN queries this one hash-pins the raw scores, not just ranks.
    "ann_quantized" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.quantizedTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec",
          scale = 64, k = 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("score").cast("long").as("score"))
    }),

    // Cross-modal: exact ANN neighbours joined back to document metadata
    // (embeddings.vec_id aligns with documents.doc_id in the testdata) —
    // the retrieve-then-enrich shape of a RAG/curation pipeline.
    "ann_join_meta" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val top = Similarity.bruteForceTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec", 3)
      val docs = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("source"))
      top.join(broadcast(docs), col("neighbor_id") === col("doc_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("lang"), col("source"))
    }),

    // Bucketed LSH ANN with an exact-recall oracle: plant one exact
    // duplicate per query vector (id + 100000). Identical vectors share
    // every hyperplane sign, hence the LSH bucket, and cosine 1.0 beats any
    // non-identical random 64-dim vector by a wide margin — so rank 1 of
    // each query is provably its planted copy and the rank-1 slice is a
    // deterministic, DuckDB-checkable integer result. The plan is still the
    // full approximate index (bucket equi-join + bounded top-k at k=3).
    "ann_lsh" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        dim = 64, numPlanes = 8, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // Random-projection ANN: deterministic ±1 JL projection 64 -> 8 dims
    // (random_project codegen expression, 8x byte cut), then exact cosine
    // ranking in the PROJECTED space. The planted duplicate projects
    // identically (pure function of the vector) so it must stay rank-1;
    // a degenerate projection (e.g. a collapsed sign matrix) sends every
    // pair to cosine 1 and the tie-break hands rank 1 to the wrong id —
    // the oracle is load-bearing for the projection itself.
    "ann_project" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
          e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
        .select(col("vec_id"), Similarity.randomProject(col("embedding"), 8).as("pvec"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          Similarity.randomProject(col("embedding"), 8).as("q_pvec"))
      Similarity.bruteForceTopK(corpus, "vec_id", "pvec", queries, "q_id", "q_pvec", 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // Multi-table LSH (the recall dial): 4 independent hyperplane sets,
    // candidates from the union of per-table bucket matches. The planted
    // duplicate is an identical vector, so it shares the query's bucket in
    // EVERY table — always a candidate, always rank 1 at cosine 1; extra
    // tables only ADD candidates, never lose the duplicate.
    "ann_lsh_multi" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopKMulti(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        dim = 64, numPlanes = 8, k = 3, tables = 4)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // IVF ANN with the same planted-duplicate exact-recall oracle: an
    // identical vector maps to the same nearest cell as its query, and the
    // query's rank-1 probe is that very cell, so the copy is always searched
    // and always wins rank 1. Centroids are a deterministic driver-side
    // quantizer; cell assignment is a codegen'd narrow projection.
    "ann_ivf" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      Similarity.ivfTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        centroids, nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // The composed 100 TB recipe — IVF probing (candidate cut) + int8
    // scoring (byte cut) — under the same planted-duplicate exact-recall
    // oracle: an identical vector shares its query's nearest cell AND its
    // quantized representation, so its integer self-dot beats any
    // non-identical unit vector's cross-dot by the cosine margin.
    "ann_ivf_quantized" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        centroids, nprobe = 4, scale = 64, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // Two-stage retrieval: the compressed index RETRIEVES (IVF probing +
    // int8 integer dots build a k'=10 shortlist), the exact float kernel
    // ORDERS (broadcast shortlist joins fetch candidate vectors in place —
    // no corpus shuffle — and exact cosine re-ranks). The planted duplicate
    // survives stage one (shares its query's cell and quantized codes) and
    // wins stage two at cosine 1 — same closed-form oracle.
    "ann_rerank" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      val shortlist = Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding",
        queries, "q_id", "q_vec", centroids, nprobe = 4, scale = 64, k = 10)
      Similarity.rerankExact(corpus, "vec_id", "embedding",
          queries, "q_id", "q_vec", shortlist, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // PERSISTED IVF index: the corpus is cell-assigned + int8-quantized
    // once and written bucketed by cell (plus a self-describing geometry
    // table), then the query batch probes the store — the write-once ANN
    // layout. Same planted-duplicate closed-form oracle: an identical
    // vector shares its query's nearest cell and wins the integer dot.
    "ann_ivf_store" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.writeIvfStore(corpus, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // Drift-triggered RE-INDEX, composed end to end: IVF ingest keeps the
    // quantizer fixed (appendToIvfStore's documented contract), so the
    // lifecycle needs a monitor that says WHEN to rebuild. Here the
    // increment is a genuinely shifted distribution (negated vectors —
    // norms preserved, every cell wrong), vectorDriftI8 measures the
    // cross-multiplied mean-L1 between base and increment, and the
    // threshold crossing drives the decision branch that retrains the
    // quantizer on base+increment and rebuilds the store. Proof the
    // rebuilt index serves the NEW distribution: each query is an exact
    // copy of a drifted vector and must find it at rank 1 (closed form);
    // under the stale base geometry the drifted rows would sit in
    // arbitrary cells. The emitted `reindexed` flag pins the decision
    // itself — if the monitor failed to cross, the oracle breaks.
    "ann_reindex_on_drift" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val tbl = freshTable(s, "graft_ivf_reindex_" + suffix)
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val drifted = e.select((col("vec_id") + 300000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      // the store as it existed before the increment arrived
      Similarity.writeIvfStore(e, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      // monitor: quantized mean-vector drift, base vs increment
      val drift = Drift.vectorDriftI8(e, drifted, lit("all"), col("embedding"),
        scale = 64).collect().head
      val (nA, l1) = (drift.getLong(1), drift.getLong(3))
      // threshold: mean gap beyond one quantization step per row pair
      val reindex = l1 > nA
      if (reindex) {
        freshTable(s, tbl)
        freshTable(s, tbl + "_centroids")
        Similarity.writeIvfStore(e.unionByName(drifted), "vec_id", "embedding",
          tbl, k = 16, iters = 1, scale = 64, buckets = 8)
      }
      val queries = drifted.filter(col("vec_id") < 300010L)
        .select((col("vec_id") - 300000L).as("q_id"), col("embedding").as("q_vec"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), lit(reindex).as("reindexed"), col("neighbor_id"))
    }),

    // FILTERED vector search against the persisted IVF store: the store
    // carries a label attribute (writeIvfStore extras) and the probe
    // PRE-filters on it in-scan, so top-k is computed among matching rows
    // only. Two exact duplicates are planted per query — one with the
    // target label (+100000), one with a decoy label (+200000). Under a
    // post-filter the decoy would crowd the shortlist; under the correct
    // pre-filter rank 1 is provably the matching-label copy and the decoy
    // cannot appear at all — which is exactly what the closed-form oracle
    // pins.
    "ann_filtered" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_filtered_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val base = e.withColumn("lab", pmod(col("vec_id"), lit(7L)).cast("int"))
      val dupGood = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
          lit(5).as("lab"))
      val dupDecoy = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"),
          lit(999).as("lab"))
      val corpus = base.union(dupGood).union(dupDecoy)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.writeIvfStore(corpus, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8, extras = Seq("lab"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec",
          nprobe = 4, k = 3, storeFilter = Some(col("lab") === 5))
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // IVF store ABSORB: the index is written from the base corpus only,
    // then an increment of exact copies (+200000) is absorbed with the
    // store's own persisted geometry — searching afterwards must rank each
    // absorbed copy at 1 (the original self-match is excluded by id), i.e.
    // appended rows are probed through the same pruned bucketed scan as
    // the initial write. The embedding-side mirror of the band-store
    // absorb loop.
    "ann_ivf_absorb" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_absorb_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      Similarity.writeIvfStore(e, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      val inc = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfStore(s, tbl, inc, "vec_id", "embedding", buckets = 8)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),

    // ----- LLM-data-pipeline: multimodal columns -----------------------
    // REAL image decode: each documents row becomes a genuine PNG or JPEG
    // payload (JDK ImageIO fixture encoder, dimensions closed-form in
    // doc_id), and the query recovers width/height by parsing the PNG IHDR
    // / JPEG SOF container headers executor-side — no pixel decode, the
    // 100 TB-appropriate kernel. The oracle re-derives the dimensions from
    // the same closed form, so a header-parse bug (endianness, offset,
    // marker walk) breaks the hash match. Fixture generation is a narrow
    // typed map; extraction is the mapPartitions batch-decode contract.
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 16 + (id % 37).toInt
          val h = 16 + (id % 23).toInt
          val fmt = if (id % 2 == 0) "png" else "jpeg"
          MediaRecord(id, s"image/$fmt", Multimodal.encodeFixture(fmt, w, h, id))
        }(Multimodal.mediaRecordEnc)
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          (col("width") * col("height")).cast("long").as("n_pixels"))
    }),

    // REAL pixel-path resize: encode a known-dimension PNG per row (some
    // within bounds, some not), run the full decode -> bilinear rescale ->
    // PNG re-encode kernel batched over partitions, then recover the
    // OUTPUT dimensions by parsing the re-encoded container headers. The
    // oracle reproduces the integer shrink arithmetic from doc_id alone
    // (ow = greatest(1, w*24 // greatest(w,h)), passthrough when already
    // within bounds) — a rescale rounding bug, a swapped axis, or a
    // corrupted re-encode each break the hash.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 12 + (id * 7 % 60).toInt
          val h = 10 + (id * 5 % 45).toInt
          MediaRecord(id, "image/png", Multimodal.encodeFixture("png", w, h, id))
        }(Multimodal.mediaRecordEnc)
      Multimodal.extractFeatures(Multimodal.resizeImages(media, maxDim = 24))
        .toDF()
        .select(col("media_id"),
          col("width").cast("long").as("out_w"),
          col("height").cast("long").as("out_h"))
    }),

    // Image near-dup via perceptual hash: dHash-64 every payload through
    // the REAL pixel path (decode -> 9x8 grayscale -> gradient bits),
    // group by hash — identical pixels hash identically whatever the
    // container bytes say, which is exactly what byte-level dedup
    // (mm_dedup) cannot see. Exact pixel copies are planted under
    // shifted ids; the oracle predicts the resulting families from the
    // plant alone (the spec pins that the 30 distinct base images do NOT
    // collide, so families are exactly the planted pairs).
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val mk = (id: Long) => Multimodal.encodeNoiseFixture(
        24 + (id % 13).toInt, 18 + (id % 11).toInt, id * 97 + 5)
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val base = MediaRecord(id, "image/png", mk(id))
          if (id < 10) Seq(base, MediaRecord(id + 1000L, "image/png", mk(id)))
          else Seq(base)
        }(Multimodal.mediaRecordEnc)
      media.map(r => (r.media_id, Multimodal.dHash64(r.bytes).get))
        .toDF("media_id", "phash")
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keep_id"),
          sum(col("media_id")).as("id_sum"))
        .filter(col("n_copies") > 1)
        .select(col("keep_id"), col("n_copies"), col("id_sum"))
    }),

    // Image NEAR-dup retrieval end to end: pattern fixtures make the
    // perceptual hash bit-exact controllable, near copies are planted at
    // EXACTLY 3 flipped bits, and the banded Hamming retrieval
    // (pigeonhole guarantee at d <= 3) must find exactly the planted
    // pairs — the same machinery that serves text simhash, proven on the
    // real image pixel path. Base patterns are splitmix-scrambled, so no
    // accidental base pair sits within the distance (spec-pinned).
    "mm_phash_near" -> ((s, dir) => {
      import s.implicits._
      val mix = (z0: Long) => { // splitmix64 finalizer
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val flips = (id: Long) =>
        (1L << (id % 64).toInt) | (1L << ((id + 21) % 64).toInt) |
          (1L << ((id + 43) % 64).toInt)
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val base = (id, Multimodal.encodePatternFixture(mix(id)))
          if (id < 10) Seq(base,
            (id + 1000L, Multimodal.encodePatternFixture(mix(id) ^ flips(id))))
          else Seq(base)
        }
      val hashed = media.map { case (id, bytes) =>
          (id, Multimodal.dHash64(bytes).get)
        }.toDF("doc_id", "phash")
      graft.ops.Dedup.simhashHammingPairs(
          hashed.select(col("doc_id").as("sh_id"), col("phash").as("simhash")), 3)
        .select(col("a_id"), col("b_id"))
    }),

    // REAL WAV audio probe: RIFF/WAVE chunk walk recovers sample rate,
    // channels and frame count without touching a sample; the exact
    // integer duration (frames * 1e6 / rate) is re-derived by the oracle
    // from the fixture arithmetic alone. The encoder side is validated
    // against the JDK's independent javax.sound parser in specs.
    "mm_audio_probe" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .map { id =>
          MediaRecord(id, "audio/wav", Multimodal.encodeWavFixture(
            rate = 8000 + 1000 * (id % 4).toInt,
            channels = 1 + (id % 2).toInt,
            nFrames = 500 + id.toInt * 3,
            seed = id))
        }(Multimodal.mediaRecordEnc)
      media.map { r =>
        val w = Multimodal.decodeWavInfo(r.bytes).get
        (r.media_id, w.sampleRate.toLong, w.channels.toLong, w.nFrames, w.durationMicros)
      }.toDF("media_id", "sample_rate", "channels", "n_frames", "dur_us")
    }),

    // The WAV probe generalized across containers: the same per-id audio
    // parameters synthesized into THREE container formats — WAV through
    // our encoder, AIFF and AU through the JDK's independent
    // javax.sound writer — and every one decoded back by the unified
    // big/little-endian header walk (decodeAudioInfo: RIFF chunk walk,
    // IFF COMM with its 80-bit extended sample rate, .snd fixed header).
    // The oracle reproduces all 3x parameters from doc_id arithmetic.
    "mm_audio_formats" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          Seq("wav", "aiff", "au").map { c =>
            val a = Multimodal.decodeAudioInfo(Multimodal.encodeAudioFixture(c,
              rate = 8000 + 1000 * (id % 4).toInt,
              channels = 1 + (id % 2).toInt,
              nFrames = 400 + id.toInt * 3, seed = id)).get
            (id, a.container, a.sampleRate.toLong, a.channels.toLong,
              a.nFrames, a.durationMicros)
          }
        }
        .toDF("media_id", "container", "sample_rate", "channels",
          "n_frames", "dur_us")
    }),

    // VIDEO container probe — MP4/ISO-BMFF box walk (ftyp check, moov →
    // mvhd timescale/duration, per-trak tkhd 16.16 presentation dims;
    // zero-dim audio tracks coexist as real muxers write them). Every
    // parameter doc_id arithmetic, so DuckDB recomputes the whole table
    // in closed form; frame/codec decode stays behind the documented
    // stub boundary — container metadata IS the Spark-side contract.
    "mm_video_probe" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val dur = 4000L + id * 7L
          val (w, h) = (320 + 16 * (id % 5).toInt, 180 + 9 * (id % 5).toInt)
          val nT = 1 + (id % 3).toInt
          Seq("mp4", "mkv", "webm").map { c =>
            val bytes = c match {
              case "mp4" => Multimodal.encodeMp4Fixture(
                1000 * (1 + (id % 3).toInt), dur, w, h, nT, id)
              case "mkv" => Multimodal.encodeMkvFixture(
                "matroska", 1000000L, dur, w, h, nT)
              case "webm" => Multimodal.encodeMkvFixture(
                "webm", 1000000L, dur, w, h, nT)
            }
            val v = Multimodal.decodeVideoInfo(bytes).get
            (id, v.container, v.timescale, v.durationTicks, v.durationMicros,
              v.nTracks.toLong, v.width.toLong, v.height.toLong)
          }
        }
        .toDF("media_id", "container", "timescale", "dur_ticks", "dur_us",
          "n_tracks", "width", "height")
    }),

    // Binary content dedup — the image/audio exact-dedup pass: group
    // opaque payloads by their SHA-256 digest, surface every duplicate
    // family with its representative (min id). The shuffle moves only
    // (digest, id) pairs — 40 bytes a row regardless of payload size; the
    // payload itself never leaves its scan partition. Payloads are
    // synthesized from text (the established stub — the container has no
    // media libs) with copies planted under shifted ids.
    "mm_dedup" -> ((s, dir) => {
      val media = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("bytes"))
      val corpus = media.union(
        media.filter(col("media_id") < 30)
          .select(col("media_id") + 1000000L, col("bytes")))
      corpus
        .select(col("media_id"), sha2(col("bytes"), 256).as("digest"))
        .groupBy(col("digest"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keep_id"),
          sum(col("media_id")).as("id_sum"))
        .filter(col("n_copies") > 1)
    }),

    // Frame sampling over media rows: every 4th frame by deterministic id
    // stride — a narrow filter, no shuffle; the video-pipeline shape.
    "mm_frames" -> ((s, dir) => {
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      Multimodal.sampleFrames(media, "media_id", stride = 4)
        .agg(count(lit(1)).as("n_frames"),
          coalesce(sum(col("media_id")), lit(0L)).as("id_sum"),
          coalesce(sum(length(col("bytes")).cast("long")), lit(0L)).as("byte_sum"))
    }),

    // ----- Composed join / layout operators -----------------------------

    // Backward as-of join: each event of a low-id user picks that user's
    // most recent order at-or-before the event (price-at-trade-time shape).
    // Timestamps become exact epoch MICROS on both engines: DuckDB's
    // TIMESTAMP truncates the nano-precision events.ts to micros, so the
    // Spark side truncates identically (`ts div 1000`; exact — and order
    // timestamps are micro-aligned, so no match can flip). The right side
    // pre-aggregates to one row per (user, ts) — the determinism contract
    // DuckDB's native ASOF JOIN (the oracle) imposes too.
    "asof_join" -> ((s, dir) => {
      val ev = eventsNs(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), expr("ts div 1000").as("e_ts"), col("event_id"))
      val ord = s.read.parquet(pq(dir, "orders"))
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
        .agg(max(col("o_orderkey")).as("o_key"))
      TemporalJoin.asofBackward(ev, ord, Seq("user_id"), "e_ts", "o_ts")
        .select(col("user_id"), col("e_ts"), col("event_id"), col("o_ts"), col("o_key"))
    }),

    // Nearest as-of join: each event picks the order closest in time in
    // EITHER direction (ties to the earlier row — backward bias). The
    // oracle is a per-row argmin via LATERAL; the operator is the same
    // linear merge shape as the directional as-ofs (one shuffle, two
    // growing-frame window passes sharing the exchange, no join operator).
    "asof_nearest" -> ((s, dir) => {
      val ev = eventsNs(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), expr("ts div 1000").as("e_ts"), col("event_id"))
      val ord = s.read.parquet(pq(dir, "orders"))
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
        .agg(max(col("o_orderkey")).as("o_key"))
      TemporalJoin.asofNearest(ev, ord, Seq("user_id"), "e_ts", "o_ts")
        .select(col("user_id"), col("e_ts"), col("event_id"), col("o_ts"), col("o_key"))
    }),

    // The as-of enrichment running as a STREAM: the same event subset
    // replayed through Trigger.AvailableNow and enriched stream-static
    // against the (broadcast, sorted-history) dimension — stateless, so
    // append mode needs no watermark and the replay must equal the batch
    // left as-of exactly. Unmatched events survive with null dims (LEFT
    // semantics — the streaming enrich never drops events).
    "stream_asof_enrich" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_asof_" + suffix
      eventsNs(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), expr("ts div 1000").as("e_ts"), col("event_id"))
        .write.mode("overwrite").parquet(staging)
      // dim keys outside the staged events' key set are unreachable under
      // the left equi-join — filter them BEFORE the history aggregate so
      // the per-batch broadcast carries only matchable keys
      val ord = s.read.parquet(pq(dir, "orders"))
        .filter(col("o_custkey") < 30)
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
        .agg(max(col("o_orderkey")).as("o_key"))
      val stream = s.readStream.schema(s.read.parquet(staging).schema).parquet(staging)
      val sink = "graft_stream_asof_sink_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_asof_ckpt").toFile
      try {
        graft.streaming.StreamOps.enrichAsOf(stream, ord,
            Seq("user_id"), "e_ts", "o_ts")
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink)
        .select(col("user_id"), col("e_ts"), col("event_id"), col("o_ts"), col("o_key"))
    }),

    // STREAMING gap sessionization through the custom-state operator:
    // closedSessions (flatMapGroupsWithState, O(1) state per user) replays
    // the events table via AvailableNow; the oracle recomputes the same
    // sessions relationally (gaps-and-islands). Staged as ONE file so the
    // run is a single batch: every emitted session is successor-closed
    // (= all but each user's last island — watermark timeouts, spec-covered
    // separately, are kept out of reach by a huge delay so the emitted set
    // is closed-form). Values are staged integer-valued (floor(v*100)) so
    // the double session sums are bit-stable on both engines.
    "stream_sessions" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_sess_" + suffix
      eventsNs(s, dir)
        .filter(col("user_id") < 20)
        .select(col("user_id"),
          timestamp_millis(expr("ts div 1000000")).as("ts"),
          floor(col("value") * 100).cast("double").as("value"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val sink = "graft_stream_sess_sink_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sess_ckpt").toFile
      try {
        import s.implicits._
        graft.streaming.StreamOps.closedSessions(
            s.readStream.schema(s.read.parquet(staging).schema).parquet(staging)
              .as[graft.streaming.UserEvent],
            gapMs = 6L * 3600 * 1000, watermark = "2400 hours")
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink).select(col("user_id"),
        unix_millis(col("session_start")).as("s_start"),
        unix_millis(col("session_end")).as("s_end"),
        col("n_events"),
        col("value_sum").cast("long").as("v_sum"))
    }),

    // The closedSessions TIMEOUT path, end-to-end: unlike stream_sessions
    // (successor-closed sessions only — each user's last island stays open
    // in state), this run pushes the event-time watermark past every open
    // session with far-future sentinel events across TWO AvailableNow runs
    // sharing one checkpoint (run 2 restores run 1's state, so the timeout
    // fires on RECOVERED state — the production restart shape). The
    // emitted set is then ALL islands per user, and the oracle is the full
    // gaps-and-islands recompute with no last-island exclusion. Parquet
    // sink: the memory sink cannot resume from a checkpoint.
    "stream_sessions_final" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_sessf_" + suffix
      val outDir = "/tmp/graft_stream_sessf_out_" + suffix
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
      val ev = eventsNs(s, dir).filter(col("user_id") < 20)
        .select(col("user_id"),
          timestamp_millis(expr("ts div 1000000")).as("ts"),
          floor(col("value") * 100).cast("double").as("value"))
      def sentinel(ms: Long) = s.range(1).select(lit(9999L).as("user_id"),
        timestamp_millis(lit(ms)).as("ts"), lit(0.0d).as("value"))
      val far = 4102444800000L // 2100-01-01, beyond every staged event
      // run 1: one file -> one batch; sessions build, nothing times out
      // (the watermark only moves at batch end)
      ev.unionByName(sentinel(far)).coalesce(1)
        .write.mode("append").parquet(staging)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_sessf_ckpt").toFile
      def runOnce(): Unit = {
        import s.implicits._
        graft.streaming.StreamOps.closedSessions(
            s.readStream.schema(s.read.parquet(staging).schema).parquet(staging)
              .as[graft.streaming.UserEvent],
            gapMs = 6L * 3600 * 1000, watermark = "0 seconds")
          .toDF()
          .writeStream.format("parquet").outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .option("path", outDir)
          .start().awaitTermination()
      }
      try {
        runOnce()
        // run 2: the recovered watermark (= the first sentinel) now
        // exceeds every real session's last+gap, so they ALL time out;
        // the second sentinel (> gap later) successor-closes the first
        // sentinel's own session so user 9999 leaves clean state too
        sentinel(far + 13L * 3600 * 1000).coalesce(1)
          .write.mode("append").parquet(staging)
        runOnce()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.read.parquet(outDir).filter(col("user_id") < 20)
        .select(col("user_id"),
          unix_millis(col("session_start")).as("s_start"),
          unix_millis(col("session_end")).as("s_end"),
          col("n_events"),
          col("value_sum").cast("long").as("v_sum"))
    }),

    // STREAMING running totals through the mapGroupsWithState escape
    // hatch, replayed over FOUR micro-batches (one file per trigger) so
    // the state genuinely carries across triggers. Update mode emits one
    // row per (user, trigger-seen); n_events is strictly increasing per
    // user, so max_by picks each user's final state — which must equal
    // the plain batch group-by. Values staged integer-valued for
    // bit-stable double accumulation.
    "stream_running_totals" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_rt_" + suffix
      eventsNs(s, dir)
        .filter(col("user_id") < 20)
        .select(col("user_id"),
          timestamp_millis(expr("ts div 1000000")).as("ts"),
          floor(col("value") * 100).cast("double").as("value"))
        .repartition(4).write.mode("overwrite").parquet(staging)
      val sink = "graft_stream_rt_sink_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_rt_ckpt").toFile
      try {
        import s.implicits._
        graft.streaming.StreamOps.runningTotals(
            s.readStream.schema(s.read.parquet(staging).schema)
              .option("maxFilesPerTrigger", "1").parquet(staging)
              .as[graft.streaming.UserEvent])
          .toDF()
          .writeStream.format("memory").queryName(sink).outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink).groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          max_by(col("total_value"), col("n_events")).cast("long").as("v_sum"))
    }),

    // STREAMING sliding-window counts in COMPLETE mode: every (30 min
    // window, 10 min slide) bucket's event count, replayed AvailableNow —
    // complete mode re-emits the full aggregate each trigger, so the final
    // memory-sink table equals the batch group-by no matter how the input
    // splits into batches. The oracle explodes each event into its three
    // containing windows (window = 3 x slide, epoch-aligned).
    "stream_window_counts" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_win_" + suffix
      eventsNs(s, dir)
        .select(timestamp_millis(expr("ts div 1000000")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val sink = "graft_stream_win_sink_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_win_ckpt").toFile
      try {
        graft.streaming.StreamOps.windowedCounts(
            s.readStream.schema(s.read.parquet(staging).schema).parquet(staging),
            "ts", "30 minutes", "10 minutes", watermark = "2400 hours")
          .writeStream.format("memory").queryName(sink).outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink)
        .select(unix_millis(col("window_start")).as("window_start"), col("n_events"))
    }),

    // STREAMING within-watermark dedup: dropDuplicatesWithinWatermark over
    // (user_id, event_type) emits each key once; projecting the keys makes
    // the emitted SET closed-form (payload of the surviving row is
    // arrival-order-dependent and deliberately not part of the contract).
    "stream_dedup" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val staging = "/tmp/graft_stream_dedup_" + suffix
      eventsNs(s, dir)
        .select(col("user_id"), col("event_type"),
          timestamp_millis(expr("ts div 1000000")).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val sink = "graft_stream_dedup_sink_" + suffix
      val ckpt = java.nio.file.Files.createTempDirectory("graft_dedup_ckpt").toFile
      try {
        graft.streaming.StreamOps.dedupStream(
            s.readStream.schema(s.read.parquet(staging).schema).parquet(staging),
            "ts", Seq("user_id", "event_type"), watermark = "2400 hours")
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt.toString)
          .start().awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      s.table(sink).select(col("user_id"), col("event_type"))
    }),

    // STREAMING ingest loop: the continuous form of pipeline_ingest. The
    // reference corpus is persisted once as a band store + doc store pair;
    // the increment then arrives as a FILE STREAM processed one file per
    // micro-batch (foreachBatch), each batch scrubbed against the store
    // and its survivors absorbed before the next batch runs. The increment
    // is pre-deduplicated on its token sets, which makes the final store
    // state independent of micro-batch boundaries (the split-invariance
    // contract on StreamOps.ingestIncrements); the oracle recomputes that
    // same fixpoint in closed form.
    "stream_ingest" -> ((s, dir) => withStreamShuffle(s) {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val band = freshTable(s, "graft_si_band_" + suffix)
      val docs = freshTable(s, "graft_si_docs_" + suffix)
      val log = freshTable(s, "graft_si_log_" + suffix)
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        band, buckets = 8)
      Dedup.writeDocStore(ref, col("doc_id"), TextOps.tokenSet(col("text")), docs)
      // increment: docs <70 relabeled, PRE-DEDUPED on token set (smallest
      // id wins; min_by carries a representative text) per the
      // split-invariance contract
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 700000L).as("doc_id"), col("text"),
          TextOps.tokenSet(col("text")).as("ws"))
        .groupBy(col("ws"))
        .agg(min(col("doc_id")).as("doc_id"),
          min_by(col("text"), col("doc_id")).as("text"))
        .select(col("doc_id"), col("text"))
      val staging = "/tmp/graft_stream_ingest_" + suffix
      inc.repartition(4).write.mode("overwrite").parquet(staging)
      val stream = s.readStream.schema(s.read.parquet(staging).schema)
        .option("maxFilesPerTrigger", "1").parquet(staging)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toFile
      try {
        graft.streaming.StreamOps.ingestIncrements(stream,
          col("doc_id"), TextOps.tokenSet(col("text")),
          band, docs, log, buckets = 8, ckpt.toString).awaitTermination()
      } finally org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
      val surv = s.table(docs).filter(col("doc_id") >= 700000L)
      s.read.parquet(staging)
        .agg(count(lit(1)).as("n_inc"),
          coalesce(sum(col("doc_id")), lit(0L)).as("inc_id_sum"))
        .crossJoin(surv.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(col("doc_id")), lit(0L)).as("surv_id_sum")))
        .crossJoin(s.table(band).agg(count(lit(1)).as("store_band_rows")))
    }),

    // Range (point-in-interval) join with no equi-key: shipments that fell
    // inside an order's 30-day fulfilment window. The binned equi-join
    // replaces the broadcast-nested-loop cartesian Catalyst plans for a
    // bare BETWEEN; one day per bin, exact nano arithmetic on both engines.
    "range_join" -> ((s, dir) => {
      val day = 86400L * 1000000000L
      val pts = s.read.parquet(pq(dir, "lineitem"))
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (unix_micros(col("l_shipdate").cast("timestamp")) * 1000L).as("ship_ns"))
      val ivs = s.read.parquet(pq(dir, "orders"))
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("iv_order"),
          (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(30L * 86400L * 1000000000L))
      RangeJoin.pointInInterval(pts, "ship_ns", ivs, "w_start", "w_end", day)
        .groupBy(col("iv_order"))
        .agg(count(lit(1)).as("n_ship"),
          sum(col("l_linenumber").cast("long")).as("ln_sum"))
    }),

    // Forward as-of join: time-to-first-shipment — each order picks the
    // EARLIEST shipment date at-or-after its order date (same merge
    // formulation, mirrored frame). Right side pre-aggregated per
    // (order, ship date) for the uniqueness contract.
    "asof_fwd" -> ((s, dir) => {
      val ord = s.read.parquet(pq(dir, "orders"))
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
      val ship = s.read.parquet(pq(dir, "lineitem"))
        .groupBy(col("l_orderkey").as("o_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_ts"))
        .agg(count(lit(1)).as("n_items"),
          max(col("l_linenumber")).cast("long").as("max_line"))
      TemporalJoin.asofForward(ord, ship, Seq("o_orderkey"), "o_ts", "ship_ts")
        .select(col("o_orderkey"), col("o_ts"), col("ship_ts"),
          col("n_items"), col("max_line"))
    }),

    // Interval-overlap join with no equi-key: 30-day fulfilment windows of
    // two disjoint order subsets that overlap in time. Both sides bin onto
    // days; the pair survives only in the first shared bin, so each
    // overlapping pair is emitted exactly once with no dedup pass.
    "interval_join" -> ((s, dir) => {
      val d30 = 30L * 86400L * 1000000L // micros
      def wins(m: Long, k: String, s0: String, e0: String) =
        s.read.parquet(pq(dir, "orders"))
          .filter(col("o_orderkey") % 100 === m)
          .select(col("o_orderkey").as(k),
            unix_micros(col("o_orderdate").cast("timestamp")).as(s0))
          .withColumn(e0, col(s0) + lit(d30))
      val a = wins(0, "a_key", "a_s", "a_e")
      val b = wins(50, "b_key", "b_s", "b_e")
      RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 86400L * 1000000L)
        .groupBy(col("a_key"))
        .agg(count(lit(1)).as("n_overlap"), sum(col("b_key")).as("bkey_sum"))
    }),

    // Z-order clustering key as a first-class expression: Morton-interleave
    // (o_custkey, o_orderkey) and roll up per z-range bucket — the exact
    // integer bit math the layout writer sorts by ([[Layout.writeZOrdered]];
    // per-file stats-tightening is asserted in LayoutSpec), replayed
    // verbatim by the DuckDB oracle via [[Layout.zvalue2Sql]].
    "zorder_key" -> ((s, dir) => {
      s.read.parquet(pq(dir, "orders"))
        .select(Layout.zvalue2(col("o_custkey"), col("o_orderkey")).as("z"))
        .withColumn("zbucket", expr(s"z div ${1L << 22}"))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"), min(col("z")).as("min_z"), max(col("z")).as("max_z"))
    }),

    // Context-window chunking with stride overlap (RAG splitting / long-doc
    // training): chunk i covers tokens [i*stride, i*stride+size), short
    // tail kept. Narrow projection + posexplode; exact integer chunk count.
    "text_chunks" -> ((s, dir) => {
      val chunkSize = 40
      val chunkStride = 30
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        // materialize tokens ONCE: chunkTokens' interpreted lambdas would
        // re-derive an embedded tokenizer expression per chunk
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode(TextOps.chunkTokens(col("toks"), chunkSize, chunkStride))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_toks"),
          element_at(col("chunk"), 1).as("head_tok"),
          element_at(col("chunk"), size(col("chunk"))).as("tail_tok"))
    }),

    // Sparse all-pairs similarity: inverted-index posting self-join over
    // word bigrams with a df-cap (Bayardo-style frequent-term pruning).
    // Per-term join fanout is bounded by maxDf^2 and pair partials by
    // maxDf x kept postings — linear in the corpus for a fixed cap, never
    // the O(n^2) brute force. Exact integer tf inner products; top-20 by
    // (dot desc, ids) is a total order, physically TakeOrderedAndProject.
    "sparse_pairs" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      SparseSim.topPairs(d, col("doc_id"), TextOps.wordNgrams(col("text"), 2),
        maxDf = 20L, k = 20)
    }),

    // Per-source redundancy report: what fraction of each source's
    // distinct-bigram postings also appear in at least one OTHER document
    // — the "how templated is this source" dashboard row that decides
    // where dedup budget goes. One posting shuffle (the inverted-index
    // build, corpus-token-sized once), a term-keyed window for df on that
    // same partitioning, then a counter-scale per-source aggregate; exact
    // integer micro-units.
    "corpus_redundancy" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val p = d.select(col("source"), col("doc_id"),
        explode(array_distinct(TextOps.wordNgrams(col("text"), 2))).as("g"))
      val withDf = p.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("g"))))
      withDf.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_postings"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("shared_micro",
          expr("n_shared * 1000000L div n_postings"))
    }),

    // Schema-evolution diff from FOOTERS: stage an evolved snapshot
    // (added column, removed column, int64->int32 narrowing), then diff
    // the two layouts through the metadata source's column level —
    // added/removed/type_changed/unchanged per column plus value counts,
    // at footer-read cost (no data scan on either side). The oracle
    // re-derives the same diff from DuckDB's parquet_metadata.
    "meta_schema_diff" -> ((s, dir) => {
      val out = "/tmp/graft_schema_diff_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "orders"))
        .withColumn("o_priority_rank", (col("o_orderkey") % 5).cast("int"))
        .withColumn("o_custkey", col("o_custkey").cast("int"))
        .drop("o_orderpriority")
        .coalesce(1).write.mode("overwrite").parquet(out)
      def side(path: String, t: String, n: String) =
        meta(s, path, "column")
          .groupBy(col("path").as("col_name"))
          .agg(max(col("type")).as(t), sum(col("num_values")).as(n))
      side(pq(dir, "orders"), "type_before", "n_before")
        .join(side(out, "type_after", "n_after"), Seq("col_name"), "full_outer")
        .select(col("col_name"),
          when(col("type_before").isNull, lit("added"))
            .when(col("type_after").isNull, lit("removed"))
            .when(col("type_before") =!= col("type_after"), lit("type_changed"))
            .otherwise(lit("unchanged")).as("status"),
          coalesce(col("type_before"), lit("-")).as("type_before"),
          coalesce(col("type_after"), lit("-")).as("type_after"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
    }),

    // LOGICAL-type-aware schema diff: the column-level diff above compares
    // physical types, which cannot see a DECIMAL scale change riding the
    // same INT64 — exactly the drift that silently corrupts downstream
    // arithmetic. The file level's reconstructed schema string carries the
    // full logical annotations, so this diff parses each side's column
    // declarations (repetition dropped, physical + annotation kept) and
    // classifies per column. The fixture evolves: price DECIMAL(18,2) ->
    // DECIMAL(18,4) (logical-ONLY change, same physical), flag removed,
    // qty added; the oracle pins the declarations closed-form from the
    // construction. Footer cost only — no data pages touched.
    "meta_schema_diff_logical" -> ((s, dir) => {
      val base = "/tmp/graft_schema_logical_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val l = s.read.parquet(pq(dir, "lineitem"))
      l.select(col("l_orderkey"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"),
          col("l_returnflag").as("flag"))
        .coalesce(1).write.mode("overwrite").parquet(base + "_v1")
      l.select(col("l_orderkey"),
          to_date(col("l_shipdate")).as("ship"),
          col("l_extendedprice").cast("decimal(18,4)").as("price"),
          col("l_linenumber").as("qty"))
        .coalesce(1).write.mode("overwrite").parquet(base + "_v2")
      def decls(path: String, side: String) =
        meta(s, path, "file")
          .select(explode(split(col("schema"), "\n")).as("line"))
          .select(trim(regexp_replace(col("line"), ";\\s*$", "")).as("line"))
          .filter(col("line").rlike("^(optional|required|repeated) "))
          .select(split(col("line"), " ").as("t"))
          .select(element_at(col("t"), 3).as("col_name"),
            trim(concat_ws(" ", element_at(col("t"), 2),
              array_join(slice(col("t"), 4, 100), " "))).as("decl_" + side))
      decls(base + "_v1", "before")
        .join(decls(base + "_v2", "after"), Seq("col_name"), "full_outer")
        .select(col("col_name"),
          when(col("decl_before").isNull, lit("added"))
            .when(col("decl_after").isNull, lit("removed"))
            .when(col("decl_before") =!= col("decl_after"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"),
          coalesce(col("decl_before"), lit("-")).as("decl_before"),
          coalesce(col("decl_after"), lit("-")).as("decl_after"))
    }),

    // Winsorization through the histogram sketch: per-returnflag 5%/95%
    // quantile bounds from a counter-scale aggregate (never a sort of the
    // data), broadcast back, then a narrow clamp — the outlier-clipping
    // feature-pipeline step. Clip counts and the exact decimal sum of the
    // clipped column pin the whole construction.
    "winsorize_clip" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
      Sketches.winsorize(l, col("l_returnflag"), col("l_quantity"),
          width = 2L, nbins = 32, loMicro = 50000L, hiMicro = 950000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("clipped") > col("l_quantity"), 1L).otherwise(0L)).as("n_raised"),
          sum(when(col("clipped") < col("l_quantity"), 1L).otherwise(0L)).as("n_lowered"),
          max(col("lo_bound")).as("lo_bound"), max(col("hi_bound")).as("hi_bound"),
          dsum(col("clipped")).as("sum_clipped"))
    }),

    // Character-collision (Rényi-2) repetitiveness: the log-free entropy
    // proxy — exact integer micro-units, one narrow codegen pass — ranking
    // the most degenerate (padding/separator-spam) documents first. The
    // quality-filter companion to text_quality's ratio features.
    "text_diversity" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      d.select(col("doc_id"), TextOps.charCollisionMicro(col("text")).as("coll_micro"))
        .orderBy(col("coll_micro").desc, col("doc_id"))
        .limit(20)
    }),

    // Content-defined chunking dedup: chunk boundaries from a rolling
    // 16-codepoint window hash (divisor 32), so a 2-char inserted prefix
    // ('zq' planted copies) re-synchronizes to identical chunks after the
    // first boundary — the shifted-duplicate case fixed-stride spans
    // structurally miss. Pairs = docs sharing >= 2 distinct chunks of
    // >= 20 chars; the oracle replays the SAME window hash
    // position-parallel in SQL (the rolling and direct forms are the same
    // mathematical function).
    "cdc_dedup" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val corpus = d.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
        .union(d.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(lit("zq"), col("text")).as("text")))
      Dedup.cdcSharedPairs(corpus, col("doc_id"), col("text"),
        window = 16, divisor = 32, minChunkLen = 20, minShared = 2)
    }),

    // Substring retrieval via a char q-gram inverted index: candidates
    // must contain EVERY q-gram of the pattern (zero false negatives),
    // then an exact contains() verify removes gram coincidences — the
    // candidates-then-verify contract, here over an index whose persisted
    // form ([[SubstrSearch.writeGramIndex]]) is gram-bucket-pruned at
    // probe time. Result equals the plain contains() scan, found without
    // one.
    "substr_search" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      SubstrSearch.search(d, "doc_id", "text", "fast merge", q = 8)
    }),

    // Corpus term statistics — the IDF-table / stopword-list / vocabulary
    // builder: two keyed aggregations with map-side partials, exact counts.
    "text_term_stats" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.termStats(d, col("doc_id"), TextOps.tokens(col("text")))
        .orderBy(col("df").desc, col("token"))
        .limit(20)
    }),

    // BM25 retrieval for one literal query: per-term dfs inlined driver-side
    // so scoring is a narrow codegen projection (CountIn term frequencies),
    // then the bounded-heap top-k. k1=1.0 / b=0.5 / ratio idf keep every
    // constant and operation IEEE-exact on both engines, so the DuckDB
    // oracle replays the score bit-identically (ln differs in the last ulp
    // across libm implementations; the ratio idf never does).
    "text_bm25" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.bm25TopK(d, "doc_id", TextOps.tokens(col("text")),
        Seq("window", "merge", "spark"), k = 15, k1 = 1.0, b = 0.5, logIdf = false)
        .select(col("rank"), col("doc_id"),
          floor(col("score") * lit(1000000.0d)).cast("long").as("score_micro"))
    }),

    // Batch BM25 retrieval — the termStats JOIN formulation: three query
    // term-sets scored in ONE corpus pass (postings restricted to the
    // broadcast query vocabulary before the tf aggregate), per-term
    // micro-floored scores (order-independent sums — bit-exact SQL
    // replay), bounded-heap top-5 per query.
    "bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val d = s.read.parquet(pq(dir, "documents"))
      val q = Seq(
        (0L, "window"), (0L, "merge"), (0L, "spark"),
        (1L, "hash"), (1L, "join"), (1L, "shuffle"),
        (2L, "parquet"), (2L, "footer"), (2L, "metadata"), (2L, "stream"))
        .toDF("q_id", "term")
      Relevance.bm25BatchTopK(d, "doc_id", TextOps.tokens(col("text")),
        q, "q_id", "term", k = 5, k1 = 1.0, b = 0.5, logIdf = false)
    }),

    // SimHash NEAR-dup retrieval (Hamming distance <= 3) via pigeonhole
    // banding — the retrieval dedup_simhash's equality join cannot do.
    // Planted exact copies have distance 0, and banding has guaranteed
    // recall at d <= maxDist, so the planted pair set is an exact oracle.
    "dedup_simhash_near" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir).withColumn("ws", TextOps.tokenSet(col("text")))
      val sh = Dedup.simhash64(corpus, col("doc_id"), col("ws"))
      Dedup.simhashHammingPairs(sh, 3)
        .filter(col("a_id") < 50 && col("b_id") === col("a_id") + 100000L)
        .select(col("a_id"), col("b_id"))
    })
  )

  /**
   * Exact-pair verification shared by the hash-prefiltered dedup queries:
   * the (tiny, broadcast) candidate-pair set fetches `valueName` for both
   * sides from `values`, keeps only pairs whose values are EXACTLY equal,
   * and aggregates to (dup_pairs, id_sum). Hash prefilters upstream can
   * therefore never introduce false positives, and the wide value column
   * never rides a shuffle.
   */
  private def exactPairAgg(
      values: DataFrame, idName: String, valueName: String,
      pairs: DataFrame): DataFrame = {
    val withA = values.join(broadcast(pairs), col(idName) === col("a_id"))
      .select(col("a_id"), col("b_id"), col(valueName).as("__v_a"))
    values.join(broadcast(withA), col(idName) === col("b_id"))
      .filter(col(valueName) === col("__v_a"))
      .agg(count(lit(1)).as("dup_pairs"),
        coalesce(sum(col("a_id") + col("b_id")), lit(0L)).as("id_sum"))
  }

  /** Documents plus planted duplicates (doc_id < 50 re-inserted shifted by
    * 100000) so dedup answers are non-trivial on a dup-free corpus. */
  private def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
    d.union(d.filter(col("doc_id") < 50).select(col("doc_id") + 100000L, col("text")))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------

  private val lineitemPq = s"$OracleSf/lineitem.parquet"

  /** Shared corpus-with-planted-duplicates CTE (mirrors plantedCorpus). */
  private val corpusCte =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
      |)""".stripMargin

  /**
   * Unrolled SQL replay of [[graft.ops.Clustering.kmeansGridAssign]]:
   * grid quantization (`round(x*1000)` of an exact <=34-bit double product
   * — no half-way case can exist), squared-L2 argmin with ties to the
   * lower seed id (`ORDER BY list_distance, j` — sqrt is injective on the
   * exact integer distances, so the ordering matches the engine's squared
   * comparison), exact-integer Lloyd means with truncating division
   * (`CAST(sum AS BIGINT) // n` == Java long division for these values),
   * empty cells keeping the previous centroid (LEFT JOIN + coalesce).
   *
   * Fixture contract (pinned by ClusteringSpec "the k-means oracle's seed
   * contract holds on the oracle fixture"): the SQL seeds with
   * `WHERE vec_id < k` and labels clusters by seed vec_id, while the
   * engine seeds with the k smallest non-null-vector ids and labels by
   * seed RANK. These coincide iff vec_ids 0..k-1 exist with non-null
   * embeddings — true of the driver's testdata; the spec fails loudly if
   * the fixture ever changes shape instead of letting the gate mismatch.
   */
  /** The WITH-chain replaying [[graft.ops.Clustering.kmeansGridAssign]] in
    * DuckDB SQL over `corpusSql` (any query yielding vec_id, embedding);
    * ends with CTE `a$iters` holding (vec_id, embedding, sv, cell) — the
    * caller appends its own final SELECT (and any extra CTEs). */
  private def kmeansAssignCtes(dim: Int, k: Int, iters: Int, corpusSql: String): String = {
    def assign(name: String, cents: String) =
      s"""$name AS (
         |  SELECT vec_id, embedding, sv,
         |    (SELECT j FROM $cents ORDER BY list_distance(v.sv, $cents.c), j LIMIT 1) AS cell
         |  FROM v)""".stripMargin
    def means(name: String, a: String) =
      s"""$name AS (
         |  SELECT cell, t.p AS p, CAST(sum(sv[t.p+1]) AS BIGINT) // count(*) AS comp
         |  FROM $a CROSS JOIN range($dim) t(p)
         |  GROUP BY cell, t.p)""".stripMargin
    def nextc(name: String, prev: String, m: String) =
      s"""$name AS (
         |  SELECT $prev.j AS j,
         |    list(CAST(coalesce(m.comp, $prev.c[t.p+1]) AS DOUBLE) ORDER BY t.p) AS c
         |  FROM $prev CROSS JOIN range($dim) t(p)
         |  LEFT JOIN $m m ON m.cell = $prev.j AND m.p = t.p
         |  GROUP BY $prev.j)""".stripMargin
    val rounds = (0 until iters).map { i =>
      // a_i assigns against c_i, whose means m_i yield c_{i+1}
      s"""${assign(s"a$i", s"c$i")},
         |${means(s"m$i", s"a$i")},
         |${nextc(s"c${i + 1}", s"c$i", s"m$i")},""".stripMargin
    }.mkString("\n")
    s"""WITH corpus AS ($corpusSql),
       |v AS (
       |  SELECT vec_id, embedding,
       |    [CAST(round(CAST(x AS DOUBLE)*1000) AS DOUBLE) for x in embedding] AS sv
       |  FROM corpus WHERE embedding IS NOT NULL),
       |c0 AS (SELECT vec_id AS j, sv AS c FROM v WHERE vec_id < $k),
       |$rounds
       |${assign(s"a$iters", s"c$iters")}""".stripMargin
  }

  /** Unrolled SQL replay of [[graft.ops.Bpe.trainOnWords]]: word-frequency
    * base, then per round weighted adjacent-pair counts, the
    * (cnt desc, left, right) argmax, and greedy left-to-right merge
    * application via non-overlapping `replace` over bracket-delimited
    * symbols. Ends with CTEs `b0..b${iters-1}` (the chosen pairs) and
    * `v$iters` (the fully-merged vocabulary — each word's row is exactly
    * its encoding under the trained merge list). ASCII corpus assumed:
    * the argmax tie-break compares strings, and UTF-16 (engine) vs UTF-8
    * (DuckDB) orders agree only below U+0080 — BpeSpec pins the fixture. */
  private def bpeTrainCtes(iters: Int): String = {
    val rounds = (0 until iters).map { i =>
      s"""p$i AS (
         |  SELECT q.pr.l AS l, q.pr.r AS r, sum(q.w) AS cnt FROM (
         |    SELECT w, unnest(list_transform(range(1, len(s)),
         |      j -> struct_pack(l := s[j], r := s[j+1]))) AS pr
         |    FROM v$i) q GROUP BY q.pr.l, q.pr.r),
         |b$i AS (SELECT l, r FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
         |v${i + 1} AS (
         |  SELECT word, w,
         |    string_split(replace('⟨' || array_to_string(s, '⟩⟨') || '⟩',
         |      '⟨' || b.l || '⟩⟨' || b.r || '⟩',
         |      '⟨' || b.l || ' ' || b.r || '⟩')[2:-2], '⟩⟨') AS s
         |  FROM v$i CROSS JOIN b$i b),""".stripMargin
    }.mkString("\n")
    s"""WITH w0 AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS w FROM (
       |    SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
       |    FROM documents) GROUP BY word),
       |v0 AS (SELECT word, w, regexp_extract_all(word, '.') AS s FROM w0),
       |$rounds
       |z_ AS (SELECT 1)""".stripMargin
  }

  private def bpeMergesOracleSql(iters: Int): String =
    s"""${bpeTrainCtes(iters)}
       |${(0 until iters).map(i =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS rank, l AS "left", r AS "right" FROM b$i""")
      .mkString("\nUNION ALL\n")}""".stripMargin

  private def bpeEncodeOracleSql(iters: Int): String =
    s"""${bpeTrainCtes(iters)}
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(v.s)) AS BIGINT) AS n_bpe_tokens
       |FROM (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
       |  FROM documents WHERE doc_id < 50) d
       |JOIN v$iters v USING (word)
       |GROUP BY d.doc_id""".stripMargin

  private def kmeansOracleSql(dim: Int, k: Int, iters: Int): String =
    s"""${kmeansAssignCtes(dim, k, iters, "SELECT vec_id, embedding FROM embeddings")}
       |SELECT cell AS cluster, count(*) AS csize,
       |  CAST(sum(vec_id) AS BIGINT) AS id_sum
       |FROM a$iters GROUP BY cell""".stripMargin

  /** Replays [[graft.ops.Clustering.semanticDedup]]: the k-means chain over
    * the planted corpus, then within-cluster cosine pairs and the min-id
    * dominance drop rule. Joins on the cluster alone (no LSH bucket): a
    * same-cluster pair above the threshold that differs in bucket would
    * diverge, but planted exact duplicates share buckets by construction
    * and random pairs sit far below the threshold — the same recall
    * contract dedup_embedding's oracle pins. */
  private def semanticDedupOracleSql(
      dim: Int, k: Int, iters: Int, plantLt: Int, threshold: Double): String =
    s"""${kmeansAssignCtes(dim, k, iters,
      s"""SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < $plantLt""".stripMargin)},
       |pairs AS (
       |  SELECT y.vec_id AS b_id
       |  FROM a$iters x JOIN a$iters y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
       |    CAST(y.embedding AS DOUBLE[])) > $threshold),
       |dropped AS (SELECT DISTINCT b_id FROM pairs)
       |SELECT cell AS cluster, count(*) AS n_vecs,
       |  CAST(sum(CASE WHEN d.b_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(sum(CASE WHEN d.b_id IS NULL THEN a.vec_id ELSE 0 END) AS BIGINT) AS keep_id_sum
       |FROM a$iters a LEFT JOIN dropped d ON a.vec_id = d.b_id
       |GROUP BY cell""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "meta_file_level" ->
      s"""SELECT parse_filename(filename) AS filename, CAST(size AS BIGINT) AS size
         |FROM read_blob('$lineitemPq')""".stripMargin,

    "meta_parquet_file_level" ->
      s"""SELECT parse_filename(file_name) AS filename, num_rows,
         |  CAST(num_row_groups AS BIGINT) AS num_row_groups, created_by
         |FROM parquet_file_metadata('$lineitemPq')""".stripMargin,

    "meta_rowgroup_level" ->
      s"""SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
         |  CAST(min(row_group_num_rows) AS BIGINT) AS num_rows,
         |  CAST(min(row_group_num_columns) AS BIGINT) AS num_columns,
         |  CAST(sum(total_compressed_size) AS BIGINT) AS total_compressed_size,
         |  CAST(min(row_group_bytes) AS BIGINT) AS total_uncompressed_size
         |FROM parquet_metadata('$lineitemPq')
         |GROUP BY row_group_id""".stripMargin,

    "meta_column_level" ->
      s"""SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
         |  CAST(column_id AS BIGINT) AS column_id,
         |  path_in_schema AS path, type, compression, encodings,
         |  CAST(num_values AS BIGINT) AS num_values,
         |  CAST(total_compressed_size AS BIGINT) AS total_compressed_size,
         |  CAST(total_uncompressed_size AS BIGINT) AS total_uncompressed_size,
         |  CAST(data_page_offset AS BIGINT) AS data_page_offset,
         |  CAST(dictionary_page_offset AS BIGINT) AS dictionary_page_offset
         |FROM parquet_metadata('$lineitemPq')""".stripMargin,

    "meta_page_bytes" ->
      s"""SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
         |  CAST(column_id AS BIGINT) AS column_id,
         |  CAST(total_compressed_size AS BIGINT) AS total_compressed_size
         |FROM parquet_metadata('$lineitemPq')""".stripMargin,

    // the chunk's footer value count is what the data pages must sum to
    "meta_page_rollup" ->
      s"""SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
         |  CAST(column_id AS BIGINT) AS column_id,
         |  CAST(num_values AS BIGINT) AS n_values
         |FROM parquet_metadata('$lineitemPq')""".stripMargin,

    // closed form for the pinned 1000-rows/page fixture: both the physical
    // page walk and the decoded OffsetIndex must land on ceil(rows/1000)
    "meta_page_oi_match" ->
      """SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
        |  CAST(column_id AS BIGINT) AS column_id,
        |  CAST((row_group_num_rows + 999) // 1000 AS BIGINT) AS n_pages,
        |  CAST((row_group_num_rows + 999) // 1000 AS BIGINT) AS n_oi_pages
        |FROM parquet_metadata('/tmp/graft_pageoi_sf0.01/*.parquet')""".stripMargin,

    // pages re-derived from the data itself: on the sorted pinned layout
    // id // 1000 is the page id, so needed pages / covered rows are plain
    // aggregates over the rows the predicate matches
    "meta_page_skip" ->
      """WITH d AS (SELECT id FROM read_parquet('/tmp/graft_pageskip_sf0.01/*.parquet')),
        |  needed AS (SELECT DISTINCT id // 1000 AS pg FROM d
        |             WHERE id BETWEEN 3500 AND 7200)
        |SELECT CAST(0 AS BIGINT) AS row_group_id,
        |  (SELECT CAST(count(DISTINCT id // 1000) AS BIGINT) FROM d) AS n_pages_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM needed) AS n_pages_needed,
        |  (SELECT CAST(count(*) AS BIGINT) FROM d) AS rows_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM d
        |   WHERE id // 1000 IN (SELECT pg FROM needed)) AS rows_covered""".stripMargin,

    // everything re-derived from the data: page count from the pinned
    // 1000-rows/page layout, value sum and row count from the column
    "meta_page_values" ->
      """SELECT CAST(count(DISTINCT id // 1000) AS BIGINT) AS n_pages,
        |  CAST(sum(id) AS BIGINT) AS value_sum,
        |  CAST(count(*) AS BIGINT) AS n_values
        |FROM read_parquet('/tmp/graft_pagevals_sf0.01/*.parquet')""".stripMargin,

    "meta_dict_values" ->
      """SELECT v, CAST(count(*) AS BIGINT) AS n
        |FROM read_parquet('/tmp/graft_dictvals_sf0.01/*.parquet')
        |GROUP BY v""".stripMargin,

    "meta_prune_multi" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(k), 0) AS BIGINT) AS k_sum
        |FROM read_parquet('/tmp/graft_multiprune_sf0.01/*.parquet')
        |WHERE od BETWEEN DATE '2024-02-01' AND DATE '2024-02-29'
        |  AND k BETWEEN 0 AND 999""".stripMargin,

    "meta_sorting" ->
      """SELECT CAST(row_group_id AS INT) AS row_group_id,
        |  0 AS sc_idx, FALSE AS sc_desc, FALSE AS sc_nulls_first,
        |  CAST(stats_min_value AS BIGINT) AS rg_min,
        |  CAST(stats_max_value AS BIGINT) AS rg_max,
        |  CASE
        |    WHEN stats_min_value IS NULL OR stats_max_value IS NULL
        |      THEN NULL
        |    WHEN row_number()
        |      OVER (PARTITION BY file_name ORDER BY row_group_id) = 1
        |      THEN TRUE
        |    WHEN lag(CAST(stats_max_value AS BIGINT))
        |      OVER (PARTITION BY file_name ORDER BY row_group_id) IS NULL
        |      THEN NULL
        |    ELSE CAST(stats_min_value AS BIGINT) >=
        |      lag(CAST(stats_max_value AS BIGINT))
        |        OVER (PARTITION BY file_name ORDER BY row_group_id)
        |  END AS monotone
        |FROM parquet_metadata('/tmp/graft_sorting_sf0.01/*.parquet')
        |WHERE path_in_schema = 'k'""".stripMargin,

    "meta_encoding_stats" ->
      """SELECT 'DICTIONARY_PAGE' AS page_type,
        |  'PLAIN_DICTIONARY' AS encoding, CAST(1 AS BIGINT) AS n_pages
        |UNION ALL
        |SELECT 'DATA_PAGE', 'PLAIN_DICTIONARY',
        |  CAST(count(DISTINCT rn // 500) AS BIGINT)
        |FROM (SELECT row_number() OVER () - 1 AS rn
        |  FROM read_parquet('/tmp/graft_encstats_sf0.01/*.parquet'))""".stripMargin,

    "meta_delta_values" ->
      """SELECT CAST(count(DISTINCT id // 1000) AS BIGINT) AS n_pages,
        |  CAST(sum(id) AS BIGINT) AS value_sum,
        |  CAST(count(*) AS BIGINT) AS n_values
        |FROM read_parquet('/tmp/graft_deltavals_sf0.01/*.parquet')""".stripMargin,

    "meta_values_any" ->
      """SELECT CAST(count(k) AS BIGINT) AS k_n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(count(lang) AS BIGINT) AS lang_n,
        |  CAST((SELECT count(DISTINCT lang)
        |      FROM read_parquet('/tmp/graft_valsany_sf0.01/v1.parquet'))
        |    + (SELECT count(DISTINCT lang)
        |      FROM read_parquet('/tmp/graft_valsany_sf0.01/v2.parquet'))
        |    AS BIGINT) AS lang_dict,
        |  CAST(count(price) AS BIGINT) AS price_n,
        |  min(price) AS price_mn,
        |  max(price) AS price_mx,
        |  CAST(5 AS BIGINT) AS n_kinds
        |FROM read_parquet('/tmp/graft_valsany_sf0.01/*.parquet')""".stripMargin,

    "orc_stripe_skip" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  TRUE AS skipped_rows, TRUE AS skipped_stripes, TRUE AS sound,
        |  CAST(count(*) FILTER (WHERE l_orderkey BETWEEN 1000 AND 4999)
        |    AS BIGINT) AS n_matches
        |FROM lineitem""".stripMargin,

    "meta_lake_census" ->
      """SELECT 'parquet' AS format, CAST(1 AS BIGINT) AS n_files,
        |  CAST(count(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) AS total_rows
        |FROM documents
        |UNION ALL
        |SELECT 'orc', CAST(1 AS BIGINT),
        |  CAST(count(*) FILTER (WHERE doc_id % 3 = 1) AS BIGINT)
        |FROM documents
        |UNION ALL
        |SELECT 'avro', CAST(1 AS BIGINT),
        |  CAST(count(*) FILTER (WHERE doc_id % 3 = 2) AS BIGINT)
        |FROM documents""".stripMargin,

    "meta_orc_rowindex" ->
      """SELECT CAST(count(*) AS BIGINT) AS rows_rollup,
        |  CAST(min(l_orderkey) AS BIGINT) AS k_min,
        |  CAST(max(l_orderkey) AS BIGINT) AS k_max,
        |  min(CAST(l_extendedprice AS DOUBLE)) AS price_mn,
        |  max(CAST(l_extendedprice AS DOUBLE)) AS price_mx,
        |  TRUE AS stripes_agree
        |FROM lineitem""".stripMargin,

    "orc_rowindex_skip" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  TRUE AS skipped_groups, TRUE AS sound, TRUE AS reader_agrees,
        |  CAST(count(*) FILTER (WHERE l_orderkey BETWEEN 1000 AND 4999)
        |    AS BIGINT) AS n_matches
        |FROM lineitem""".stripMargin,

    "orc_bloom_skip" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  TRUE AS skipped_groups, TRUE AS sound, TRUE AS reader_agrees,
        |  CAST(count(*) FILTER (WHERE l_partkey IN (
        |    (SELECT min(l_partkey) FROM lineitem),
        |    (SELECT max(l_partkey) FROM lineitem), -1))
        |    AS BIGINT) AS n_matches
        |FROM lineitem""".stripMargin,

    "meta_delta_snapshot" ->
      """SELECT version, kind, n_add, n_remove, operation, op_timestamp FROM (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    'commit' AS kind,
        |    CAST(count(add) AS BIGINT) AS n_add,
        |    CAST(count(remove) AS BIGINT) AS n_remove,
        |    max(commitInfo.operation) AS operation,
        |    CAST(max(commitInfo.timestamp) AS BIGINT) AS op_timestamp
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  GROUP BY 1
        |  UNION ALL
        |  SELECT 2, 'checkpoint',
        |    (SELECT CAST(count(add) AS BIGINT) FROM
        |      read_parquet('/tmp/graft_delta_sf0.01/_delta_log/*.checkpoint.parquet')),
        |    (SELECT CAST(count(remove) AS BIGINT) FROM
        |      read_parquet('/tmp/graft_delta_sf0.01/_delta_log/*.checkpoint.parquet')),
        |    NULL, NULL
        |)""".stripMargin,

    "meta_delta_live" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |    AS BIGINT) > 2
        |),
        |ckpt AS (
        |  SELECT CAST(2 AS BIGINT) AS version, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats
        |  FROM read_parquet('/tmp/graft_delta_sf0.01/_delta_log/*.checkpoint.parquet')
        |  WHERE add.path IS NOT NULL OR remove.path IS NOT NULL
        |),
        |actions AS (
        |  SELECT coalesce(apath, rpath) AS path, version,
        |    apath IS NOT NULL AS is_add, stats
        |  FROM (SELECT * FROM tail UNION ALL SELECT * FROM ckpt)
        |),
        |latest AS (
        |  SELECT path, arg_max(is_add, version) AS live,
        |    arg_max(stats, version) AS stats
        |  FROM actions GROUP BY path
        |),
        |live AS (
        |  SELECT path, CAST(json_extract(stats, '$.numRecords') AS BIGINT) AS nrec
        |  FROM latest WHERE live
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(sum(nrec) AS BIGINT) AS live_rows,
        |  (SELECT CAST(sum(num_rows) AS BIGINT)
        |    FROM parquet_file_metadata('/tmp/graft_delta_sf0.01/*.parquet') m
        |    JOIN live l ON parse_filename(m.file_name) = l.path) AS footer_rows,
        |  (SELECT CAST(count(*) AS BIGINT)
        |    FROM parquet_file_metadata('/tmp/graft_delta_sf0.01/*.parquet') m
        |    WHERE parse_filename(m.file_name) NOT IN (SELECT path FROM live)) AS n_dead,
        |  (SELECT CAST(sum(num_rows) AS BIGINT)
        |    FROM parquet_file_metadata('/tmp/graft_delta_sf0.01/*.parquet') m
        |    WHERE parse_filename(m.file_name) NOT IN (SELECT path FROM live)) AS dead_rows
        |FROM live""".stripMargin,

    "meta_table_census" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats,
        |    add.deletionVector.cardinality AS dv_card
        |  FROM read_json_auto('/tmp/graft_deltadv_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max({'is_add': apath IS NOT NULL, 'stats': stats,
        |      'dv': coalesce(CAST(dv_card AS BIGINT), 0)},
        |      version * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS w
        |  FROM tail GROUP BY coalesce(apath, rpath)
        |),
        |dlive AS (
        |  SELECT path,
        |    CAST(json_extract(w.stats, '$.numRecords') AS BIGINT) AS nrec,
        |    w.dv AS dv
        |  FROM latest WHERE w.is_add
        |),
        |ddisk AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_deltadv_sf0.01/*.parquet')
        |),
        |idisk AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_iceberg_sf0.01/data/*.parquet')
        |)
        |SELECT 'delta' AS format,
        |  (SELECT CAST(count(*) AS BIGINT) FROM dlive) AS n_live,
        |  (SELECT CAST(sum(nrec) - sum(dv) AS BIGINT) FROM dlive) AS live_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ddisk) AS n_disk,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM ddisk) AS disk_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ddisk
        |    WHERE name NOT IN (SELECT path FROM dlive)) AS n_dead,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM ddisk
        |    WHERE name NOT IN (SELECT path FROM dlive)) AS dead_rows
        |UNION ALL
        |SELECT 'iceberg',
        |  CAST(6 AS BIGINT),
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM idisk
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet')
        |    - (SELECT CAST(num_rows AS BIGINT) FROM idisk
        |       WHERE name = 'del0.parquet'),
        |  (SELECT CAST(count(*) AS BIGINT) FROM idisk),
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM idisk),
        |  CAST(1 AS BIGINT),
        |  (SELECT CAST(num_rows AS BIGINT) FROM idisk
        |    WHERE name = 'f5.parquet')""".stripMargin,

    "meta_delta_partition_prune" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT)
        |    FROM read_json_auto('/tmp/graft_deltapart_sf0.01/_delta_log/*.json',
        |      format='newline_delimited', union_by_name=true)
        |    WHERE add.path IS NOT NULL) AS n_files,
        |  (SELECT CAST(count(*) AS BIGINT)
        |    FROM read_json_auto('/tmp/graft_deltapart_sf0.01/_delta_log/*.json',
        |      format='newline_delimited', union_by_name=true)
        |    WHERE add.partitionValues.lang = 'zh') AS n_pruned,
        |  (SELECT CAST(sum(CAST(json_extract(add.stats, '$.numRecords')
        |      AS BIGINT)) AS BIGINT)
        |    FROM read_json_auto('/tmp/graft_deltapart_sf0.01/_delta_log/*.json',
        |      format='newline_delimited', union_by_name=true)
        |    WHERE add.partitionValues.lang = 'zh') AS pruned_rows,
        |  (SELECT CAST(sum(num_rows) AS BIGINT)
        |    FROM parquet_file_metadata(
        |      '/tmp/graft_deltapart_sf0.01/lang=zh/*.parquet')) AS footer_rows""".stripMargin,

    "meta_delta_time_travel" ->
      """WITH acts AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS cv,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |cis AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v,
        |    max(CAST(commitInfo.timestamp AS BIGINT)) AS ts
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE commitInfo.timestamp IS NOT NULL GROUP BY 1
        |),
        |probes AS (SELECT unnest([500, 2500, 99999]) AS off),
        |resolved AS (
        |  SELECT p.off AS off, max(c.v) AS v
        |  FROM probes p JOIN cis c ON c.ts <= 1700000000000 + p.off
        |  GROUP BY p.off
        |),
        |latest AS (
        |  SELECT r.off AS off, r.v AS v, coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live,
        |    arg_max(stats, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS stats
        |  FROM resolved r JOIN acts a ON a.cv <= r.v
        |  GROUP BY r.off, r.v, coalesce(apath, rpath)
        |)
        |SELECT CAST(off AS BIGINT) AS probe_off, CAST(v AS BIGINT) AS version,
        |  CAST(count(*) FILTER (WHERE live) AS BIGINT) AS n_live,
        |  CAST(sum(CAST(json_extract(stats, '$.numRecords') AS BIGINT))
        |    FILTER (WHERE live) AS BIGINT) AS live_rows
        |FROM latest GROUP BY off, v""".stripMargin,

    "meta_delta_travel" ->
      """WITH acts AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS cv,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |vs AS (SELECT unnest([0, 1, 2, 3, 4]) AS v),
        |latest AS (
        |  SELECT vs.v AS v, coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live,
        |    arg_max(stats, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS stats
        |  FROM vs JOIN acts ON acts.cv <= vs.v
        |  GROUP BY vs.v, coalesce(apath, rpath)
        |)
        |SELECT CAST(v AS BIGINT) AS version,
        |  CAST(count(*) FILTER (WHERE live) AS BIGINT) AS n_live,
        |  CAST(sum(CAST(json_extract(stats, '$.numRecords') AS BIGINT))
        |    FILTER (WHERE live) AS BIGINT) AS live_rows
        |FROM latest GROUP BY v""".stripMargin,

    "meta_delta_v2ckpt" ->
      """WITH acts AS (
        |  SELECT CAST(2 AS BIGINT) AS cv, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats
        |  FROM read_parquet(
        |    '/tmp/graft_deltav2_sf0.01/_delta_log/_sidecars/*.parquet',
        |    union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS cv,
        |    add.path, remove.path, add.stats
        |  FROM read_json_auto('/tmp/graft_deltav2_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live,
        |    arg_max(cv, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS v,
        |    arg_max(stats, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS stats
        |  FROM acts GROUP BY 1
        |)
        |SELECT path, CAST(v AS BIGINT) AS version,
        |  CAST(json_extract(stats, '$.numRecords') AS BIGINT) AS num_records
        |FROM latest WHERE live""".stripMargin,

    "meta_delta_v2ckpt_json" ->
      """WITH acts AS (
        |  SELECT CAST(2 AS BIGINT) AS cv, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats
        |  FROM read_parquet(
        |    '/tmp/graft_deltav2j_sf0.01/_delta_log/_sidecars/*.parquet',
        |    union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |  UNION ALL
        |  -- the glob also reads the JSON MANIFEST (its lines carry no
        |  -- file actions and fall out below), whose extra action kinds
        |  -- make union_by_name demote some structs to JSON — extract
        |  -- through to_json(...)->> so both typings read identically
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS cv,
        |    to_json(add)->>'$.path', to_json(remove)->>'$.path',
        |    to_json(add)->>'$.stats'
        |  FROM read_json_auto('/tmp/graft_deltav2j_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(to_json(add)->>'$.path',
        |    to_json(remove)->>'$.path') IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live,
        |    arg_max(cv, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS v,
        |    arg_max(stats, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS stats
        |  FROM acts GROUP BY 1
        |)
        |SELECT path, CAST(v AS BIGINT) AS version,
        |  CAST(json_extract(stats, '$.numRecords') AS BIGINT) AS num_records
        |FROM latest WHERE live""".stripMargin,

    "meta_delta_crc_audit" ->
      """WITH crc AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    CAST(numFiles AS BIGINT) AS declared_files,
        |    CAST(tableSizeBytes AS BIGINT) AS declared_bytes
        |  FROM read_json_auto('/tmp/graft_deltacrc_sf0.01/_delta_log/*.crc',
        |    filename=true)
        |),
        |acts AS (
        |  SELECT coalesce(add.path, remove.path) AS path,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v,
        |    add.path IS NOT NULL AS is_add,
        |    CAST(add.size AS BIGINT) AS sz
        |  FROM read_json_auto('/tmp/graft_deltacrc_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |per AS (
        |  SELECT c.version, a.path,
        |    arg_max(a.is_add, a.v * 2 + CAST(a.is_add AS BIGINT)) AS live,
        |    arg_max(a.sz, a.v * 2 + CAST(a.is_add AS BIGINT)) AS sz
        |  FROM crc c JOIN acts a ON a.v <= c.version
        |  GROUP BY 1, 2
        |),
        |actuals AS (
        |  SELECT version,
        |    CAST(count(*) FILTER (WHERE live) AS BIGINT) AS actual_files,
        |    CAST(sum(sz) FILTER (WHERE live) AS BIGINT) AS actual_bytes
        |  FROM per GROUP BY 1
        |)
        |SELECT c.version, c.declared_files, c.declared_bytes,
        |  a.actual_files, a.actual_bytes,
        |  c.declared_files = a.actual_files AS files_match,
        |  c.declared_bytes = a.actual_bytes AS bytes_match
        |FROM crc c JOIN actuals a USING (version)""".stripMargin,

    "meta_delta_multickpt" ->
      """WITH acts AS (
        |  SELECT CAST(2 AS BIGINT) AS cv, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats
        |  FROM read_parquet(
        |    '/tmp/graft_deltamp_sf0.01/_delta_log/*.checkpoint.*.parquet',
        |    union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |  UNION ALL
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS cv,
        |    add.path, remove.path, add.stats
        |  FROM read_json_auto('/tmp/graft_deltamp_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live,
        |    arg_max(cv, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS v,
        |    arg_max(stats, cv * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS stats
        |  FROM acts GROUP BY 1
        |)
        |SELECT path, CAST(v AS BIGINT) AS version,
        |  CAST(json_extract(stats, '$.numRecords') AS BIGINT) AS num_records
        |FROM latest WHERE live""".stripMargin,

    "meta_delta_dv_rows" ->
      """WITH f0 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
        |  FROM read_parquet('/tmp/graft_deltadvb_sf0.01/f0.parquet')
        |),
        |f1 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS pos
        |  FROM read_parquet('/tmp/graft_deltadvb_sf0.01/f1.parquet')
        |)
        |SELECT 'f0.parquet' AS path, CAST(3 AS BIGINT) AS n_deleted,
        |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM f0
        |    WHERE pos IN (1, 3, 5)) AS deleted_docid_sum
        |UNION ALL
        |SELECT 'f1.parquet', CAST(2 AS BIGINT),
        |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM f1
        |    WHERE pos IN (0, 2))""".stripMargin,

    "meta_delta_colmap" ->
      """WITH metas AS (
        |  SELECT CAST(metaData->>'$.schemaString' AS VARCHAR) AS ss,
        |    CAST(metaData->'$.partitionColumns' AS VARCHAR[]) AS pcols,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v
        |  FROM read_json_auto('/tmp/graft_deltacm_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE metaData->>'$.id' IS NOT NULL
        |),
        |latest AS (SELECT arg_max(ss, v) AS ss, arg_max(pcols, v) AS pcols
        |  FROM metas),
        |nonpart AS (
        |  SELECT f->>'$.name' AS logical,
        |    f->>'$.metadata."delta.columnMapping.physicalName"' AS phys
        |  FROM (SELECT unnest(CAST(ss->'$.fields' AS JSON[])) AS f
        |    FROM latest)
        |  WHERE NOT list_contains((SELECT pcols FROM latest), f->>'$.name')
        |),
        |live AS (
        |  SELECT add.path AS p
        |  FROM read_json_auto('/tmp/graft_deltacm_sf0.01/_delta_log/*.json',
        |    format='newline_delimited', union_by_name=true)
        |  WHERE add.path IS NOT NULL
        |),
        |cols AS (
        |  SELECT parse_filename(file_name) AS f, list(DISTINCT name) AS present
        |  FROM parquet_schema('/tmp/graft_deltacm_sf0.01/*.parquet')
        |  WHERE num_children IS NULL OR num_children = 0
        |  GROUP BY 1
        |)
        |SELECT l.p AS path,
        |  (SELECT CAST(count(*) AS INTEGER) FROM nonpart) AS n_declared,
        |  CAST(len(c.present) AS INTEGER) AS n_present,
        |  array_to_string(list_sort(list(n.logical)
        |    FILTER (WHERE NOT list_contains(c.present, n.phys))), ',')
        |    AS missing_csv
        |FROM live l JOIN cols c ON c.f = l.p, nonpart n
        |GROUP BY l.p, c.present""".stripMargin,

    "meta_delta_colmap_id" ->
      """WITH metas AS (
        |  SELECT CAST(metaData->>'$.schemaString' AS VARCHAR) AS ss,
        |    CAST(metaData->'$.partitionColumns' AS VARCHAR[]) AS pcols,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v
        |  FROM read_json_auto('/tmp/graft_deltacmid_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE metaData->>'$.id' IS NOT NULL
        |),
        |latest AS (SELECT arg_max(ss, v) AS ss, arg_max(pcols, v) AS pcols
        |  FROM metas),
        |nonpart AS (
        |  SELECT f->>'$.name' AS logical,
        |    CAST(f->'$.metadata."delta.columnMapping.id"' AS BIGINT) AS fid
        |  FROM (SELECT unnest(CAST(ss->'$.fields' AS JSON[])) AS f
        |    FROM latest)
        |  WHERE NOT list_contains((SELECT pcols FROM latest), f->>'$.name')
        |),
        |live AS (
        |  SELECT add.path AS p
        |  FROM read_json_auto('/tmp/graft_deltacmid_sf0.01/_delta_log/*.json',
        |    format='newline_delimited', union_by_name=true)
        |  WHERE add.path IS NOT NULL
        |),
        |cols AS (
        |  SELECT parse_filename(file_name) AS f,
        |    list(DISTINCT field_id) FILTER (WHERE field_id IS NOT NULL)
        |      AS present_ids
        |  FROM parquet_schema('/tmp/graft_deltacmid_sf0.01/*.parquet')
        |  WHERE num_children IS NULL OR num_children = 0
        |  GROUP BY 1
        |)
        |SELECT l.p AS path,
        |  (SELECT CAST(count(*) AS INTEGER) FROM nonpart) AS n_declared,
        |  CAST(len(c.present_ids) AS INTEGER) AS n_present,
        |  array_to_string(list_sort(list(n.logical)
        |    FILTER (WHERE NOT list_contains(c.present_ids, n.fid))), ',')
        |    AS missing_csv
        |FROM live l JOIN cols c ON c.f = l.p, nonpart n
        |GROUP BY l.p, c.present_ids""".stripMargin,

    "meta_delta_colmap_prune" ->
      """WITH metas AS (
        |  SELECT CAST(metaData->>'$.schemaString' AS VARCHAR) AS ss,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v
        |  FROM read_json_auto('/tmp/graft_deltacm_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE metaData->>'$.id' IS NOT NULL
        |),
        |latest AS (SELECT arg_max(ss, v) AS ss FROM metas),
        |phys AS (
        |  SELECT f->>'$.metadata."delta.columnMapping.physicalName"' AS p
        |  FROM (SELECT unnest(CAST(ss->'$.fields' AS JSON[])) AS f
        |    FROM latest)
        |  WHERE f->>'$.name' = 'lang'
        |),
        |adds AS (
        |  SELECT json_extract_string(to_json(add.partitionValues),
        |      '$.' || (SELECT p FROM phys)) AS lang,
        |    CAST(json_extract(add.stats, '$.numRecords') AS BIGINT) AS nr
        |  FROM read_json_auto('/tmp/graft_deltacm_sf0.01/_delta_log/*.json',
        |    format='newline_delimited', union_by_name=true)
        |  WHERE add.path IS NOT NULL
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM adds) AS n_files,
        |  (SELECT CAST(count(*) AS BIGINT) FROM adds WHERE lang = 'zh')
        |    AS n_pruned,
        |  (SELECT CAST(sum(nr) AS BIGINT) FROM adds WHERE lang = 'zh')
        |    AS pruned_rows""".stripMargin,

    "meta_iceberg_partition_prune" ->
      """SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM parquet_file_metadata(
        |    '/tmp/graft_icepart_sf0.01/data/*/*.parquet')) AS n_files,
        |  (SELECT CAST(count(*) AS BIGINT) FROM parquet_file_metadata(
        |    '/tmp/graft_icepart_sf0.01/data/lang=zh/*.parquet')) AS n_pruned,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM parquet_file_metadata(
        |    '/tmp/graft_icepart_sf0.01/data/lang=zh/*.parquet')) AS pruned_rows,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM parquet_file_metadata(
        |    '/tmp/graft_icepart_sf0.01/data/lang=zh/*.parquet')) AS footer_rows""".stripMargin,

    "meta_iceberg_orphans" ->
      """SELECT 'stray.parquet' AS filename, 'parquet' AS format,
        |  (SELECT CAST(num_rows AS BIGINT) FROM parquet_file_metadata(
        |    '/tmp/graft_iceorph_sf0.01/data/stray.parquet')) AS num_rows
        |UNION ALL
        |SELECT 'junk.bin', 'other', NULL""".stripMargin,

    "meta_iceberg_schema" ->
      """SELECT CAST(s."schema-id" AS INTEGER) AS schema_id,
        |  CAST(len(s.fields) AS INTEGER) AS n_fields,
        |  array_to_string([f.name FOR f IN s.fields], ',') AS field_names_csv,
        |  s."schema-id" = cur AS is_current
        |FROM (
        |  SELECT unnest(schemas) AS s, "current-schema-id" AS cur
        |  FROM read_json_auto(
        |    '/tmp/graft_iceberg_sf0.01/metadata/*.metadata.json')
        |)""".stripMargin,

    "meta_iceberg_conformance" ->
      """WITH decl AS (
        |  SELECT [f.name FOR f IN s.fields] AS names
        |  FROM (
        |    SELECT unnest(schemas) AS s, "current-schema-id" AS cur
        |    FROM read_json_auto(
        |      '/tmp/graft_iceberg_sf0.01/metadata/*.metadata.json')
        |  )
        |  WHERE s."schema-id" = cur
        |),
        |cols AS (
        |  SELECT parse_filename(file_name) AS f, list(DISTINCT name) AS present
        |  FROM parquet_schema('/tmp/graft_iceberg_sf0.01/data/*.parquet')
        |  WHERE num_children IS NULL OR num_children = 0
        |  GROUP BY 1
        |)
        |SELECT c.f AS path,
        |  (SELECT CAST(len(names) AS INTEGER) FROM decl) AS n_declared,
        |  CAST(len(c.present) AS INTEGER) AS n_present,
        |  array_to_string(list_sort(list_filter((SELECT names FROM decl),
        |    x -> NOT list_contains(c.present, x))), ',') AS missing_csv
        |FROM cols c
        |WHERE c.f IN ('f0.parquet', 'f1.parquet', 'f2.parquet',
        |  'f3.parquet', 'f4.parquet')""".stripMargin,

    "meta_iceberg_delete_rows" ->
      """WITH del AS (
        |  SELECT parse_filename(file_path) AS f, pos
        |  FROM read_parquet('/tmp/graft_iceberg_sf0.01/data/del0.parquet')
        |),
        |f0 AS (
        |  SELECT doc_id, file_row_number AS pos
        |  FROM read_parquet('/tmp/graft_iceberg_sf0.01/data/f0.parquet',
        |    file_row_number=true)
        |)
        |SELECT 'f0.parquet' AS path,
        |  CAST(count(*) AS BIGINT) AS n_deleted,
        |  CAST(sum(f0.doc_id) AS BIGINT) AS deleted_docid_sum
        |FROM del JOIN f0 USING (pos)
        |WHERE del.f = 'f0.parquet'""".stripMargin,

    "meta_iceberg_eq_rows" ->
      """WITH data AS (
        |  SELECT parse_filename(filename) AS file, doc_id, lang
        |  FROM read_parquet('/tmp/graft_iceeq_sf0.01/data/f*.parquet',
        |    filename=true)
        |),
        |e0 AS (SELECT DISTINCT doc_id
        |  FROM read_parquet('/tmp/graft_iceeq_sf0.01/data/eq0.parquet')),
        |e1 AS (SELECT DISTINCT doc_id, lang
        |  FROM read_parquet('/tmp/graft_iceeq_sf0.01/data/eq1.parquet'))
        |SELECT d.file, 'doc_id' AS eq_cols,
        |  coalesce(CAST(d.doc_id AS VARCHAR), 'NULL') AS key_csv
        |FROM data d JOIN e0 ON d.doc_id IS NOT DISTINCT FROM e0.doc_id
        |UNION ALL
        |SELECT d.file, 'doc_id,lang',
        |  concat(coalesce(CAST(d.doc_id AS VARCHAR), 'NULL'), '|',
        |    coalesce(d.lang, 'NULL'))
        |FROM data d JOIN e1 ON d.doc_id IS NOT DISTINCT FROM e1.doc_id
        |  AND d.lang IS NOT DISTINCT FROM e1.lang""".stripMargin,

    "meta_iceberg_dv_rows" ->
      """WITH f0 AS (
        |  SELECT doc_id, file_row_number AS pos
        |  FROM read_parquet('/tmp/graft_icedv_sf0.01/data/f0.parquet',
        |    file_row_number=true)
        |),
        |f1 AS (
        |  SELECT doc_id, file_row_number AS pos
        |  FROM read_parquet('/tmp/graft_icedv_sf0.01/data/f1.parquet',
        |    file_row_number=true)
        |)
        |SELECT 'f0.parquet' AS path, CAST(3 AS BIGINT) AS n_deleted,
        |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM f0
        |    WHERE pos IN (1, 3, 5)) AS deleted_docid_sum
        |UNION ALL
        |SELECT 'f1.parquet', CAST(2 AS BIGINT),
        |  (SELECT CAST(sum(doc_id) AS BIGINT) FROM f1
        |    WHERE pos IN (0, 2))""".stripMargin,

    "clustering_report" ->
      """SELECT path_in_schema AS col_name,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN stats_min_value IS NULL
        |      OR stats_max_value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unbounded,
        |  CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT) AS global_min,
        |  CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT) AS global_max,
        |  CAST(sum(CAST(stats_max_value AS BIGINT)
        |    - CAST(stats_min_value AS BIGINT)) AS BIGINT) AS span_sum,
        |  CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT)
        |    - CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT)
        |    AS global_span
        |FROM parquet_metadata('/tmp/graft_cluster_sf0.01/*.parquet')
        |WHERE path_in_schema IN ('k', 'r')
        |GROUP BY 1""".stripMargin,

    "zorder_clustering" ->
      """WITH layouts AS (
        |  SELECT 'linear' AS layout, path_in_schema AS col_name,
        |    stats_min_value AS mn, stats_max_value AS mx
        |  FROM parquet_metadata('/tmp/graft_zclin_sf0.01/*.parquet')
        |  WHERE path_in_schema IN ('k', 'r')
        |  UNION ALL
        |  SELECT 'zorder', path_in_schema, stats_min_value, stats_max_value
        |  FROM parquet_metadata('/tmp/graft_zczo_sf0.01/*.parquet')
        |  WHERE path_in_schema IN ('k', 'r')
        |)
        |SELECT col_name, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN mn IS NULL OR mx IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unbounded,
        |  CAST(min(CAST(mn AS BIGINT)) AS BIGINT) AS global_min,
        |  CAST(max(CAST(mx AS BIGINT)) AS BIGINT) AS global_max,
        |  CAST(sum(CAST(mx AS BIGINT) - CAST(mn AS BIGINT)) AS BIGINT)
        |    AS span_sum,
        |  CAST(max(CAST(mx AS BIGINT)) AS BIGINT)
        |    - CAST(min(CAST(mn AS BIGINT)) AS BIGINT) AS global_span,
        |  layout
        |FROM layouts GROUP BY layout, col_name""".stripMargin,

    "compaction_plan_delta" ->
      """WITH acts AS (
        |  SELECT coalesce(add.path, remove.path) AS path,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v,
        |    add.path IS NOT NULL AS is_add,
        |    CAST(add.size AS BIGINT) AS sz
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT path,
        |    arg_max(is_add, v * 2 + CAST(is_add AS BIGINT)) AS live,
        |    arg_max(sz, v * 2 + CAST(is_add AS BIGINT)) AS sz
        |  FROM acts GROUP BY 1
        |),
        |t AS (SELECT 3 * min(sz) AS tgt FROM latest WHERE live),
        |small AS (
        |  SELECT path, sz FROM latest
        |  WHERE live AND sz < (SELECT tgt FROM t)
        |),
        |g AS (
        |  SELECT path, sz,
        |    COALESCE(sum(sz) OVER (ORDER BY path
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM small
        |)
        |SELECT '' AS partition_key,
        |  CAST(floor(bef / (SELECT tgt FROM t)) AS BIGINT) AS group_id,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(sz) AS BIGINT) AS group_bytes,
        |  min(path) AS first_path, max(path) AS last_path
        |FROM g GROUP BY 2 HAVING count(*) >= 2""".stripMargin,

    "compaction_plan_iceberg" ->
      """WITH f AS (
        |  SELECT regexp_extract(filename, 'lang=([^/]+)/', 1) AS lang,
        |    parse_filename(filename) AS path, CAST(size AS BIGINT) AS sz
        |  FROM read_blob('/tmp/graft_icepart_sf0.01/data/*/*.parquet')
        |),
        |t AS (SELECT 3 * min(sz) AS tgt FROM f),
        |small AS (SELECT * FROM f WHERE sz < (SELECT tgt FROM t)),
        |g AS (
        |  SELECT lang, path, sz,
        |    COALESCE(sum(sz) OVER (PARTITION BY lang ORDER BY path
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
        |  FROM small
        |)
        |SELECT 'lang=' || lang AS partition_key,
        |  CAST(floor(bef / (SELECT tgt FROM t)) AS BIGINT) AS group_id,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(sz) AS BIGINT) AS group_bytes,
        |  min(path) AS first_path, max(path) AS last_path
        |FROM g GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "meta_delta_stats_prune" ->
      """SELECT add.path AS path,
        |  CAST(json_extract(add.stats, '$.numRecords') AS BIGINT)
        |    AS num_records,
        |  CAST(json_extract(add.stats, '$.minValues.doc_id') AS BIGINT)
        |    AS min_value,
        |  CAST(json_extract(add.stats, '$.maxValues.doc_id') AS BIGINT)
        |    AS max_value,
        |  json_extract(add.stats, '$.minValues.doc_id') IS NOT NULL AND
        |    json_extract(add.stats, '$.maxValues.doc_id') IS NOT NULL
        |    AS has_bounds,
        |  (json_extract(add.stats, '$.minValues.doc_id') IS NULL OR
        |   json_extract(add.stats, '$.maxValues.doc_id') IS NULL) OR NOT
        |    (CAST(json_extract(add.stats, '$.maxValues.doc_id') AS BIGINT)
        |       < 100 OR
        |     CAST(json_extract(add.stats, '$.minValues.doc_id') AS BIGINT)
        |       > 299) AS selected
        |FROM read_json_auto('/tmp/graft_deltasp_sf0.01/_delta_log/*.json',
        |  format='newline_delimited', union_by_name=true)
        |WHERE add.path IS NOT NULL""".stripMargin,

    "meta_delta_ict" ->
      """WITH acts AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v,
        |    add.path AS apath,
        |    CAST(json_extract(add.stats, '$.numRecords') AS BIGINT) AS nr,
        |    COALESCE(CAST(commitInfo.inCommitTimestamp AS BIGINT),
        |      CAST(commitInfo.timestamp AS BIGINT)) AS cts
        |  FROM read_json_auto('/tmp/graft_deltaict_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |),
        |vts AS (
        |  SELECT v, max(cts) AS ts FROM acts WHERE cts IS NOT NULL GROUP BY 1
        |),
        |probes AS (SELECT unnest([5000, 15000, 99999]) AS off),
        |resolved AS (
        |  SELECT p.off AS probe_off, max(t.v) AS version
        |  FROM probes p JOIN vts t ON t.ts <= 1700000000000 + p.off
        |  GROUP BY 1
        |)
        |SELECT CAST(r.probe_off AS BIGINT) AS probe_off,
        |  CAST(r.version AS BIGINT) AS version,
        |  CAST(count(a.apath) AS BIGINT) AS n_live,
        |  CAST(sum(a.nr) AS BIGINT) AS live_rows
        |FROM resolved r JOIN acts a ON a.apath IS NOT NULL
        |  AND a.v <= r.version
        |GROUP BY 1, 2""".stripMargin,

    "meta_delta_domains" ->
      """WITH dm AS (
        |  SELECT domainMetadata.domain AS domain,
        |    domainMetadata.configuration AS configuration,
        |    domainMetadata.removed AS removed,
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS v
        |  FROM read_json_auto('/tmp/graft_deltadm_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE domainMetadata.domain IS NOT NULL
        |)
        |SELECT domain, arg_max(configuration, v) AS configuration,
        |  arg_max(removed, v) AS removed,
        |  CAST(max(v) AS BIGINT) AS version
        |FROM dm GROUP BY 1""".stripMargin,

    "meta_iceberg_summary_audit" ->
      """WITH decl AS (
        |  SELECT CAST(s."snapshot-id" AS BIGINT) AS snapshot_id,
        |    CAST(s.summary."added-data-files" AS BIGINT)
        |      AS declared_added_files,
        |    CAST(s.summary."added-records" AS BIGINT)
        |      AS declared_added_records
        |  FROM (SELECT unnest(snapshots) AS s FROM read_json_auto(
        |    '/tmp/graft_icesum_sf0.01/metadata/*.metadata.json'))
        |),
        |fm AS (
        |  SELECT parse_filename(file_name) AS name,
        |    CAST(num_rows AS BIGINT) AS nr
        |  FROM parquet_file_metadata('/tmp/graft_icesum_sf0.01/data/*.parquet')
        |),
        |actual AS (
        |  SELECT CAST(1 AS BIGINT) AS snapshot_id,
        |    CAST(3 AS BIGINT) AS actual_added_files,
        |    (SELECT sum(nr) FROM fm WHERE name IN
        |      ('f0.parquet', 'f1.parquet', 'f2.parquet'))
        |      AS actual_added_records
        |  UNION ALL
        |  SELECT 2, 2,
        |    (SELECT sum(nr) FROM fm WHERE name IN
        |      ('f3.parquet', 'f4.parquet'))
        |)
        |SELECT d.snapshot_id, d.declared_added_files,
        |  d.declared_added_records, a.actual_added_files,
        |  a.actual_added_records,
        |  d.declared_added_files = a.actual_added_files AS files_match,
        |  d.declared_added_records = a.actual_added_records
        |    AS records_match
        |FROM decl d JOIN actual a USING (snapshot_id)""".stripMargin,

    "meta_iceberg_ndv_audit" ->
      """WITH decl AS (
        |  SELECT unnest(s."blob-metadata") AS b,
        |    CAST(s."snapshot-id" AS BIGINT) AS sid
        |  FROM (SELECT unnest(statistics) AS s FROM read_json_auto(
        |    '/tmp/graft_icendv_sf0.01/metadata/*.metadata.json'))
        |),
        |data AS (
        |  SELECT doc_id, lang
        |  FROM read_parquet('/tmp/graft_icendv_sf0.01/data/f[0-4].parquet')
        |)
        |SELECT 'ndv-2.puffin' AS filename, d.sid AS stats_snapshot_id,
        |  CASE WHEN d.b.fields = [2] THEN 'lang' ELSE 'doc_id' END
        |    AS fields_csv,
        |  CAST(d.b.properties.ndv AS BIGINT) AS declared_ndv,
        |  CAST(CASE WHEN d.b.fields = [2]
        |    THEN (SELECT count(DISTINCT lang) FROM data)
        |    ELSE (SELECT count(DISTINCT doc_id) FROM data) END AS BIGINT)
        |    AS sketch_ndv,
        |  CAST(d.b.properties.ndv AS BIGINT) =
        |    CASE WHEN d.b.fields = [2]
        |      THEN (SELECT count(DISTINCT lang) FROM data)
        |      ELSE (SELECT count(DISTINCT doc_id) FROM data) END
        |    AS ndv_match
        |FROM decl d""".stripMargin,

    "meta_iceberg_metadata_log" ->
      """WITH ml AS (
        |  SELECT parse_filename(e."metadata-file") AS filename,
        |    CAST(e."timestamp-ms" AS BIGINT) AS timestamp_ms
        |  FROM (
        |    SELECT unnest("metadata-log") AS e
        |    FROM read_json_auto(
        |      '/tmp/graft_icemlog_sf0.01/metadata/v2.metadata.json')
        |  )
        |),
        |disk AS (
        |  SELECT parse_filename(file) AS f
        |  FROM glob('/tmp/graft_icemlog_sf0.01/metadata/*')
        |)
        |SELECT ml.filename, ml.timestamp_ms,
        |  EXISTS (SELECT 1 FROM disk WHERE disk.f = ml.filename) AS "exists"
        |FROM ml""".stripMargin,

    "meta_delta_last_ckpt" ->
      """WITH ptr AS (
        |  SELECT CAST(version AS BIGINT) AS dv
        |  FROM read_json_auto(
        |    '/tmp/graft_delta_sf0.01/_delta_log/_last_checkpoint')
        |),
        |names AS (
        |  SELECT parse_filename(file) AS f
        |  FROM glob('/tmp/graft_delta_sf0.01/_delta_log/*')
        |),
        |cks AS (
        |  SELECT CAST(regexp_extract(f, '^0*(\d+)', 1) AS BIGINT) AS v
        |  FROM names
        |  WHERE regexp_matches(f, '^\d{20}\.checkpoint(\..+)?\.parquet$')
        |),
        |commits AS (
        |  SELECT CAST(regexp_extract(f, '^0*(\d+)', 1) AS BIGINT) AS v
        |  FROM names WHERE regexp_matches(f, '^\d{20}\.json$')
        |)
        |SELECT p.dv AS declared_version,
        |  CAST(NULL AS BIGINT) AS declared_parts,
        |  (SELECT CAST(count(*) AS BIGINT) FROM cks WHERE v = p.dv)
        |    AS parts_found,
        |  (SELECT count(*) FROM cks WHERE v = p.dv) > 0
        |    AS checkpoint_complete,
        |  COALESCE((SELECT max(v) FROM cks), -1) > p.dv
        |    AS newer_checkpoint_exists,
        |  (SELECT CAST(count(*) AS BIGINT) FROM commits WHERE v > p.dv)
        |    AS commits_after
        |FROM ptr p""".stripMargin,

    "meta_iceberg_refs" ->
      """WITH m AS (
        |  SELECT refs, "current-snapshot-id" AS cur, snapshots
        |  FROM read_json_auto(
        |    '/tmp/graft_icerefs_sf0.01/metadata/*.metadata.json')
        |),
        |r AS (
        |  SELECT k AS ref_name,
        |    json_extract_string(j, '$.' || k || '.type') AS ref_type,
        |    CAST(json_extract(j, '$.' || k || '."snapshot-id"') AS BIGINT)
        |      AS snapshot_id,
        |    cur
        |  FROM (
        |    SELECT unnest(json_keys(to_json(refs))) AS k,
        |      to_json(refs) AS j, cur
        |    FROM m
        |  )
        |),
        |ids AS (
        |  SELECT CAST(s."snapshot-id" AS BIGINT) AS id
        |  FROM (SELECT unnest(snapshots) AS s FROM m)
        |)
        |SELECT ref_name, ref_type, snapshot_id,
        |  snapshot_id IN (SELECT id FROM ids) AS resolves,
        |  snapshot_id = cur AS is_current
        |FROM r""".stripMargin,

    "meta_iceberg_partition_stats" ->
      """WITH decl AS (
        |  SELECT 'lang=' || "partition".lang AS partition_key,
        |    CAST(data_file_count AS BIGINT) AS declared_files,
        |    CAST(data_record_count AS BIGINT) AS declared_rows,
        |    CAST(total_data_file_size_in_bytes AS BIGINT) AS declared_bytes
        |  FROM read_parquet(
        |    '/tmp/graft_icepstats_sf0.01/metadata/partition-stats-1.parquet')
        |),
        |rowsfc AS (
        |  SELECT regexp_extract(file_name, 'lang=([^/]+)/', 1) AS lang,
        |    CAST(count(*) AS BIGINT) AS actual_files,
        |    CAST(sum(num_rows) AS BIGINT) AS actual_rows
        |  FROM parquet_file_metadata(
        |    '/tmp/graft_icepstats_sf0.01/data/*/*.parquet')
        |  GROUP BY 1
        |),
        |bytes AS (
        |  SELECT regexp_extract(filename, 'lang=([^/]+)/', 1) AS lang,
        |    CAST(sum(size) AS BIGINT) AS actual_bytes
        |  FROM read_blob('/tmp/graft_icepstats_sf0.01/data/*/*.parquet')
        |  GROUP BY 1
        |)
        |SELECT d.partition_key,
        |  d.declared_files, d.declared_rows, d.declared_bytes,
        |  r.actual_files, r.actual_rows, b.actual_bytes,
        |  d.declared_files = r.actual_files AS files_match,
        |  d.declared_rows = r.actual_rows AS rows_match,
        |  d.declared_bytes = b.actual_bytes AS bytes_match
        |FROM decl d
        |JOIN rowsfc r ON 'lang=' || r.lang = d.partition_key
        |JOIN bytes b ON b.lang = r.lang""".stripMargin,

    "meta_iceberg_puffin_stats" ->
      """WITH raw AS (
        |  SELECT hex(content) AS h, octet_length(content) AS n,
        |    parse_filename(filename) AS f
        |  FROM read_blob('/tmp/graft_icestats_sf0.01/metadata/*.puffin')
        |),
        |sz AS (
        |  SELECT f, h, n,
        |    (strpos('0123456789ABCDEF', substr(h,(n-12)*2+1,1))-1)*16
        |      + strpos('0123456789ABCDEF', substr(h,(n-12)*2+2,1))-1
        |    + ((strpos('0123456789ABCDEF', substr(h,(n-11)*2+1,1))-1)*16
        |      + strpos('0123456789ABCDEF', substr(h,(n-11)*2+2,1))-1) * 256
        |    + ((strpos('0123456789ABCDEF', substr(h,(n-10)*2+1,1))-1)*16
        |      + strpos('0123456789ABCDEF', substr(h,(n-10)*2+2,1))-1) * 65536
        |    + ((strpos('0123456789ABCDEF', substr(h,(n-9)*2+1,1))-1)*16
        |      + strpos('0123456789ABCDEF', substr(h,(n-9)*2+2,1))-1) * 16777216
        |      AS psize
        |  FROM raw
        |),
        |payload AS (
        |  SELECT f,
        |    decode(unhex(substr(h, (n-12-psize)*2+1, psize*2))) AS js
        |  FROM sz
        |),
        |actual AS (
        |  SELECT f,
        |    CAST(unnest(range(len(CAST(js->'$.blobs' AS JSON[]))))
        |      AS INTEGER) AS blob_idx,
        |    unnest(CAST(js->'$.blobs' AS JSON[])) AS b
        |  FROM payload
        |),
        |decl AS (
        |  SELECT parse_filename(s."statistics-path") AS f,
        |    CAST(s."snapshot-id" AS BIGINT) AS stats_snapshot_id,
        |    s."blob-metadata" AS bm
        |  FROM (SELECT unnest(statistics) AS s FROM read_json_auto(
        |    '/tmp/graft_icestats_sf0.01/metadata/*.metadata.json'))
        |)
        |SELECT a.f AS filename, d.stats_snapshot_id, a.blob_idx,
        |  a.b->>'$.type' AS blob_type,
        |  CAST(a.b->'$."snapshot-id"' AS BIGINT) AS blob_snapshot_id,
        |  CAST(a.b->'$."sequence-number"' AS BIGINT) AS sequence_number,
        |  CAST(a.b->'$.offset' AS BIGINT) AS "offset",
        |  CAST(a.b->'$.length' AS BIGINT) AS "length",
        |  d.bm[a.blob_idx+1]."type" AS declared_type,
        |  COALESCE(d.bm[a.blob_idx+1]."type" = (a.b->>'$.type') AND
        |    CAST(d.bm[a.blob_idx+1]."snapshot-id" AS BIGINT) =
        |      CAST(a.b->'$."snapshot-id"' AS BIGINT), false)
        |    AS declared_match
        |FROM actual a JOIN decl d USING (f)""".stripMargin,

    "stream_iceberg_live" ->
      """WITH fm AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_icestream_sf0.01/data/*.parquet')
        |)
        |SELECT CAST(5 AS BIGINT) AS n_live,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet') AS live_rows,
        |  CAST(7 AS BIGINT) AS n_entries,
        |  (SELECT CAST(num_rows AS BIGINT) FROM fm
        |    WHERE name = 'del0.parquet') AS deleted_positions""".stripMargin,

    "meta_iceberg_time_travel" ->
      """WITH snaps AS (
        |  SELECT CAST(s."snapshot-id" AS BIGINT) AS id,
        |    CAST(s."timestamp-ms" AS BIGINT) AS ts
        |  FROM (SELECT unnest(snapshots) AS s FROM read_json_auto(
        |    '/tmp/graft_iceberg_sf0.01/metadata/*.metadata.json'))
        |),
        |probes AS (SELECT unnest([500, 99999]) AS off),
        |resolved AS (
        |  SELECT p.off AS off, arg_max(id, ts) AS id
        |  FROM probes p JOIN snaps s ON s.ts <= 1700000000000 + p.off
        |  GROUP BY p.off
        |),
        |fm AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_iceberg_sf0.01/data/*.parquet')
        |)
        |SELECT CAST(off AS BIGINT) AS probe_off, id AS snapshot_id,
        |  CAST(CASE WHEN id = 1 THEN 3 ELSE 5 END AS BIGINT) AS n_live,
        |  CASE WHEN id = 1 THEN (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |      WHERE name IN ('f0.parquet', 'f1.parquet', 'f2.parquet'))
        |    ELSE (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |      WHERE name LIKE 'f%' AND name <> 'f5.parquet') END AS data_rows
        |FROM resolved""".stripMargin,

    "meta_iceberg_travel" ->
      """WITH fm AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_iceberg_sf0.01/data/*.parquet')
        |)
        |SELECT CAST(1 AS BIGINT) AS snapshot_id, CAST(3 AS BIGINT) AS n_live,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |    WHERE name IN ('f0.parquet', 'f1.parquet', 'f2.parquet'))
        |    AS data_rows
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(5 AS BIGINT),
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet')""".stripMargin,

"stream_delta_live" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats,
        |    add.deletionVector.cardinality AS dv_card
        |  FROM read_json_auto('/tmp/graft_deltastream_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |    AS BIGINT) > 2
        |),
        |ckpt AS (
        |  SELECT CAST(2 AS BIGINT) AS version, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats, NULL AS dv_card
        |  FROM read_parquet('/tmp/graft_deltastream_sf0.01/_delta_log/*.checkpoint.parquet')
        |  WHERE add.path IS NOT NULL OR remove.path IS NOT NULL
        |),
        |actions AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    version * 2 + CAST(apath IS NOT NULL AS BIGINT) AS rank,
        |    apath IS NOT NULL AS is_add, stats, dv_card
        |  FROM (SELECT * FROM tail UNION ALL SELECT * FROM ckpt)
        |),
        |latest AS (
        |  SELECT path,
        |    arg_max({'is_add': is_add, 'stats': stats,
        |      'dv': coalesce(CAST(dv_card AS BIGINT), 0)}, rank) AS w
        |  FROM actions GROUP BY path
        |),
        |live AS (
        |  SELECT path,
        |    CAST(json_extract(w.stats, '$.numRecords') AS BIGINT) AS nrec,
        |    w.dv AS dv
        |  FROM latest WHERE w.is_add
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(sum(nrec) AS BIGINT) AS physical_rows,
        |  CAST(count(*) FILTER (WHERE dv > 0) AS BIGINT) AS n_dv_files,
        |  CAST(sum(dv) AS BIGINT) AS dv_deleted,
        |  CAST(sum(nrec) - sum(dv) AS BIGINT) AS net_rows
        |FROM live""".stripMargin,

    "meta_delta_vacuum" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath,
        |    remove.deletionTimestamp AS dts
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max({'is_add': apath IS NOT NULL, 'dts': dts},
        |      version * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS w
        |  FROM tail GROUP BY 1
        |),
        |tomb AS (
        |  SELECT path, CAST(w.dts AS BIGINT) AS deleted_at FROM latest
        |  WHERE NOT w.is_add AND CAST(w.dts AS BIGINT) <= 1700000010000 - 7500
        |)
        |SELECT t.path AS path, t.deleted_at AS deleted_at,
        |  CAST(1700000010000 - t.deleted_at AS BIGINT) AS age_ms,
        |  CAST(m.num_rows AS BIGINT) AS num_rows
        |FROM tomb t JOIN (
        |  SELECT parse_filename(file_name) AS f, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_delta_sf0.01/*.parquet')) m
        |  ON m.f = t.path""".stripMargin,

    "meta_delta_conformance" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE coalesce(add.path, remove.path) IS NOT NULL
        |),
        |latest AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    arg_max(apath IS NOT NULL,
        |      version * 2 + CAST(apath IS NOT NULL AS BIGINT)) AS live
        |  FROM tail GROUP BY 1
        |),
        |live AS (SELECT path FROM latest WHERE live),
        |decl AS (
        |  SELECT CAST(CAST(arg_max(metaData->>'$.schemaString',
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT)) AS VARCHAR)->>'$.fields[*].name' AS VARCHAR[]) AS names
        |  FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE metaData->>'$.id' IS NOT NULL
        |),
        |cols AS (
        |  SELECT parse_filename(file_name) AS f, list(DISTINCT name) AS present
        |  FROM parquet_schema('/tmp/graft_delta_sf0.01/*.parquet')
        |  WHERE num_children IS NULL OR num_children = 0
        |  GROUP BY 1
        |)
        |SELECT l.path AS path,
        |  CAST(len(d.names) AS INTEGER) AS n_declared,
        |  CAST(len(c.present) AS INTEGER) AS n_present,
        |  array_to_string(list_sort(list_filter(d.names,
        |    x -> NOT list_contains(c.present, x))), ',') AS missing_csv
        |FROM live l, decl d JOIN cols c ON c.f = l.path""".stripMargin,

    "meta_delta_txn" ->
      """SELECT txn.appId AS app_id,
        |  arg_max(CAST(txn.version AS BIGINT),
        |    CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT)) AS txn_version,
        |  max(CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |    AS BIGINT)) AS table_version
        |FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |  filename=true, format='newline_delimited', union_by_name=true)
        |WHERE txn.appId IS NOT NULL
        |GROUP BY txn.appId""".stripMargin,

    "meta_delta_schema" ->
      """SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |    AS BIGINT) AS version,
        |  metaData->>'$.id' AS schema_id,
        |  CAST(json_array_length(CAST(metaData->>'$.schemaString' AS VARCHAR),
        |    '$.fields') AS INTEGER) AS n_fields,
        |  array_to_string(CAST(CAST(metaData->>'$.schemaString' AS VARCHAR)
        |    ->>'$.fields[*].name' AS VARCHAR[]), ',') AS field_names_csv,
        |  coalesce(array_to_string(CAST(metaData->'$.partitionColumns'
        |    AS VARCHAR[]), ','), '') AS partition_columns_csv
        |FROM read_json_auto('/tmp/graft_delta_sf0.01/_delta_log/*.json',
        |  filename=true, format='newline_delimited', union_by_name=true)
        |WHERE metaData->>'$.id' IS NOT NULL""".stripMargin,

    "meta_delta_protocol" ->
      """WITH protos AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version, protocol AS p
        |  FROM read_json_auto('/tmp/graft_deltaproto_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE protocol.minReaderVersion IS NOT NULL
        |),
        |latest AS (SELECT arg_max(p, version) AS p FROM protos)
        |SELECT CAST(p->>'$.minReaderVersion' AS INTEGER) AS min_reader_version,
        |  CAST(p->>'$.minWriterVersion' AS INTEGER) AS min_writer_version,
        |  array_to_string(CAST(p->'$.readerFeatures' AS VARCHAR[]), ',')
        |    AS reader_features_csv,
        |  array_to_string(CAST(p->'$.writerFeatures' AS VARCHAR[]), ',')
        |    AS writer_features_csv,
        |  (CAST(p->>'$.minReaderVersion' AS INTEGER) <= 2 OR list_has_all(
        |    ['deletionVectors', 'v2Checkpoint', 'columnMapping',
        |     'timestampNtz', 'typeWidening', 'vacuumProtocolCheck'],
        |    coalesce(CAST(p->'$.readerFeatures' AS VARCHAR[]),
        |      CAST([] AS VARCHAR[])))) AS supported
        |FROM latest""".stripMargin,

    "meta_delta_dv" ->
      """WITH tail AS (
        |  SELECT CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |      AS BIGINT) AS version,
        |    add.path AS apath, remove.path AS rpath, add.stats AS stats,
        |    add.deletionVector.cardinality AS dv_card
        |  FROM read_json_auto('/tmp/graft_deltadv_sf0.01/_delta_log/*.json',
        |    filename=true, format='newline_delimited', union_by_name=true)
        |  WHERE CAST(regexp_extract(parse_filename(filename), '^0*(\d+)', 1)
        |    AS BIGINT) > 2
        |),
        |ckpt AS (
        |  SELECT CAST(2 AS BIGINT) AS version, add.path AS apath,
        |    remove.path AS rpath, add.stats AS stats, NULL AS dv_card
        |  FROM read_parquet('/tmp/graft_deltadv_sf0.01/_delta_log/*.checkpoint.parquet')
        |  WHERE add.path IS NOT NULL OR remove.path IS NOT NULL
        |),
        |actions AS (
        |  SELECT coalesce(apath, rpath) AS path,
        |    version * 2 + CAST(apath IS NOT NULL AS BIGINT) AS rank,
        |    apath IS NOT NULL AS is_add, stats, dv_card
        |  FROM (SELECT * FROM tail UNION ALL SELECT * FROM ckpt)
        |),
        |latest AS (
        |  SELECT path,
        |    arg_max({'is_add': is_add, 'stats': stats,
        |      'dv': coalesce(CAST(dv_card AS BIGINT), 0)}, rank) AS w
        |  FROM actions GROUP BY path
        |),
        |live AS (
        |  SELECT path,
        |    CAST(json_extract(w.stats, '$.numRecords') AS BIGINT) AS nrec,
        |    w.dv AS dv
        |  FROM latest WHERE w.is_add
        |)
        |SELECT CAST(count(*) AS BIGINT) AS n_live,
        |  CAST(sum(nrec) AS BIGINT) AS physical_rows,
        |  CAST(count(*) FILTER (WHERE dv > 0) AS BIGINT) AS n_dv_files,
        |  CAST(sum(dv) AS BIGINT) AS dv_deleted,
        |  CAST(sum(nrec) - sum(dv) AS BIGINT) AS net_rows
        |FROM live""".stripMargin,

    "meta_iceberg_snapshot" ->
      """SELECT CAST(s."snapshot-id" AS BIGINT) AS snapshot_id,
        |  CAST(s."timestamp-ms" AS BIGINT) AS timestamp_ms,
        |  s.summary.operation AS operation,
        |  s."snapshot-id" = cur AS is_current,
        |  CAST(fv AS INTEGER) AS format_version
        |FROM (
        |  SELECT unnest(snapshots) AS s,
        |    "current-snapshot-id" AS cur,
        |    "format-version" AS fv
        |  FROM read_json_auto(
        |    '/tmp/graft_iceberg_sf0.01/metadata/*.metadata.json')
        |)""".stripMargin,

    "meta_iceberg_live" ->
      """WITH fm AS (
        |  SELECT parse_filename(file_name) AS name, num_rows
        |  FROM parquet_file_metadata('/tmp/graft_iceberg_sf0.01/data/*.parquet')
        |)
        |SELECT
        |  CAST(5 AS BIGINT) AS n_live,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet') AS live_rows,
        |  (SELECT CAST(sum(num_rows) AS BIGINT) FROM fm
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet') AS footer_rows,
        |  (SELECT CAST(sum(num_rows)
        |      - (SELECT num_rows FROM fm WHERE name = 'del0.parquet')
        |      AS BIGINT) FROM fm
        |    WHERE name LIKE 'f%' AND name <> 'f5.parquet') AS net_rows,
        |  CAST(1 AS BIGINT) AS n_delete_files,
        |  (SELECT CAST(num_rows AS BIGINT) FROM fm
        |    WHERE name = 'del0.parquet') AS deleted_positions,
        |  (SELECT CAST(count(*) AS BIGINT) FROM fm) AS n_disk""".stripMargin,

    "meta_avro_file" ->
      """SELECT CAST(2 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(2 AS BIGINT) AS n_codecs,
        |  TRUE AS blocks_agree
        |FROM documents""".stripMargin,

    "orc_prune_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) AS k_sum
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 1000 AND 4999""".stripMargin,

    "meta_orc_column" ->
      """SELECT 'l_orderkey' AS path, CAST(count(*) AS BIGINT) AS num_values,
        |  FALSE AS has_null,
        |  CAST(min(l_orderkey) AS BIGINT) AS min_long,
        |  CAST(max(l_orderkey) AS BIGINT) AS max_long,
        |  CAST(sum(l_orderkey) AS BIGINT) AS sum_long,
        |  CAST(NULL AS DOUBLE) AS min_double, CAST(NULL AS DOUBLE) AS max_double,
        |  CAST(NULL AS VARCHAR) AS min_string, CAST(NULL AS VARCHAR) AS max_string
        |FROM lineitem
        |UNION ALL
        |SELECT 'qty', CAST(count(*) AS BIGINT), FALSE, NULL, NULL, NULL,
        |  min(CAST(l_quantity AS DOUBLE)), max(CAST(l_quantity AS DOUBLE)),
        |  NULL, NULL
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', CAST(count(*) AS BIGINT), FALSE, NULL, NULL,
        |  NULL, NULL, NULL, min(l_returnflag), max(l_returnflag)
        |FROM lineitem""".stripMargin,

    "meta_orc_file" ->
      """SELECT CAST(2 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(1 AS BIGINT) AS n_codecs,
        |  'ZSTD' AS codec,
        |  '0.12' AS file_version
        |FROM documents""".stripMargin,

    "meta_orc_stripe" ->
      """SELECT CAST(2 AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(3 AS BIGINT) AS first_offset
        |FROM lineitem""".stripMargin,

    "stream_token_accounting" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(len(tokens)), 0) AS BIGINT) AS n_slots,
        |  CAST(coalesce(sum(len(list_filter(tokens, x -> x IS NOT NULL))), 0)
        |    AS BIGINT) AS n_tokens
        |FROM read_parquet('/tmp/graft_stracct_src_sf0.01/*.parquet')""".stripMargin,

    "meta_token_accounting" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(len(tokens)), 0) AS BIGINT) AS n_slots,
        |  CAST(coalesce(sum(len(list_filter(tokens, x -> x IS NOT NULL))), 0)
        |    AS BIGINT) AS n_tokens
        |FROM read_parquet('/tmp/graft_tokacct_sf0.01/*.parquet')""".stripMargin,

    "meta_decode_table" ->
      """SELECT CAST(count(k) AS BIGINT) AS k_n,
        |  CAST(sum(k) AS BIGINT) AS k_sum,
        |  CAST(count(s) AS BIGINT) AS s_n,
        |  CAST(count(price) AS BIGINT) AS price_n,
        |  CAST(coalesce(sum(price * 100), 0) AS BIGINT) AS price_usum,
        |  CAST(coalesce(sum(len(vals)), 0) AS BIGINT) AS vals_elems,
        |  CAST(coalesce(sum(list_sum(vals)), 0) AS BIGINT) AS vals_sum,
        |  CAST(count(p) AS BIGINT) AS p_n,
        |  min(p) AS p_mn,
        |  max(p) AS p_mx
        |FROM read_parquet('/tmp/graft_decodetable_sf0.01/*.parquet')""".stripMargin,

    "meta_int96_values" ->
      """SELECT CAST(count(ts) AS BIGINT) AS n_values,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS min_micros,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS max_micros
        |FROM read_parquet('/tmp/graft_int96vals_sf0.01/*.parquet')""".stripMargin,

    "meta_flba_values" ->
      """SELECT CAST(count(price) AS BIGINT) AS n_values,
        |  CAST(coalesce(sum(price * 100), 0) AS BIGINT) AS usum
        |FROM read_parquet('/tmp/graft_flbavals_sf0.01/*.parquet')""".stripMargin,

    "meta_nested_values" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(len(vals)), 0) AS BIGINT) AS n_slots,
        |  CAST(coalesce(sum(len(list_filter(vals, x -> x IS NOT NULL))), 0)
        |    AS BIGINT) AS n_elems,
        |  CAST(coalesce(sum(list_sum(vals)), 0) AS BIGINT) AS val_sum
        |FROM read_parquet('/tmp/graft_nestedvals_sf0.01/*.parquet')""".stripMargin,

    "meta_dict_values_v2" ->
      """SELECT v, CAST(count(*) AS BIGINT) AS n
        |FROM read_parquet('/tmp/graft_dictvals2_sf0.01/*.parquet')
        |GROUP BY v""".stripMargin,

    "meta_v2_strings" ->
      """SELECT CAST(count(v) AS BIGINT) AS n_values,
        |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |  CAST(sum(length(v)) AS BIGINT) AS char_mass,
        |  min(v) AS v_min, max(v) AS v_max
        |FROM read_parquet('/tmp/graft_v2strings_sf0.01/*.parquet')
        |WHERE v IS NOT NULL""".stripMargin,

    "meta_plain_strings" ->
      """SELECT CAST(count(v) AS BIGINT) AS n_values,
        |  CAST(sum(strlen(v)) AS BIGINT) AS byte_mass,
        |  CAST(min(strlen(v)) AS BIGINT) AS len_mn,
        |  CAST(max(strlen(v)) AS BIGINT) AS len_mx,
        |  TRUE AS both_layouts, TRUE AS dispatcher_agrees
        |FROM read_parquet('/tmp/graft_plainstrings_sf0.01/*.parquet')""".stripMargin,

    "meta_kv_stamp" ->
      """SELECT decode(key) AS key, decode(value) AS value
        |FROM parquet_kv_metadata('/tmp/graft_kvstamp_sf0.01/*.parquet')""".stripMargin,

    "meta_page_skip_multi" ->
      """SELECT CAST(0 AS BIGINT) AS row_group_id,
        |  CAST(count(*) AS BIGINT) AS rows_total,
        |  CAST(1000 * (SELECT count(*) FROM (
        |    SELECT DISTINCT a // 1000 AS p
        |    FROM read_parquet('/tmp/graft_pageskip2_sf0.01/*.parquet')
        |    WHERE a BETWEEN 3500 AND 7200
        |    INTERSECT
        |    SELECT DISTINCT a // 1000
        |    FROM read_parquet('/tmp/graft_pageskip2_sf0.01/*.parquet')
        |    WHERE b BETWEEN 15000 AND 17999)) AS BIGINT) AS rows_covered
        |FROM read_parquet('/tmp/graft_pageskip2_sf0.01/*.parquet')""".stripMargin,

    "meta_bss_values" ->
      """SELECT CAST(count(v) AS BIGINT) AS n_values,
        |  min(v) AS v_min, max(v) AS v_max
        |FROM read_parquet('/tmp/graft_bssvals_sf0.01/*.parquet')""".stripMargin,

    "meta_bool_values" ->
      """SELECT CAST(count(*) FILTER (WHERE b) AS BIGINT) AS n_true,
        |  CAST(count(*) AS BIGINT) AS n_values
        |FROM read_parquet('/tmp/graft_boolvals_sf0.01/*.parquet')""".stripMargin,

    "meta_fp_values" ->
      """SELECT CAST(count(v) AS BIGINT) AS n_values,
        |  min(v) AS v_min, max(v) AS v_max
        |FROM read_parquet('/tmp/graft_fpvals_sf0.01/*.parquet')""".stripMargin,

    "meta_page_crc" ->
      """SELECT CAST(count(DISTINCT id // 1000) AS BIGINT) AS n_pages,
        |  CAST(count(DISTINCT id // 1000) AS BIGINT) AS n_with_crc,
        |  CAST(count(DISTINCT id // 1000) AS BIGINT) AS n_verified
        |FROM read_parquet('/tmp/graft_pagecrc_sf0.01/*.parquet')""".stripMargin,

    "meta_join" ->
      s"""WITH rg AS (
         |  SELECT DISTINCT row_group_id, row_group_num_rows
         |  FROM parquet_metadata('$lineitemPq'))
         |SELECT parse_filename(f.file_name) AS filename, f.num_rows,
         |  (SELECT CAST(sum(row_group_num_rows) AS BIGINT) FROM rg) AS rg_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM rg) AS n_row_groups
         |FROM parquet_file_metadata('$lineitemPq') f""".stripMargin,

    "meta_filter_agg" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(num_values) AS BIGINT) AS n_values
         |FROM parquet_metadata('$lineitemPq')
         |WHERE type = 'INT64'""".stripMargin,

    "meta_multifile" ->
      s"""SELECT parse_filename(file_name) AS filename, num_rows,
         |  CAST(num_row_groups AS BIGINT) AS num_row_groups
         |FROM parquet_file_metadata('$OracleSf/*.parquet')""".stripMargin,

    "meta_vs_data" ->
      s"""SELECT (SELECT CAST(sum(mx) AS BIGINT) FROM (
         |    SELECT min(row_group_num_rows) AS mx
         |    FROM parquet_metadata('$OracleSf/orders.parquet')
         |    GROUP BY row_group_id)) AS meta_rows,
         |  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS data_rows""".stripMargin,

    "meta_report" ->
      s"""SELECT CAST(count(DISTINCT row_group_id) AS BIGINT) AS n_row_groups,
         |  CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(total_compressed_size) AS BIGINT) AS compressed_bytes,
         |  CAST(sum(total_uncompressed_size) AS BIGINT) AS uncompressed_bytes,
         |  CAST(floor(CAST(sum(total_uncompressed_size) AS DOUBLE)
         |    / sum(total_compressed_size) * 10000) AS BIGINT) AS ratio_x10k
         |FROM parquet_metadata('$lineitemPq')""".stripMargin,

    "meta_prune_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 500""".stripMargin,

    // independent recomputation over ALL the written fixture files — any
    // file wrongly pruned by the date-stats path breaks n_rows/key_sum
    // (same-machine fixed sf0.01 path, like the export_manifest oracle)
    "meta_prune_date" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS key_sum
        |FROM read_parquet('/tmp/graft_prune_date_sf0.01/*.parquet')
        |WHERE od BETWEEN DATE '1996-03-01' AND DATE '1996-08-31'""".stripMargin,

    "meta_prune_prefix" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM read_parquet('/tmp/graft_prune_prefix_sf0.01/*.parquet')
        |WHERE starts_with(source, 'src1')""".stripMargin,

    "meta_prune_decimal" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) AS key_sum
        |FROM read_parquet('/tmp/graft_prune_decimal_sf0.01/*.parquet')
        |WHERE price BETWEEN 1000.00 AND 5000.00""".stripMargin,

    // the bloom no-false-negative closed form: every distinct
    // (file, value) pair present in the data MUST probe true through the
    // decoded bitset, so n_hits == n_probes == the data-side distinct
    // count DuckDB computes without ever seeing a bloom filter
    "meta_bloom_probe" ->
      """SELECT colname,
        |  CAST(count(DISTINCT fname) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_probes,
        |  CAST(count(*) AS BIGINT) AS n_hits
        |FROM (
        |  SELECT 'doc_id' AS colname, filename AS fname, CAST(doc_id AS VARCHAR) AS v
        |  FROM read_parquet('/tmp/graft_bloom_probe_sf0.01/*.parquet', filename=true)
        |  GROUP BY 1, 2, 3
        |  UNION ALL
        |  SELECT 'source' AS colname, filename AS fname, source AS v
        |  FROM read_parquet('/tmp/graft_bloom_probe_sf0.01/*.parquet', filename=true)
        |  GROUP BY 1, 2, 3
        |)
        |GROUP BY colname""".stripMargin,

    "bloom_prune_scan" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        |FROM read_parquet('/tmp/graft_bloom_prune_sf0.01/*.parquet')
        |WHERE doc_id = 4321""".stripMargin,

    "bloom_prune_in" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        |FROM read_parquet('/tmp/graft_bloom_in_sf0.01/*.parquet')
        |WHERE doc_id IN (101, 4321, 7777, 12345)""".stripMargin,

    "bloom_prune_int" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        |FROM read_parquet('/tmp/graft_bloom_int_sf0.01/*.parquet')
        |WHERE k IN (202, 4321, 9876)""".stripMargin,

    "bloom_prune_decimal" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        |FROM read_parquet('/tmp/graft_bloom_dec_sf0.01/*.parquet')
        |WHERE k IN (202.25, 4321.25, 9876.25)""".stripMargin,

    "bloom_prune_double" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars_sum
        |FROM read_parquet('/tmp/graft_bloom_dbl_sf0.01/*.parquet')
        |WHERE v IN (50.5, 1080.25, 2469.0)""".stripMargin,

    // the logical string volume re-derived from the data: unencoded
    // BYTE_ARRAY bytes == sum of octet lengths, value counts include
    // nulls, level-0 histogram counts are exactly the null count
    "meta_size_stats" ->
      """SELECT 'lang' AS path,
        |  CAST(sum(octet_length(encode(lang))) AS BIGINT) AS unenc_bytes,
        |  CAST(count(*) AS BIGINT) AS n_values,
        |  CAST(count(*) - count(lang) AS BIGINT) AS n_nulls
        |FROM read_parquet('/tmp/graft_sizestats_sf0.01/*.parquet')
        |UNION ALL
        |SELECT 'source',
        |  CAST(sum(octet_length(encode(source))) AS BIGINT),
        |  CAST(count(*) AS BIGINT), CAST(count(*) - count(source) AS BIGINT)
        |FROM read_parquet('/tmp/graft_sizestats_sf0.01/*.parquet')
        |UNION ALL
        |SELECT 'text',
        |  CAST(sum(octet_length(encode(text))) AS BIGINT),
        |  CAST(count(*) AS BIGINT), CAST(count(*) - count(text) AS BIGINT)
        |FROM read_parquet('/tmp/graft_sizestats_sf0.01/*.parquet')""".stripMargin,

    "meta_kv" ->
      s"""SELECT decode(key) AS key, decode(value) AS value
         |FROM parquet_kv_metadata('$OracleSf/documents.parquet')""".stripMargin,

    // the data-side distinct IS the dictionary contract: every row
    // group's dictionary page holds exactly its distinct values when no
    // plain fallback occurred (source has ~tens of values, far under any
    // fallback threshold), and a decode bug in the <u32 LE len><bytes>
    // walk breaks the set equality
    "meta_dict" ->
      """SELECT DISTINCT source AS v
        |FROM read_parquet('/tmp/graft_dict_sf0.01/*.parquet')""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "win_rank" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "win_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |      OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM events))
        |GROUP BY user_id""".stripMargin,

    "q_corr_subquery" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_above
        |FROM orders o
        |WHERE (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) *
        |    CAST(o.o_totalprice AS DECIMAL(28,6)) * 2 >
        |  (SELECT sum(CAST(i.o_totalprice AS DECIMAL(28,6)))
        |   FROM orders i WHERE i.o_custkey = o.o_custkey) * 3""".stripMargin,

    "win_moving" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_rev
        |FROM lineitem WHERE l_suppkey < 20""".stripMargin,

    "cube_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,

    "semi_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_customers_with_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "set_except" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_customers_without_orders FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,

    "distinct_agg" ->
      """SELECT n_name,
        |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "dedup_exact" ->
      s"""$corpusCte
         |SELECT CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(sum(n_copies) AS BIGINT) AS n_total,
         |  CAST(sum(rep_id) AS BIGINT) AS rep_id_sum
         |FROM (
         |  SELECT text, min(doc_id) AS rep_id, count(*) AS n_copies
         |  FROM corpus GROUP BY text)""".stripMargin,

    "dedup_minhash" ->
      s"""$corpusCte,
         |sets AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
         |  FROM corpus)
         |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
         |  CAST(coalesce(sum(a.doc_id + b.doc_id), 0) AS BIGINT) AS id_sum
         |FROM sets a JOIN sets b ON a.ws = b.ws AND a.doc_id < b.doc_id""".stripMargin,

    "dedup_clusters" ->
      s"""$corpusCte,
         |clusters AS (
         |  SELECT list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws,
         |    count(*) AS cluster_size, min(doc_id) AS rep_id
         |  FROM corpus GROUP BY 1
         |  HAVING count(*) > 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS n_dup_docs,
         |  CAST(coalesce(max(cluster_size), 0) AS BIGINT) AS max_cluster,
         |  CAST(coalesce(sum(rep_id), 0) AS BIGINT) AS rep_sum
         |FROM clusters""".stripMargin,

    "dedup_simhash" ->
      s"""$corpusCte
         |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
         |  CAST(coalesce(sum(a.doc_id + b.doc_id), 0) AS BIGINT) AS id_sum
         |FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,

    "dedup_cross" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id + 300000 AS doc_id, ws FROM sets WHERE doc_id < 30
        |  UNION ALL
        |  SELECT s.doc_id + 300000,
        |    list_sort(list_distinct(list_filter(
        |      string_split(d.text || ' uniquesuffix' || CAST(s.doc_id AS VARCHAR), ' '),
        |      t -> t <> '')))
        |  FROM sets s JOIN documents d USING (doc_id)
        |  WHERE s.doc_id >= 30 AND s.doc_id < 50),
        |bad AS (SELECT DISTINCT b.doc_id FROM b JOIN sets a ON b.ws = a.ws)
        |SELECT CAST(count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,

    "dedup_store_scrub" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id + 400000 AS doc_id, ws FROM sets WHERE doc_id < 20
        |  UNION ALL
        |  SELECT s.doc_id + 400000,
        |    list_sort(list_distinct(list_filter(
        |      string_split(d.text || ' storesuffix' || CAST(s.doc_id AS VARCHAR), ' '),
        |      t -> t <> '')))
        |  FROM sets s JOIN documents d USING (doc_id)
        |  WHERE s.doc_id >= 20 AND s.doc_id < 40),
        |bad AS (SELECT DISTINCT b.doc_id FROM b JOIN sets a ON b.ws = a.ws)
        |SELECT CAST(count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,

    // the ingest loop's semantics in closed form: duplicates are exactly
    // the increment docs whose token set equals some reference doc's
    // (equal sets => equal minhash signatures => every band matches, so
    // LSH candidate generation is guaranteed-recall for the exact-verify
    // filter); the store row count is (ref + survivors) x 16 bands
    "pipeline_ingest" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 600000 AS doc_id, ws FROM sets WHERE doc_id < 70),
        |dups AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ref r ON i.ws = r.ws),
        |surv AS (SELECT doc_id FROM inc
        |         WHERE doc_id NOT IN (SELECT doc_id FROM dups))
        |SELECT
        |  CAST((SELECT count(*) FROM dups) AS BIGINT) AS n_dups,
        |  CAST(coalesce((SELECT sum(doc_id) FROM dups), 0) AS BIGINT) AS dup_id_sum,
        |  CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_survivors,
        |  CAST(coalesce((SELECT sum(doc_id) FROM surv), 0) AS BIGINT) AS surv_id_sum,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv)) * 16
        |    AS BIGINT) AS store_band_rows""".stripMargin,

    // layout closed form: one file per bucket per write (the repartition
    // in writeBucketed aligns with the bucket hash), so write + absorb =
    // 2 x 8 files, compaction = 8; rows conserve; every literal store
    // member must still pair with its relabeled copy post-compact
    // (identical token set => identical signature => every band matches)
    "store_compact" ->
      """SELECT CAST(16 AS BIGINT) AS n_files_before,
        |  CAST(8 AS BIGINT) AS n_files_after,
        |  CAST(((SELECT count(*) FROM documents WHERE doc_id >= 50)
        |       + (SELECT count(*) FROM documents WHERE doc_id < 70)) * 16
        |    AS BIGINT) AS store_rows,
        |  CAST((SELECT count(*) FROM documents WHERE doc_id >= 50 AND doc_id < 70)
        |    AS BIGINT) AS n_literal_pairs""".stripMargin,

    // every duplicate paired with the smallest token-set-equal store id
    "dedup_provenance" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 850000 AS doc_id, ws FROM sets WHERE doc_id < 70)
        |SELECT i.doc_id, CAST(min(r.doc_id) AS BIGINT) AS matched_id
        |FROM inc i JOIN ref r ON i.ws = r.ws
        |GROUP BY i.doc_id""".stripMargin,

    // cross-modal closed form: text-side dedup decides both stores, so
    // every count derives from token-set equality vs the reference; the
    // retrieval hits are exactly the queries whose text survived (their
    // exact-copy embeddings were absorbed; dup'd queries' were not, and
    // a dropped embedding cannot be found)
    "pipeline_crossmodal" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 950000 AS doc_id, doc_id AS orig, ws FROM sets
        |        WHERE doc_id < 70),
        |dups AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ref r ON i.ws = r.ws),
        |surv AS (SELECT doc_id, orig FROM inc
        |         WHERE doc_id NOT IN (SELECT doc_id FROM dups))
        |SELECT
        |  CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_survivors,
        |  CAST(coalesce((SELECT sum(doc_id) FROM surv), 0) AS BIGINT) AS surv_id_sum,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv)) * 16
        |    AS BIGINT) AS store_band_rows,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv))
        |    AS BIGINT) AS doc_store_rows,
        |  CAST(((SELECT count(*) FROM embeddings WHERE vec_id >= 50)
        |       + (SELECT count(*) FROM surv)) AS BIGINT) AS ivf_rows,
        |  CAST((SELECT count(*) FROM surv WHERE orig < 10) AS BIGINT) AS n_rank1_hits""".stripMargin,

    // each user's final emitted state must equal the batch group-by
    "stream_running_totals" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(floor(value * 100)) AS BIGINT) AS v_sum
        |FROM events WHERE user_id < 20 GROUP BY user_id""".stripMargin,

    // each event lives in exactly three epoch-aligned 10-minute-slide
    // windows of 30 minutes; explode and count
    "stream_window_counts" ->
      """WITH ev AS (
        |  SELECT (epoch_us(ts) // 1000) AS ms FROM events),
        |exploded AS (
        |  SELECT ((ms // 600000) - k.k) * 600000 AS window_start
        |  FROM ev, (SELECT unnest([0, 1, 2]) AS k) k)
        |SELECT CAST(window_start AS BIGINT) AS window_start,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM exploded GROUP BY window_start""".stripMargin,

    // the emitted key set is every distinct key, exactly once
    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events""".stripMargin,

    // gaps-and-islands replay of successor-closed sessions: an island
    // breaks where the gap to the previous event exceeds 6h; each user's
    // LAST island is still open (no successor) and must not appear. The
    // nanosecond ts maps to ms identically on both engines (DuckDB's
    // parquet read truncates ns->us, then //1000: floor-of-floor equals
    // floor(ns/1e6) for these positive timestamps).
    "stream_sessions" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000 AS ms, floor(value * 100) AS v
        |  FROM events WHERE user_id < 20),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |                   OR ms - lag(ms) OVER w > 21600000 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |islands AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, island, min(ms) AS s_start, max(ms) AS s_end,
        |    count(*) AS n_events, sum(v) AS v_sum
        |  FROM islands GROUP BY user_id, island)
        |SELECT user_id, CAST(s_start AS BIGINT) AS s_start,
        |  CAST(s_end AS BIGINT) AS s_end,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(v_sum AS BIGINT) AS v_sum
        |FROM sess
        |WHERE island < (SELECT max(island) FROM sess s2
        |                WHERE s2.user_id = sess.user_id)""".stripMargin,

    // the timeout-path run emits EVERY island (the sentinel watermark push
    // closes each user's trailing session), so the recompute keeps them all
    "stream_sessions_final" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 1000 AS ms, floor(value * 100) AS v
        |  FROM events WHERE user_id < 20),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |                   OR ms - lag(ms) OVER w > 21600000 THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        |islands AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ms
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM marked),
        |sess AS (
        |  SELECT user_id, island, min(ms) AS s_start, max(ms) AS s_end,
        |    count(*) AS n_events, sum(v) AS v_sum
        |  FROM islands GROUP BY user_id, island)
        |SELECT user_id, CAST(s_start AS BIGINT) AS s_start,
        |  CAST(s_end AS BIGINT) AS s_end,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(v_sum AS BIGINT) AS v_sum
        |FROM sess""".stripMargin,

    // the streaming loop's fixpoint in closed form: the increment is
    // intra-deduped (min id per token set), so batch boundaries cannot
    // change the outcome — each doc survives iff its set is absent from
    // the reference, regardless of what was absorbed before it
    "stream_ingest" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT min(doc_id + 700000) AS doc_id, ws FROM sets
        |        WHERE doc_id < 70 GROUP BY ws),
        |surv AS (SELECT i.doc_id FROM inc i
        |         WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.ws = i.ws))
        |SELECT
        |  CAST((SELECT count(*) FROM inc) AS BIGINT) AS n_inc,
        |  CAST(coalesce((SELECT sum(doc_id) FROM inc), 0) AS BIGINT) AS inc_id_sum,
        |  CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_survivors,
        |  CAST(coalesce((SELECT sum(doc_id) FROM surv), 0) AS BIGINT) AS surv_id_sum,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv)) * 16
        |    AS BIGINT) AS store_band_rows""".stripMargin,

    // components via min-reachable-node: the recursive CTE enumerates
    // (node, reachable node) pairs with UNION dedup — exact on the small
    // components this graph has, and engine-agnostic
    "dedup_cc" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
        |),
        |sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM corpus),
        |dup_edges AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst
        |  FROM sets a JOIN sets b ON a.ws = b.ws AND a.doc_id < b.doc_id),
        |chain_edges AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM corpus
        |  WHERE doc_id < 299 AND doc_id % 5 <> 4),
        |edges AS (SELECT src, dst FROM dup_edges UNION SELECT src, dst FROM chain_edges),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
        |reach(node, comp) AS (
        |  SELECT src AS node, src AS comp FROM sym
        |  UNION
        |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node
        |),
        |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
        |comps AS (SELECT component, count(*) AS csize FROM cc GROUP BY component)
        |SELECT CAST(count(*) AS BIGINT) AS n_components,
        |  CAST(coalesce(sum(csize), 0) AS BIGINT) AS n_nodes,
        |  CAST(coalesce(max(csize), 0) AS BIGINT) AS max_size,
        |  CAST(coalesce(sum(component), 0) AS BIGINT) AS comp_id_sum
        |FROM comps""".stripMargin,

    "pagerank" ->
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS d
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT s, d FROM cs UNION ALL SELECT d, s FROM cs),
        |nodes AS (SELECT DISTINCT s AS node FROM e),
        |deg AS (SELECT s, count(*) AS outdeg FROM e GROUP BY s),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.d AS node, sum(r0.rank // deg.outdeg) AS m
        |       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r1 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c1.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node),
        |c2 AS (SELECT e.d AS node, sum(r1.rank // deg.outdeg) AS m
        |       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r2 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c2.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node),
        |c3 AS (SELECT e.d AS node, sum(r2.rank // deg.outdeg) AS m
        |       FROM e JOIN r2 ON e.s = r2.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r3 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c3.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node)
        |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,

    "kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT lang AS g,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM documents),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
        |s AS (
        |  SELECT g AS lang,
        |    CAST(least(count(*), 8) AS BIGINT) AS n_sketch,
        |    CAST(coalesce(max(CASE WHEN rn = 8 THEN h END), 0) AS BIGINT) AS kth_min
        |  FROM r GROUP BY g)
        |SELECT lang, n_sketch, kth_min,
        |  CAST(CASE WHEN n_sketch < 8 THEN n_sketch * 1000000
        |    ELSE 7000021000000 // kth_min END AS BIGINT) AS est_micro
        |FROM s""".stripMargin,

    "text_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT unnest(t) AS w FROM toks)
        |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 16),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n,
        |    sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS known
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks WHERE doc_id < 50) s
        |  LEFT JOIN vocab v USING (w)
        |  GROUP BY s.doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST((n - known) * 1000000 // n AS BIGINT) AS oov_micro
        |FROM per""".stripMargin,

    "corpus_report" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS mean_chars_micro
        |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin,

    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS ng
        |  FROM toks),
        |lm AS (
        |  SELECT ng, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ng WHERE doc_id >= 50 GROUP BY ng),
        |sc AS (
        |  SELECT n.doc_id, count(*) AS n_ngrams,
        |    sum(CASE WHEN lm.cnt IS NULL THEN 1 ELSE 0 END) AS oov,
        |    sum(coalesce(lm.cnt, 0)) AS fam
        |  FROM ng n LEFT JOIN lm ON n.ng = lm.ng
        |  WHERE n.doc_id < 50 GROUP BY n.doc_id)
        |SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
        |  CAST(oov AS BIGINT) AS oov_ngrams,
        |  CAST(fam * 1000000 // n_ngrams AS BIGINT) AS fam_micro
        |FROM sc""".stripMargin,

    "corpus_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
        |nw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM old WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM old WHERE doc_id < 30),
        |st AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |      WHEN n.doc_id IS NULL THEN 'removed'
        |      WHEN o.text <> n.text THEN 'changed'
        |      ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM st GROUP BY status""".stripMargin,

    "mm_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 30)
        |SELECT sha256(text) AS digest,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(media_id) AS BIGINT) AS keep_id,
        |  CAST(sum(media_id) AS BIGINT) AS id_sum
        |FROM corpus GROUP BY digest HAVING count(*) > 1""".stripMargin,

    "shard_order" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS hv
        |  FROM documents)
        |SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM h""".stripMargin,

    "span_dedup" ->
      s"""$corpusCte,
         |toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
         |  FROM corpus),
         |spans AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |      t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS g
         |  FROM toks),
         |occ AS (SELECT g, count(*) AS occ FROM spans GROUP BY g),
         |ds AS (
         |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(coalesce(sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_spans
         |  FROM spans s JOIN occ o USING (g) GROUP BY s.doc_id)
         |SELECT doc_id, n_spans, n_dup_spans FROM ds WHERE n_dup_spans > 0""".stripMargin,

    // replays the EXACT grid-quantized Lloyd iterations of
    // Clustering.kmeansGridAssign: every step is exact-integer arithmetic
    // (see the unroller's scaladoc), so the SQL reproduces the identical
    // labels — a genuine cross-engine k-means oracle
    "cluster_kmeans" -> kmeansOracleSql(dim = 64, k = 8, iters = 2),

    "dedup_semantic" ->
      semanticDedupOracleSql(dim = 64, k = 8, iters = 2, plantLt = 25, threshold = 0.99d),

    "ngram_jaccard" ->
      """WITH ng AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(
        |      list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i + 1]))) AS ng
        |  FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents WHERE doc_id < 40))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) AS j_micro
        |FROM ng a JOIN ng b ON a.doc_id < b.doc_id
        |WHERE CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) >= 100000""".stripMargin,

    "ngram_containment" ->
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 40),
        |corpus AS (
        |  SELECT doc_id, toks FROM t0
        |  UNION ALL
        |  SELECT doc_id + 100000, toks[1:30] FROM t0 WHERE doc_id < 20),
        |ng AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]))) AS ng
        |  FROM corpus),
        |nz AS (SELECT * FROM ng WHERE len(ng) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(a.ng) * 1000000) AS BIGINT) AS c_micro,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) AS j_micro
        |FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |WHERE CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(a.ng) * 1000000) AS BIGINT) >= 900000""".stripMargin,

    "text_tokens" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY lang""".stripMargin,

    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CAST(floor((
        |    least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |    + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |        AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |      THEN 1.0 ELSE 0.5 END * 0.3
        |    + CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |  ) * 1000000) AS BIGINT) AS q_micro
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "text_langid" ->
      """WITH scored AS (
        |  SELECT
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['the','a','of','and','to'], t))) AS s_en,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['el','la','de','y','que'], t))) AS s_es,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['le','la','de','et','les'], t))) AS s_fr,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['的','是','了','在','我'], t))) AS s_zh
        |  FROM documents)
        |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM scored)
        |GROUP BY pred_lang""".stripMargin,

    "text_langid_ngram" ->
      """WITH tri AS (
        |  SELECT CASE WHEN length(text) < 3 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, length(text) - 1), i -> substr(text, i, 3)) END AS tg
        |  FROM documents),
        |scored AS (
        |  SELECT
        |    len(list_filter(tg, t -> list_contains(['der','ein','sch','ich','und','die'], t))) AS s_de,
        |    len(list_filter(tg, t -> list_contains(['the','ing','ion','and','he '], t))) AS s_en,
        |    len(list_filter(tg, t -> list_contains(['de ','la ','que','os ','ión'], t))) AS s_es,
        |    len(list_filter(tg, t -> list_contains(['le ','ent','les','de ','eur'], t))) AS s_fr,
        |    len(list_filter(tg, t -> list_contains(['我们的','是一个','不知道'], t))) AS s_zh
        |  FROM tri)
        |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM scored)
        |GROUP BY pred_lang""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |FROM documents WHERE doc_id < 100""".stripMargin,

    "quality_rules" ->
      """WITH p1 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 17 = 0 THEN repeat('zz ', 40) ELSE text END AS t1
        |  FROM documents),
        |p2 AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN t1 || ' 0123456789 #### $$$$ %%%% ^^^^ &&&& 1111 2222 3333 4444 5555'
        |      ELSE t1 END AS text2
        |  FROM p1),
        |m AS (
        |  SELECT source,
        |    len(list_filter(string_split(text2, ' '), t -> t <> '')) AS ntok,
        |    length(text2) AS nchar,
        |    length(replace(text2, ' ', '')) AS wchars,
        |    length(regexp_replace(text2, '[^a-zA-Z]', '', 'g')) AS alpha,
        |    len(list_distinct(list_filter(string_split(text2, ' '), t -> t <> ''))) AS ndist,
        |    len(list_filter(string_split(text2, ' '),
        |      t -> list_contains(['the', 'a', 'of', 'and', 'to'], t))) AS stop
        |  FROM p2),
        |f AS (
        |  SELECT source,
        |    CASE WHEN ntok < 8 OR ntok > 1024 THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN wchars < ntok * 2 OR wchars > ntok * 12 THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN alpha * 10 < nchar * 6 THEN 1 ELSE 0 END AS f4,
        |    CASE WHEN stop = 0 THEN 1 ELSE 0 END AS f8,
        |    CASE WHEN ndist * 10 < ntok * 3 THEN 1 ELSE 0 END AS f16
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(CASE WHEN f1 + f2 + f4 + f8 + f16 = 0 THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(sum(f1) AS BIGINT) AS n_wordcount,
        |  CAST(sum(f2) AS BIGINT) AS n_wordlen,
        |  CAST(sum(f4) AS BIGINT) AS n_alpha,
        |  CAST(sum(f8) AS BIGINT) AS n_nostop,
        |  CAST(sum(f16) AS BIGINT) AS n_repetitive
        |FROM f GROUP BY source""".stripMargin,

    "text_redact" ->
      """WITH p1 AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |      ELSE text END AS t1
        |  FROM documents),
        |p2 AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN t1 || ' via 10.0.3.77 call 555-867-5309'
        |      ELSE t1 END AS text2
        |  FROM p1),
        |red AS (
        |  SELECT lang, text2,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text2,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM p2)
        |SELECT lang,
        |  CAST(count(*) FILTER (WHERE red <> text2) AS BIGINT) AS n_redacted_docs,
        |  CAST(coalesce(sum(length(text2) - length(red)), 0) AS BIGINT) AS chars_removed,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))), 0) AS BIGINT) AS n_emails,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))), 0) AS BIGINT) AS n_ips,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))), 0) AS BIGINT) AS n_phones
        |FROM red GROUP BY lang""".stripMargin,

    "dedup_keep_best" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000, text || ' 1234 !!!! ####'
        |  FROM documents WHERE doc_id < 60),
        |scored AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(
        |      list_filter(string_split(text, ' '), t -> t <> ''), 1, 6), ' ') AS pfx,
        |    CAST(floor((
        |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |        THEN 1.0 ELSE 0.5 END * 0.3
        |      + CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |    ) * 1000000) AS BIGINT) AS q_micro
        |  FROM corpus),
        |ranked AS (
        |  SELECT pfx, doc_id, q_micro,
        |    row_number() OVER (PARTITION BY pfx ORDER BY q_micro DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY pfx) AS n_copies
        |  FROM scored)
        |SELECT pfx AS dedup_key, CAST(n_copies AS BIGINT) AS n_copies,
        |  q_micro AS best_q_micro, doc_id AS rep_id
        |FROM ranked WHERE rn = 1 AND n_copies > 1""".stripMargin,

    "line_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'shared navigation header menu' || chr(10) ELSE '' END
        |    || text
        |    || CASE WHEN doc_id % 4 = 0
        |      THEN chr(10) || 'copyright footer all rights reserved' ELSE '' END AS text2
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, source,
        |    unnest(string_split(text2, chr(10))) AS line,
        |    generate_subscripts(string_split(text2, chr(10)), 1) AS line_no
        |  FROM planted),
        |freq AS (
        |  SELECT line AS fline FROM lines GROUP BY line HAVING count(*) >= 100),
        |cleaned AS (
        |  SELECT doc_id, any_value(source) AS source,
        |    coalesce(string_agg(CASE WHEN fline IS NULL THEN line END,
        |      chr(10) ORDER BY line_no), '') AS clean_text,
        |    count(CASE WHEN fline IS NULL THEN 1 END) AS kept,
        |    count(fline) AS removed
        |  FROM lines l LEFT JOIN freq f ON l.line = f.fline
        |  GROUP BY doc_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS lines_kept,
        |  CAST(sum(removed) AS BIGINT) AS lines_removed,
        |  CAST(sum(length(clean_text)) AS BIGINT) AS chars_after
        |FROM cleaned GROUP BY source""".stripMargin,

    "mix_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END AS source,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS hv
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM m
        |  WHERE hv % 100 <
        |    CASE source WHEN 'web' THEN 80 WHEN 'books' THEN 50 ELSE 20 END)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source""".stripMargin,

    "temp_mixture" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'web'
        |         WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS source,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 1000 AS hv
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n FROM m GROUP BY 1),
        |-- isqrt via one correction step around floor(sqrt(n::DOUBLE)):
        |-- exact only while n < 2^52, where the double sqrt is within one
        |-- step of the true root. The Scala side loops to exactness at any
        |-- n; beyond 2^52 rows/source this oracle (not the engine) would
        |-- need an iterative isqrt.
        |w AS (
        |  SELECT source, n,
        |    CASE WHEN (x + 1) * (x + 1) <= n THEN x + 1
        |         WHEN x * x > n THEN x - 1 ELSE x END AS w
        |  FROM (SELECT source, n,
        |          CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS x FROM c)),
        |p AS (
        |  SELECT source,
        |    least(1000, (1000::HUGEINT * 250 * w) // ((SELECT sum(w) FROM w) * n)) AS permille
        |  FROM w),
        |kept AS (
        |  SELECT m.source, m.doc_id FROM m JOIN p USING (source)
        |  WHERE m.hv < p.permille)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source""".stripMargin,

    // the band partition contract in closed form: exhaustive (every row in
    // exactly one band) and disjoint (no row twice), so all three counts
    // are the plain table count
    "hash_bands" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_in_bands,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents""".stripMargin,

    "sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
        |  FROM documents)
        |SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM b GROUP BY 1""".stripMargin,

    "group_split" ->
      s"""$corpusCte,
         |sets AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
         |  FROM corpus),
         |fam AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY ws) AS rep_id FROM sets),
         |sp AS (
         |  SELECT doc_id, rep_id,
         |    ((rep_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
         |  FROM fam)
         |SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT rep_id) AS BIGINT) AS n_families,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
         |FROM sp GROUP BY 1""".stripMargin,

    "budget_carve" ->
      """WITH c AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    SUM(n_chars) OVER (
        |      ORDER BY ((doc_id % 1000003) * 2654435761 + 104729) % 1000003,
        |               doc_id) AS cum
        |  FROM documents)
        |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM c WHERE cum <= 75000""".stripMargin,

    "mass_carve" ->
      """WITH t AS (SELECT source, sum(n_chars) AS tot FROM documents GROUP BY source),
        |c AS (
        |  SELECT d.source, d.doc_id, d.n_chars, t.tot,
        |    SUM(d.n_chars) OVER (PARTITION BY d.source
        |      ORDER BY d.n_chars DESC, d.doc_id) AS cum
        |  FROM documents d JOIN t ON d.source = t.source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM c WHERE cum <= tot * 800 // 1000 GROUP BY source""".stripMargin,

    "stream_budget_gate" ->
      """WITH b AS (
        |  SELECT src, budget FROM (VALUES
        |    ('src0', 5000), ('src1', 3000), ('src2', 100000), ('src3', 9000))
        |    AS v(src, budget)),
        |c AS (
        |  SELECT d.source, d.doc_id, d.n_chars, d.doc_id % 3 AS batch, bb.budget,
        |    SUM(d.n_chars) OVER (PARTITION BY d.source, d.doc_id % 3
        |      ORDER BY ((d.doc_id % 1000003) * 2654435761 + 104729) % 1000003,
        |               d.doc_id) AS cum
        |  FROM documents d JOIN b bb ON d.source = bb.src),
        |s0 AS (SELECT src, budget, coalesce((SELECT max(cum) FROM c
        |         WHERE c.source = b.src AND batch = 0 AND cum <= b.budget), 0) AS c0
        |       FROM b),
        |s1 AS (SELECT src, budget, c0, coalesce((SELECT max(cum) FROM c
        |         WHERE c.source = s0.src AND batch = 1
        |           AND cum <= s0.budget - s0.c0), 0) AS c1
        |       FROM s0),
        |kept AS (
        |  SELECT c.source, c.doc_id, c.n_chars FROM c JOIN s1 ON c.source = s1.src
        |  WHERE (batch = 0 AND cum <= s1.budget)
        |     OR (batch = 1 AND cum <= s1.budget - s1.c0)
        |     OR (batch = 2 AND cum <= s1.budget - s1.c0 - s1.c1))
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM kept GROUP BY source""".stripMargin,

    "budget_mixture" ->
      """WITH b AS (
        |  SELECT source AS src, budget FROM (VALUES
        |    ('src0', 100000), ('src1', 4000), ('src2', 40000), ('src3', 12000))
        |    AS v(source, budget)),
        |c AS (
        |  SELECT d.source, d.doc_id, d.n_chars, b.budget,
        |    SUM(d.n_chars) OVER (PARTITION BY d.source
        |      ORDER BY ((d.doc_id % 1000003) * 2654435761 + 104729) % 1000003,
        |               d.doc_id) AS cum
        |  FROM documents d JOIN b ON d.source = b.src)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM c WHERE cum <= budget GROUP BY source""".stripMargin,

    "quantile_hist" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    least(greatest(CAST(floor(l_extendedprice) AS BIGINT), 0) // 5000, 23) AS bin
        |  FROM lineitem),
        |h AS (SELECT g, bin, count(*) AS cnt FROM b GROUP BY g, bin),
        |c AS (
        |  SELECT g, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 500000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p50_ub,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 900000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p90_ub,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 990000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p99_ub
        |FROM c GROUP BY g""".stripMargin,

    "drift_hist" ->
      """WITH c AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS w,
        |    least(greatest(CAST(floor(value) AS BIGINT), 0) // 10, 11) AS cat,
        |    count(*) AS cnt
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT w, cat, cnt * 1000000 // sum(cnt) OVER (PARTITION BY w) AS sh
        |  FROM c),
        |p AS (
        |  SELECT coalesce(a.w, b.w) AS w,
        |    coalesce(a.sh, 0) AS sa, coalesce(b.sh, 0) AS sb
        |  FROM s a
        |  FULL JOIN (SELECT w + 1 AS w, cat, sh FROM s) b
        |    ON a.w = b.w AND a.cat IS NOT DISTINCT FROM b.cat),
        |d AS (SELECT DISTINCT w FROM s)
        |SELECT p.w AS day, CAST(sum(abs(sa - sb)) AS BIGINT) AS l1_micro
        |FROM p
        |WHERE p.w IN (SELECT w FROM d) AND p.w - 1 IN (SELECT w FROM d)
        |GROUP BY p.w""".stripMargin,

    "drift_l1" ->
      """WITH c AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS w,
        |    event_type AS cat, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT w, cat, cnt * 1000000 // sum(cnt) OVER (PARTITION BY w) AS sh
        |  FROM c),
        |p AS (
        |  SELECT coalesce(a.w, b.w) AS w,
        |    coalesce(a.sh, 0) AS sa, coalesce(b.sh, 0) AS sb
        |  FROM s a
        |  FULL JOIN (SELECT w + 1 AS w, cat, sh FROM s) b
        |    ON a.w = b.w AND a.cat IS NOT DISTINCT FROM b.cat),
        |d AS (SELECT DISTINCT w FROM s)
        |SELECT p.w AS day, CAST(sum(abs(sa - sb)) AS BIGINT) AS l1_micro
        |FROM p
        |WHERE p.w IN (SELECT w FROM d) AND p.w - 1 IN (SELECT w FROM d)
        |GROUP BY p.w""".stripMargin,

    "bpe_pairs" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |u AS (
        |  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        |  FROM t WHERE len(t) >= 2),
        |c AS (
        |  SELECT z[1] AS "left", z[2] AS "right", CAST(count(*) AS BIGINT) AS cnt
        |  FROM u GROUP BY 1, 2)
        |SELECT "left", "right", cnt FROM c
        |ORDER BY cnt DESC, "left", "right" LIMIT 20""".stripMargin,

    "bpe_merges" -> bpeMergesOracleSql(8),

    "bpe_encode" -> bpeEncodeOracleSql(8),

    "drift_vector" ->
      """WITH qv AS (
        |  SELECT vec_id, CAST(label AS VARCHAR) AS g,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> greatest(least(CAST(floor(x * 64) AS BIGINT), 127), -128)) AS q8
        |  FROM embeddings),
        |dims AS (
        |  SELECT g, vec_id % 2 = 0 AS is_a, i, q8[i] AS qd
        |  FROM qv, unnest(range(1, len(q8) + 1)) AS r(i)),
        |sums AS (
        |  SELECT g, i,
        |    sum(CASE WHEN is_a THEN qd ELSE 0 END) AS sa,
        |    sum(CASE WHEN NOT is_a THEN qd ELSE 0 END) AS sb
        |  FROM dims GROUP BY 1, 2),
        |cnts AS (
        |  SELECT g,
        |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
        |  FROM qv GROUP BY 1)
        |SELECT g, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS l1_cross
        |FROM sums JOIN cnts USING (g)
        |GROUP BY g, na, nb""".stripMargin,

    "bpe_efficiency" ->
      s"""${bpeTrainCtes(8)}
         |SELECT d.source,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
         |  CAST(sum(len(v.s)) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(length(d.word)) * 1000000 // sum(len(v.s)) AS BIGINT) AS chars_per_tok_micro
         |FROM (
         |  SELECT source,
         |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
         |  FROM documents) d
         |JOIN v8 v USING (word)
         |GROUP BY d.source""".stripMargin,

    "pipeline_tokenize" ->
      s"""${bpeTrainCtes(8)},
         |cnt AS (
         |  SELECT d.source, d.doc_id, CAST(sum(len(v.s)) AS BIGINT) AS n_tok
         |  FROM (
         |    SELECT source, doc_id,
         |      unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
         |    FROM documents) d
         |  JOIN v8 v USING (word)
         |  GROUP BY d.source, d.doc_id),
         |packed AS (
         |  SELECT source, doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // 2048 AS BIGINT) AS seq_id
         |  FROM cnt)
         |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM packed
         |GROUP BY source, seq_id""".stripMargin,

    "event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, {'t': ts, 'i': event_id} AS k FROM events),
        |v AS (
        |  SELECT user_id, min(k) AS s1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.k) AS s2 FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.k > v.s1 GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.k) AS s3 FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.k > c.s2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM p""".stripMargin,

    "event_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT CAST(fd.cohort_day AS BIGINT) AS cohort_day,
        |  CAST(ud.day - fd.cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM ud JOIN fd ON ud.user_id = fd.user_id
        |GROUP BY 1, 2""".stripMargin,

    // the salted join must equal the PLAIN join it replaces — the oracle
    // is the unsalted formulation
    "skew_join" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE o_custkey END AS cust,
        |    o_totalprice
        |  FROM orders)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS price_sum
        |FROM o JOIN customer ON cust = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "profile_table" ->
      """WITH p AS (
        |  SELECT 'l_orderkey' AS "column", count(*) AS n, count(*) - count(l_orderkey) AS n_null,
        |    CAST(CAST(min(l_orderkey) AS DECIMAL(28,6)) AS VARCHAR) AS min_s,
        |    CAST(CAST(max(l_orderkey) AS DECIMAL(28,6)) AS VARCHAR) AS max_s,
        |    CAST(sum(CAST(l_orderkey AS DECIMAL(28,6))) AS DOUBLE) AS sum_d
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |    CAST(CAST(min(l_quantity) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(CAST(max(l_quantity) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |    CAST(CAST(min(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(CAST(max(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    min(l_returnflag), max(l_returnflag), NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |    CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR), NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
        |    min(l_linestatus), max(l_linestatus), NULL
        |  FROM lineitem)
        |SELECT "column", CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
        |  min_s, max_s, CAST(sum_d AS DOUBLE) AS sum_d
        |FROM p""".stripMargin,

    // capacity exceeds the distinct-token count, so the sketch holds exact
    // counts and both bounds equal the true count (see the query comment).
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT lang, token AS item,
        |  CAST(count(*) AS BIGINT) AS count_lb,
        |  CAST(count(*) AS BIGINT) AS count_ub
        |FROM toks GROUP BY lang, token""".stripMargin,

    // the streaming sketch must land on the batch exact counts (the
    // eviction-free Misra-Gries regime) — identical oracle by design
    "stream_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT lang, token AS item,
        |  CAST(count(*) AS BIGINT) AS count_lb,
        |  CAST(count(*) AS BIGINT) AS count_ub
        |FROM toks GROUP BY lang, token""".stripMargin,

    "weighted_sample" ->
      """WITH p AS (
        |  SELECT doc_id AS id,
        |    (length(text) * 1000003) //
        |      (((doc_id % 1000003) * 2654435761 + 104729) % 1000003 + 1) AS priority
        |  FROM documents),
        |r AS (
        |  SELECT id, priority,
        |    row_number() OVER (ORDER BY priority DESC, id) AS rank
        |  FROM p)
        |SELECT CAST(rank AS BIGINT) AS rank, id, CAST(priority AS BIGINT) AS priority
        |FROM r WHERE rank <= 20""".stripMargin,

    "kmv_overlap" ->
      """WITH ha AS (
        |  SELECT DISTINCT ((c_custkey % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM customer),
        |hb AS (
        |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM orders),
        |a AS (SELECT list_sort(list(h)) AS ka FROM (SELECT h FROM ha ORDER BY h LIMIT 16)),
        |b AS (SELECT list_sort(list(h)) AS kb FROM (SELECT h FROM hb ORDER BY h LIMIT 16)),
        |m AS (SELECT ka, kb, (list_sort(list_distinct(ka || kb)))[1:16] AS mk FROM a, b)
        |SELECT CAST(len(ka) AS BIGINT) AS n_a, CAST(len(kb) AS BIGINT) AS n_b,
        |  CAST(len(list_intersect(list_intersect(mk, ka), kb)) AS BIGINT) AS inter_k,
        |  CAST(CASE WHEN len(mk) < 16 THEN len(mk) * 1000000
        |    ELSE 15000045000000 // mk[16] END AS BIGINT) AS union_est_micro,
        |  CAST(len(list_intersect(list_intersect(mk, ka), kb)) * 1000000 // len(mk) AS BIGINT)
        |    AS jaccard_micro
        |FROM m""".stripMargin,

    "quota_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv DESC, doc_id) AS rn
        |  FROM h)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM r WHERE rn <= 25 GROUP BY lang""".stripMargin,

    "text_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |df AS (
        |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks GROUP BY token),
        |tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE doc_id < 30 GROUP BY doc_id, token)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rank
        |  FROM tf JOIN df USING (token))
        |WHERE rank <= 3""".stripMargin,

    "text_vocab" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,

    "dedup_embedding" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 25)
        |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
        |  CAST(coalesce(sum(a.vec_id + b.vec_id), 0) AS BIGINT) AS id_sum
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |  CAST(b.embedding AS DOUBLE[])) > 0.99""".stripMargin,

    "text_bpe_tokens" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS n_subwords
        |FROM documents
        |GROUP BY source""".stripMargin,

    "pipeline_clean" ->
      s"""$corpusCte,
         |reps AS (SELECT text, min(doc_id) AS doc_id FROM corpus GROUP BY text),
         |scored AS (
         |  SELECT doc_id, text,
         |    CAST(floor((
         |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
         |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
         |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
         |        THEN 1.0 ELSE 0.5 END * 0.3
         |      + CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
         |    ) * 1000000) AS BIGINT) AS q_micro
         |  FROM reps)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sum(q_micro), 0) AS BIGINT) AS q_micro_sum,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
         |FROM scored WHERE q_micro >= 800000""".stripMargin,

    "pipeline_train" ->
      """WITH reps AS (
        |  SELECT text, min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang
        |  FROM documents GROUP BY text),
        |scored AS (
        |  SELECT doc_id, lang, text,
        |    CAST(floor((
        |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |        THEN 1.0 ELSE 0.5 END * 0.3
        |      + CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |    ) * 1000000) AS BIGINT) AS q_micro
        |  FROM reps),
        |kept AS (
        |  SELECT doc_id, lang, text,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 < 80 THEN 'train'
        |      WHEN ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM scored WHERE q_micro >= 800000)
        |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY lang, split""".stripMargin,

    "pack_sequences" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 4096 AS BIGINT) AS seq_id
        |  FROM toks)
        |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM packed
        |GROUP BY source, seq_id""".stripMargin,

    "decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |      t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS ng
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(ng) AS g FROM grams WHERE doc_id < 20),
        |corpus AS (
        |  SELECT doc_id, ng FROM grams WHERE doc_id >= 20
        |  UNION ALL
        |  SELECT doc_id + 200000, ng FROM grams WHERE doc_id < 20),
        |bad AS (
        |  SELECT DISTINCT c.doc_id
        |  FROM (SELECT doc_id, unnest(ng) AS g FROM corpus) c
        |  JOIN bench USING (g))
        |SELECT CAST(count(*) AS BIGINT) AS n_contaminated,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,

    "text_repetition" ->
      """WITH ng AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS ng
        |  FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents WHERE doc_id < 50))
        |SELECT doc_id,
        |  CASE WHEN len(ng) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor((1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng))
        |      * 1000000) AS BIGINT) END AS rep_micro
        |FROM ng""".stripMargin,

    "ann_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |FROM (
        |  SELECT q.q_id, e.vec_id,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY list_cosine_similarity(q.q_vec, CAST(e.embedding AS DOUBLE[])) DESC,
        |        e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id)
        |WHERE rank <= 3""".stripMargin,

    // Quantized scores are exact integers: the oracle replays the same
    // floor/clamp fixed-point arithmetic and integer dot product, and the
    // hash compare pins scores, not just ranks.
    "ann_quantized" ->
      """WITH qv AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> greatest(least(CAST(floor(x * 64) AS BIGINT), 127), -128)) AS q8
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, q8 AS qq FROM qv WHERE vec_id < 10),
        |s AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_sum(list_transform(list_zip(e.q8, q.qq), x -> x[1] * x[2])) AS score
        |  FROM qv e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
        |  FROM s)
        |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
        |  CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3""".stripMargin,

    "ann_join_meta" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |  FROM embeddings WHERE vec_id < 5),
        |top AS (
        |  SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |  FROM (
        |    SELECT q.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.q_vec, CAST(e.embedding AS DOUBLE[])) DESC,
        |          e.vec_id) AS rank
        |    FROM embeddings e CROSS JOIN q
        |    WHERE e.vec_id <> q.q_id)
        |  WHERE rank <= 3)
        |SELECT query_id, rank, neighbor_id, d.lang, d.source
        |FROM top JOIN documents d ON neighbor_id = d.doc_id""".stripMargin,

    // Planted-duplicate exact recall: rank 1 of query q is provably its
    // exact copy at id q + 100000 (see the query comments), so the oracle
    // is a closed-form integer relation.
    "ann_lsh" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_lsh_multi" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_project" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_ivf" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_ivf_quantized" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_rerank" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "ann_ivf_store" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // pre-filtered store search: rank 1 must be the matching-label copy
    // (+100000); the cosine-identical decoy (+200000, wrong label) cannot
    // appear because the filter runs BEFORE ranking (closed-form recall)
    "ann_filtered" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // absorbed exact copies must be found at rank 1 through the grown
    // store (closed-form planted recall, same contract as ann_ivf_store)
    "ann_ivf_absorb" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 200000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // the monitor MUST fire (the increment is a genuine distribution
    // shift) and the rebuilt index must serve the drifted copies at rank 1
    "ann_reindex_on_drift" ->
      """SELECT vec_id AS query_id, true AS reindexed,
        |  CAST(vec_id + 300000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    // the query encodes each row as a real PNG/JPEG with these exact
    // closed-form dimensions and then parses them back off the container
    // headers; the oracle recomputes the closed form independently
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS kind,
        |  CAST(16 + doc_id % 37 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 23 AS BIGINT) AS height,
        |  CAST((16 + doc_id % 37) * (16 + doc_id % 23) AS BIGINT) AS n_pixels
        |FROM documents WHERE doc_id < 50""".stripMargin,

    // independent re-derivation of the manifest from the written files
    // (hive partitioning + per-file row counts); the path is the fixed
    // export location the query writes (same-machine oracle, like the
    // meta_* oracles' fixed sf0.01 paths)
    "export_manifest" ->
      """SELECT CAST(lang AS VARCHAR) AS lang,
        |  CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM read_parquet('/tmp/graft_export_manifest_sf0.01/*/*.parquet',
        |  hive_partitioning = 1, filename = 1)
        |GROUP BY lang""".stripMargin,

    // independent re-derivation of the compaction manifest from the
    // written files themselves (same-machine fixed sf0.01 path)
    "sized_write" ->
      """SELECT CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM read_parquet('/tmp/graft_sized_write_sf0.01/*.parquet', filename = 1)""".stripMargin,

    "bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // the DATA recomputes what the PAGE INDEX promises: the query writes
    // ids 0..19999 at exactly 1000 rows per page, so page p must span
    // [1000p, 1000p+999] — derived here by scanning the written rows with
    // an independent engine (same-machine fixed sf0.01 path, like the
    // export_manifest oracle)
    "meta_page_index" ->
      """SELECT CAST(id // 1000 AS BIGINT) AS page,
        |  CAST(min(id) AS BIGINT) AS min_id, CAST(max(id) AS BIGINT) AS max_id
        |FROM read_parquet('/tmp/graft_pageindex_sf0.01/*.parquet')
        |GROUP BY 1""".stripMargin,

    // pairs predicted from the plant: each id < 10 has a copy at id+1000
    // flipped at exactly 3 hash bits (within the d=3 recall guarantee);
    // base patterns are splitmix-scrambled and pairwise far (spec-pinned)
    "mm_phash_near" ->
      """SELECT doc_id AS a_id, CAST(doc_id + 1000 AS BIGINT) AS b_id
        |FROM documents WHERE doc_id < 10""".stripMargin,

    // families predicted from the plant: ids < 10 get one exact pixel
    // copy at id+1000; distinct bases don't collide (spec-pinned)
    "mm_phash_dedup" ->
      """SELECT doc_id AS keep_id, CAST(2 AS BIGINT) AS n_copies,
        |  CAST(doc_id * 2 + 1000 AS BIGINT) AS id_sum
        |FROM documents WHERE doc_id < 10""".stripMargin,

    // fixture arithmetic replayed: rate 8000+1000*(id%4), channels
    // 1+id%2, frames 500+3*id, exact integer microsecond duration
    "mm_audio_probe" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + 1000 * (doc_id % 4) AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(500 + doc_id * 3 AS BIGINT) AS n_frames,
        |  CAST((500 + doc_id * 3) * 1000000 // (8000 + 1000 * (doc_id % 4))
        |    AS BIGINT) AS dur_us
        |FROM documents WHERE doc_id < 40""".stripMargin,

    "mm_video_probe" ->
      """SELECT doc_id AS media_id, c.container,
        |  CAST(CASE WHEN c.container = 'mp4'
        |    THEN 1000 * (1 + doc_id % 3) ELSE 1000 END AS BIGINT) AS timescale,
        |  CAST(4000 + doc_id * 7 AS BIGINT) AS dur_ticks,
        |  CAST((4000 + doc_id * 7) * 1000000
        |    // (CASE WHEN c.container = 'mp4'
        |      THEN 1000 * (1 + doc_id % 3) ELSE 1000 END) AS BIGINT) AS dur_us,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
        |  CAST(320 + 16 * (doc_id % 5) AS BIGINT) AS width,
        |  CAST(180 + 9 * (doc_id % 5) AS BIGINT) AS height
        |FROM documents, (VALUES ('mp4'), ('mkv'), ('webm')) c(container)
        |WHERE doc_id < 40""".stripMargin,

    "mm_audio_formats" ->
      """SELECT doc_id AS media_id, c.container,
        |  CAST(8000 + 1000 * (doc_id % 4) AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(400 + doc_id * 3 AS BIGINT) AS n_frames,
        |  CAST((400 + doc_id * 3) * 1000000 // (8000 + 1000 * (doc_id % 4))
        |    AS BIGINT) AS dur_us
        |FROM documents, (VALUES ('wav'), ('aiff'), ('au')) c(container)
        |WHERE doc_id < 30""".stripMargin,

    // the integer shrink arithmetic reproduced from doc_id alone:
    // fixture dims w=12+(id*7)%60, h=10+(id*5)%45; longer side capped at
    // 24 with floor scaling, passthrough when already within bounds
    "mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    12 + (doc_id * 7) % 60 AS w, 10 + (doc_id * 5) % 45 AS h
        |  FROM documents WHERE doc_id < 40)
        |SELECT media_id,
        |  CAST(CASE WHEN greatest(w, h) <= 24 THEN w
        |    ELSE greatest(1, w * 24 // greatest(w, h)) END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN greatest(w, h) <= 24 THEN h
        |    ELSE greatest(1, h * 24 // greatest(w, h)) END AS BIGINT) AS out_h
        |FROM dims""".stripMargin,

    "mm_frames" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum,
        |  CAST(coalesce(sum(octet_length(encode(text))), 0) AS BIGINT) AS byte_sum
        |FROM documents WHERE doc_id < 100 AND doc_id % 4 = 0""".stripMargin,

    "asof_join" ->
      """SELECT e.user_id, e.e_ts, e.event_id, o.o_ts, o.o_key
        |FROM (SELECT user_id, epoch_us(ts) AS e_ts, event_id
        |      FROM events WHERE user_id < 30) e
        |ASOF JOIN (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_ts,
        |             max(o_orderkey) AS o_key
        |           FROM orders GROUP BY 1, 2) o
        |ON e.user_id = o.user_id AND e.e_ts >= o.o_ts""".stripMargin,

    // per-row argmin over |e_ts - o_ts|, earlier order on ties (backward
    // bias) — the relational definition of direction='nearest'
    "asof_nearest" ->
      """SELECT e.user_id, e.e_ts, e.event_id, o.o_ts, o.o_key
        |FROM (SELECT user_id, epoch_us(ts) AS e_ts, event_id
        |      FROM events WHERE user_id < 30) e
        |JOIN LATERAL (
        |  SELECT o_ts, o_key
        |  FROM (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_ts,
        |          max(o_orderkey) AS o_key
        |        FROM orders GROUP BY 1, 2) o
        |  WHERE o.user_id = e.user_id
        |  ORDER BY abs(e.e_ts - o.o_ts), o.o_ts
        |  LIMIT 1) o ON true""".stripMargin,

    // the streaming replay must land on the batch LEFT as-of exactly
    // (stateless stream-static enrichment, AvailableNow)
    "stream_asof_enrich" ->
      """SELECT e.user_id, e.e_ts, e.event_id, o.o_ts, o.o_key
        |FROM (SELECT user_id, epoch_us(ts) AS e_ts, event_id
        |      FROM events WHERE user_id < 30) e
        |ASOF LEFT JOIN (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_ts,
        |             max(o_orderkey) AS o_key
        |           FROM orders GROUP BY 1, 2) o
        |ON e.user_id = o.user_id AND e.e_ts >= o.o_ts""".stripMargin,

    "range_join" ->
      """WITH pts AS (
        |  SELECT l_orderkey, l_linenumber, epoch_ns(l_shipdate) AS ship_ns
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |ivs AS (
        |  SELECT o_orderkey AS iv_order, epoch_ns(o_orderdate) AS w_start,
        |    epoch_ns(o_orderdate) + CAST(2592000000000000 AS BIGINT) AS w_end
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT iv_order, CAST(count(*) AS BIGINT) AS n_ship,
        |  CAST(sum(l_linenumber) AS BIGINT) AS ln_sum
        |FROM pts JOIN ivs ON ship_ns BETWEEN w_start AND w_end
        |GROUP BY iv_order""".stripMargin,

    "asof_fwd" ->
      """SELECT o.o_orderkey, o.o_ts, s.ship_ts, s.n_items, s.max_line
        |FROM (SELECT o_orderkey, epoch_us(o_orderdate) AS o_ts
        |      FROM orders WHERE o_orderkey % 20 = 0) o
        |ASOF JOIN (SELECT l_orderkey AS o_orderkey, epoch_us(l_shipdate) AS ship_ts,
        |             CAST(count(*) AS BIGINT) AS n_items,
        |             CAST(max(l_linenumber) AS BIGINT) AS max_line
        |           FROM lineitem GROUP BY 1, 2) s
        |ON o.o_orderkey = s.o_orderkey AND o.o_ts <= s.ship_ts""".stripMargin,

    "interval_join" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, epoch_us(o_orderdate) AS a_s,
        |    epoch_us(o_orderdate) + CAST(2592000000000 AS BIGINT) AS a_e
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, epoch_us(o_orderdate) AS b_s,
        |    epoch_us(o_orderdate) + CAST(2592000000000 AS BIGINT) AS b_e
        |  FROM orders WHERE o_orderkey % 100 = 50)
        |SELECT a_key, CAST(count(*) AS BIGINT) AS n_overlap,
        |  CAST(sum(b_key) AS BIGINT) AS bkey_sum
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |GROUP BY a_key""".stripMargin,

    "zorder_key" ->
      s"""WITH z AS (
         |  SELECT ${Layout.zvalue2Sql("o_custkey", "o_orderkey")} AS z FROM orders)
         |SELECT z // ${1L << 22} AS zbucket, CAST(count(*) AS BIGINT) AS n,
         |  min(z) AS min_z, max(z) AS max_z
         |FROM z GROUP BY 1""".stripMargin,

    "dedup_simhash_near" ->
      """SELECT doc_id AS a_id, doc_id + 100000 AS b_id
        |FROM documents WHERE doc_id < 50""".stripMargin,

    "text_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id, toks,
        |        CASE WHEN len(toks) = 0 THEN 0
        |             WHEN len(toks) <= 40 THEN 1
        |             ELSE (len(toks) - 40 + 29) // 30 + 1 END AS n_chunks
        |      FROM d),
        |c AS (
        |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id
        |  FROM n WHERE n_chunks > 0),
        |s AS (
        |  SELECT doc_id, chunk_id,
        |    toks[(chunk_id * 30 + 1):least(chunk_id * 30 + 40, len(toks))] AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_toks,
        |  chunk[1] AS head_tok, chunk[len(chunk)] AS tail_tok
        |FROM s""".stripMargin,

    "sparse_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS term
        |  FROM tok),
        |pt AS (SELECT term, doc_id, count(*) AS tf FROM ng GROUP BY 1, 2),
        |keep AS (SELECT term FROM pt GROUP BY term HAVING count(*) <= 20),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    sum(a.tf * b.tf) AS dot, count(*) AS shared_terms
        |  FROM pt a JOIN keep USING (term) JOIN pt b USING (term)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot,
        |  CAST(shared_terms AS BIGINT) AS shared_terms
        |FROM pr ORDER BY dot DESC, doc_a, doc_b LIMIT 20""".stripMargin,

    "corpus_redundancy" ->
      """WITH ng AS (
        |  SELECT source, doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]))) AS g
        |  FROM (
        |    SELECT source, doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents)),
        |withdf AS (
        |  SELECT source, doc_id, g,
        |    count(*) OVER (PARTITION BY g) AS df
        |  FROM ng)
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS shared_micro
        |FROM withdf GROUP BY source""".stripMargin,

    "meta_schema_diff" ->
      """WITH before AS (
        |  SELECT path_in_schema AS col_name, max(type) AS type_before,
        |    sum(num_values) AS n_before
        |  FROM parquet_metadata('/root/testdata/sf0.01/orders.parquet') GROUP BY 1),
        |after AS (
        |  SELECT path_in_schema AS col_name, max(type) AS type_after,
        |    sum(num_values) AS n_after
        |  FROM parquet_metadata('/tmp/graft_schema_diff_sf0.01/*.parquet') GROUP BY 1)
        |SELECT col_name,
        |  CASE WHEN b.type_before IS NULL THEN 'added'
        |       WHEN a.type_after IS NULL THEN 'removed'
        |       WHEN b.type_before <> a.type_after THEN 'type_changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(b.type_before, '-') AS type_before,
        |  coalesce(a.type_after, '-') AS type_after,
        |  CAST(coalesce(b.n_before, 0) AS BIGINT) AS n_before,
        |  CAST(coalesce(a.n_after, 0) AS BIGINT) AS n_after
        |FROM before b FULL OUTER JOIN after a USING (col_name)""".stripMargin,

    // the fixtures' parquet declarations are pinned by construction
    // (mm_features-style closed form): DATE annotates int32, DECIMAL(18,x)
    // rides int64 — so the scale bump 2->4 is a LOGICAL-only change the
    // physical diff above cannot see, and it must classify as 'changed'
    "meta_schema_diff_logical" ->
      """SELECT * FROM (VALUES
        |  ('l_orderkey', 'unchanged', 'int64', 'int64'),
        |  ('ship', 'unchanged', 'int32 (DATE)', 'int32 (DATE)'),
        |  ('price', 'changed', 'int64 (DECIMAL(18,2))', 'int64 (DECIMAL(18,4))'),
        |  ('flag', 'removed', 'binary (STRING)', '-'),
        |  ('qty', 'added', '-', 'int32'))
        |AS t(col_name, status, decl_before, decl_after)""".stripMargin,

    "winsorize_clip" ->
      """WITH h AS (
        |  SELECT l_returnflag AS g,
        |    least(greatest(CAST(floor(l_quantity) AS BIGINT), 0) // 2, 31) AS bin,
        |    count(*) AS cnt
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |c AS (
        |  SELECT g, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM h),
        |b AS (
        |  SELECT g,
        |    min(CASE WHEN cum * 1000000 >= n * 50000 THEN (bin + 1) * 2 END) AS lo_bound,
        |    min(CASE WHEN cum * 1000000 >= n * 950000 THEN (bin + 1) * 2 END) AS hi_bound
        |  FROM c GROUP BY g),
        |clipped AS (
        |  SELECT l.l_returnflag, l.l_quantity,
        |    b.lo_bound, b.hi_bound,
        |    least(greatest(l.l_quantity, b.lo_bound), b.hi_bound) AS clipped
        |  FROM lineitem l JOIN b ON l.l_returnflag = b.g)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN clipped > l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS n_raised,
        |  CAST(sum(CASE WHEN clipped < l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS n_lowered,
        |  CAST(max(lo_bound) AS BIGINT) AS lo_bound,
        |  CAST(max(hi_bound) AS BIGINT) AS hi_bound,
        |  CAST(sum(CAST(clipped AS DECIMAL(28,6))) AS DOUBLE) AS sum_clipped
        |FROM clipped GROUP BY l_returnflag""".stripMargin,

    "text_diversity" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1), i -> unicode(text[i:i]))) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM codes GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(k * k) AS sq, sum(k) AS n FROM cnt GROUP BY 1)
        |SELECT doc_id, CAST((1000000::HUGEINT * sq) // (n * n) AS BIGINT) AS coll_micro
        |FROM agg WHERE n > 0
        |ORDER BY coll_micro DESC, doc_id LIMIT 20""".stripMargin,

    "cdc_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, 'zq' || text AS text
        |  FROM documents WHERE doc_id < 50),
        |codes AS (
        |  SELECT doc_id, text,
        |    list_transform(range(1, length(text) + 1), i -> unicode(text[i:i])) AS cs
        |  FROM corpus),
        |cuts AS (
        |  SELECT doc_id, text,
        |    list_filter(range(16, length(text) + 1),
        |      p -> list_reduce(cs[p-15:p], (a, c) -> (a * 31 + c) % 1000003) % 32 = 0) AS cut
        |  FROM codes),
        |bounds AS (
        |  SELECT doc_id, text,
        |    list_concat(list_concat([CAST(0 AS BIGINT)], cut),
        |      CASE WHEN len(cut) > 0 AND cut[-1] = length(text)
        |           THEN CAST([] AS BIGINT[]) ELSE [CAST(length(text) AS BIGINT)] END) AS b
        |  FROM cuts),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(b)), k -> text[b[k]+1 : b[k+1]]))) AS chunk
        |  FROM bounds),
        |keep AS (SELECT doc_id, chunk FROM chunks WHERE length(chunk) >= 20),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
        |  FROM keep a JOIN keep b USING (chunk) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 2""".stripMargin,

    "substr_search" ->
      """SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'fast merge', ''))) // 10 AS BIGINT) AS n_occ
        |FROM documents WHERE contains(text, 'fast merge')""".stripMargin,

    "text_term_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |pt AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
        |SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
        |FROM pt GROUP BY token
        |ORDER BY df DESC, token LIMIT 20""".stripMargin,

    // the join-formulation BM25 replayed relationally: same IEEE ratio-idf
    // operation order as text_bm25's oracle, with the per-term
    // micro-floor BEFORE the per-(query, doc) sum mirroring the Spark
    // side's order-independent aggregation
    "bm25_batch" ->
      """WITH q(q_id, term) AS (VALUES
        |    (0, 'window'), (0, 'merge'), (0, 'spark'),
        |    (1, 'hash'), (1, 'join'), (1, 'shuffle'),
        |    (2, 'parquet'), (2, 'footer'), (2, 'metadata'), (2, 'stream')),
        |d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT count(*) AS n,
        |        CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen FROM d),
        |p AS (
        |  SELECT u.token, d.doc_id, CAST(count(*) AS DOUBLE) AS tf,
        |    any_value(CAST(len(d.toks) AS DOUBLE)) AS dl
        |  FROM d, unnest(d.toks) AS u(token)
        |  WHERE u.token IN (SELECT term FROM q)
        |  GROUP BY 1, 2),
        |f AS (SELECT token, count(*) AS df FROM p GROUP BY 1),
        |scored AS (
        |  SELECT q.q_id, p.doc_id,
        |    CAST(sum(CAST(floor(
        |      ((s.n + 1.0) / (f.df + 1.0)) *
        |      ((p.tf * (1.0 + 1.0)) /
        |       (p.tf + 1.0 * ((1.0 - 0.5) + 0.5 * (p.dl / s.avglen))))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
        |  FROM p JOIN f USING (token) JOIN q ON p.token = q.term, s
        |  GROUP BY 1, 2)
        |SELECT CAST(q_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
        |  doc_id, score_micro
        |FROM (SELECT q_id, doc_id, score_micro,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY score_micro DESC, doc_id) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin,

    "text_bm25" -> {
      // one BM25 term, written to the letter of Relevance.bm25TopK's
      // IEEE operation order (ratio idf, k1=1.0, b=0.5)
      def term(t: String): String =
        s"""((s.n + 1.0) / (f.df_$t + 1.0)) *
           |  ((CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * 2.0) /
           |   (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) +
           |    1.0 * (0.5 + 0.5 * (CAST(len(toks) AS DOUBLE) / s.avglen))))""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen FROM d),
         |f AS (SELECT
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'window')) AS df_window,
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'merge')) AS df_merge,
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'spark')) AS df_spark),
         |scored AS (
         |  SELECT doc_id,
         |    ${term("window")}
         |  + ${term("merge")}
         |  + ${term("spark")} AS score
         |  FROM d, s, f),
         |top AS (SELECT doc_id, score FROM scored WHERE score > 0.0
         |        ORDER BY score DESC, doc_id LIMIT 15)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, CAST(floor(score * 1000000.0) AS BIGINT) AS score_micro
         |FROM top""".stripMargin
    }
  )
}
