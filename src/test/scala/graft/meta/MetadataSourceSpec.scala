package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetadataSourceSpec extends SparkSpec {
  private val lineitem = sf("0.001") + "/lineitem.parquet"

  private def meta(path: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("metadata")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(path)
  }

  test("file level over a single parquet file") {
    val df = meta(lineitem, "source" -> "file")
    assert(df.schema === MetaLevel.FsFile.schema)
    val rows = df.collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("filename") === "lineitem.parquet")
    assert(rows.head.getAs[Long]("size") > 0)
  }

  test("parquet file level matches actual row count") {
    val expected = spark.read.parquet(lineitem).count()
    val df = meta(lineitem, "level" -> "file")
    assert(df.schema === MetaLevel.ParquetFile.schema)
    val row = df.collect().head
    assert(row.getAs[Long]("num_rows") === expected)
    assert(row.getAs[Int]("num_row_groups") >= 1)
    assert(row.getAs[Long]("metadata_size") > 0)
    assert(row.getAs[String]("schema").startsWith("message"))
    assert(row.getAs[String]("created_by") != null)
  }

  test("rowgroup level num_rows sums to file num_rows") {
    val fileRows = meta(lineitem, "level" -> "file")
      .select("num_rows", "num_row_groups").collect().head
    val rg = meta(lineitem, "level" -> "rowgroup")
    assert(rg.schema === MetaLevel.ParquetRowGroup.schema)
    assert(rg.count() === fileRows.getInt(1).toLong)
    val summed = rg.agg(sum("num_rows")).collect().head.getLong(0)
    assert(summed === fileRows.getLong(0))
  }

  test("column level multiplicity and sizes are consistent with rowgroups") {
    val rgs = meta(lineitem, "level" -> "rowgroup")
      .select("row_group_id", "num_columns", "total_compressed_size")
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    val cols = meta(lineitem, "level" -> "column")
    assert(cols.schema === MetaLevel.ParquetColumn.schema)
    val byRg = cols.groupBy("row_group_id")
      .agg(count("*").as("n"), sum("total_compressed_size").as("sz"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byRg.keySet === rgs.keySet)
    byRg.foreach { case (id, (n, sz)) =>
      assert(n === rgs(id)._1.toLong)
      assert(sz === rgs(id)._2)
    }
    // every chunk carries a type/path/codec and positive num_values
    assert(cols.filter(col("path").isNull || col("type").isNull ||
      col("compression").isNull || col("num_values") <= 0).count() === 0)
  }

  test("page level bytes sum exactly to chunk compressed size") {
    val chunks = meta(lineitem, "level" -> "column")
      .select("row_group_id", "column_id", "total_compressed_size")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val pages = meta(lineitem, "level" -> "page")
    assert(pages.schema === MetaLevel.ParquetPage.schema)
    val byChunk = pages.groupBy("row_group_id", "column_id")
      .agg(sum(col("page_header_size") + col("page_compressed_size")).as("bytes"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(byChunk === chunks)
    // page ids restart at 0 per chunk
    val firstIds = pages.groupBy("row_group_id", "column_id")
      .agg(min("page_id").as("first")).select("first").distinct().collect()
    assert(firstIds.map(_.getInt(0)).toSeq === Seq(0))
  }

  test("page content gated by option and sized exactly") {
    val off = meta(lineitem, "level" -> "page")
    assert(off.filter(col("page_content").isNotNull).count() === 0)
    val on = meta(lineitem, "level" -> "page", "pagecontent" -> "true")
      .filter(col("page_content").isNotNull)
      .select(size(col("page_content")).as("n"), col("page_compressed_size"))
    assert(on.count() > 0)
    assert(on.filter(col("n") =!= col("page_compressed_size")).count() === 0)
  }

  test("partitioned table surfaces stringified partition values") {
    val dir = Files.createTempDirectory("graft_part").toString
    spark.range(0, 100, 1, 2)
      .withColumn("p", (col("id") % 2).cast("int"))
      .withColumn("s", concat(lit("v"), col("id") % 3))
      .write.mode("overwrite").partitionBy("p", "s").parquet(dir)
    val df = meta(dir, "level" -> "file")
    val parts = df.select("partition").collect().map(_.getAs[Map[String, String]](0))
    assert(parts.nonEmpty)
    assert(parts.forall(m => m.keySet === Set("p", "s")))
    assert(parts.forall(m => Set("0", "1").contains(m("p"))))
    assert(parts.forall(m => m("s").startsWith("v")))
    // rowgroup totals across many files still sum to the table count
    val total = meta(dir, "level" -> "rowgroup")
      .agg(sum("num_rows")).collect().head.getLong(0)
    assert(total === 100L)
  }

  test("non-parquet files fall back to file source") {
    val dir = Files.createTempDirectory("graft_json").toString
    spark.range(0, 10).write.mode("overwrite").json(dir)
    val df = meta(dir)
    assert(df.schema === MetaLevel.FsFile.schema)
    assert(df.count() > 0)
  }

  test("sizestats level: exact unencoded bytes on modern writers, zero rows on old") {
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft_sizestats").toString
    spark.range(0, 200)
      .select(col("id"), concat(lit("v"), col("id")).as("s"),
        when(col("id") % 5 === 0, null).otherwise(concat(lit("n"), col("id"))).as("opt"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    val rows = spark.read.format("metadata").option("level", "sizestats").load(d)
      .select("path", "type", "num_values", "unencoded_byte_array_bytes",
        "definition_level_histogram")
      .collect().map(r => r.getString(0) -> r).toMap
    val data = spark.read.parquet(d)
    val expectS = data.agg(sum(length(col("s")))).collect()(0).getLong(0)
    val expectOpt = data.agg(sum(length(col("opt")))).collect()(0).getLong(0)
    assert(rows("s").getLong(3) === expectS)
    assert(rows("opt").getLong(3) === expectOpt)
    // parquet-mr omits the level histograms for flat schemas (max levels
    // <= 1: null counts already live in Statistics) — pin the omission so
    // a writer change is visible, and the nullable rendering with it
    assert(rows("opt").isNullAt(4) && rows("s").isNullAt(4))
    assert(rows("opt").getLong(2) === 200L) // num_values includes nulls
    // pre-SizeStatistics writers (the pyarrow testdata): zero rows, no error
    assert(spark.read.format("metadata").option("level", "sizestats")
      .load(sf("0.001") + "/documents.parquet").count() === 0L)
  }

  test("invalid option combinations produce reference-compatible errors") {
    def messageOf(t: Throwable): String = {
      var cause: Throwable = t
      while (cause.getCause != null && !cause.getMessage.contains("level") &&
        !cause.getMessage.contains("source")) cause = cause.getCause
      cause.getMessage
    }
    val e1 = intercept[Exception](meta(lineitem, "source" -> "json").collect())
    assert(messageOf(e1).contains(
      "Invalid source: json, expected one of [file, parquet, orc, avro, any, delta, iceberg, hudi]"))
    val e2 = intercept[Exception](meta(lineitem, "level" -> "pages").collect())
    assert(messageOf(e2).contains(
      "Invalid level: pages, expected one of " +
        "[file, rowgroup, column, page, columnindex, offsetindex, " +
        "bloomfilter, sizestats, stripe, block, snapshot, rowindex, " +
        "timeline]"))
    val e3 = intercept[Exception](
      meta(lineitem, "source" -> "file", "level" -> "rowgroup").collect())
    assert(messageOf(e3).contains("Source 'file' does not support 'rowgroup' level"))
  }

  test("column pruning reaches the scan") {
    val df = meta(lineitem, "level" -> "column").select("path", "num_values")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("path") && !plan.toLowerCase.contains("statistics"))
    assert(df.collect().length > 0)
  }

  test("maxparts caps input partitions") {
    val dir = Files.createTempDirectory("graft_many").toString
    spark.range(0, 100, 1, 10).write.mode("overwrite").parquet(dir)
    val df = meta(dir, "level" -> "file", "maxparts" -> "3")
    assert(df.rdd.getNumPartitions <= 3)
    val all = meta(dir, "level" -> "file")
    assert(all.count() === df.count())
  }

  test("ignorecorrupt skips undecodable files instead of failing the scan") {
    val dir = Files.createTempDirectory("graft_corrupt").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)
    // plant a file that passes the magic sniff but has a truncated footer
    Files.write(java.nio.file.Paths.get(dir, "bad.parquet"),
      "PAR1this-is-not-a-footer".getBytes)
    val strict = meta(dir, "level" -> "rowgroup", "source" -> "parquet")
    intercept[org.apache.spark.SparkException](strict.count())
    val lenient = meta(dir, "level" -> "rowgroup", "source" -> "parquet",
      "ignorecorrupt" -> "true")
    assert(lenient.agg(sum("num_rows")).collect().head.getLong(0) === 10L)
    // file level never decodes footers, so the bad file still lists there
    assert(meta(dir, "level" -> "file", "source" -> "file").count() === 2L)
  }

  test("encrypted parquet (PARE magic) classifies, not a thrift error") {
    val dir = Files.createTempDirectory("graft_encrypted").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)
    // synthetic encrypted-footer-mode file: PARE head + ciphertext + PARE
    // tail (real encrypted footers are thrift ciphertext — any bytes do)
    Files.write(java.nio.file.Paths.get(dir, "enc.parquet"),
      ("PARE" + "x" * 64 + "\u0010\u0000\u0000\u0000" + "PARE")
        .getBytes("ISO-8859-1"))
    // direct footer read: the dedicated classification, with a clear
    // message, not an opaque thrift decode failure
    val conf = spark.sessionState.newHadoopConf()
    val e = intercept[Footers.EncryptedParquetException](
      Footers.read(new org.apache.hadoop.fs.Path(dir, "enc.parquet"), conf))
    assert(e.getMessage.contains("ENCRYPTED"))
    assert(e.getMessage.contains("PARE"))
    // strict scan: loud failure carrying the classification
    val strict = meta(dir, "level" -> "rowgroup", "source" -> "parquet")
    val scanErr = intercept[org.apache.spark.SparkException](strict.count())
    assert(causeMessages(scanErr).contains("ENCRYPTED"))
    // lenient scan: the encrypted file skips, the good file survives
    val lenient = meta(dir, "level" -> "rowgroup", "source" -> "parquet",
      "ignorecorrupt" -> "true")
    assert(lenient.agg(sum("num_rows")).collect().head.getLong(0) === 10L)
    // file level never decodes footers: the mixed directory lists fully
    assert(meta(dir, "level" -> "file", "source" -> "file").count() === 2L)
  }

  test("count and limit pushdowns decline under ignorecorrupt at the parquet-file level") {
    val dir = Files.createTempDirectory("graft_corrupt_count").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)
    Files.write(java.nio.file.Paths.get(dir, "bad.parquet"),
      "PAR1this-is-not-a-footer".getBytes)
    val lenient = meta(dir, "level" -> "file", "source" -> "parquet",
      "ignorecorrupt" -> "true")
    // the corrupt file is skipped at decode time, so count must come from
    // the scan, not the driver listing (which would say one more)
    val rows = lenient.collect().length.toLong
    assert(lenient.count() === rows)
    assert(lenient.limit(2).count() <= rows)
    // fs file level never decodes: pushdown stays exact there
    val fs = meta(dir, "level" -> "file", "source" -> "file", "ignorecorrupt" -> "true")
    assert(fs.count() === 2L)
  }

  test("ignorecorrupt covers mid-file page corruption (valid footer, bad pages)") {
    val dir = Files.createTempDirectory("graft_midcorrupt").toString
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(dir)
    val good = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst.get
    // copy with the page bytes clobbered but the footer intact: the footer
    // decodes fine, and corruption only surfaces inside the page walk
    val bytes = java.nio.file.Files.readAllBytes(good)
    java.util.Arrays.fill(bytes, 4, math.min(64, bytes.length - 64), 0xFF.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad_pages.parquet"), bytes)
    val lenient = meta(dir, "level" -> "page", "source" -> "parquet",
      "ignorecorrupt" -> "true")
    // must complete and still return the good file's pages
    val byFile = lenient.groupBy("filepath").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFile.keys.exists(_.endsWith(good.getFileName.toString)))
    assert(byFile.values.forall(_ > 0))
  }

  test("page level splits large files into byte spans with identical results") {
    // force tiny spans so even the small test file splits into many units
    val whole = meta(lineitem, "level" -> "page")
      .select("row_group_id", "column_id", "page_id", "page_header_offset", "page_compressed_size")
      .collect().map(_.toSeq).toSet
    val split = meta(lineitem, "level" -> "page", "spanbytes" -> "4096")
    val parts = split.rdd.getNumPartitions
    assert(parts > 1, s"expected multiple span partitions, got $parts")
    val splitRows = split
      .select("row_group_id", "column_id", "page_id", "page_header_offset", "page_compressed_size")
      .collect().map(_.toSeq).toSet
    assert(splitRows === whole)
  }

  test("footer cache is keyed by (path,size,mtime) and disableable") {
    FooterCache.clear()
    val rg1 = meta(lineitem, "level" -> "rowgroup").agg(sum("num_rows")).collect().head.getLong(0)
    assert(FooterCache.entries === 1)
    // repeat query served from cache, same answer
    val rg2 = meta(lineitem, "level" -> "rowgroup").agg(sum("num_rows")).collect().head.getLong(0)
    assert(rg1 === rg2)
    assert(FooterCache.entries === 1)
    // disabled: no new entries appear
    FooterCache.clear()
    meta(lineitem, "level" -> "column", "footercache" -> "false").collect()
    assert(FooterCache.entries === 0)
    // rewritten file (different mtime/size) gets a fresh entry
    val dir = java.nio.file.Files.createTempDirectory("graft_fcache").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)
    FooterCache.clear()
    meta(dir, "level" -> "rowgroup").collect()
    val before = FooterCache.entries
    Thread.sleep(1100) // ensure a distinct mtime second
    spark.range(0, 20).coalesce(1).write.mode("overwrite").parquet(dir)
    val n = meta(dir, "level" -> "rowgroup").agg(sum("num_rows")).collect().head.getLong(0)
    assert(n === 20L)
    assert(FooterCache.entries >= before)
  }

  test("footer cache invalidate drops entries for a path") {
    FooterCache.clear()
    meta(lineitem, "level" -> "rowgroup").collect()
    assert(FooterCache.entries === 1)
    // the escape hatch for in-place rewrites within one mtime granule
    FooterCache.invalidate(new org.apache.hadoop.fs.Path(lineitem)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(new org.apache.hadoop.fs.Path(lineitem)).toString)
    assert(FooterCache.entries === 0)
    FooterCache.clear()
  }

  test("page reader reports remote I/O custom metrics") {
    val p = new org.apache.hadoop.fs.Path(lineitem)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(p)
    val slice = FileSlice(st.getPath.toString, st.getPath.getName, st.getLen,
      st.getModificationTime, Map.empty)
    val reader = new MetaPartitionReader(
      Array(FileSpan(slice, 0L, Long.MaxValue)), MetaLevel.ParquetPage,
      MetaLevel.ParquetPage.schema, spark.sessionState.newHadoopConf(),
      1 << 20, false)
    var n = 0
    while (reader.next()) n += 1
    assert(n > 0)
    val m = reader.currentMetricsValues().map(x => x.name -> x.value).toMap
    assert(m("graftRemoteReads") > 0L)
    assert(m.contains("graftRemoteSeeks"))
    reader.close()
    // totals survive stream close
    val after = reader.currentMetricsValues().map(x => x.name -> x.value).toMap
    assert(after("graftRemoteReads") === m("graftRemoteReads"))
  }

  test("nested pruning of the statistics struct survives the scan") {
    // Catalyst narrows statistics to the selected sub-fields; the reader must
    // emit rows matching the pruned nested schema (regression: a full 6-field
    // stats row under a 1-field pruned struct threw ArrayIndexOutOfBounds).
    val one = meta(lineitem, "level" -> "column")
      .select(col("statistics.null_count"))
    assert(one.collect().forall(!_.isNullAt(0)))
    val two = meta(lineitem, "level" -> "page")
      .select(col("statistics.null_count"), col("statistics.max_value"))
    assert(two.count() > 0)
    // full struct still works
    val full = meta(lineitem, "level" -> "column").select(col("statistics"))
    assert(full.collect().forall(_.getStruct(0).length === 6))
  }
}
