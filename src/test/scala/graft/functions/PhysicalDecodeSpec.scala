package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** BOOLEAN and FLOAT/DOUBLE page-payload decode: real v1 (PLAIN) and v2
  * (RLE) boolean files and PLAIN FP files reconstruct against the data;
  * malformed payloads stay null. */
class PhysicalDecodeSpec extends SparkSpec {

  private def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  test("driver-side compute: hand-built payloads and malformed cases") {
    // required PLAIN booleans: bits 1,0,1,1,0,0,1,0 -> 0b01001101 = 0x4D
    assert(BoolTrueCount.compute(Array[Byte](0x4D), 0, 8, u("PLAIN")) ===
      java.lang.Long.valueOf(4L))
    // only the first num_values bits count
    assert(BoolTrueCount.compute(Array[Byte](0xFF.toByte), 0, 3, u("PLAIN")) ===
      java.lang.Long.valueOf(3L))
    // truncated payload
    assert(BoolTrueCount.compute(Array.emptyByteArray, 0, 8, u("PLAIN")) == null)
    // an adversarial header count near Int.MaxValue must not wrap the
    // bounds check into passing (Long arithmetic) — null, not AIOOBE
    assert(BoolTrueCount.compute(Array[Byte](0x4D), 0, Int.MaxValue, u("PLAIN")) == null)
    // unknown encoding
    assert(BoolTrueCount.compute(Array[Byte](0x4D), 0, 8, u("DELTA")) == null)
    // PLAIN doubles: 1.5, -2.5
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(1.5).putDouble(-2.5)
    val st = PlainFpStats.compute(bb.array(), 0, 2, u("DOUBLE"))
    assert(st.getLong(0) === 2L && st.getDouble(1) === -2.5 && st.getDouble(2) === 1.5)
    // short payload
    assert(PlainFpStats.compute(bb.array().take(9), 0, 2, u("DOUBLE")) == null)
    // non-FP type
    assert(PlainFpStats.compute(bb.array(), 0, 2, u("INT64")) == null)
  }

  test("v1 PLAIN and v2 RLE boolean pages both roll up to the data") {
    for (version <- Seq("v1", "v2")) {
      val d = java.nio.file.Files.createTempDirectory(s"graft_bool_$version").toString
      spark.range(0, 6000)
        .select(when(col("id") % 13 === 0, lit(null).cast("boolean"))
          .otherwise(col("id") % 3 === 0).as("b"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.writer.version", version)
        .option("parquet.page.row.count.limit", "800")
        .parquet(d)
      val pages = spark.read.format("metadata").option("level", "page")
        .option("pagecontent", "true").load(d)
      val codecs = spark.read.format("metadata").option("level", "column").load(d)
        .select(col("filepath"), col("row_group_id"), col("column_id"),
          col("compression"))
      val joined = pages.join(codecs, Seq("filepath", "row_group_id", "column_id"))
        .filter(col("page_type").startsWith("DATA_PAGE"))
      val (payload, maxDef, nonNullCount) =
        if (version == "v1") {
          (ColumnBridge.column(PageInflate(
            ColumnBridge.expression(col("page_content")),
            ColumnBridge.expression(col("compression")),
            ColumnBridge.expression(col("page_uncompressed_size")))),
            lit(1), col("num_values"))
        } else {
          val levelBytes =
            col("def_levels_byte_length") + col("rep_levels_byte_length")
          (ColumnBridge.column(PageValuesV2(
            ColumnBridge.expression(col("page_content")),
            ColumnBridge.expression(levelBytes.cast("int")),
            ColumnBridge.expression(when(col("values_compressed"),
              col("compression")).otherwise(lit("UNCOMPRESSED"))),
            ColumnBridge.expression(
              (col("page_uncompressed_size") - levelBytes).cast("int")))),
            lit(0), (col("num_values") - col("num_nulls")))
        }
      val trues = ColumnBridge.column(BoolTrueCount(
        ColumnBridge.expression(payload),
        ColumnBridge.expression(maxDef),
        ColumnBridge.expression(nonNullCount.cast("int")),
        ColumnBridge.expression(col("encoding"))))
      val got = joined
        .agg(sum(trues).as("n_true"), sum(col("num_values")).as("n_total"))
        .collect()(0)
      val data = spark.read.parquet(d)
      assert(got.getLong(0) === data.filter(col("b") === true).count(),
        s"$version true-count mismatch")
      assert(got.getLong(1) === 6000L)
    }
  }

  test("BYTE_STREAM_SPLIT pages reconstruct the same stats as PLAIN") {
    // hand-built: transposing PLAIN bytes into planes must decode equal
    val vals = Seq(1.5, -2.5, 1024.125, 0.0078125)
    val plain = java.nio.ByteBuffer.allocate(vals.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(plain.putDouble)
    val p = plain.array()
    val bss = new Array[Byte](p.length)
    for (i <- vals.indices; j <- 0 until 8) bss(j * vals.length + i) = p(i * 8 + j)
    val a = PlainFpStats.compute(p, 0, vals.length, u("DOUBLE"))
    val b = BssFpStats.compute(bss, 0, vals.length, u("DOUBLE"))
    assert(a.getLong(0) === b.getLong(0))
    assert(a.getDouble(1) === b.getDouble(1) && a.getDouble(2) === b.getDouble(2))
    assert(BssFpStats.compute(bss.take(9), 0, vals.length, u("DOUBLE")) == null)

    // real file: parquet-mr's own BYTE_STREAM_SPLIT writer (builder-only
    // encoding Spark cannot produce), nulls included
    val d = java.nio.file.Files.createTempDirectory("graft_bss").toString
    graft.meta.RowGroupWriter.writeDoubleFile(s"$d/f.parquet",
      (0 until 3000).map(i => if (i % 9 == 0) None else Some(i * 0.25 + 0.125)),
      byteStreamSplit = true)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(d)
      .filter(col("page_type").startsWith("DATA_PAGE"))
    val encs = pages.select(col("encoding")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(encs === Set("BYTE_STREAM_SPLIT"), s"premise broken: $encs")
    val st = ColumnBridge.column(BssFpStats(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(lit(1)),
      ColumnBridge.expression(col("num_values")),
      ColumnBridge.expression(lit("DOUBLE"))))
    val got = pages.select(st.as("st"))
      .agg(sum(col("st.n")).as("n"), min(col("st.mn")).as("mn"),
        max(col("st.mx")).as("mx")).collect()(0)
    // Spark's vectorized reader cannot materialize BSS columns (DuckDB
    // can, and agrees with these closed forms), so the expectation comes
    // from the generating formula directly
    val vals2 = (0 until 3000).filter(_ % 9 != 0).map(_ * 0.25 + 0.125)
    assert(got.getLong(0) === vals2.length.toLong)
    assert(got.getDouble(1) === vals2.min)
    assert(got.getDouble(2) === vals2.max)
  }

  test("PLAIN FLBA pages sum decimal unscaled values; >64-bit refuses") {
    // hand-built: three 3-byte big-endian values 1, -2, 300 (max_def 0)
    def be3(v: Int): Array[Byte] =
      Array[Byte]((v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val payload = be3(1) ++ be3(-2) ++ be3(300)
    val got = PlainFlbaSum.compute(payload, 0, 3, 3)
    assert(got != null)
    assert(got.getLong(0) === 3L && got.getLong(1) === 299L)
    // width mismatch with the region length is a malformation
    assert(PlainFlbaSum.compute(payload, 0, 3, 4) == null)
    assert(PlainFlbaSum.compute(payload, 0, 4, 3) == null)
    // a genuinely >64-bit value refuses rather than wraps: 9 bytes with a
    // non-sign-extension leading byte
    val wide = Array[Byte](0x01, 0x80.toByte, 0, 0, 0, 0, 0, 0, 0)
    assert(PlainFlbaSum.compute(wide, 0, 1, 9) == null)
    // but pure sign-extension leading bytes still decode
    val ext = Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 42)
    val g2 = PlainFlbaSum.compute(ext, 0, 1, 9)
    assert(g2 != null && g2.getLong(1) === 42L)

    // real file: decimal(20,2) column (FLBA width 9) with nulls — data
    // pages AND the dictionary page (max_def 0) decode to the data's sum
    val dir = java.nio.file.Files.createTempDirectory("graft_flba").toString
    spark.range(0, 5000)
      .select(when(col("id") % 13 === 0, lit(null))
        .otherwise((col("id") % 700).cast("decimal(20,2)")).as("price"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.page.row.count.limit", "1000")
      .option("compression", "none")
      .parquet(dir)
    val truth = spark.read.parquet(dir)
      .agg(sum(col("price") * 100).cast("long"), count(col("price")))
      .collect()(0)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
      .createOrReplaceTempView("flba_pages")
    val got2 = spark.sql(
      """SELECT sum(fs.usum), sum(fs.n), count(*)
        |FROM (SELECT plain_flba_sum(page_content, 1, num_values, 9) AS fs
        |  FROM flba_pages WHERE page_type = 'DATA_PAGE')""".stripMargin)
      .collect()(0)
    assert(!got2.isNullAt(0), "FLBA page decode failed")
    assert(got2.getLong(0) === truth.getLong(0), "unscaled sum")
    assert(got2.getLong(1) === truth.getLong(1), "non-null count")
    assert(got2.getLong(2) > 1, "fixture must span multiple pages")

    // dictionary-encoded variant: the FLBA dictionary page is the same
    // PLAIN layout with no level block. parquet-mr's v1 writer never
    // dictionary-encodes FLBA — only the v2 writer does
    val dir2 = java.nio.file.Files.createTempDirectory("graft_flba_dict").toString
    spark.range(0, 2000)
      .select((col("id") % 23).cast("decimal(20,2)").as("price"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.writer.version", "PARQUET_2_0")
      .option("compression", "none")
      .parquet(dir2)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir2)
      .createOrReplaceTempView("flba_dict_pages")
    val dict = spark.sql(
      """SELECT fs.n, fs.usum FROM (
        |  SELECT plain_flba_sum(page_content, 0, num_values, 9) AS fs
        |  FROM flba_dict_pages WHERE page_type = 'DICTIONARY_PAGE')""".stripMargin)
      .collect()(0)
    assert(!dict.isNullAt(0), "FLBA dictionary page decode failed")
    assert(dict.getLong(0) === 23L, "dictionary cardinality")
    assert(dict.getLong(1) === (0L until 23L).map(_ * 100).sum,
      "dictionary unscaled sum")
  }

  test("PLAIN INT96 legacy timestamps decode to epoch-micro extrema") {
    // hand-built: nanos-within-day little-endian int64 + julian day
    // little-endian int32; julian 2440588 = 1970-01-01
    def i96(julian: Int, nanos: Long): Array[Byte] =
      (0 until 8).map(i => (nanos >> (8 * i)).toByte).toArray ++
        (0 until 4).map(i => (julian >> (8 * i)).toByte)
    val payload = i96(2440588, 1000L) ++ i96(2440589, 0L)
    val got = PlainInt96Stats.compute(payload, 0, 2)
    assert(got != null)
    assert(got.getLong(0) === 2L)
    assert(got.getLong(1) === 1L)            // 1 micro past epoch
    assert(got.getLong(2) === 86400000000L)  // 1970-01-02 00:00:00
    // truncated payload refuses
    assert(PlainInt96Stats.compute(payload.take(23), 0, 2) == null)

    // real file through Spark's legacy INT96 writer, nulls included;
    // totals must equal what Spark's own reader returns
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    val dir = java.nio.file.Files.createTempDirectory("graft_i96").toString
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      spark.range(0, 5000)
        .select(when(col("id") % 17 === 0, lit(null))
          .otherwise(timestamp_micros(col("id") * 1000001L)).as("ts"))
        .coalesce(1).write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.page.row.count.limit", "1200")
        .option("compression", "none")
        .parquet(dir)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    }
    val truth = spark.read.parquet(dir)
      .agg(count(col("ts")), unix_micros(min(col("ts"))),
        unix_micros(max(col("ts")))).collect()(0)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
      .createOrReplaceTempView("i96_pages")
    // the fixture really is the legacy physical type
    val tpe = spark.read.format("metadata").option("level", "column")
      .load(dir).select(col("type")).collect()(0).getString(0)
    assert(tpe === "INT96", s"fixture must be INT96, got $tpe")
    val got2 = spark.sql(
      """SELECT sum(st.n), min(st.mn), max(st.mx), count(*)
        |FROM (SELECT plain_int96_stats(page_content, 1, num_values) AS st
        |  FROM i96_pages WHERE page_type = 'DATA_PAGE')""".stripMargin)
      .collect()(0)
    assert(!got2.isNullAt(0), "INT96 page decode failed")
    assert(got2.getLong(0) === truth.getLong(0), "non-null count")
    assert(got2.getLong(1) === truth.getLong(1), "min epoch micros")
    assert(got2.getLong(2) === truth.getLong(2), "max epoch micros")
    assert(got2.getLong(3) > 1, "fixture must span multiple pages")
  }

  test("PLAIN double and float pages reconstruct count/min/max") {
    val d = java.nio.file.Files.createTempDirectory("graft_fp").toString
    spark.range(0, 5000)
      .select(
        when(col("id") % 9 === 0, lit(null).cast("double"))
          .otherwise(col("id") * 0.25 + 0.125).as("dv"),
        when(col("id") % 17 === 0, lit(null).cast("float"))
          .otherwise((col("id") * -1.5).cast("float")).as("fv"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "700")
      .parquet(d)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(d)
    val codecs = spark.read.format("metadata").option("level", "column").load(d)
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("compression"), col("type"))
    val joined = pages.join(codecs, Seq("filepath", "row_group_id", "column_id"))
      .filter(col("page_type").startsWith("DATA_PAGE") && col("encoding") === "PLAIN")
    val payload = ColumnBridge.column(PageInflate(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(col("compression")),
      ColumnBridge.expression(col("page_uncompressed_size"))))
    val st = ColumnBridge.column(PlainFpStats(
      ColumnBridge.expression(payload),
      ColumnBridge.expression(lit(1)),
      ColumnBridge.expression(col("num_values")),
      ColumnBridge.expression(col("type"))))
    for ((colId, name) <- Seq(0 -> "dv", 1 -> "fv")) {
      val got = joined.filter(col("column_id") === colId)
        .select(st.as("st"))
        .agg(sum(col("st.n")).as("n"), min(col("st.mn")).as("mn"),
          max(col("st.mx")).as("mx"))
        .collect()(0)
      val want = spark.read.parquet(d)
        .agg(count(col(name)).as("n"),
          min(col(name)).cast("double").as("mn"),
          max(col(name)).cast("double").as("mx"))
        .collect()(0)
      assert(got.getLong(0) === want.getLong(0), s"$name count")
      assert(got.getDouble(1) === want.getDouble(1), s"$name min")
      assert(got.getDouble(2) === want.getDouble(2), s"$name max")
    }
  }
}
