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
