package graft.functions

import org.apache.parquet.bytes.HeapByteBufferAllocator
import org.apache.parquet.column.values.delta.{DeltaBinaryPackingValuesWriter, DeltaBinaryPackingValuesWriterForInteger, DeltaBinaryPackingValuesWriterForLong}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** DELTA_BINARY_PACKED decode: bit-parity against parquet-mr's own
  * writers (long + int flavors), malformed streams stay null, and v2
  * data pages reconstruct a real written file's values end-to-end. */
class DeltaDecodeSpec extends SparkSpec {

  private def encodeLongs(vals: Seq[Long]): Array[Byte] = {
    val w = new DeltaBinaryPackingValuesWriterForLong(
      1 << 10, 1 << 16, new HeapByteBufferAllocator())
    vals.foreach(w.writeLong)
    w.getBytes.toByteArray
  }

  private def encodeInts(vals: Seq[Int]): Array[Byte] = {
    val w = new DeltaBinaryPackingValuesWriterForInteger(
      1 << 10, 1 << 16, new HeapByteBufferAllocator())
    vals.foreach(w.writeInteger)
    w.getBytes.toByteArray
  }

  test("decode is bit-parity with parquet-mr's delta writers") {
    val rnd = new scala.util.Random(11)
    val longCases: Seq[Seq[Long]] = Seq(
      Seq(42L),
      (0L until 1000L),                       // constant delta 1
      (0 until 500).map(_ => rnd.nextLong()), // arbitrary (modular deltas)
      (0 until 2500).map(i => i.toLong * 1000003L % 7919L), // > 1 block
      Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 1L),
      Seq.fill(300)(-7L))
    for (vals <- longCases) {
      val bytes = encodeLongs(vals)
      val got = DeltaBp.decodeLongs(bytes)
      assert(got != null, s"decode failed for ${vals.take(3)}...")
      assert(got.toSeq === vals)
    }
    val intCases: Seq[Seq[Int]] = Seq(
      (0 until 700).map(_ => rnd.nextInt()),
      Seq(Int.MaxValue, Int.MinValue, 0, -1))
    for (vals <- intCases) {
      val got = DeltaBp.decodeLongs(encodeInts(vals), wrap32 = true)
      assert(got != null)
      assert(got.toSeq === vals.map(_.toLong))
    }
  }

  test("malformed delta streams decode to null") {
    val good = encodeLongs(0L until 100L)
    assert(DeltaBp.decodeLongs(good.take(3)) == null) // truncated header
    assert(DeltaBp.decodeLongs(good.dropRight(5)) == null) // short miniblock
    assert(DeltaBp.decodeLongs(Array.emptyByteArray) == null)
    assert(DeltaBp.decodeLongs(Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1, -1, -1, -1)) == null)
    // sum expression mirrors the null contract
    val i64 = org.apache.spark.unsafe.types.UTF8String.fromString("INT64")
    assert(DeltaIntSum.compute(good.take(3), i64) == null)
    assert(DeltaIntSum.compute(good, i64) ===
      java.lang.Long.valueOf((0L until 100L).sum))
    assert(DeltaIntSum.compute(good,
      org.apache.spark.unsafe.types.UTF8String.fromString("BYTE_ARRAY")) == null)
    // a crafted header claiming 2^26 values (past the 2^25 allocation
    // cap) must be rejected BEFORE the output array is allocated — the
    // count is untrusted page data, not a size to trust
    val evil = Array[Byte](
      0x80.toByte, 0x01,                            // blockSize = 128
      0x04,                                         // 4 miniblocks
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x20,  // totalCount = 2^26
      0x00)                                         // firstValue = 0
    assert(DeltaBp.decodeLongs(evil) == null)
  }

  test("delta byte-array decode is bit-parity with parquet-mr's writers") {
    import org.apache.parquet.io.api.Binary
    val cases: Seq[Seq[String]] = Seq(
      Seq("a"),
      Seq("", "", ""),
      (0 until 800).map(i => s"unique_string_value_${i}_suffix"), // shared prefixes
      (0 until 300).map(i => scala.util.Random.javaRandomToRandom(
        new java.util.Random(i)).nextString(i % 40)),
      Seq("abc", "abd", "ab", "abcdef", "x", ""))
    for (vals <- cases) {
      val w = new org.apache.parquet.column.values.deltastrings.DeltaByteArrayWriter(
        1 << 10, 1 << 16, new HeapByteBufferAllocator())
      vals.foreach(s => w.writeBytes(Binary.fromString(s)))
      val got = DeltaBp.decodeDeltaByteArray(w.getBytes.toByteArray)
      assert(got != null, s"DELTA_BYTE_ARRAY decode failed for ${vals.take(3)}")
      assert(got.map(new String(_, "UTF-8")).toSeq === vals)

      val lw = new org.apache.parquet.column.values.deltalengthbytearray
        .DeltaLengthByteArrayValuesWriter(1 << 10, 1 << 16, new HeapByteBufferAllocator())
      vals.foreach(s => lw.writeBytes(Binary.fromString(s)))
      val lgot = DeltaBp.decodeDeltaLengthByteArray(lw.getBytes.toByteArray)
      assert(lgot != null)
      assert(lgot.map(new String(_, "UTF-8")).toSeq === vals)
    }
    // malformed: truncated payload, junk
    val w = new org.apache.parquet.column.values.deltastrings.DeltaByteArrayWriter(
      1 << 10, 1 << 16, new HeapByteBufferAllocator())
    Seq("aaa", "aab").foreach(s => w.writeBytes(Binary.fromString(s)))
    val good = w.getBytes.toByteArray
    assert(DeltaBp.decodeDeltaByteArray(good.dropRight(1)) == null)
    assert(DeltaBp.decodeDeltaByteArray(Array[Byte](-1, -1, -1)) == null)
  }

  test("v2 DELTA_BYTE_ARRAY pages reconstruct a high-cardinality column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_v2dba").toString
    spark.range(0, 6000)
      .select(when(col("id") % 11 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("unique_value_"), col("id"), lit("_tail"))).as("s"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.writer.version", "v2")
      .option("parquet.page.row.count.limit", "900")
      .parquet(dir)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
    val codecs = spark.read.format("metadata").option("level", "column").load(dir)
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("compression"))
    val joined = pages.join(codecs, Seq("filepath", "row_group_id", "column_id"))
    val levelBytes = col("def_levels_byte_length") + col("rep_levels_byte_length")
    val region = ColumnBridge.column(PageValuesV2(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(levelBytes.cast("int")),
      ColumnBridge.expression(when(col("values_compressed"),
        col("compression")).otherwise(lit("UNCOMPRESSED"))),
      ColumnBridge.expression((col("page_uncompressed_size") - levelBytes).cast("int"))))
    val strings = ColumnBridge.column(DeltaStringsExpr(
      ColumnBridge.expression(region),
      ColumnBridge.expression(col("encoding"))))
    val dba = joined.filter(col("page_type") === "DATA_PAGE_V2" &&
      col("encoding") === "DELTA_BYTE_ARRAY")
    assert(dba.count() > 0, "premise broken: no DELTA_BYTE_ARRAY pages")
    val got = dba.select(explode(strings).as("s"))
      .agg(count(lit(1)).as("n"), countDistinct(col("s")).as("d"),
        sum(length(col("s"))).as("chars"), min(col("s")).as("mn"), max(col("s")).as("mx"))
      .collect()(0)
    val want = spark.read.parquet(dir).filter(col("s").isNotNull)
      .agg(count(lit(1)).as("n"), countDistinct(col("s")).as("d"),
        sum(length(col("s"))).as("chars"), min(col("s")).as("mn"), max(col("s")).as("mx"))
      .collect()(0)
    assert(got === want)
  }

  test("v2 data pages reconstruct values: delta ints and dict strings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_v2").toString
    spark.range(0, 5000)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("w"), col("id") % 19)).as("s"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.writer.version", "v2")
      .option("parquet.page.row.count.limit", "800")
      .parquet(dir)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
    val codecs = spark.read.format("metadata").option("level", "column").load(dir)
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("compression"))
    val joined = pages.join(codecs, Seq("filepath", "row_group_id", "column_id"))
    val effCodec = when(col("values_compressed"), col("compression"))
      .otherwise(lit("UNCOMPRESSED"))
    val levelBytes = col("def_levels_byte_length") + col("rep_levels_byte_length")
    val valuesSize = col("page_uncompressed_size") - levelBytes
    val region = ColumnBridge.column(PageValuesV2(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(levelBytes.cast("int")),
      ColumnBridge.expression(effCodec),
      ColumnBridge.expression(valuesSize.cast("int"))))

    // INT64 column (id, column 0): per-page delta sums roll up to sum(id)
    val idSum = joined
      .filter(col("column_id") === 0 && col("page_type") === "DATA_PAGE_V2" &&
        col("encoding") === "DELTA_BINARY_PACKED")
      .select(ColumnBridge.column(DeltaIntSum(
        ColumnBridge.expression(region),
        ColumnBridge.expression(lit("INT64")))).as("s"), col("num_values"))
      .agg(sum(col("s")).as("total"), sum(col("num_values")).as("n"))
      .collect()(0)
    assert(idSum.getLong(0) === (0L until 5000L).sum)
    assert(idSum.getLong(1) === 5000L)

    // string column (s, column 1): v2 dict indexes carry no level prefix;
    // non-null count comes straight from the v2 header's num_nulls
    val dict = ColumnBridge.column(PlainDictStrings(
      ColumnBridge.expression(ColumnBridge.column(PageInflate(
        ColumnBridge.expression(col("page_content")),
        ColumnBridge.expression(col("compression")),
        ColumnBridge.expression(col("page_uncompressed_size")))))))
    val dicts = joined.filter(col("page_type") === "DICTIONARY_PAGE" &&
        col("column_id") === 1)
      .select(col("row_group_id"), dict.as("dict"))
    val idx = ColumnBridge.column(DictIndexes(
      ColumnBridge.expression(region),
      ColumnBridge.expression(lit(0)),
      ColumnBridge.expression((col("num_values") - col("num_nulls")).cast("int"))))
    val got = joined
      .filter(col("column_id") === 1 && col("page_type") === "DATA_PAGE_V2" &&
        col("encoding") === "RLE_DICTIONARY")
      .select(col("row_group_id"), idx.as("idx"))
      .join(dicts, "row_group_id")
      .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(dir).filter(col("s").isNotNull)
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // v2 header null accounting equals the data's
    val nulls = joined.filter(col("column_id") === 1 &&
        col("page_type") === "DATA_PAGE_V2")
      .agg(sum(col("num_nulls"))).collect()(0).getLong(0)
    assert(nulls === spark.read.parquet(dir).filter(col("s").isNull).count())
  }
}
