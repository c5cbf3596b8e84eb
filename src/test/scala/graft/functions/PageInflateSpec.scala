package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** Page decompression composed with the dictionary-index decode: the
  * DEFAULT layouts (snappy/zstd/gzip + dictionary encoding) reconstruct
  * full value sequences from page_content, per codec, against the data. */
class PageInflateSpec extends SparkSpec {

  private def reconstruct(dir: String): Map[String, Long] = {
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
    val codecs = spark.read.format("metadata").option("level", "column")
      .load(dir)
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("compression"))
    val joined = pages.join(codecs, Seq("filepath", "row_group_id", "column_id"))
    val inflate = ColumnBridge.column(PageInflate(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(col("compression")),
      ColumnBridge.expression(col("page_uncompressed_size"))))
    val dict = ColumnBridge.column(PlainDictStrings(
      ColumnBridge.expression(inflate)))
    val idx = ColumnBridge.column(DictIndexes(
      ColumnBridge.expression(inflate),
      ColumnBridge.expression(lit(1)),
      ColumnBridge.expression(col("num_values"))))
    val dicts = joined.filter(col("page_type") === "DICTIONARY_PAGE")
      .select(col("filepath"), col("row_group_id"), dict.as("dict"))
    joined.filter(col("page_type").startsWith("DATA_PAGE") &&
        col("encoding").isin("PLAIN_DICTIONARY", "RLE_DICTIONARY"))
      .select(col("filepath"), col("row_group_id"), idx.as("idx"))
      .join(dicts, Seq("filepath", "row_group_id"))
      .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("snappy, zstd, gzip and uncompressed layouts all reconstruct values") {
    for (codec <- Seq("snappy", "zstd", "gzip", "none")) {
      val d = java.nio.file.Files.createTempDirectory(s"graft_inflate_$codec").toString
      spark.range(0, 4000)
        .select(concat(lit("val"), col("id") % 23).as("s"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("compression", codec)
        .option("parquet.page.row.count.limit", "700")
        .parquet(d)
      val got = reconstruct(d)
      val want = spark.read.parquet(d)
        .groupBy(col("s")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === want, s"codec $codec reconstruction mismatch")
      assert(got.values.sum === 4000L, s"codec $codec lost rows")
    }
  }

  test("malformed payloads and size lies decode to null, not garbage") {
    val good = org.xerial.snappy.Snappy.compress("hello page".getBytes("UTF-8"))
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    assert(PageInflate.compute(good, u("SNAPPY"), 10).toSeq ===
      "hello page".getBytes("UTF-8").toSeq)
    // header lies about the size: must be rejected, not returned
    assert(PageInflate.compute(good, u("SNAPPY"), 11) == null)
    // truncated compressed bytes
    assert(PageInflate.compute(good.take(3), u("SNAPPY"), 10) == null)
    // BROTLI is availability-gated: commons-compress's route needs
    // org.brotli:dec, which Spark does not ship — here it must report
    // unavailable and decode to a clean null (never a link error); a
    // deployment that adds the decoder jar gets the real route
    assert(!PageInflate.brotliAvailable)
    assert(PageInflate.compute(good, u("BROTLI"), 10) == null)
    // arbitrary junk codec names
    assert(PageInflate.compute(good, u("nonsense"), 10) == null)
    // identity path
    assert(PageInflate.compute("abc".getBytes, u("UNCOMPRESSED"), 3).toSeq ===
      "abc".getBytes.toSeq)
    assert(PageInflate.compute("abc".getBytes, u("UNCOMPRESSED"), 2) == null)
    // absurd declared size
    assert(PageInflate.compute(good, u("SNAPPY"), Int.MaxValue) == null)
    // a crafted snappy stream whose varint header claims ~2 GB must be
    // rejected BEFORE allocation (the declared length is checked against
    // the contract size first) — and must not OOM the executor
    val evil = Array[Byte](0xF6.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0x07, 1, 2, 3) // varint 0x7FFFFFF6 ~ 2 GB
    assert(PageInflate.compute(evil, u("SNAPPY"), 1000) == null)
    // a gzip stream inflating far past its declared size must stop
    // buffering once the declaration is exceeded (one read chunk of
    // slack), not fill 256 MB before the final length check — a 32 MB
    // zero bomb with a 100-byte claim is rejected as null
    val bombSrc = new Array[Byte](32 << 20)
    val bombBuf = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bombBuf)
    gz.write(bombSrc); gz.close()
    assert(PageInflate.compute(bombBuf.toByteArray, u("GZIP"), 100) == null)
    // and an honest gzip declaration still inflates
    val okBuf = new java.io.ByteArrayOutputStream()
    val gz2 = new java.util.zip.GZIPOutputStream(okBuf)
    gz2.write("hello page".getBytes("UTF-8")); gz2.close()
    assert(PageInflate.compute(okBuf.toByteArray, u("GZIP"), 10).toSeq ===
      "hello page".getBytes("UTF-8").toSeq)
  }
}
