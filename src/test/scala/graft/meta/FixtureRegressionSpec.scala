package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Regression against a real-world impala-written file whose Thrift
 * `file_offset` is wrong when a dictionary page exists — the case the
 * chunk-offset workaround (Footers.decodeChunk) exists for. All four levels
 * must scan cleanly and the page walk must account for every byte.
 * (reference behavior: DefaultSourceSuite.scala:336-347 with the same
 * vendored fixture)
 */
class FixtureRegressionSpec extends SparkSpec {
  private val fixture = getClass.getResource("/alltypes_plain.snappy.parquet").toString

  private def meta(level: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("metadata").option("level", level)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load(fixture)
  }

  test("all four levels scan the impala fixture") {
    assert(meta("file").count() === 1)
    assert(meta("rowgroup").count() >= 1)
    assert(meta("column").count() >= 1)
    assert(meta("page").count() >= 1)
  }

  test("chunk start offsets use the dictionary/data-page workaround") {
    val chunks = meta("column")
      .select("file_offset", "dictionary_page_offset", "data_page_offset")
      .collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val expected =
        if (!r.isNullAt(1)) r.getLong(1) else r.getLong(2)
      assert(r.getLong(0) === expected)
    }
  }

  test("page bytes sum exactly to chunk compressed sizes") {
    val chunkSizes = meta("column")
      .select("row_group_id", "column_id", "total_compressed_size")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val pageSums = meta("page")
      .groupBy("row_group_id", "column_id")
      .agg(sum(col("page_header_size").cast("long") +
        col("page_compressed_size").cast("long")).as("bytes"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(pageSums === chunkSizes)
  }

  test("page content decodes for the fixture when enabled") {
    val withContent = meta("page", "pagecontent" -> "true")
      .select(size(col("page_content")).as("n"), col("page_compressed_size"))
      .collect()
    assert(withContent.nonEmpty)
    withContent.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("page content bytes are byte-exact against an independent positioned read") {
    // reference pins exact raw page bytes (DefaultSourceSuite.scala:268-300);
    // here every page's content must equal the bytes at
    // page_header_offset + page_header_size read straight from the file,
    // independently of the scan's buffered-stream path.
    val rows = meta("page", "pagecontent" -> "true")
      .select(col("page_header_offset"), col("page_header_size"),
        col("page_compressed_size"), col("page_content"))
      .collect()
    assert(rows.nonEmpty)
    val path = java.nio.file.Paths.get(new java.net.URI(fixture))
    val fileBytes = java.nio.file.Files.readAllBytes(path)
    rows.foreach { r =>
      val start = r.getLong(0) + r.getInt(1)
      val len = r.getInt(2)
      val expected = java.util.Arrays.copyOfRange(fileBytes, start.toInt, start.toInt + len)
      val got = r.getSeq[Byte](3).toArray
      assert(java.util.Arrays.equals(got, expected),
        s"page content mismatch at offset $start len $len")
    }
  }
}
