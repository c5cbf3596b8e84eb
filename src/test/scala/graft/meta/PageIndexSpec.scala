package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Page-index levels (`columnindex`/`offsetindex`) decoded against a file
 * WRITTEN BY SPARK itself — parquet-mr writes the page index by default, so
 * the fixture carries real ColumnIndex/OffsetIndex structs; the pyarrow-
 * written testdata files carry none and must yield zero rows.
 */
class PageIndexSpec extends SparkSpec {
  import spark.implicits._

  /** A multi-page, multi-rowgroup file with known values and nulls. */
  private lazy val fixture: String = {
    val d = Files.createTempDirectory("graft_pageindex").toString
    spark.range(0, 200000, 1, 1)
      .select(col("id"),
        when(col("id") % 10 =!= 0, col("id") * 3).as("v"),  // 10% nulls
        concat(lit("s"), col("id")).as("s"))
      .coalesce(1)
      .write.option("parquet.page.size", "4096")
      .option("parquet.block.size", s"${256 * 1024}")
      .mode("overwrite").parquet(d)
    d
  }

  private def level(path: String, lvl: String): DataFrame =
    spark.read.format("metadata").option("level", lvl).load(path)

  private def longLE(b: Array[Byte]): Long =
    ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong

  test("column index min/max roll up to the chunk statistics exactly") {
    val ci = level(fixture, "columnindex")
      .filter(col("null_page") === false)
      .collect()
    assert(ci.nonEmpty)
    // per (rg, col=0: id): min over page mins == chunk stats min_value
    val chunkStats = level(fixture, "column")
      .select(col("row_group_id"), col("column_id"),
        col("statistics.min_value").as("mn"), col("statistics.max_value").as("mx"),
        col("statistics.null_count").as("nc"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getAs[Array[Byte]](2), r.getAs[Array[Byte]](3), r.getLong(4))).toMap
    val idPages = ci.filter(_.getAs[Int]("column_id") == 0)
      .groupBy(r => (r.getAs[Int]("row_group_id"), r.getAs[Int]("column_id")))
    assert(idPages.nonEmpty)
    idPages.foreach { case (key, pages) =>
      assert(pages.length > 1, s"expected several pages per chunk, got ${pages.length}")
      val pageMin = pages.map(r => longLE(r.getAs[Array[Byte]]("min_value"))).min
      val pageMax = pages.map(r => longLE(r.getAs[Array[Byte]]("max_value"))).max
      val (mn, mx, _) = chunkStats(key)
      assert(pageMin === longLE(mn), s"chunk $key min")
      assert(pageMax === longLE(mx), s"chunk $key max")
    }
  }

  test("column index null counts roll up to the chunk null count") {
    val byChunk = level(fixture, "columnindex")
      .groupBy(col("row_group_id"), col("column_id"))
      .agg(sum(col("null_count")).as("nulls"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val chunkNulls = level(fixture, "column")
      .select(col("row_group_id"), col("column_id"),
        col("statistics.null_count").as("nc"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(byChunk.keySet === chunkNulls.keySet)
    byChunk.foreach { case (k, n) => assert(n === chunkNulls(k), s"chunk $k") }
    // the nullable column really has nulls, so the check is non-vacuous
    assert(byChunk.collect { case ((_, 1), n) => n }.sum > 0)
  }

  test("offset index locations agree with the physical page walk") {
    val oi = level(fixture, "offsetindex").collect()
    assert(oi.nonEmpty)
    // per chunk: first_row_index starts at 0 and increases strictly
    oi.groupBy(r => (r.getAs[Int]("row_group_id"), r.getAs[Int]("column_id")))
      .foreach { case (key, pages) =>
        val sorted = pages.sortBy(_.getAs[Int]("page_id"))
        assert(sorted.head.getAs[Long]("first_row_index") === 0L, s"chunk $key")
        val fri = sorted.map(_.getAs[Long]("first_row_index"))
        assert(fri.zip(fri.tail).forall { case (a, b) => a < b }, s"chunk $key")
      }
    // every offset-index entry points at a real DATA page header: equal
    // (rg, col, offset) keys in the physical page scan, dictionary pages
    // excluded from the index by the format
    val physical = level(fixture, "page")
      .filter(col("page_type") =!= "DICTIONARY_PAGE")
      .select(col("row_group_id"), col("column_id"), col("page_header_offset"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val indexed = oi.map(r => (r.getAs[Int]("row_group_id"),
      r.getAs[Int]("column_id"), r.getAs[Long]("offset"))).toSet
    assert(indexed === physical)
  }

  test("files written without a page index yield zero rows, not errors") {
    assert(level(sf("0.001") + "/lineitem.parquet", "columnindex").count() === 0)
    assert(level(sf("0.001") + "/lineitem.parquet", "offsetindex").count() === 0)
  }

  test("page-index levels prune columns and push filters like any level") {
    val plan = level(fixture, "columnindex")
      .filter(col("row_group_id") === 0)
      .select(col("page_id"), col("null_count"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("metadata(parquet-columnindex"))
  }
}
