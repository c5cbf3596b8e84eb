package graft.meta

import scala.jdk.CollectionConverters._

import org.apache.parquet.format.Util

/** One ColumnIndex entry: the page-level statistics of one data page. */
case class ColumnIndexInfo(
    rowGroupId: Int,
    columnId: Int,
    pageId: Int,
    nullPage: Boolean,
    minValue: Option[Array[Byte]],
    maxValue: Option[Array[Byte]],
    nullCount: Option[Long],
    boundaryOrder: String)

/** One OffsetIndex entry: where one data page lives and which rows it holds. */
case class OffsetIndexInfo(
    rowGroupId: Int,
    columnId: Int,
    pageId: Int,
    offset: Long,
    compressedPageSize: Int,
    firstRowIndex: Long)

/**
 * Parquet page-index decoding (ColumnIndex + OffsetIndex thrift structs,
 * read with `org.apache.parquet.format.Util` like the footer and page
 * headers). The indexes of all chunks live together between the last row
 * group and the footer, so decoding sorts chunks by index offset and walks
 * ONE forward-only stream — the same single-pass I/O discipline as the page
 * scan ([[PageScan]]); index blobs are kilobytes, so per-file tasks hold.
 *
 * A chunk without the corresponding index offset contributes no rows
 * (pre-page-index writers, or writers configured without it).
 */
object PageIndexes {

  /** Decode every present ColumnIndex among `chunks` through `in`. */
  def columnIndexes(
      chunks: Seq[ChunkInfo], in: ForwardSeekStream): Iterator[ColumnIndexInfo] = {
    val indexed = chunks.filter(_.columnIndexOffset.isDefined)
      .sortBy(_.columnIndexOffset.get)
    indexed.iterator.flatMap { c =>
      in.seek(c.columnIndexOffset.get)
      val ci = Util.readColumnIndex(in)
      val nullPages = ci.getNull_pages.asScala
      val mins = ci.getMin_values.asScala
      val maxs = ci.getMax_values.asScala
      val nullCounts =
        if (ci.isSetNull_counts) Some(ci.getNull_counts.asScala) else None
      val order = ci.getBoundary_order.toString
      nullPages.indices.iterator.map { i =>
        val np = nullPages(i)
        ColumnIndexInfo(
          rowGroupId = c.rowGroupId,
          columnId = c.columnId,
          pageId = i,
          nullPage = np,
          // a null page has no values: its min/max slots are meaningless
          // placeholder bytes the spec says to ignore
          minValue = if (np) None else Some(byteArray(mins(i))),
          maxValue = if (np) None else Some(byteArray(maxs(i))),
          nullCount = nullCounts.map(_(i).longValue()),
          boundaryOrder = order)
      }
    }
  }

  /** Decode every present OffsetIndex among `chunks` through `in`. */
  def offsetIndexes(
      chunks: Seq[ChunkInfo], in: ForwardSeekStream): Iterator[OffsetIndexInfo] = {
    val indexed = chunks.filter(_.offsetIndexOffset.isDefined)
      .sortBy(_.offsetIndexOffset.get)
    indexed.iterator.flatMap { c =>
      in.seek(c.offsetIndexOffset.get)
      val oi = Util.readOffsetIndex(in)
      oi.getPage_locations.asScala.iterator.zipWithIndex.map { case (loc, i) =>
        OffsetIndexInfo(
          rowGroupId = c.rowGroupId,
          columnId = c.columnId,
          pageId = i,
          offset = loc.getOffset,
          compressedPageSize = loc.getCompressed_page_size,
          firstRowIndex = loc.getFirst_row_index)
      }
    }
  }

  /** Materialize a thrift ByteBuffer without disturbing its position. */
  private def byteArray(bb: java.nio.ByteBuffer): Array[Byte] = {
    val dup = bb.duplicate()
    val out = new Array[Byte](dup.remaining())
    dup.get(out)
    out
  }
}
