package graft.meta

import org.apache.parquet.format.{Encoding, PageHeader, Util}

/** Decoded header of one physical page. The four trailing fields are
  * v2-only (`DataPageHeaderV2` places levels uncompressed ahead of a
  * separately compressed values region and counts nulls in the header);
  * they are None for v1 and dictionary pages. */
case class PageInfo(
    rowGroupId: Int,
    columnId: Int,
    pageId: Int,
    pageType: String,
    headerOffset: Long,
    headerSize: Int,
    compressedSize: Int,
    uncompressedSize: Int,
    crc: Option[Int],
    numValues: Option[Int],
    encoding: Option[String],
    defLevelEncoding: Option[String],
    repLevelEncoding: Option[String],
    stats: Option[StatsInfo],
    content: Option[Array[Byte]],
    numNulls: Option[Int] = None,
    defLevelBytes: Option[Int] = None,
    repLevelBytes: Option[Int] = None,
    valuesCompressed: Option[Boolean] = None)

/**
 * Streaming page-header walk over a Parquet file.
 *
 * A column chunk is a back-to-back sequence of `[PageHeader][page bytes]`
 * records spanning exactly `totalCompressedSize` bytes from the chunk start;
 * there is no page directory, so the only way to enumerate pages is to walk
 * headers sequentially, advancing by `headerSize + compressed_page_size`
 * (same walk contract as the reference page scan,
 * reference: src/main/scala/com/github/sadikovi/metadata/MetadataFileFormat.scala:236-315).
 *
 * Decomposed as chunk-iterators flat-mapped lazily so the scan streams:
 * page counts can be huge and must never be materialized per file.
 */
object PageScan {

  /** Lazily enumerate all pages of the given chunks through one stream. */
  def pages(
      chunks: Seq[ChunkInfo],
      in: ForwardSeekStream,
      withContent: Boolean): Iterator[PageInfo] =
    chunks.iterator.flatMap(c => chunkPages(c, in, withContent))

  /** Lazily enumerate the pages of a single column chunk. */
  def chunkPages(
      chunk: ChunkInfo,
      in: ForwardSeekStream,
      withContent: Boolean): Iterator[PageInfo] = new Iterator[PageInfo] {
    private var consumed = 0L
    private var pageId = 0

    override def hasNext: Boolean = consumed < chunk.totalCompressedSize

    override def next(): PageInfo = {
      val headerOffset = chunk.startOffset + consumed
      in.seek(headerOffset)
      val header = Util.readPageHeader(in)
      // Thrift gives no header length; recover it from the stream position
      val headerSize = (in.getPos - headerOffset).toInt
      val content =
        if (withContent) {
          val bytes = new Array[Byte](header.getCompressed_page_size)
          in.readFully(bytes, 0, bytes.length)
          Some(bytes)
        } else None
      val page = decode(header, chunk, pageId, headerOffset, headerSize, content)
      consumed += headerSize + header.getCompressed_page_size
      pageId += 1
      page
    }
  }

  /** Normalize the four page-header variants into one record. */
  def decode(
      h: PageHeader,
      chunk: ChunkInfo,
      pageId: Int,
      headerOffset: Long,
      headerSize: Int,
      content: Option[Array[Byte]]): PageInfo = {
    val data = if (h.isSetData_page_header) Some(h.getData_page_header) else None
    val dataV2 = if (h.isSetData_page_header_v2) Some(h.getData_page_header_v2) else None
    val dict = if (h.isSetDictionary_page_header) Some(h.getDictionary_page_header) else None
    val rle = Encoding.RLE.toString // v2 def/rep levels are always RLE

    PageInfo(
      rowGroupId = chunk.rowGroupId,
      columnId = chunk.columnId,
      pageId = pageId,
      pageType = h.getType.toString,
      headerOffset = headerOffset,
      headerSize = headerSize,
      compressedSize = h.getCompressed_page_size,
      uncompressedSize = h.getUncompressed_page_size,
      crc = if (h.isSetCrc) Some(h.getCrc) else None,
      numValues = dict.map(_.getNum_values)
        .orElse(data.map(_.getNum_values))
        .orElse(dataV2.map(_.getNum_values)),
      encoding = dict.map(_.getEncoding.toString)
        .orElse(data.map(_.getEncoding.toString))
        .orElse(dataV2.map(_.getEncoding.toString)),
      defLevelEncoding = data.map(_.getDefinition_level_encoding.toString)
        .orElse(dataV2.map(_ => rle)),
      repLevelEncoding = data.map(_.getRepetition_level_encoding.toString)
        .orElse(dataV2.map(_ => rle)),
      stats = data.flatMap(d => if (d.isSetStatistics) Some(d.getStatistics) else None)
        .orElse(dataV2.flatMap(d => if (d.isSetStatistics) Some(d.getStatistics) else None))
        .map(Footers.decodeStats),
      content = content,
      numNulls = dataV2.map(_.getNum_nulls.toInt),
      defLevelBytes = dataV2.map(_.getDefinition_levels_byte_length),
      repLevelBytes = dataV2.map(_.getRepetition_levels_byte_length),
      // thrift default is true; isSet distinguishes "explicit false"
      valuesCompressed = dataV2.map(d =>
        if (d.isSetIs_compressed) d.isIs_compressed else true))
  }
}
