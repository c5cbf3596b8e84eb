package graft.meta

import java.lang.reflect.Method

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.parquet.format.{ColumnChunk, FileMetaData, RowGroup, Statistics, Util}
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.schema.MessageType

/** Decoded subset of Thrift `Statistics` (column chunk or page). */
case class StatsInfo(
    nullCount: Option[Long],
    distinctCount: Option[Long],
    min: Option[Array[Byte]],
    max: Option[Array[Byte]],
    minValue: Option[Array[Byte]],
    maxValue: Option[Array[Byte]])

/** Decoded Thrift `SizeStatistics` (parquet-format 2.10+): logical data
  * sizes that survive encoding/compression choices. */
case class SizeStatsInfo(
    unencodedByteArrayDataBytes: Option[Long],
    repetitionLevelHistogram: Option[Seq[Long]],
    definitionLevelHistogram: Option[Seq[Long]])

/** Decoded Thrift `SortingColumn`: a writer's declaration that a row
  * group's rows are sorted by this column (by schema ordinal). */
case class SortingColumnInfo(
    columnIdx: Int,
    descending: Boolean,
    nullsFirst: Boolean)

/** Decoded Thrift `PageEncodingStats`: how many pages of one type use one
  * encoding inside a column chunk — the footer-resident layout audit
  * (is this chunk dictionary-encoded? did it fall back to PLAIN?). */
case class PageEncodingStat(
    pageType: String,
    encoding: String,
    count: Int)

/** Decoded column-chunk metadata for one (row group, column) pair. */
case class ChunkInfo(
    rowGroupId: Int,
    columnId: Int,
    startOffset: Long,
    totalCompressedSize: Long,
    totalUncompressedSize: Long,
    path: Option[String],
    physicalType: Option[String],
    encodings: Option[Seq[String]],
    codec: Option[String],
    numValues: Long,
    stats: Option[StatsInfo],
    dataPageOffset: Option[Long],
    dictionaryPageOffset: Option[Long],
    indexPageOffset: Option[Long],
    offsetIndexOffset: Option[Long],
    offsetIndexLength: Option[Int],
    columnIndexOffset: Option[Long],
    columnIndexLength: Option[Int],
    bloomFilterOffset: Option[Long],
    bloomFilterLength: Option[Int],
    sizeStats: Option[SizeStatsInfo],
    encodingStats: Option[Seq[PageEncodingStat]])

/** Decoded row-group metadata. */
case class RowGroupInfo(
    id: Int,
    startOffset: Long,
    totalCompressedSize: Long,
    totalUncompressedSize: Long,
    numRows: Long,
    columns: Seq[ChunkInfo],
    sortingColumns: Option[Seq[SortingColumnInfo]])

/** Fully decoded Parquet footer. */
case class FooterInfo(
    schemaString: String,
    numRows: Long,
    createdBy: Option[String],
    keyValue: Option[Map[String, String]],
    rowGroups: Seq[RowGroupInfo],
    footerBytes: Long) {
  def chunks: Seq[ChunkInfo] = rowGroups.flatMap(_.columns)
}

/**
 * Parquet footer decoding straight from the Thrift structures.
 *
 * We decode raw Thrift (`org.apache.parquet.format.Util`) rather than going
 * through `ParquetFileReader` because the table model exposes details the
 * high-level reader drops: the serialized footer size, legacy `min`/`max`
 * statistics bytes, and raw page headers.
 *
 * Semantics follow the reference engine's footer/offset handling, notably the
 * column-chunk start-offset workaround
 * (reference: src/main/scala/com/github/sadikovi/metadata/ParquetUtils.scala:165-175):
 * writers often leave Thrift `ColumnChunk.file_offset` wrong when a
 * dictionary page exists, so the real chunk start is
 * `dictionary_page_offset` else `data_page_offset` else the Thrift field.
 */
object Footers {
  private val MAGIC = Array[Byte]('P', 'A', 'R', '1')
  // Parquet Modular Encryption, encrypted-footer mode: the file starts
  // and ends with PARE and the footer thrift is ciphertext. CLASSIFY it
  // (a dedicated exception with a clear message, skippable under
  // `ignorecorrupt`) instead of surfacing an opaque thrift decode error.
  private val MAGIC_ENCRYPTED = Array[Byte]('P', 'A', 'R', 'E')
  private val TAIL_LEN = 8 // 4-byte footer length + 4-byte magic

  /** A structurally valid but ENCRYPTED parquet file — not corrupt, just
    * unreadable without keys. */
  final class EncryptedParquetException(msg: String) extends RuntimeException(msg)

  /** True if the file starts with the Parquet magic bytes. */
  def isParquet(fs: FileSystem, path: Path): Boolean = {
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      // readFully: a plain read may legally return <4 bytes mid-stream
      in.readFully(head)
      java.util.Arrays.equals(head, MAGIC)
    } catch {
      case _: java.io.EOFException => false // shorter than the magic
    } finally {
      in.close()
    }
  }

  /**
   * Classify a file by its leading magic with ONE 4-byte read:
   * `"parquet"` (PAR1, or the PARE encrypted-footer variant — still a
   * parquet file, just unreadable without keys), `"orc"`, `"avro"`, or
   * `"other"` for anything shorter or unrecognized. The single probe
   * behind both the homogeneous-source inference and the `source=any`
   * mixed-lake level — one read where three per-format `isX` probes
   * would each open the file.
   */
  def sniffFormat(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      try in.readFully(head) catch {
        case _: java.io.EOFException => return "other"
      }
      if (java.util.Arrays.equals(head, MAGIC) ||
          java.util.Arrays.equals(head, MAGIC_ENCRYPTED)) "parquet"
      else if (head(0) == 'O' && head(1) == 'R' && head(2) == 'C') "orc"
      else if (head(0) == 'O' && head(1) == 'b' && head(2) == 'j' &&
          head(3) == 1) "avro"
      else "other"
    } finally {
      in.close()
    }
  }

  /** Read and fully decode the footer of one Parquet file. */
  def read(path: Path, conf: Configuration, knownSize: Option[Long] = None): FooterInfo = {
    val fs = path.getFileSystem(conf)
    val fileLen = knownSize.getOrElse(fs.getFileStatus(path).getLen)
    val in = fs.open(path)
    try {
      val four = new Array[Byte](4)
      in.readFully(four)
      if (!java.util.Arrays.equals(four, MAGIC)) {
        if (java.util.Arrays.equals(four, MAGIC_ENCRYPTED)) {
          throw new EncryptedParquetException(
            s"$path is an ENCRYPTED Parquet file (PARE magic, encrypted " +
              "footer mode); its footer cannot be decoded without " +
              "decryption keys. Use ignorecorrupt=true to skip it.")
        }
        throw new RuntimeException(
          s"$path is invalid Parquet file, magic: ${java.util.Arrays.toString(four)}")
      }
      in.seek(fileLen - TAIL_LEN)
      in.readFully(four)
      // Little-endian u32 footer length
      val footerLen =
        (four(0) & 0xff) | ((four(1) & 0xff) << 8) |
        ((four(2) & 0xff) << 16) | ((four(3) & 0xff) << 24)
      // A corrupt length >2GB decodes negative; treat it as EOF/corrupt too
      // (footerLen is promoted to Long so the comparison cannot overflow).
      if (footerLen < 0 || fileLen < footerLen.toLong + TAIL_LEN) {
        throw new RuntimeException(
          s"EOF when reading Parquet metadata for $path, file $fileLen, metadata $footerLen")
      }
      in.seek(fileLen - footerLen - TAIL_LEN)
      decode(Util.readFileMetaData(in), footerLen.toLong)
    } finally {
      in.close()
    }
  }

  /** Convert a Thrift footer into the decoded [[FooterInfo]] model. */
  def decode(md: FileMetaData, footerBytes: Long): FooterInfo = {
    val createdBy = if (md.isSetCreated_by) Option(md.getCreated_by) else None
    val kv =
      if (md.isSetKey_value_metadata) {
        Some(md.getKey_value_metadata.asScala.map { p =>
          p.getKey -> (if (p.isSetValue) p.getValue else null)
        }.toMap)
      } else None
    val rowGroups = md.getRow_groups.asScala.toSeq.zipWithIndex.map {
      case (rg, i) => decodeRowGroup(rg, i)
    }
    FooterInfo(
      schemaString = schemaToString(md),
      numRows = md.getNum_rows,
      createdBy = createdBy,
      keyValue = kv,
      rowGroups = rowGroups,
      footerBytes = footerBytes)
  }

  private def decodeRowGroup(rg: RowGroup, id: Int): RowGroupInfo = {
    val cols = rg.getColumns.asScala.toSeq.zipWithIndex.map {
      case (cc, i) => decodeChunk(cc, i, id)
    }
    RowGroupInfo(
      id = id,
      // A row group starts where its first column chunk starts (0 if the
      // required-but-possibly-empty column list is empty).
      startOffset = cols.headOption.map(_.startOffset).getOrElse(0L),
      totalCompressedSize = cols.map(_.totalCompressedSize).sum,
      totalUncompressedSize = rg.getTotal_byte_size,
      numRows = rg.getNum_rows,
      columns = cols,
      sortingColumns =
        if (!rg.isSetSorting_columns) None
        else Some(rg.getSorting_columns.asScala.toSeq.map(sc =>
          SortingColumnInfo(sc.getColumn_idx, sc.isDescending, sc.isNulls_first))))
  }

  private def decodeChunk(cc: ColumnChunk, columnId: Int, rowGroupId: Int): ChunkInfo = {
    // Thrift marks ColumnMetaData optional even though writers always set it
    val meta = if (cc.isSetMeta_data) Some(cc.getMeta_data) else None
    val dataPageOffset = meta.map(_.getData_page_offset)
    val dictPageOffset = meta.flatMap { m =>
      if (m.isSetDictionary_page_offset) Some(m.getDictionary_page_offset) else None
    }
    ChunkInfo(
      rowGroupId = rowGroupId,
      columnId = columnId,
      // Workaround: Thrift file_offset is unreliable with dictionary pages
      startOffset = dictPageOffset.orElse(dataPageOffset).getOrElse(cc.getFile_offset),
      totalCompressedSize = meta.map(_.getTotal_compressed_size).getOrElse(0L),
      totalUncompressedSize = meta.map(_.getTotal_uncompressed_size).getOrElse(0L),
      path = meta.map(_.getPath_in_schema.asScala.mkString(".")),
      physicalType = meta.map(_.getType.toString),
      encodings = meta.map(_.getEncodings.asScala.toSeq.map(_.toString)),
      codec = meta.map(_.getCodec.toString),
      numValues = meta.map(_.getNum_values).getOrElse(0L),
      stats = meta.flatMap { m =>
        if (m.isSetStatistics) Some(decodeStats(m.getStatistics)) else None
      },
      dataPageOffset = dataPageOffset,
      dictionaryPageOffset = dictPageOffset,
      indexPageOffset = meta.flatMap { m =>
        if (m.isSetIndex_page_offset) Some(m.getIndex_page_offset) else None
      },
      offsetIndexOffset = if (cc.isSetOffset_index_offset) Some(cc.getOffset_index_offset) else None,
      offsetIndexLength = if (cc.isSetOffset_index_length) Some(cc.getOffset_index_length) else None,
      columnIndexOffset = if (cc.isSetColumn_index_offset) Some(cc.getColumn_index_offset) else None,
      columnIndexLength = if (cc.isSetColumn_index_length) Some(cc.getColumn_index_length) else None,
      bloomFilterOffset = meta.flatMap { m =>
        if (m.isSetBloom_filter_offset) Some(m.getBloom_filter_offset) else None
      },
      bloomFilterLength = meta.flatMap { m =>
        if (m.isSetBloom_filter_length) Some(m.getBloom_filter_length) else None
      },
      sizeStats = meta.flatMap { m =>
        if (!m.isSetSize_statistics) None
        else {
          val ss = m.getSize_statistics
          Some(SizeStatsInfo(
            unencodedByteArrayDataBytes =
              if (ss.isSetUnencoded_byte_array_data_bytes) {
                Some(ss.getUnencoded_byte_array_data_bytes)
              } else None,
            repetitionLevelHistogram =
              Option(ss.getRepetition_level_histogram)
                .map(_.asScala.toSeq.map(_.longValue())),
            definitionLevelHistogram =
              Option(ss.getDefinition_level_histogram)
                .map(_.asScala.toSeq.map(_.longValue()))))
        }
      },
      encodingStats = meta.flatMap { m =>
        if (!m.isSetEncoding_stats) None
        else Some(m.getEncoding_stats.asScala.toSeq.map(es =>
          PageEncodingStat(es.getPage_type.toString,
            es.getEncoding.toString, es.getCount)))
      })
  }

  def decodeStats(s: Statistics): StatsInfo = StatsInfo(
    nullCount = if (s.isSetNull_count) Some(s.getNull_count) else None,
    distinctCount = if (s.isSetDistinct_count) Some(s.getDistinct_count) else None,
    min = if (s.isSetMin) Some(s.getMin) else None,
    max = if (s.isSetMax) Some(s.getMax) else None,
    minValue = if (s.isSetMin_value) Some(s.getMin_value) else None,
    maxValue = if (s.isSetMax_value) Some(s.getMax_value) else None)

  // parquet-mr keeps its Thrift->MessageType schema converter package-private;
  // the parquet jars live on the classpath (unnamed module) so plain
  // setAccessible reflection is allowed under JDK 17.
  private lazy val fromParquetSchema: (ParquetMetadataConverter, Method) = {
    val m = classOf[ParquetMetadataConverter].getDeclaredMethod(
      "fromParquetSchema", classOf[java.util.List[_]], classOf[java.util.List[_]])
    m.setAccessible(true)
    (new ParquetMetadataConverter(), m)
  }

  /** Render the Parquet schema as the standard `message { ... }` string. */
  def schemaToString(md: FileMetaData): String = {
    val (conv, m) = fromParquetSchema
    m.invoke(conv, md.getSchema, md.getColumn_orders)
      .asInstanceOf[MessageType].toString
  }
}
