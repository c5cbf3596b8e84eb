package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType

/**
 * Executor-side row production for every metadata level.
 *
 * Rows are produced only for the pruned `required` schema: unrequested
 * fields are never computed, and the expensive `page_content` bytes are read
 * from storage only when the column survived pruning AND the `pagecontent`
 * option is on. The file-level source touches no storage at all on executors
 * (everything was captured during driver-side listing); parquet levels read
 * the footer once per file, and the page level additionally streams page
 * headers through a single buffered forward-seek stream per file.
 */
class MetaPartitionReader(
    files: Array[FileSlice],
    level: MetaLevel,
    required: StructType,
    conf: Configuration,
    bufferSize: Int,
    pageContent: Boolean) extends PartitionReader[InternalRow] {

  private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(required)
  private val fieldNames = required.fieldNames
  private val wantContent = pageContent && fieldNames.contains("page_content")

  // The page walker keeps one open stream per in-flight file; track it so
  // close() releases it even when the scan stops early (e.g. a LIMIT).
  private var openStream: ForwardSeekStream = null

  private val rows: Iterator[Row] = files.iterator.flatMap(fileRows)
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows.hasNext) {
      current = toCatalyst(rows.next()).asInstanceOf[InternalRow]
      true
    } else false
  }

  override def get(): InternalRow = current

  override def close(): Unit = closeStream()

  private def closeStream(): Unit = {
    if (openStream != null) {
      openStream.close()
      openStream = null
    }
  }

  private def orNull[T](v: Option[T]): Any = v match {
    case Some(x) => x
    case None => null
  }

  private def statsRow(s: Option[StatsInfo]): Any = s match {
    case Some(st) => Row(orNull(st.nullCount), orNull(st.distinctCount),
      orNull(st.min), orNull(st.max), orNull(st.minValue), orNull(st.maxValue))
    case None => null
  }

  private def fileRows(f: FileSlice): Iterator[Row] = level match {
    case MetaLevel.FsFile =>
      Iterator.single(project {
        case "filepath" => f.path
        case "filename" => f.name
        case "size" => f.size
        case "mtime" => f.mtime
        case "partition" => f.partition
      })

    case MetaLevel.ParquetFile =>
      val footer = readFooter(f)
      Iterator.single(project {
        case "filepath" => f.path
        case "filename" => f.name
        case "size" => f.size
        case "mtime" => f.mtime
        case "partition" => f.partition
        case "metadata_size" => footer.footerBytes
        case "schema" => footer.schemaString
        case "num_rows" => footer.numRows
        case "num_row_groups" => footer.rowGroups.length
        case "created_by" => orNull(footer.createdBy)
        case "key_value_metadata" => orNull(footer.keyValue)
      })

    case MetaLevel.ParquetRowGroup =>
      readFooter(f).rowGroups.iterator.map { rg =>
        project {
          case "row_group_id" => rg.id
          case "file_offset" => rg.startOffset
          case "total_compressed_size" => rg.totalCompressedSize
          case "total_uncompressed_size" => rg.totalUncompressedSize
          case "num_rows" => rg.numRows
          case "num_columns" => rg.columns.length
          case "filepath" => f.path
        }
      }

    case MetaLevel.ParquetColumn =>
      readFooter(f).chunks.iterator.map { c =>
        project {
          case "row_group_id" => c.rowGroupId
          case "column_id" => c.columnId
          case "file_offset" => c.startOffset
          case "total_compressed_size" => c.totalCompressedSize
          case "total_uncompressed_size" => c.totalUncompressedSize
          case "path" => orNull(c.path)
          case "type" => orNull(c.physicalType)
          case "encodings" => orNull(c.encodings)
          case "compression" => orNull(c.codec)
          case "num_values" => c.numValues
          case "statistics" => statsRow(c.stats)
          case "data_page_offset" => orNull(c.dataPageOffset)
          case "dictionary_page_offset" => orNull(c.dictionaryPageOffset)
          case "index_page_offset" => orNull(c.indexPageOffset)
          case "offset_index_offset" => orNull(c.offsetIndexOffset)
          case "offset_index_length" => orNull(c.offsetIndexLength)
          case "column_index_offset" => orNull(c.columnIndexOffset)
          case "column_index_length" => orNull(c.columnIndexLength)
          case "filepath" => f.path
        }
      }

    case MetaLevel.ParquetPage =>
      val footer = readFooter(f)
      val path = new Path(f.path)
      closeStream()
      openStream = new ForwardSeekStream(path.getFileSystem(conf).open(path), bufferSize)
      PageScan.pages(footer.chunks, openStream, wantContent).map { p =>
        project {
          case "row_group_id" => p.rowGroupId
          case "column_id" => p.columnId
          case "page_id" => p.pageId
          case "page_type" => p.pageType
          case "page_header_offset" => p.headerOffset
          case "page_header_size" => p.headerSize
          case "page_compressed_size" => p.compressedSize
          case "page_uncompressed_size" => p.uncompressedSize
          case "crc" => orNull(p.crc)
          case "num_values" => orNull(p.numValues)
          case "encoding" => orNull(p.encoding)
          case "definition_level_encoding" => orNull(p.defLevelEncoding)
          case "repetition_level_encoding" => orNull(p.repLevelEncoding)
          case "statistics" => statsRow(p.stats)
          case "page_content" => orNull(p.content)
          case "filepath" => f.path
        }
      }
  }

  private def readFooter(f: FileSlice): FooterInfo =
    Footers.read(new Path(f.path), conf, Some(f.size))

  /** Build a row holding exactly the pruned columns, in required order. */
  private def project(value: PartialFunction[String, Any]): Row =
    Row.fromSeq(fieldNames.toSeq.map(value))
}
