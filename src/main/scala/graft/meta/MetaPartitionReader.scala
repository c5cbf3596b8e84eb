package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.apache.spark.internal.Logging
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.{ArrayType, StructType}

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
 *
 * Hot-path shape: field resolution happens ONCE per reader — each level
 * precomputes an array of extractor lambdas aligned with the pruned schema,
 * plus one Catalyst converter per field — so producing a row is a tight
 * loop over arrays with no per-row string matching and no external-Row
 * round trip. At page level (the only level whose row count explodes with
 * data volume) this is the difference between millions of rows x 16 string
 * comparisons and a plain indexed loop.
 */
class MetaPartitionReader(
    spans: Array[FileSpan],
    level: MetaLevel,
    required: StructType,
    conf: Configuration,
    bufferSize: Int,
    pageContent: Boolean,
    ignoreCorrupt: Boolean = false,
    footerCache: Boolean = true,
    bloomPathHint: Option[Set[String]] = None)
    extends PartitionReader[InternalRow] with Logging {

  private val fieldNames = required.fieldNames
  private val wantContent = pageContent && fieldNames.contains("page_content")

  /** One Catalyst converter per pruned field (nulls pass through). */
  private val fieldConverters: Array[Any => Any] =
    required.fields.map(f => CatalystTypeConverters.createToCatalystConverter(f.dataType))

  /** Extractor: (file, level-specific record) -> raw external value. */
  private type Ex[T] = (FileSlice, T) => Any

  private def toInternal[T](ex: Array[Ex[T]], f: FileSlice, t: T): InternalRow = {
    val arr = new Array[Any](ex.length)
    var i = 0
    while (i < ex.length) {
      arr(i) = fieldConverters(i)(ex(i)(f, t))
      i += 1
    }
    new GenericInternalRow(arr)
  }

  // The page walker keeps one open stream per in-flight file; track it so
  // close() releases it even when the scan stops early (e.g. a LIMIT).
  private var openStream: ForwardSeekStream = null

  // Cumulative remote-I/O counters across this task's files (plus the live
  // stream's), surfaced as DSv2 custom metrics in the scan node.
  private var doneReads: Long = 0L
  private var doneSeeks: Long = 0L

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = {
    val liveReads = if (openStream != null) openStream.underlyingReads else 0L
    val liveSeeks = if (openStream != null) openStream.underlyingSeeks else 0L
    Array(
      TaskMetricValue("graftRemoteReads", doneReads + liveReads),
      TaskMetricValue("graftRemoteSeeks", doneSeeks + liveSeeks),
      TaskMetricValue("graftSkippedFiles", skippedPaths.size.toLong))
  }

  private val rows: Iterator[InternalRow] =
    if (!ignoreCorrupt) {
      spans.iterator.flatMap(spanRows)
    } else {
      // With ignorecorrupt=true, one undecodable file skips (with a warning)
      // instead of failing the whole scan — at large file counts a single
      // truncated upload must not kill the query. The guard wraps the whole
      // per-span iterator: page-walk errors mid-file drop that file's
      // remaining pages only.
      spans.iterator.flatMap { sp =>
        try {
          val it = spanRows(sp)
          // Prefetch wrapper: page-level I/O and Thrift decoding happen in
          // the underlying next(), not hasNext, so BOTH must be guarded.
          new Iterator[InternalRow] {
            private var pending: InternalRow = _
            private var done = false
            private def advance(): Unit =
              try {
                if (it.hasNext) pending = it.next() else done = true
              } catch {
                case e: Exception => warnCorrupt(sp, e); pending = null; done = true
              }
            override def hasNext: Boolean = {
              if (pending == null && !done) advance()
              pending != null
            }
            override def next(): InternalRow = {
              if (!hasNext) throw new NoSuchElementException
              val r = pending
              pending = null
              r
            }
          }
        } catch {
          case e: Exception => warnCorrupt(sp, e); Iterator.empty
        }
      }
    }

  // Counted (not only logged): skips surface in the scan node's
  // `graftSkippedFiles` metric, where a million-file scan that quietly
  // dropped 1% of its inputs is visible at a glance. Deduplicated by PATH —
  // a corrupt file split into many page-level byte spans fails once per
  // span, and counting spans would inflate the per-file signal the metric
  // promises. The set is bounded by this task's file count.
  private val skippedPaths = new scala.collection.mutable.HashSet[String]

  private def warnCorrupt(span: FileSpan, e: Exception): Unit = {
    if (skippedPaths.add(span.file.path)) {
      // encrypted files are a CLASSIFICATION, not corruption — say so
      val label = e match {
        case _: Footers.EncryptedParquetException => "encrypted"
        case _ => "corrupt"
      }
      logWarning(s"metadata scan skipping $label file ${span.file.path}: ${e.getMessage}")
    }
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (rows.hasNext) {
      current = rows.next()
      true
    } else false
  }

  override def get(): InternalRow = current

  override def close(): Unit = closeStream()

  private def closeStream(): Unit = {
    if (openStream != null) {
      doneReads += openStream.underlyingReads
      doneSeeks += openStream.underlyingSeeks
      openStream.close()
      openStream = null
    }
  }

  private def orNull[T](v: Option[T]): Any = v match {
    case Some(x) => x
    case None => null
  }

  /**
   * The `statistics` struct must be built to the PRUNED nested schema:
   * Catalyst's nested-schema pruning can narrow it (e.g. to just
   * `null_count`), and `CatalystTypeConverters`' struct converter indexes
   * its per-field converters by the incoming Row's width — a full 6-field
   * row under a narrowed schema throws ArrayIndexOutOfBounds.
   */
  private lazy val statsFieldEx: Array[StatsInfo => Any] =
    required.find(_.name == "statistics") match {
      case Some(f) => f.dataType.asInstanceOf[StructType].fieldNames.map[StatsInfo => Any] {
        case "null_count" => st => orNull(st.nullCount)
        case "distinct_count" => st => orNull(st.distinctCount)
        case "min" => st => orNull(st.min)
        case "max" => st => orNull(st.max)
        case "min_value" => st => orNull(st.minValue)
        case "max_value" => st => orNull(st.maxValue)
      }
      case None => Array.empty
    }

  private def statsRow(s: Option[StatsInfo]): Any = s match {
    case Some(st) => Row.fromSeq(statsFieldEx.toSeq.map(_(st)))
    case None => null
  }

  // array<struct> fields are built to the PRUNED element schema for the
  // same reason statsRow is: nested-schema pruning can narrow the struct,
  // and the converters index by the incoming Row's width.
  private lazy val sortingFieldEx: Array[SortingColumnInfo => Any] =
    required.find(_.name == "sorting_columns") match {
      case Some(f) => f.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fieldNames.map[SortingColumnInfo => Any] {
          case "column_idx" => sc => sc.columnIdx
          case "descending" => sc => sc.descending
          case "nulls_first" => sc => sc.nullsFirst
        }
      case None => Array.empty
    }

  private def sortingRows(v: Option[Seq[SortingColumnInfo]]): Any = v match {
    case Some(scs) => scs.map(sc => Row.fromSeq(sortingFieldEx.toSeq.map(_(sc))))
    case None => null
  }

  private lazy val encStatFieldEx: Array[PageEncodingStat => Any] =
    required.find(_.name == "encoding_stats") match {
      case Some(f) => f.dataType.asInstanceOf[ArrayType].elementType
        .asInstanceOf[StructType].fieldNames.map[PageEncodingStat => Any] {
          case "page_type" => es => es.pageType
          case "encoding" => es => es.encoding
          case "count" => es => es.count
        }
      case None => Array.empty
    }

  private def encStatRows(v: Option[Seq[PageEncodingStat]]): Any = v match {
    case Some(ess) => ess.map(es => Row.fromSeq(encStatFieldEx.toSeq.map(_(es))))
    case None => null
  }

  // ---- per-level extractor tables (resolved once per reader) -------------

  private lazy val fsFileEx: Array[Ex[Unit]] = fieldNames.map[Ex[Unit]] {
    case "filepath" => (f, _) => f.path
    case "filename" => (f, _) => f.name
    case "size" => (f, _) => f.size
    case "mtime" => (f, _) => f.mtime
    case "partition" => (f, _) => f.partition
  }

  private lazy val pqFileEx: Array[Ex[FooterInfo]] = fieldNames.map[Ex[FooterInfo]] {
    case "filepath" => (f, _) => f.path
    case "filename" => (f, _) => f.name
    case "size" => (f, _) => f.size
    case "mtime" => (f, _) => f.mtime
    case "partition" => (f, _) => f.partition
    case "metadata_size" => (_, ft) => ft.footerBytes
    case "schema" => (_, ft) => ft.schemaString
    case "num_rows" => (_, ft) => ft.numRows
    case "num_row_groups" => (_, ft) => ft.rowGroups.length
    case "created_by" => (_, ft) => orNull(ft.createdBy)
    case "key_value_metadata" => (_, ft) => orNull(ft.keyValue)
  }

  private lazy val rowGroupEx: Array[Ex[RowGroupInfo]] = fieldNames.map[Ex[RowGroupInfo]] {
    case "row_group_id" => (_, rg) => rg.id
    case "file_offset" => (_, rg) => rg.startOffset
    case "total_compressed_size" => (_, rg) => rg.totalCompressedSize
    case "total_uncompressed_size" => (_, rg) => rg.totalUncompressedSize
    case "num_rows" => (_, rg) => rg.numRows
    case "num_columns" => (_, rg) => rg.columns.length
    case "sorting_columns" => (_, rg) => sortingRows(rg.sortingColumns)
    case "filepath" => (f, _) => f.path
  }

  private lazy val chunkEx: Array[Ex[ChunkInfo]] = fieldNames.map[Ex[ChunkInfo]] {
    case "row_group_id" => (_, c) => c.rowGroupId
    case "column_id" => (_, c) => c.columnId
    case "file_offset" => (_, c) => c.startOffset
    case "total_compressed_size" => (_, c) => c.totalCompressedSize
    case "total_uncompressed_size" => (_, c) => c.totalUncompressedSize
    case "path" => (_, c) => orNull(c.path)
    case "type" => (_, c) => orNull(c.physicalType)
    case "encodings" => (_, c) => orNull(c.encodings)
    case "compression" => (_, c) => orNull(c.codec)
    case "num_values" => (_, c) => c.numValues
    case "statistics" => (_, c) => statsRow(c.stats)
    case "data_page_offset" => (_, c) => orNull(c.dataPageOffset)
    case "dictionary_page_offset" => (_, c) => orNull(c.dictionaryPageOffset)
    case "index_page_offset" => (_, c) => orNull(c.indexPageOffset)
    case "offset_index_offset" => (_, c) => orNull(c.offsetIndexOffset)
    case "offset_index_length" => (_, c) => orNull(c.offsetIndexLength)
    case "column_index_offset" => (_, c) => orNull(c.columnIndexOffset)
    case "column_index_length" => (_, c) => orNull(c.columnIndexLength)
    case "encoding_stats" => (_, c) => encStatRows(c.encodingStats)
    case "filepath" => (f, _) => f.path
  }

  private lazy val pageEx: Array[Ex[PageInfo]] = fieldNames.map[Ex[PageInfo]] {
    case "row_group_id" => (_, p) => p.rowGroupId
    case "column_id" => (_, p) => p.columnId
    case "page_id" => (_, p) => p.pageId
    case "page_type" => (_, p) => p.pageType
    case "page_header_offset" => (_, p) => p.headerOffset
    case "page_header_size" => (_, p) => p.headerSize
    case "page_compressed_size" => (_, p) => p.compressedSize
    case "page_uncompressed_size" => (_, p) => p.uncompressedSize
    case "crc" => (_, p) => orNull(p.crc)
    case "num_values" => (_, p) => orNull(p.numValues)
    case "encoding" => (_, p) => orNull(p.encoding)
    case "definition_level_encoding" => (_, p) => orNull(p.defLevelEncoding)
    case "repetition_level_encoding" => (_, p) => orNull(p.repLevelEncoding)
    case "statistics" => (_, p) => statsRow(p.stats)
    case "page_content" => (_, p) => orNull(p.content)
    case "num_nulls" => (_, p) => orNull(p.numNulls)
    case "def_levels_byte_length" => (_, p) => orNull(p.defLevelBytes)
    case "rep_levels_byte_length" => (_, p) => orNull(p.repLevelBytes)
    case "values_compressed" => (_, p) => orNull(p.valuesCompressed)
    case "filepath" => (f, _) => f.path
  }

  private lazy val colIndexEx: Array[Ex[ColumnIndexInfo]] = fieldNames.map[Ex[ColumnIndexInfo]] {
    case "row_group_id" => (_, e) => e.rowGroupId
    case "column_id" => (_, e) => e.columnId
    case "page_id" => (_, e) => e.pageId
    case "null_page" => (_, e) => e.nullPage
    case "min_value" => (_, e) => orNull(e.minValue)
    case "max_value" => (_, e) => orNull(e.maxValue)
    case "null_count" => (_, e) => orNull(e.nullCount)
    case "boundary_order" => (_, e) => e.boundaryOrder
    case "filepath" => (f, _) => f.path
  }

  private lazy val offIndexEx: Array[Ex[OffsetIndexInfo]] = fieldNames.map[Ex[OffsetIndexInfo]] {
    case "row_group_id" => (_, e) => e.rowGroupId
    case "column_id" => (_, e) => e.columnId
    case "page_id" => (_, e) => e.pageId
    case "offset" => (_, e) => e.offset
    case "compressed_page_size" => (_, e) => e.compressedPageSize
    case "first_row_index" => (_, e) => e.firstRowIndex
    case "filepath" => (f, _) => f.path
  }

  private lazy val bloomEx: Array[Ex[BloomFilterInfo]] = fieldNames.map[Ex[BloomFilterInfo]] {
    case "row_group_id" => (_, e) => e.rowGroupId
    case "column_id" => (_, e) => e.columnId
    case "path" => (_, e) => orNull(e.path)
    case "type" => (_, e) => orNull(e.physicalType)
    case "bloom_offset" => (_, e) => e.offset
    case "header_size" => (_, e) => e.headerSize
    case "num_bytes" => (_, e) => e.numBytes
    case "algorithm" => (_, e) => e.algorithm
    case "hash" => (_, e) => e.hashAlgo
    case "compression" => (_, e) => e.compression
    case "bitset" => (_, e) => e.bitset
    case "filepath" => (f, _) => f.path
  }

  private lazy val sizeStatsEx: Array[Ex[ChunkInfo]] = fieldNames.map[Ex[ChunkInfo]] {
    case "row_group_id" => (_, c) => c.rowGroupId
    case "column_id" => (_, c) => c.columnId
    case "path" => (_, c) => orNull(c.path)
    case "type" => (_, c) => orNull(c.physicalType)
    case "num_values" => (_, c) => c.numValues
    case "unencoded_byte_array_bytes" => (_, c) =>
      orNull(c.sizeStats.flatMap(_.unencodedByteArrayDataBytes))
    case "repetition_level_histogram" => (_, c) =>
      orNull(c.sizeStats.flatMap(_.repetitionLevelHistogram))
    case "definition_level_histogram" => (_, c) =>
      orNull(c.sizeStats.flatMap(_.definitionLevelHistogram))
    case "filepath" => (f, _) => f.path
  }

  /** One buffered forward stream over the (tiny, footer-adjacent) index
    * region of a file — the page-index levels never touch page data. */
  private def indexStream(f: FileSlice): ForwardSeekStream = {
    val path = new Path(f.path)
    closeStream()
    // index blobs are KB-scale: a small read-ahead buffer is plenty and a
    // 128 MB default would churn allocation across many-file scans
    val cap = math.min(math.min(bufferSize.toLong, 1L << 20),
      math.max(f.size, 1L)).toInt
    openStream = new ForwardSeekStream(path.getFileSystem(conf).open(path), cap)
    openStream
  }

  private lazy val deltaSnapshotEx: Array[Ex[DeltaLogInfo]] =
    fieldNames.map[Ex[DeltaLogInfo]] {
      case "version" => (_, d) => d.version
      case "kind" => (_, d) => d.kind
      case "filename" => (f, _) => f.name
      case "size" => (f, _) => f.size
      case "mtime" => (f, _) => f.mtime
      case "n_add" => (_, d) => orNull(d.nAdd)
      case "n_remove" => (_, d) => orNull(d.nRemove)
      case "has_protocol" => (_, d) => d.hasProtocol
      case "has_metadata" => (_, d) => d.hasMetadata
      case "operation" => (_, d) => orNull(d.operation)
      case "op_timestamp" => (_, d) => orNull(d.opTimestamp)
      case "filepath" => (f, _) => f.path
    }

  /** (instant, action, state) decoded from the timeline file NAME. */
  private lazy val hudiTimelineEx: Array[Ex[(String, String, String)]] =
    fieldNames.map[Ex[(String, String, String)]] {
      case "instant_time" => (_, t) => t._1
      case "action" => (_, t) => t._2
      case "state" => (_, t) => t._3
      case "size" => (f, _) => f.size
      case "mtime" => (f, _) => f.mtime
      case "filename" => (f, _) => f.name
      case "filepath" => (f, _) => f.path
    }

  private lazy val icebergSnapshotEx: Array[Ex[(IcebergTableInfo, IcebergSnapshotInfo)]] =
    fieldNames.map[Ex[(IcebergTableInfo, IcebergSnapshotInfo)]] {
      case "snapshot_id" => (_, t) => t._2.snapshotId
      case "timestamp_ms" => (_, t) => t._2.timestampMs
      case "manifest_list" => (_, t) => t._2.manifestList
      case "operation" => (_, t) => orNull(t._2.operation)
      case "is_current" => (_, t) => t._2.isCurrent
      case "format_version" => (_, t) => t._1.formatVersion
      case "filename" => (f, _) => f.name
      case "filepath" => (f, _) => f.path
    }

  /** (format, Option(num_rows)) for the mixed-lake `any` file level. */
  private lazy val anyFileEx: Array[Ex[(String, Option[Long])]] =
    fieldNames.map[Ex[(String, Option[Long])]] {
      case "filepath" => (f, _) => f.path
      case "filename" => (f, _) => f.name
      case "size" => (f, _) => f.size
      case "mtime" => (f, _) => f.mtime
      case "partition" => (f, _) => f.partition
      case "format" => (_, a) => a._1
      case "num_rows" => (_, a) => orNull(a._2)
    }

  private lazy val orcFileEx: Array[Ex[OrcInfo]] = fieldNames.map[Ex[OrcInfo]] {
    case "filepath" => (f, _) => f.path
    case "filename" => (f, _) => f.name
    case "size" => (f, _) => f.size
    case "mtime" => (f, _) => f.mtime
    case "partition" => (f, _) => f.partition
    case "num_rows" => (_, o) => o.numRows
    case "num_stripes" => (_, o) => o.numStripes
    case "compression" => (_, o) => o.compression
    case "compression_block_size" => (_, o) => o.compressionBlockSize
    case "file_version" => (_, o) => o.fileVersion
    case "writer_version" => (_, o) => o.writerVersion
    case "schema" => (_, o) => o.schemaString
    case "user_metadata" => (_, o) => orNull(o.userMetadata)
  }

  private lazy val avroFileEx: Array[Ex[AvroInfo]] = fieldNames.map[Ex[AvroInfo]] {
    case "filepath" => (f, _) => f.path
    case "filename" => (f, _) => f.name
    case "size" => (f, _) => f.size
    case "mtime" => (f, _) => f.mtime
    case "partition" => (f, _) => f.partition
    case "num_rows" => (_, a) => a.numRows
    case "num_blocks" => (_, a) => a.numBlocks
    case "codec" => (_, a) => a.codec
    case "data_bytes" => (_, a) => a.dataBytes
    case "schema" => (_, a) => a.schemaJson
    case "metadata" => (_, a) => a.metadata
  }

  private lazy val avroBlockEx: Array[Ex[AvroBlockInfo]] = fieldNames.map[Ex[AvroBlockInfo]] {
    case "block_id" => (_, b) => b.id
    case "offset" => (_, b) => b.offset
    case "num_rows" => (_, b) => b.count
    case "data_size" => (_, b) => b.dataSize
    case "filepath" => (f, _) => f.path
  }

  private lazy val orcColumnEx: Array[Ex[OrcColumnInfo]] = fieldNames.map[Ex[OrcColumnInfo]] {
    case "column_id" => (_, c) => c.columnId
    case "path" => (_, c) => c.path
    case "type" => (_, c) => c.typeName
    case "num_values" => (_, c) => c.numValues
    case "has_null" => (_, c) => c.hasNull
    case "min_long" => (_, c) => orNull(c.minLong)
    case "max_long" => (_, c) => orNull(c.maxLong)
    case "sum_long" => (_, c) => orNull(c.sumLong)
    case "min_double" => (_, c) => orNull(c.minDouble)
    case "max_double" => (_, c) => orNull(c.maxDouble)
    case "sum_double" => (_, c) => orNull(c.sumDouble)
    case "min_string" => (_, c) => orNull(c.minString)
    case "max_string" => (_, c) => orNull(c.maxString)
    case "filepath" => (f, _) => f.path
  }

  private lazy val orcRowIndexEx: Array[Ex[OrcRowIndexInfo]] =
    fieldNames.map[Ex[OrcRowIndexInfo]] {
      case "stripe_id" => (_, r) => r.stripeId
      case "column_id" => (_, r) => r.columnId
      case "path" => (_, r) => r.path
      case "entry_id" => (_, r) => r.entryId
      case "num_rows" => (_, r) => r.numRows
      case "num_values" => (_, r) => r.numValues
      case "has_null" => (_, r) => r.hasNull
      case "min_long" => (_, r) => orNull(r.minLong)
      case "max_long" => (_, r) => orNull(r.maxLong)
      case "min_double" => (_, r) => orNull(r.minDouble)
      case "max_double" => (_, r) => orNull(r.maxDouble)
      case "min_string" => (_, r) => orNull(r.minString)
      case "max_string" => (_, r) => orNull(r.maxString)
      case "filepath" => (f, _) => f.path
    }

  private lazy val orcStripeEx: Array[Ex[OrcStripeInfo]] = fieldNames.map[Ex[OrcStripeInfo]] {
    case "stripe_id" => (_, s) => s.id
    case "offset" => (_, s) => s.offset
    case "index_length" => (_, s) => s.indexLength
    case "data_length" => (_, s) => s.dataLength
    case "footer_length" => (_, s) => s.footerLength
    case "num_rows" => (_, s) => s.numRows
    case "filepath" => (f, _) => f.path
  }

  private def spanRows(span: FileSpan): Iterator[InternalRow] = {
    val f = span.file
    level match {
      case MetaLevel.FsFile =>
        Iterator.single(toInternal(fsFileEx, f, ()))

      case MetaLevel.DeltaSnapshot =>
        Iterator.single(toInternal(deltaSnapshotEx, f,
          DeltaMeta.readSegment(new Path(f.path), conf, Some(f.size))))

      case MetaLevel.IcebergSnapshot =>
        val info = IcebergMeta.readTableMetadata(new Path(f.path), conf)
        info.snapshots.iterator.map(s => toInternal(icebergSnapshotEx, f, (info, s)))

      case MetaLevel.HudiTimeline =>
        Iterator.single(toInternal(hudiTimelineEx, f,
          HudiMeta.parseInstantName(f.name, f.path)))

      case MetaLevel.AnyFile =>
        val path = new Path(f.path)
        val fmt = Footers.sniffFormat(path.getFileSystem(conf), path)
        // rows decode only when the column survived pruning — a
        // format-only census pays one 4-byte probe per file, no footers
        val rows: Option[Long] =
          if (!fieldNames.contains("num_rows")) None
          else fmt match {
            case "parquet" =>
              // encrypted footers (PARE) classify with null rows instead
              // of failing a census over an otherwise-healthy lake
              try Some(readFooter(f).numRows)
              catch { case _: Footers.EncryptedParquetException => None }
            case "orc" => Some(OrcMeta.read(path, conf).numRows)
            case "avro" => Some(AvroMeta.read(path, conf, Some(f.size)).numRows)
            case _ => None
          }
        Iterator.single(toInternal(anyFileEx, f, (fmt, rows)))

      case MetaLevel.OrcFile =>
        Iterator.single(toInternal(orcFileEx, f,
          OrcMeta.read(new Path(f.path), conf)))

      case MetaLevel.OrcStripe =>
        OrcMeta.read(new Path(f.path), conf).stripes.iterator
          .map(toInternal(orcStripeEx, f, _))

      case MetaLevel.OrcColumn =>
        OrcMeta.read(new Path(f.path), conf).columns.iterator
          .map(toInternal(orcColumnEx, f, _))

      case MetaLevel.OrcRowIndex =>
        OrcMeta.readRowIndexes(new Path(f.path), conf).iterator
          .map(toInternal(orcRowIndexEx, f, _))

      case MetaLevel.AvroFile =>
        Iterator.single(toInternal(avroFileEx, f,
          AvroMeta.read(new Path(f.path), conf, Some(f.size))))

      case MetaLevel.AvroBlock =>
        AvroMeta.read(new Path(f.path), conf, Some(f.size)).blocks.iterator
          .map(toInternal(avroBlockEx, f, _))

      case MetaLevel.ParquetFile =>
        Iterator.single(toInternal(pqFileEx, f, readFooter(f)))

      case MetaLevel.ParquetRowGroup =>
        readFooter(f).rowGroups.iterator.map(toInternal(rowGroupEx, f, _))

      case MetaLevel.ParquetColumn =>
        readFooter(f).chunks.iterator.map(toInternal(chunkEx, f, _))

      case MetaLevel.ParquetColumnIndex =>
        val chunks = readFooter(f).chunks
        if (!chunks.exists(_.columnIndexOffset.isDefined)) Iterator.empty
        else PageIndexes.columnIndexes(chunks, indexStream(f))
          .map(toInternal(colIndexEx, f, _))

      case MetaLevel.ParquetOffsetIndex =>
        val chunks = readFooter(f).chunks
        if (!chunks.exists(_.offsetIndexOffset.isDefined)) Iterator.empty
        else PageIndexes.offsetIndexes(chunks, indexStream(f))
          .map(toInternal(offIndexEx, f, _))

      case MetaLevel.ParquetSizeStats =>
        readFooter(f).chunks.iterator.filter(_.sizeStats.isDefined)
          .map(toInternal(sizeStatsEx, f, _))

      case MetaLevel.ParquetBloomFilter =>
        // The advisory path hint drops chunks BEFORE any bitset I/O; it
        // only ever skips rows the (still-residual) path predicate would
        // drop anyway — a chunk without path metadata cannot satisfy a
        // path equality, so it is skippable under a hint too.
        val chunks = readFooter(f).chunks.filter(c =>
          bloomPathHint.forall(h => c.path.exists(h.contains)))
        if (!chunks.exists(_.bloomFilterOffset.isDefined)) Iterator.empty
        else BloomFilters.bloomFilters(chunks, indexStream(f),
            wantBitset = fieldNames.contains("bitset"), fileLen = f.size)
          .map(toInternal(bloomEx, f, _))

      case MetaLevel.ParquetPage =>
        val footer = readFooter(f)
        // Only the column chunks whose start offset falls inside this span:
        // a chunk belongs to exactly one span, so a split file is walked
        // disjointly and completely across its spans.
        val chunks = footer.chunks.filter(c =>
          c.startOffset >= span.lo && c.startOffset < span.hi)
        if (chunks.isEmpty) {
          Iterator.empty
        } else {
          val path = new Path(f.path)
          closeStream()
          // Cap the read-ahead buffer at the file size: the default 128 MB
          // is sized for row groups, and allocating it per small file would
          // churn gigabytes across a many-file scan.
          val cap = math.min(bufferSize.toLong, math.max(f.size, 1L)).toInt
          openStream = new ForwardSeekStream(path.getFileSystem(conf).open(path), cap)
          PageScan.pages(chunks, openStream, wantContent).map(toInternal(pageEx, f, _))
        }
    }
  }

  private def readFooter(f: FileSlice): FooterInfo =
    FooterCache.get(f, conf, footerCache)
}
