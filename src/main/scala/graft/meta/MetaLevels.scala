package graft.meta

import org.apache.spark.sql.types._

/**
 * Metadata granularity levels and their fixed output schemas.
 *
 * The data model (field names, types, nesting, nullability quirks such as
 * `page_content: array<byte>` rather than `binary`) mirrors the reference
 * engine's five-level metadata table model
 * (reference: src/main/scala/com/github/sadikovi/metadata/MetadataLevel.scala:15-105)
 * so queries written against the reference run unchanged here.
 */
sealed abstract class MetaLevel(val levelName: String) extends Serializable {
  def schema: StructType
  override def toString: String = levelName
}

object MetaLevel {
  /** Shared statistics struct used by the column and page levels. */
  val statsType: StructType = StructType(Seq(
    StructField("null_count", LongType),
    StructField("distinct_count", LongType),
    StructField("min", BinaryType),
    StructField("max", BinaryType),
    StructField("min_value", BinaryType),
    StructField("max_value", BinaryType)))

  /** Generic file-system level: one row per file, no format decoding. */
  case object FsFile extends MetaLevel("file") {
    override val schema: StructType = StructType(Seq(
      StructField("filepath", StringType),
      StructField("filename", StringType),
      StructField("size", LongType),
      StructField("mtime", LongType),
      StructField("partition", MapType(StringType, StringType))))
  }

  /** Parquet file level: file-system columns + footer summary. */
  case object ParquetFile extends MetaLevel("parquet-file") {
    override val schema: StructType = FsFile.schema
      .add("metadata_size", LongType)
      .add("schema", StringType)
      .add("num_rows", LongType)
      .add("num_row_groups", IntegerType)
      .add("created_by", StringType)
      .add("key_value_metadata", MapType(StringType, StringType))
  }

  /** Thrift `SortingColumn` rendered as a struct: the writer's declaration
    * that a row group's rows are sorted by the schema ordinal. */
  val sortingColumnType: StructType = StructType(Seq(
    StructField("column_idx", IntegerType, nullable = false),
    StructField("descending", BooleanType, nullable = false),
    StructField("nulls_first", BooleanType, nullable = false)))

  /** Thrift `PageEncodingStats` rendered as a struct: page count per
    * (page type, encoding) inside a chunk. */
  val pageEncodingStatType: StructType = StructType(Seq(
    StructField("page_type", StringType, nullable = false),
    StructField("encoding", StringType, nullable = false),
    StructField("count", IntegerType, nullable = false)))

  /** One row per (file x row group). `sorting_columns` (a post-reference
    * addition, appended so reference queries run unchanged) surfaces the
    * writer's sort declaration — null when the writer declared none. */
  case object ParquetRowGroup extends MetaLevel("parquet-rowgroup") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("file_offset", LongType),
      StructField("total_compressed_size", LongType),
      StructField("total_uncompressed_size", LongType),
      StructField("num_rows", LongType),
      StructField("num_columns", IntegerType),
      StructField("sorting_columns", ArrayType(sortingColumnType, containsNull = false)),
      StructField("filepath", StringType)))
  }

  /** One row per (file x row group x column chunk). */
  case object ParquetColumn extends MetaLevel("parquet-column") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("file_offset", LongType),
      StructField("total_compressed_size", LongType),
      StructField("total_uncompressed_size", LongType),
      StructField("path", StringType),
      StructField("type", StringType),
      StructField("encodings", ArrayType(StringType)),
      StructField("compression", StringType),
      StructField("num_values", LongType),
      StructField("statistics", statsType),
      StructField("data_page_offset", LongType),
      StructField("dictionary_page_offset", LongType),
      StructField("index_page_offset", LongType),
      StructField("offset_index_offset", LongType),
      StructField("offset_index_length", IntegerType),
      StructField("column_index_offset", LongType),
      StructField("column_index_length", IntegerType),
      // post-reference addition (appended; reference queries unchanged):
      // per-(page type, encoding) page counts from the footer — the audit
      // of whether a chunk is dictionary-encoded or fell back to PLAIN
      StructField("encoding_stats", ArrayType(pageEncodingStatType, containsNull = false)),
      StructField("filepath", StringType)))
  }

  /**
   * One row per (file x row group x column x data page) from the Parquet
   * PAGE INDEX (ColumnIndex thrift struct) — per-page min/max/null stats
   * readable WITHOUT touching page data. A post-reference extension: the
   * page index postdates the reference engine's data model (its column
   * level only exposes the index offsets, reference:
   * src/main/scala/com/github/sadikovi/metadata/MetadataLevel.scala:48-77);
   * this level decodes what those offsets point at. Files written without
   * a page index contribute zero rows.
   */
  case object ParquetColumnIndex extends MetaLevel("parquet-columnindex") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("page_id", IntegerType),
      StructField("null_page", BooleanType),
      StructField("min_value", BinaryType),
      StructField("max_value", BinaryType),
      StructField("null_count", LongType),
      StructField("boundary_order", StringType),
      StructField("filepath", StringType)))
  }

  /** One row per (file x row group x column x data page) from the Parquet
    * OffsetIndex: page location and row coverage without page-header I/O. */
  case object ParquetOffsetIndex extends MetaLevel("parquet-offsetindex") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("page_id", IntegerType),
      StructField("offset", LongType),
      StructField("compressed_page_size", IntegerType),
      StructField("first_row_index", LongType),
      StructField("filepath", StringType)))
  }

  /**
   * One row per (file x row group x column) BLOOM FILTER: the thrift
   * header fields plus the raw split-block bitset, probeable with
   * [[graft.functions.SbbfMightContain]] without any page I/O. A
   * post-reference extension like the page-index levels: bloom filters
   * postdate the reference's data model. Chunks written without one
   * (the writer default, and parquet-mr's choice for fully
   * dictionary-encoded chunks) contribute zero rows.
   */
  case object ParquetBloomFilter extends MetaLevel("parquet-bloomfilter") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("path", StringType),
      StructField("type", StringType),
      StructField("bloom_offset", LongType),
      StructField("header_size", IntegerType),
      StructField("num_bytes", IntegerType),
      StructField("algorithm", StringType),
      StructField("hash", StringType),
      StructField("compression", StringType),
      StructField("bitset", BinaryType),
      StructField("filepath", StringType)))
  }

  /**
   * One row per (file x row group x column) SIZE STATISTICS (thrift
   * `SizeStatistics`, parquet-format 2.10+): the logical data sizes that
   * survive encoding/compression choices — unencoded BYTE_ARRAY payload
   * bytes (memory sizing for scans) and the repetition/definition level
   * histograms (nullability and nesting shape without reading a value).
   * A post-reference extension; chunks written by pre-2.10 writers
   * contribute zero rows.
   */
  case object ParquetSizeStats extends MetaLevel("parquet-sizestats") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("path", StringType),
      StructField("type", StringType),
      StructField("num_values", LongType),
      StructField("unencoded_byte_array_bytes", LongType),
      StructField("repetition_level_histogram", ArrayType(LongType, containsNull = false)),
      StructField("definition_level_histogram", ArrayType(LongType, containsNull = false)),
      StructField("filepath", StringType)))
  }

  /** ORC file level: file-system columns + file-tail summary — the ORC
    * sibling of [[ParquetFile]] for the second major columnar format a
    * lake audit meets. */
  case object OrcFile extends MetaLevel("orc-file") {
    override val schema: StructType = FsFile.schema
      .add("num_rows", LongType)
      .add("num_stripes", IntegerType)
      .add("compression", StringType)
      .add("compression_block_size", IntegerType)
      .add("file_version", StringType)
      .add("writer_version", StringType)
      .add("schema", StringType)
      .add("user_metadata", MapType(StringType, StringType))
  }

  /** One row per ORC schema column: the file-footer column statistics
    * (typed min/max/sum slots, null where the type doesn't carry them) —
    * the ORC sibling of [[ParquetColumn]]'s statistics struct, flattened
    * because ORC types their stats where parquet stores raw bytes. */
  case object OrcColumn extends MetaLevel("orc-column") {
    override val schema: StructType = StructType(Seq(
      StructField("column_id", IntegerType),
      StructField("path", StringType),
      StructField("type", StringType),
      StructField("num_values", LongType),
      StructField("has_null", BooleanType),
      StructField("min_long", LongType),
      StructField("max_long", LongType),
      StructField("sum_long", LongType),
      StructField("min_double", DoubleType),
      StructField("max_double", DoubleType),
      StructField("sum_double", DoubleType),
      StructField("min_string", StringType),
      StructField("max_string", StringType),
      StructField("filepath", StringType)))
  }

  /**
   * One row per ORC (stripe × column × ROW GROUP of
   * `orc.row.index.stride` rows, default 10k): the row-group index
   * statistics ORC's own reader consults for its finest-grain skipping
   * — the ORC sibling of [[ParquetColumnIndex]]. Typed min/max slots
   * like [[OrcColumn]]; files written with the index disabled
   * contribute zero rows.
   */
  case object OrcRowIndex extends MetaLevel("orc-rowindex") {
    override val schema: StructType = StructType(Seq(
      StructField("stripe_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("path", StringType),
      StructField("entry_id", IntegerType),
      StructField("num_rows", LongType),
      StructField("num_values", LongType),
      StructField("has_null", BooleanType),
      StructField("min_long", LongType),
      StructField("max_long", LongType),
      StructField("min_double", DoubleType),
      StructField("max_double", DoubleType),
      StructField("min_string", StringType),
      StructField("max_string", StringType),
      StructField("filepath", StringType)))
  }

  /** One row per ORC stripe — the sub-file unit playing the parquet
    * row group's role (offset + index/data/footer section lengths +
    * row count). */
  case object OrcStripe extends MetaLevel("orc-stripe") {
    override val schema: StructType = StructType(Seq(
      StructField("stripe_id", IntegerType),
      StructField("offset", LongType),
      StructField("index_length", LongType),
      StructField("data_length", LongType),
      StructField("footer_length", LongType),
      StructField("num_rows", LongType),
      StructField("filepath", StringType)))
  }

  /** Avro file level: file-system columns + object-container header
    * summary plus the block-walk totals (Avro has no footer — row
    * counts come from walking the block headers). */
  case object AvroFile extends MetaLevel("avro-file") {
    override val schema: StructType = FsFile.schema
      .add("num_rows", LongType)
      .add("num_blocks", IntegerType)
      .add("codec", StringType)
      .add("data_bytes", LongType)
      .add("schema", StringType)
      .add("metadata", MapType(StringType, StringType))
  }

  /** One row per Avro data block: offset, row count, compressed data
    * size — the sub-file unit in the row group / stripe role. */
  case object AvroBlock extends MetaLevel("avro-block") {
    override val schema: StructType = StructType(Seq(
      StructField("block_id", IntegerType),
      StructField("offset", LongType),
      StructField("num_rows", LongType),
      StructField("data_size", LongType),
      StructField("filepath", StringType)))
  }

  /**
   * Delta Lake TRANSACTION-LOG level (`source=delta`,
   * `level=snapshot`): one row per `_delta_log` segment — JSON commits
   * and checkpoint parts — with per-segment action counts. Commit
   * counts come from a line-keyed JSON parse; checkpoint counts come AT
   * FOOTER COST from the checkpoint parquet's own column statistics
   * (non-null `add.path` = num_values − null_count), zero data-page
   * I/O. `operation`/`op_timestamp` lift `commitInfo` (null for
   * checkpoints and commits without one); `n_add`/`n_remove` are null
   * only when a checkpoint footer lacks null counts (no evidence).
   */
  case object DeltaSnapshot extends MetaLevel("delta-snapshot") {
    override val schema: StructType = StructType(Seq(
      StructField("version", LongType),
      StructField("kind", StringType),
      StructField("filename", StringType),
      StructField("size", LongType),
      StructField("mtime", LongType),
      StructField("n_add", LongType),
      StructField("n_remove", LongType),
      StructField("has_protocol", BooleanType),
      StructField("has_metadata", BooleanType),
      StructField("operation", StringType),
      StructField("op_timestamp", LongType),
      StructField("filepath", StringType)))
  }

  /**
   * Iceberg TABLE-METADATA level (`source=iceberg`, `level=snapshot`):
   * one row per snapshot of each `*.metadata.json` file — id,
   * commit timestamp, manifest-list pointer, summary operation, and
   * whether it is the file's `current-snapshot-id`. The listing is the
   * metadata directory, not the data files; manifest-level census runs
   * through [[IcebergMeta.currentFiles]].
   */
  case object IcebergSnapshot extends MetaLevel("iceberg-snapshot") {
    override val schema: StructType = StructType(Seq(
      StructField("snapshot_id", LongType),
      StructField("timestamp_ms", LongType),
      StructField("manifest_list", StringType),
      StructField("operation", StringType),
      StructField("is_current", BooleanType),
      StructField("format_version", IntegerType),
      StructField("filename", StringType),
      StructField("filepath", StringType)))
  }

  /**
   * Hudi TIMELINE level (`source=hudi`, `level=timeline`): one row per
   * `.hoodie` instant file — instant time, action, and state
   * (`completed` for the bare `<instant>.<action>` form), decoded from
   * the NAME alone (the timeline encodes its facts in names; zero
   * file I/O per row). The listing is the timeline directory, not the
   * data files; slice-level resolution runs through
   * [[HudiMeta.liveFiles]].
   */
  case object HudiTimeline extends MetaLevel("hudi-timeline") {
    override val schema: StructType = StructType(Seq(
      StructField("instant_time", StringType),
      StructField("action", StringType),
      StructField("state", StringType),
      StructField("size", LongType),
      StructField("mtime", LongType),
      StructField("filename", StringType),
      StructField("filepath", StringType)))
  }

  /**
   * Mixed-lake file level (`source=any`): one row per file, classified
   * by ONE magic-byte probe — `format` is `parquet`/`orc`/`avro`/`other`
   * — with `num_rows` decoded through the matching format's reader
   * (footer / tail / block walk). Foreign files census as `other` with
   * null rows instead of failing a homogeneity sniff; encrypted parquet
   * (PARE) classifies as `parquet` with null rows ("no evidence", the
   * footer is ciphertext). The one-scan answer to "what is actually in
   * this bucket" that the per-source file levels need three scans for.
   */
  case object AnyFile extends MetaLevel("any-file") {
    override val schema: StructType = FsFile.schema
      .add("format", StringType)
      .add("num_rows", LongType)
  }

  /** One row per physical page (incl. dictionary pages). */
  case object ParquetPage extends MetaLevel("parquet-page") {
    override val schema: StructType = StructType(Seq(
      StructField("row_group_id", IntegerType),
      StructField("column_id", IntegerType),
      StructField("page_id", IntegerType),
      StructField("page_type", StringType),
      StructField("page_header_offset", LongType),
      StructField("page_header_size", IntegerType),
      StructField("page_compressed_size", IntegerType),
      StructField("page_uncompressed_size", IntegerType),
      StructField("crc", IntegerType),
      StructField("num_values", IntegerType),
      StructField("encoding", StringType),
      StructField("definition_level_encoding", StringType),
      StructField("repetition_level_encoding", StringType),
      StructField("statistics", statsType),
      // array<byte> (not binary) for reference schema fidelity
      StructField("page_content", ArrayType(ByteType)),
      // post-reference additions (appended; reference queries unchanged):
      // DataPageHeaderV2's null count, level-region byte lengths, and
      // values-compression flag — null for v1 and dictionary pages
      StructField("num_nulls", IntegerType),
      StructField("def_levels_byte_length", IntegerType),
      StructField("rep_levels_byte_length", IntegerType),
      StructField("values_compressed", BooleanType),
      StructField("filepath", StringType)))
  }
}
