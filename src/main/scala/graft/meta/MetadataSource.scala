package graft.meta

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `spark.read.format("metadata")` — file-system and Parquet physical metadata
 * exposed as DataFrames at four granularities (file / rowgroup / column /
 * page). Options, levels, defaults, and error text are compatible with the
 * reference engine's user surface
 * (reference: src/main/scala/com/github/sadikovi/metadata/DefaultSource.scala:99-150),
 * but this is a DataSource V2 implementation: it gets column pruning
 * (`SupportsPushDownRequiredColumns`), size-weighted input partition packing,
 * and deterministic reader cleanup via `PartitionReader.close` for free.
 */
class MetadataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "metadata"

  // Spark calls inferSchema then getTable on the same provider instance with
  // the same options; cache the resolved table so file listing, partition
  // stringification, and the magic-byte sniff run once per spark.read.
  private var cached: (Map[String, String], MetaTable) = null

  private def resolve(options: Map[String, String]): MetaTable = synchronized {
    if (cached == null || cached._1 != options) {
      cached = (options, MetaTable.resolve(options))
    }
    cached._2
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options.asScala.toMap).schema()

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    resolve(properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = false
}

object MetadataSource {
  val MAX_PARTS = "maxparts"
  val MAX_PARTS_DEFAULT = 200
  val BUFFER_SIZE = "buffersize"
  val BUFFER_SIZE_DEFAULT: Int = 128 * 1024 * 1024
  val PAGE_CONTENT = "pagecontent"
  val SOURCE = "source"
  val LEVEL = "level"
  val SPAN_BYTES = "spanbytes"
  val SPAN_BYTES_DEFAULT: Long = 128L * 1024 * 1024
  val IGNORE_CORRUPT = "ignorecorrupt"
  val FOOTER_CACHE = "footercache"
  val COUNT_PUSHDOWN = "countpushdown"
  val LIST_MODE = "listmode"
  val LIST_MODES = Seq("index", "sharded")

  val SOURCES = Seq("file", "parquet", "orc", "avro", "any", "delta", "iceberg", "hudi")
  val LEVELS = Seq("file", "rowgroup", "column", "page",
    "columnindex", "offsetindex", "bloomfilter", "sizestats", "stripe",
    "block", "snapshot", "rowindex", "timeline")

  /** Map a validated (source, level) pair onto a [[MetaLevel]]. */
  def levelFor(source: String, level: String): MetaLevel = (source, level) match {
    case ("file", "file") => MetaLevel.FsFile
    case ("parquet", "file") => MetaLevel.ParquetFile
    case ("parquet", "rowgroup") => MetaLevel.ParquetRowGroup
    case ("parquet", "column") => MetaLevel.ParquetColumn
    case ("parquet", "page") => MetaLevel.ParquetPage
    case ("parquet", "columnindex") => MetaLevel.ParquetColumnIndex
    case ("parquet", "offsetindex") => MetaLevel.ParquetOffsetIndex
    case ("parquet", "bloomfilter") => MetaLevel.ParquetBloomFilter
    case ("parquet", "sizestats") => MetaLevel.ParquetSizeStats
    case ("orc", "file") => MetaLevel.OrcFile
    case ("orc", "stripe") => MetaLevel.OrcStripe
    case ("orc", "column") => MetaLevel.OrcColumn
    case ("orc", "rowindex") => MetaLevel.OrcRowIndex
    case ("avro", "file") => MetaLevel.AvroFile
    case ("avro", "block") => MetaLevel.AvroBlock
    case ("any", "file") => MetaLevel.AnyFile
    case ("delta", "snapshot") => MetaLevel.DeltaSnapshot
    case ("iceberg", "snapshot") => MetaLevel.IcebergSnapshot
    case ("hudi", "timeline") => MetaLevel.HudiTimeline
    case (s, l) =>
      throw new IllegalArgumentException(s"Source '$s' does not support '$l' level")
  }
}

/** One listed file with its stringified partition values. */
case class FileSlice(
    path: String,
    name: String,
    size: Long,
    mtime: Long,
    partition: Map[String, String])

/**
 * Resolved metadata table: options parsed, files listed, source inferred.
 * All of this happens once on the driver; executors only ever see
 * [[FileSlice]]s and a serialized Hadoop conf.
 */
class MetaTable(
    val level: MetaLevel,
    val files: Seq[FileSlice],
    val maxParts: Int,
    val bufferSize: Int,
    val pageContent: Boolean,
    val spanBytes: Long,
    val ignoreCorrupt: Boolean,
    val footerCache: Boolean,
    val countPushdown: Boolean,
    val rootPath: Path,
    val options: Map[String, String],
    @transient val spark: SparkSession) extends Table with SupportsRead {

  override def name(): String = s"metadata(${level.levelName})"
  override def schema(): StructType = level.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MetaScanBuilder(this)
}

object MetaTable {
  import MetadataSource._

  def resolve(options: Map[String, String]): MetaTable = {
    val opts = options.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val spark = SparkSession.active
    val hadoopConf = spark.sessionState.newHadoopConf()

    val rootPath = {
      val p = new Path(opts.getOrElse("path",
        throw new IllegalArgumentException("Path is not provided")))
      p.getFileSystem(hadoopConf).makeQualified(p)
    }
    val maxParts = opts.get(MAX_PARTS).map(_.toInt).getOrElse(MAX_PARTS_DEFAULT)
    val bufferSize = opts.get(BUFFER_SIZE).map(_.toInt).getOrElse(BUFFER_SIZE_DEFAULT)
    require(bufferSize > 0, s"Unsupported buffer size value $bufferSize")
    val pageContent = opts.get(PAGE_CONTENT).exists(_.trim.toBoolean)
    val spanBytes = opts.get(SPAN_BYTES).map(_.toLong).getOrElse(SPAN_BYTES_DEFAULT)
    require(spanBytes > 0, s"Unsupported span bytes value $spanBytes")
    val ignoreCorrupt = opts.get(IGNORE_CORRUPT).exists(_.trim.toBoolean)
    val footerCache = opts.get(FOOTER_CACHE).forall(_.trim.toBoolean)
    val countPushdown = opts.get(COUNT_PUSHDOWN).forall(_.trim.toBoolean)

    val explicitSource = opts.get(SOURCE).map(_.toLowerCase(java.util.Locale.ROOT))
    explicitSource.foreach { s =>
      require(SOURCES.contains(s),
        s"Invalid source: $s, expected one of ${SOURCES.mkString("[", ", ", "]")}")
    }
    // Table formats are detected STRUCTURALLY (a `_delta_log` child
    // dir; a `metadata/*.metadata.json`), not by file magic: the
    // transaction log / metadata chain — not the data files — is what
    // their snapshot levels list, so the listing itself branches.
    // Detection only runs when the requested level is unset or
    // `snapshot`: a `level=rowgroup` load of a table directory must
    // keep scanning the DATA files (the `source=parquet` behavior),
    // and non-table loads with an explicit level skip the probe RPCs.
    val requestedLevel = opts.get(LEVEL).map(_.toLowerCase(java.util.Locale.ROOT))
    val mayAutoDetect = explicitSource.isEmpty &&
      requestedLevel.forall(l => l == "snapshot" || l == "timeline")
    val isDelta = explicitSource.contains("delta") ||
      (mayAutoDetect &&
        DeltaMeta.isDeltaTable(rootPath.getFileSystem(hadoopConf), rootPath))
    val isIceberg = !isDelta && (explicitSource.contains("iceberg") ||
      (mayAutoDetect &&
        IcebergMeta.isIcebergTable(rootPath.getFileSystem(hadoopConf), rootPath)))
    val isHudi = !isDelta && !isIceberg && (explicitSource.contains("hudi") ||
      (mayAutoDetect && HudiMeta.isHudiTable(rootPath, hadoopConf)))

    val files =
      if (isDelta) DeltaMeta.listLogSlices(rootPath, hadoopConf)
      else if (isIceberg) IcebergMeta.listMetadataSlices(rootPath, hadoopConf)
      else if (isHudi) HudiMeta.listTimelineSlices(rootPath, hadoopConf)
      else listSlices(spark, rootPath, opts, fresh = false)

    val source =
      if (isDelta) "delta"
      else if (isIceberg) "iceberg"
      else if (isHudi) "hudi"
      else explicitSource.getOrElse {
        // Assume homogeneous input: sniff the first file's magic bytes
        // with one 4-byte read (PAR1/PARE → parquet, ORC → orc,
        // Obj\1 → avro, anything else → file)
        files.headOption.map { f =>
          val p = new Path(f.path)
          Footers.sniffFormat(p.getFileSystem(hadoopConf), p) match {
            case "other" => "file"
            case fmt => fmt
          }
        }.getOrElse("file")
      }

    // the table formats' only level is the snapshot; defaulting to it
    // keeps `spark.read.format("metadata").load(table)` meaningful there
    val level = opts.getOrElse(LEVEL,
      if (source == "delta" || source == "iceberg") "snapshot"
      else if (source == "hudi") "timeline" else "file")
      .toLowerCase(java.util.Locale.ROOT)
    require(LEVELS.contains(level),
      s"Invalid level: $level, expected one of ${LEVELS.mkString("[", ", ", "]")}")

    new MetaTable(MetadataSource.levelFor(source, level), files,
      maxParts, bufferSize, pageContent, spanBytes, ignoreCorrupt, footerCache,
      countPushdown, rootPath, opts, spark)
  }

  /**
   * Recursive listing + Hive partition discovery. Batch reads share the
   * session file-status cache; streaming listings pass `fresh = true` so
   * newly arrived files are visible every micro-batch.
   */
  def listSlices(
      spark: SparkSession,
      rootPath: Path,
      opts: Map[String, String],
      fresh: Boolean): Seq[FileSlice] = {
    val mode = opts.getOrElse(MetadataSource.LIST_MODE, "index")
      .toLowerCase(java.util.Locale.ROOT)
    require(MetadataSource.LIST_MODES.contains(mode),
      s"Invalid listmode: $mode, expected one of " +
        MetadataSource.LIST_MODES.mkString("[", ", ", "]"))
    if (mode == "sharded") {
      return listSlicesSharded(rootPath, spark.sessionState.newHadoopConf())
    }
    val cache =
      if (fresh) org.apache.spark.sql.execution.datasources.NoopCache
      else FileStatusCache.getOrCreate(spark)
    val index = new InMemoryFileIndex(spark, Seq(rootPath), opts, None, cache)
    val partSchema = index.partitionSchema
    index.listFiles(Nil, Nil).flatMap { dir =>
      // Stringify partition values once, on the driver, through the external
      // Scala representation so dates/timestamps render in their canonical
      // java.sql form (e.g. "2020-02-02 01:02:03.0"), not as internal micros.
      val partMap = partSchema.zipWithIndex.map { case (f, i) =>
        val v = CatalystTypeConverters.convertToScala(
          dir.values.get(i, f.dataType), f.dataType)
        f.name -> (if (v == null) "null" else v.toString)
      }.toMap
      dir.files.map { st =>
        FileSlice(st.getPath.toString, st.getPath.getName, st.getLen,
          st.getModificationTime, partMap)
      }
    }
  }

  /**
   * `listmode=sharded` — the MILLION-FILE listing posture: a
   * depth-first walk that pages every directory through
   * `listStatusIterator` (streaming RPC pages, one subtree at a time)
   * and yields [[FileSlice]]s DIRECTLY. No `InMemoryFileIndex`, no
   * session `FileStatusCache`: driver retention is one compact slice
   * per file (~hundreds of bytes — path string, two longs, a shared
   * partition map) instead of the index path's measured ~32 KB cache
   * entry per file (BASELINE.md), so a 1M-file listing needs ~300 MB,
   * not ~32 GB. Always fresh (there is no cache to go stale), which
   * also makes it the natural streaming-relist mode.
   *
   * Hive-style `k=v` segments become partition values as URL-decoded
   * strings (one decode per DIRECTORY, the map shared by its files) —
   * no whole-tree type-inference pass, which is exactly the step that
   * cannot scale ahead of planning. Rendering parity with index mode
   * is spec-pinned (`ListModeSpec`) INCLUDING timestamp-shaped values:
   * Spark 4's partition inference leaves `HH:mm:ss`-shaped strings as
   * StringType (verified empirically against `InMemoryFileIndex` —
   * `StructField(ts,StringType)`), so both modes render the raw
   * URL-decoded form and no typed-rendering translation exists to
   * diverge on. The one theoretical residue is a value index mode's
   * inference WOULD type (e.g. a zero-padded integer `id=003`, typed
   * rendering `3` vs raw `003`) — a shape Spark's own writers never
   * produce.
   */
  def listSlicesSharded(
      rootPath: Path,
      hadoopConf: org.apache.hadoop.conf.Configuration): Seq[FileSlice] = {
    val fs = rootPath.getFileSystem(hadoopConf)
    val rootStatus = fs.getFileStatus(rootPath)
    if (!rootStatus.isDirectory) {
      return Seq(FileSlice(rootStatus.getPath.toString,
        rootStatus.getPath.getName, rootStatus.getLen,
        rootStatus.getModificationTime, Map.empty))
    }
    def hidden(name: String): Boolean =
      name.startsWith("_") || name.startsWith(".")
    def partOf(partition: Map[String, String], dirName: String): Map[String, String] = {
      val eq = dirName.indexOf('=')
      if (eq > 0) {
        val raw = java.net.URLDecoder.decode(dirName.substring(eq + 1), "UTF-8")
        // the hive null sentinel renders "null", like index mode
        val v = if (raw == "__HIVE_DEFAULT_PARTITION__") "null" else raw
        partition + (dirName.substring(0, eq) -> v)
      } else partition
    }
    def walk(dir: Path, partition: Map[String, String],
        out: scala.collection.mutable.Builder[FileSlice, Vector[FileSlice]]): Unit = {
      val it = fs.listStatusIterator(dir)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (!hidden(name)) {
          if (st.isDirectory) {
            walk(st.getPath, partOf(partition, name), out)
          } else {
            out += FileSlice(st.getPath.toString, name, st.getLen,
              st.getModificationTime, partition)
          }
        }
      }
    }
    // the TOP-level shards walk in parallel (a high-latency store's
    // listing cost is round trips, and the shard fan-out is the
    // parallelism a partitioned tree naturally offers); each subtree
    // stays a sequential depth-first iterator, so peak memory is the
    // final slice vector plus one RPC page per in-flight shard
    val rootFiles = Vector.newBuilder[FileSlice]
    val shards = Vector.newBuilder[(Path, Map[String, String])]
    val it = fs.listStatusIterator(rootPath)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!hidden(name)) {
        if (st.isDirectory) shards += ((st.getPath, partOf(Map.empty, name)))
        else rootFiles += FileSlice(st.getPath.toString, name, st.getLen,
          st.getModificationTime, Map.empty)
      }
    }
    val shardSeq = shards.result()
    val parallelism = math.min(16, math.max(1, shardSeq.size))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = shardSeq.map { case (p, part) =>
        new java.util.concurrent.Callable[Vector[FileSlice]] {
          override def call(): Vector[FileSlice] = {
            val b = Vector.newBuilder[FileSlice]
            walk(p, part, b)
            b.result()
          }
        }
      }
      val results = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      rootFiles.result() ++ results.flatten
    } finally {
      pool.shutdown()
    }
  }
}

/** Scan builder with required-column pruning and file-pruning filter
  * pushdown: filters over the per-file attributes are used to drop whole
  * files at planning time (before any executor I/O). Every filter is also
  * returned as residual, so Spark re-applies it post-scan — pruning is a
  * pure I/O optimization and can never change results. */
class MetaScanBuilder(table: MetaTable)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownAggregates {
  private var required: StructType = table.schema()
  private var pushed: Array[Filter] = Array.empty
  private var limit: Option[Int] = None
  private var countStar: Boolean = false
  private var pathHint: Option[Set[String]] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val attrs = FilePruning.evaluableAttrs(table.level)
    // A filter decidable for EVERY listed file is handled EXACTLY by file
    // pruning — its columns are constant across a file's rows — so it is
    // claimed (not re-evaluated post-scan), which both removes a redundant
    // Filter node and makes aggregate pushdown reachable for filtered
    // counts. Anything not fully decidable stays residual for Spark.
    val (claimed, residual) = filters.partition { f =>
      FilePruning.canEvaluate(f, attrs) &&
        table.files.forall(FilePruning.eval(f, _).isDefined)
    }
    pushed = claimed
    // Advisory hint, NOT a claim: at the bloomfilter level a `path = 'c'`
    // / `path IN (...)` predicate lets the reader skip non-matching
    // chunks BEFORE any bitset I/O (the common probe reads one column of
    // a table that blooms many). The filter stays residual — Spark still
    // applies it — so skipping is exact: only rows the filter would drop
    // anyway are skipped (a null path never satisfies these predicates).
    if (table.level == MetaLevel.ParquetBloomFilter) {
      val sets = residual.collect {
        case EqualTo("path", v: String) => Set(v)
        case EqualNullSafe("path", v: String) => Set(v)
        case In("path", vs) => vs.collect { case s: String => s }.toSet
      }
      if (sets.nonEmpty) pathHint = Some(sets.reduce(_ intersect _))
    }
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT n caps the planned files at the file levels, where each file
    * yields exactly one row — `limit(10)` over a million-file table plans
    * 10 files instead of all of them. Deeper levels can produce zero rows
    * per file (an empty parquet file has no row groups), so capping files
    * there could under-produce; they decline the pushdown. */
  override def pushLimit(n: Int): Boolean = table.level match {
    // With ignorecorrupt, the parquet-file level may SKIP files at decode
    // time, so capping the listing at n files could under-produce; decline.
    case MetaLevel.FsFile =>
      limit = Some(n)
      false // keep Spark's limit on top (pruning is still exact, this is belt+braces)
    case MetaLevel.ParquetFile | MetaLevel.OrcFile | MetaLevel.AvroFile |
        MetaLevel.AnyFile | MetaLevel.DeltaSnapshot | MetaLevel.HudiTimeline
        if !table.ignoreCorrupt =>
      limit = Some(n)
      false
    case _ => false
  }

  /**
   * Complete COUNT(*) pushdown at the file levels, where the row count is
   * exactly the surviving-file count: `df.count()` over a million-file
   * listing answers from the driver without shipping one row to executors.
   * Pushed filters are safe by construction — pushFilters only claims
   * filters fully decidable against the driver listing.
   *
   * Documented divergence (ParquetFile level, ignorecorrupt=false): the
   * pushed count answers from the listing WITHOUT decoding footers, so if
   * the directory contains an undecodable .parquet file, `count()` succeeds
   * (counting the corrupt file) where `collect()` on the same DataFrame
   * throws. Values never diverge — only error behavior does: the count the
   * scan WOULD produce if it succeeded is the same number. Sniffing or
   * decoding every footer driver-side to close this gap would cost one
   * read per file and defeat the zero-I/O point of the pushdown; callers
   * who need scan-exact error semantics can disable it with
   * `.option("countpushdown", "false")`.
   */
  private def countPushable(agg: Aggregation): Boolean =
    table.countPushdown &&
      agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar] &&
      (table.level == MetaLevel.FsFile ||
        ((table.level == MetaLevel.ParquetFile ||
          table.level == MetaLevel.OrcFile ||
          table.level == MetaLevel.AvroFile ||
          table.level == MetaLevel.AnyFile ||
          table.level == MetaLevel.DeltaSnapshot ||
          table.level == MetaLevel.HudiTimeline) && !table.ignoreCorrupt)) &&
      limit.isEmpty

  override def supportCompletePushDown(agg: Aggregation): Boolean = countPushable(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    countStar = countPushable(agg)
    countStar
  }

  override def build(): Scan =
    if (countStar) new MetaCountScan(table, pushed)
    else new MetaScan(table, required, pushed, limit, pathHint)
}

/** Single-row COUNT(*) result computed entirely from the driver listing. */
class MetaCountScan(table: MetaTable, pushed: Array[Filter]) extends Scan with Batch {
  private lazy val n: Long =
    (if (pushed.isEmpty) table.files
     else table.files.filter(FilePruning.keep(pushed.toSeq, _))).length.toLong

  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"metadata(level=${table.level.levelName}, pushed-count=$n)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(CountPartition(n))
  override def createReaderFactory(): PartitionReaderFactory = CountReaderFactory
}

case class CountPartition(n: Long) extends InputPartition

object CountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val n = partition.asInstanceOf[CountPartition].n
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](n))
      override def close(): Unit = ()
    }
  }
}

/**
 * A unit of scan work: one file, restricted to column chunks whose start
 * offset falls in `[lo, hi)`. Non-page levels always use the full span —
 * their only per-file work is the footer decode. Page-level scans split
 * large files into multiple spans so a single huge parquet file
 * parallelizes across tasks: each task re-reads the (cheap) footer and
 * walks only its own chunks.
 */
case class FileSpan(file: FileSlice, lo: Long, hi: Long) {
  def length: Long = math.min(hi, math.max(file.size, 1L)) - lo
}

/** A group of file spans read by one task. */
case class FilesPartition(spans: Array[FileSpan]) extends InputPartition

class MetaScan(
    table: MetaTable,
    required: StructType,
    pushed: Array[Filter],
    limit: Option[Int] = None,
    pathHint: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Files surviving pushed-filter pruning and the (file-level) limit. */
  private lazy val prunedFiles: Seq[FileSlice] = {
    val filtered =
      if (pushed.isEmpty) table.files
      else table.files.filter(FilePruning.keep(pushed.toSeq, _))
    limit.fold(filtered)(filtered.take)
  }

  /**
   * Exact statistics at the file levels (row count == surviving file
   * count), so Catalyst can see that a metadata DataFrame is small and
   * choose a broadcast join when the user joins metadata against data.
   * Deeper levels report unknown (footer reads would be needed).
   */
  override def estimateStatistics(): Statistics = new Statistics {
    private val known = table.level match {
      case MetaLevel.FsFile | MetaLevel.ParquetFile | MetaLevel.OrcFile |
          MetaLevel.AvroFile | MetaLevel.AnyFile | MetaLevel.DeltaSnapshot |
          MetaLevel.HudiTimeline =>
        Some(prunedFiles.length.toLong)
      case _ => None
    }
    override def numRows(): java.util.OptionalLong =
      known.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty)
    override def sizeInBytes(): java.util.OptionalLong =
      known.map(n => java.util.OptionalLong.of(n * required.defaultSize))
        .getOrElse(java.util.OptionalLong.empty)
  }

  override def description(): String =
    s"metadata(level=${table.level.levelName}, files=${prunedFiles.length}/${table.files.length}, " +
      s"columns=[${required.fieldNames.mkString(",")}]" +
      (if (pushed.nonEmpty) s", pushed=[${pushed.mkString(",")}]" else "") +
      pathHint.fold("")(h => s", bloompaths=[${h.toSeq.sorted.mkString(",")}]") +
      limit.fold("")(n => s", limit=$n") + ")"

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    MetaMetrics.supported

  override def toMicroBatchStream(checkpointLocation: String): 
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new MetaMicroBatchStream(table, required)

  /**
   * Pack scan units into at most `maxparts` partitions, balanced by span
   * size (greedy largest-first into the lightest bin) so one task doesn't
   * end up with all the big work when page-scanning a skewed table.
   *
   * Page level additionally splits each file into `spanbytes`-sized byte
   * spans, so the page walk of one huge file parallelizes across tasks
   * instead of serializing into a single partition.
   */
  override def planInputPartitions(): Array[InputPartition] =
    MetaScan.pack(MetaScan.spanify(prunedFiles, table.level, table.spanBytes), table.maxParts)

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(table.spark.sessionState.newHadoopConf())
    MetaReaderFactory(table.level, required, conf, table.bufferSize, table.pageContent,
      table.ignoreCorrupt, table.footerCache, pathHint)
  }
}

object MetaScan {
  /** Page level splits big files into byte spans; other levels scan whole. */
  def spanify(files: Seq[FileSlice], level: MetaLevel, spanBytes: Long): Seq[FileSpan] =
    files.flatMap { f =>
      if (level == MetaLevel.ParquetPage && f.size > spanBytes) {
        // Cap the span count: a tiny spanbytes on a huge file must not
        // overflow the Int conversion (which would silently drop the file);
        // the final span always extends to MaxValue so coverage is complete
        // even when capped.
        val nSpans = math.min((f.size + spanBytes - 1) / spanBytes, 1L << 20).toInt
        (0 until nSpans).map { s =>
          FileSpan(f, s.toLong * spanBytes,
            if (s == nSpans - 1) Long.MaxValue else (s + 1).toLong * spanBytes)
        }
      } else {
        Seq(FileSpan(f, 0L, Long.MaxValue))
      }
    }

  /** Greedy size-balanced packing into at most maxParts partitions. */
  def pack(units: Seq[FileSpan], maxParts: Int): Array[InputPartition] = {
    if (units.isEmpty) return Array.empty
    val n = math.max(1, math.min(units.length, maxParts))
    val bins = Array.fill(n)(Vector.newBuilder[FileSpan])
    val weights = new Array[Long](n)
    units.sortBy(-_.length).foreach { u =>
      var best = 0
      var i = 1
      while (i < n) {
        if (weights(i) < weights(best)) best = i
        i += 1
      }
      bins(best) += u
      weights(best) += math.max(u.length, 1L)
    }
    bins.iterator
      .map(b => FilesPartition(b.result().toArray))
      .filter(_.spans.nonEmpty)
      .toArray[InputPartition]
  }
}

case class MetaReaderFactory(
    level: MetaLevel,
    required: StructType,
    conf: SerializableHadoopConf,
    bufferSize: Int,
    pageContent: Boolean,
    ignoreCorrupt: Boolean,
    footerCache: Boolean,
    pathHint: Option[Set[String]] = None) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val spans = partition.asInstanceOf[FilesPartition].spans
    new MetaPartitionReader(spans, level, required, conf.value, bufferSize, pageContent,
      ignoreCorrupt, footerCache, pathHint)
  }
}
