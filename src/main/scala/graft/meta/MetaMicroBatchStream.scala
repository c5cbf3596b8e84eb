package graft.meta

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType

/**
 * Offset for the streaming metadata source: the maximum `(mtime, path)` key
 * observed so far, ordered lexicographically. Append-only semantics: a
 * micro-batch consists of every listed file whose key is greater than the
 * previous offset.
 */
case class FileKeyOffset(mtime: Long, path: String) extends Offset {
  override def json(): String =
    s"""{"mtime":$mtime,"path":${graft.Json.str(path)}}"""

  def lessThan(o: FileKeyOffset): Boolean =
    mtime < o.mtime || (mtime == o.mtime && path < o.path)
}

object FileKeyOffset {
  val Initial: FileKeyOffset = FileKeyOffset(Long.MinValue, "")

  def of(f: FileSlice): FileKeyOffset = FileKeyOffset(f.mtime, f.path)

  /** Parse the controlled json() form back (inverse of Json.str escaping). */
  def fromJson(s: String): FileKeyOffset = {
    val mtime = s.split("\"mtime\":")(1).takeWhile(c => c == '-' || c.isDigit).toLong
    val raw = s.substring(s.indexOf("\"path\":") + 8, s.lastIndexOf("\"}"))
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      raw(i) match {
        case '\\' if i + 1 < raw.length =>
          raw(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' => sb += Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    FileKeyOffset(mtime, sb.toString)
  }
}

/**
 * Streaming metadata source: `spark.readStream.format("metadata")` watches
 * the root path and emits each level's rows for NEWLY ARRIVED files every
 * micro-batch. Each `latestOffset` re-lists the path (bypassing the
 * file-status cache); a batch is the files whose `(mtime, path)` key falls
 * in `(start, end]`, planned with the same span-splitting and size-balanced
 * packing as the batch scan.
 *
 * Semantics are append-only, like a log-less file stream: a file that
 * arrives with a key at or below the committed offset (backdated mtime) is
 * not replayed, and rewriting an existing file re-emits it under its new
 * mtime. Exactly the trade-off of monitoring a growing table directory.
 */
class MetaMicroBatchStream(table: MetaTable, required: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def listing(): Seq[FileSlice] =
    if (table.level == MetaLevel.DeltaSnapshot) {
      // a delta COMMIT stream: each micro-batch is the newly arrived
      // log segments (the log is append-only by protocol)
      DeltaMeta.listLogSlices(table.rootPath,
        table.spark.sessionState.newHadoopConf())
    } else if (table.level == MetaLevel.IcebergSnapshot) {
      IcebergMeta.listMetadataSlices(table.rootPath,
        table.spark.sessionState.newHadoopConf())
    } else if (table.level == MetaLevel.HudiTimeline) {
      // a hudi TIMELINE stream: each micro-batch is the newly arrived
      // instant files (the timeline is append-only by protocol)
      HudiMeta.listTimelineSlices(table.rootPath,
        table.spark.sessionState.newHadoopConf())
    } else {
      MetaTable.listSlices(table.spark, table.rootPath, table.options, fresh = true)
    }

  // The listing observed by the last latestOffset(), reused by the
  // subsequent planInputPartitions so a batch is planned from the exact
  // snapshot that produced its end offset (and the directory is listed once
  // per trigger, not twice). A checkpoint-recovered replay after a restart
  // has no snapshot and re-lists — the documented append-only caveat.
  @volatile private var lastSnapshot: (FileKeyOffset, Seq[FileSlice]) = null

  // Offsets must never move backwards: a transiently empty or lagging
  // listing (object-store eventual consistency, compaction windows) would
  // otherwise rewind and re-emit the whole directory.
  @volatile private var highWater: FileKeyOffset = FileKeyOffset.Initial

  /**
   * Settle lag: the newest mtime granule is only emitted once the wall
   * clock has passed it by this much, closing the race where two files
   * share an mtime and a listing lands between their creations (the later
   * same-mtime file would otherwise be below the committed offset forever).
   * On an immediately consistent filesystem, once `now > mtime + lag`, every
   * file with that mtime already exists and is listed. Tunable via the
   * `streamlagms` option (tests use 0).
   */
  private val lagMs: Long =
    table.options.get("streamlagms").map(_.toLong).getOrElse(2000L)

  /** Per-trigger file cap (backfill pacing), like maxFilesPerTrigger. */
  private val maxFilesPerTrigger: Option[Int] =
    table.options.get("maxfilespertrigger").map(_.toInt)

  /** Fixed end target once Trigger.AvailableNow prepares the run. */
  @volatile private var availableNowTarget: FileKeyOffset = null

  override def initialOffset(): Offset = FileKeyOffset.Initial

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  override def prepareForTriggerAvailableNow(): Unit = {
    // Snapshot the end of the run: AvailableNow drains everything settled
    // at start time across (possibly rate-limited) batches, then stops.
    availableNowTarget = advanceHighWater()
  }

  override def reportLatestOffset(): Offset = highWater

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target =
      if (availableNowTarget != null) availableNowTarget else advanceHighWater()
    limit match {
      case m: ReadMaxFiles =>
        // cap the batch at the first maxFiles keys past start
        val lo = start.asInstanceOf[FileKeyOffset]
        val snap = lastSnapshot
        val files = if (snap != null) snap._2 else listing()
        val pending = files
          .map(FileKeyOffset.of)
          .filter(k => lo.lessThan(k) && !target.lessThan(k))
          .sortBy(k => (k.mtime, k.path))
        if (pending.isEmpty) target
        else pending.take(m.maxFiles).lastOption.getOrElse(target)
      case _ => target
    }
  }

  /** List, advance the monotonic high-water mark, snapshot the listing. */
  private def advanceHighWater(): FileKeyOffset = {
    val files = listing()
    val cutoff = System.currentTimeMillis() - lagMs
    val settled = files.filter(_.mtime <= cutoff)
    val maxKey =
      if (settled.isEmpty) FileKeyOffset.Initial
      else settled.map(FileKeyOffset.of).maxBy(o => (o.mtime, o.path))
    if (highWater.lessThan(maxKey)) highWater = maxKey
    lastSnapshot = (highWater, files)
    highWater
  }

  override def deserializeOffset(json: String): Offset = FileKeyOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[FileKeyOffset]
    val hi = end.asInstanceOf[FileKeyOffset]
    val snap = lastSnapshot
    // reuse the trigger's snapshot whenever it covers this batch's end
    // (rate-limited batches end below the snapshot's high-water mark)
    val files = if (snap != null && !snap._1.lessThan(hi)) snap._2 else listing()
    val batch = files.filter { f =>
      val k = FileKeyOffset.of(f)
      lo.lessThan(k) && !hi.lessThan(k)
    }
    MetaScan.pack(MetaScan.spanify(batch, table.level, table.spanBytes), table.maxParts)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(table.spark.sessionState.newHadoopConf())
    MetaReaderFactory(table.level, required, conf, table.bufferSize, table.pageContent,
      table.ignoreCorrupt, table.footerCache)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
