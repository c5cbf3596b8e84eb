package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Apache Hudi COPY-ON-WRITE metadata tier (the public table spec:
 * hudi.apache.org/tech-specs) — the same lake-planning surface the
 * Delta/Iceberg tiers expose, for Hudi's timeline layout: a `.hoodie/`
 * directory of INSTANT files (`<instant>.<action>[.<state>]`; a bare
 * `<instant>.commit` is the COMPLETED state) and base parquet files
 * named `<fileId>_<writeToken>_<instant>.parquet` grouped into FILE
 * GROUPS by fileId, where each commit's JSON metadata declares the
 * file slices it wrote (`partitionToWriteStats`). Resolution here is
 * COMMIT-METADATA-driven, never a directory listing: the live view at
 * an instant is, per file group, the latest declared slice whose
 * commit completed at or before it — so orphaned base files from
 * failed writes are invisible by construction, exactly as Hudi's own
 * timeline-filtered readers guarantee.
 *
 * Reference scope note: the reference explores parquet file metadata
 * only (`/root/reference/src/main/scala/com/github/sadikovi/metadata/
 * DefaultSource.scala:20-60`); this tier extends the repo's
 * lake-format family (Delta/Iceberg) with Hudi along the same
 * metadata-cost axes.
 *
 * Scale posture: the timeline is a driver-bounded file listing (one
 * name per instant, the same boundary every timeline consumer has);
 * commit-metadata JSON decodes fan out one task per completed commit;
 * nothing data-sized visits the driver.
 */
object HudiMeta extends Serializable {

  /** True if `root` looks like a Hudi table (a `.hoodie/
    * hoodie.properties` marker). */
  def isHudiTable(root: Path, conf: Configuration): Boolean = {
    val fs = root.getFileSystem(conf)
    fs.exists(new Path(new Path(root, ".hoodie"), "hoodie.properties"))
  }

  /** One timeline instant: time (the REQUEST time — the id file
    * slices embed), action, state, the 1.x completion time when the
    * name carries one, and the instant file's path relative to
    * `.hoodie/` (0.x: `<instant>.<action>`; 1.x:
    * `timeline/<begin>_<end>.<action>`). */
  private[meta] case class HudiInstant(
      instant: String, action: String, state: String,
      completionTime: Option[String] = None, relFile: String = "")

  private val instantRe =
    """^(\d+)\.([a-z]+)(?:\.(requested|inflight))?$""".r

  /** Hudi 1.x (table version 8) names COMPLETED instants with their
    * completion time: `<beginTime>_<endTime>.<action>` — begin is the
    * request time (the slice id), end orders visibility. */
  private val v1xCompletedRe = """^(\d+)_(\d+)\.([a-z]+)$""".r

  /** Hudi writes COMMIT-inflight markers as a bare `<instant>.inflight`
    * (no action token) — without this case the generic parse would
    * read action='inflight', state='completed': a wrong COMPLETED row
    * in the timeline. */
  private val bareInflightRe = """^(\d+)\.inflight$""".r

  /** Where the ACTIVE timeline lives: `.hoodie/timeline/` when the
    * 1.x layout directory exists (table version 8 moved the active
    * timeline there; `.hoodie/timeline/history/` is the archived LSM,
    * a subdirectory the file-only listing never reads), else
    * `.hoodie/` (0.x). Returns the subpath prefix for relFile. */
  private def timelinePrefix(root: Path, conf: Configuration): String = {
    val fs = root.getFileSystem(conf)
    val tdir = new Path(new Path(root, ".hoodie"), "timeline")
    if (fs.exists(tdir) && fs.getFileStatus(tdir).isDirectory) "timeline/"
    else ""
  }

  /** Open and parse one instant's commit-metadata JSON body, refusing
    * garbage CLASSIFIED with the file named (r17 VERDICT): commit
    * bodies are untrusted input the moment a table written by another
    * engine is opened, and a corrupt `<instant>.commit` must surface
    * as the repo's standard refusal — never a raw Jackson exception
    * escaping an executor task. Runs wherever the decode runs (driver
    * or executor fan-out). */
  private[meta] def readCommitNode(
      fs: org.apache.hadoop.fs.FileSystem,
      f: Path): com.fasterxml.jackson.databind.JsonNode = {
    val in = fs.open(f)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      catch {
        // CharConversionException: jackson's encoding sniffer throws
        // it (a plain java.io exception, NOT a JacksonException) on
        // garbage that looks like a UCS-4 BOM — fuzz-found, same
        // refusal class
        case e @ (_: com.fasterxml.jackson.core.JacksonException |
            _: java.io.CharConversionException) =>
          throw new IllegalArgumentException(
            s"$f: unparseable commit metadata JSON — refusing rather " +
              s"than mis-reading the timeline (${String.valueOf(e.getMessage)
                .linesIterator.nextOption().getOrElse("")})")
      } finally in.close()
    if (node == null || !node.isObject) {
      throw new IllegalArgumentException(
        s"$f: commit metadata is empty or not a JSON object — refusing " +
          "rather than treating the commit as empty")
    }
    node
  }

  /** The parsed `.hoodie` timeline, instant-ordered. Non-instant
    * files (hoodie.properties, metadata dirs) are skipped; an
    * unparseable instant-LIKE name refuses (a misread timeline
    * silently changes what "live" means). */
  private[meta] def timeline(
      root: Path, conf: Configuration): Seq[HudiInstant] = {
    val hoodie = new Path(root, ".hoodie")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(new Path(hoodie, "hoodie.properties"))) {
      throw new IllegalArgumentException(
        s"$root: no .hoodie/hoodie.properties — not a Hudi table")
    }
    val prefix = timelinePrefix(root, conf)
    val dir = if (prefix.isEmpty) hoodie else new Path(hoodie, "timeline")
    fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
      .filterNot(_ == "hoodie.properties")
      .flatMap { name =>
        (name match {
          case bareInflightRe(t) =>
            Some(HudiInstant(t, "commit", "inflight"))
          case v1xCompletedRe(begin, end, action) =>
            Some(HudiInstant(begin, action, "completed", Some(end)))
          case instantRe(t, action, state) =>
            Some(HudiInstant(t, action,
              Option(state).getOrElse("completed")))
          case other if other.headOption.exists(_.isDigit) =>
            throw new IllegalArgumentException(
              s"$root: unparseable timeline file '$other' — refusing " +
                "rather than mis-reading the timeline")
          case _ => None
        }).map(_.copy(relFile = prefix + name))
      }
      .sortBy(i => (i.instant, i.action, i.state))
      .toSeq
  }

  /** Refuse a 1.x timeline whose completions are out of REQUEST
    * order: two overlapping writers completed inversely (non-blocking
    * concurrency control), and this tier's request-time slice
    * supersession would resolve their file groups wrongly. Linear
    * histories — completion order equal to request order — resolve
    * exactly as 0.x. */
  private def requireLinearCompletions(
      root: Path, writes: Seq[HudiInstant]): Unit = {
    val timed = writes.filter(_.completionTime.isDefined)
      .sortBy(_.instant)
    timed.sliding(2).foreach {
      case Seq(a, b) if a.completionTime.get > b.completionTime.get =>
        throw new UnsupportedOperationException(
          s"$root: instants ${a.instant} and ${b.instant} completed out " +
            "of request order (non-blocking concurrency control) — " +
            "completion-time slice resolution is not modeled; refusing " +
            "rather than resolving overlapping writers' file groups " +
            "wrongly")
      case _ => ()
    }
  }

  /** Completed visibility-affecting write instants at or before
    * `asOf` (all, when None), as `(instant, action)`: `commit` writes
    * and `replacecommit` replacements (clustering / insert-overwrite,
    * modeled r17 — see [[replacedGroups]]). `restore` and (on the
    * COW-only surfaces) `deltacommit` refuse; table-service actions
    * that cannot grow or shrink the live set (`clean`, `rollback`)
    * pass through, but time travel behind a completed clean refuses
    * (cleaned slices are gone from disk). */
  private def completedCommits(
      root: Path, tl: Seq[HudiInstant],
      asOf: Option[String]): Seq[HudiInstant] = {
    val completed = tl.filter(_.state == "completed")
    completed.find(i => Set("restore", "deltacommit").contains(i.action))
      .foreach { i =>
        throw new UnsupportedOperationException(
          s"$root: timeline carries a completed ${i.action} " +
            s"(${i.instant}) — " +
            (if (i.action == "deltacommit")
              "merge-on-read log files are not modeled here; refusing " +
                "rather than reading a base file whose rows a log " +
                "supersedes (use the MOR tier: morFileGroups/morCensus)"
             else
               "restore rewrites visibility in ways this tier does " +
                 "not model; refusing rather than resurrecting files"))
      }
    // `replacecommit` (clustering / insert-overwrite) is MODELED (r17):
    // its write stats declare the new base files and its
    // partitionToReplaceFileIds kills the replaced groups — see
    // [[replacedGroups]].
    val writes = completed
      .filter(i => i.action == "commit" || i.action == "replacecommit")
    requireLinearCompletions(root, writes)
    asOf match {
      case None => writes
      case Some(t) =>
        if (!writes.exists(_.instant == t)) {
          throw new IllegalArgumentException(
            s"$root: no completed commit at instant $t (completed: " +
              s"${writes.map(_.instant).mkString(", ")})")
        }
        // A completed clean DELETED superseded slices from disk; a view
        // older than the newest clean may reference files that no
        // longer exist — refuse up front, never a mid-scan
        // missing-file task failure.
        completed.filter(_.action == "clean").map(_.instant)
          .filter(_ > t).sorted.lastOption.foreach { c =>
            throw new UnsupportedOperationException(
              s"$root: time travel to $t crosses completed clean $c — " +
                "cleaned slices are gone from disk; refusing rather " +
                "than failing on a missing base file")
          }
        writes.filter(_.instant <= t)
    }
  }

  /** FileIds killed by the completed `replacecommit`s among `writes`
    * (clustering / insert-overwrite): fileId → the earliest replacing
    * instant. Each replacecommit's JSON must declare
    * `partitionToReplaceFileIds` (the spec's
    * HoodieReplaceCommitMetadata shape) — a replacecommit that hides
    * what it replaced refuses, never a census that resurrects replaced
    * groups. Driver work is commit-count-bounded (one small JSON per
    * replacecommit), the same boundary class as the timeline itself. */
  private def replacedGroups(
      root: Path, conf: Configuration,
      writes: Seq[HudiInstant]): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    writes.filter(_.action == "replacecommit").sortBy(_.instant).flatMap {
      i =>
        val node = actionNode(root, conf, i.relFile)
        val replaced = Option(node.get("partitionToReplaceFileIds"))
          .getOrElse(throw new IllegalArgumentException(
            s"$root: replacecommit ${i.instant} declares no " +
              "partitionToReplaceFileIds — refusing rather than " +
              "resurrecting replaced file groups"))
        replaced.properties().asScala.flatMap { e =>
          e.getValue.elements().asScala.map(_.asText() -> i.instant)
        }
    }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
  }

  /** Parse one timeline file NAME into `(instant, action, state)` —
    * the `source=hudi, level=timeline` row producer (zero I/O: the
    * timeline encodes its facts in names). Refuses unparseable
    * instant-like names. */
  private[meta] def parseInstantName(
      name: String, where: String): (String, String, String) = name match {
    case bareInflightRe(t) => (t, "commit", "inflight")
    case v1xCompletedRe(begin, _, action) => (begin, action, "completed")
    case instantRe(t, action, state) =>
      (t, action, Option(state).getOrElse("completed"))
    case other => throw new IllegalArgumentException(
      s"$where: unparseable timeline file '$other' — refusing rather " +
        "than mis-reading the timeline")
  }

  /** The `.hoodie` timeline as [[FileSlice]]s for the metadata
    * datasource (batch and streaming): every instant file, named
    * facts decoded by the reader. `hoodie.properties` and nested
    * dirs are not timeline entries. */
  private[meta] def listTimelineSlices(
      root: Path, conf: Configuration): Seq[FileSlice] = {
    val hoodie = new Path(root, ".hoodie")
    val fs = root.getFileSystem(conf)
    if (!fs.exists(new Path(hoodie, "hoodie.properties"))) {
      throw new IllegalArgumentException(
        s"$root: no .hoodie/hoodie.properties — not a Hudi table")
    }
    val dir =
      if (timelinePrefix(root, conf).isEmpty) hoodie
      else new Path(hoodie, "timeline")
    fs.listStatus(dir).filter(_.isFile)
      .filter(st => st.getPath.getName.headOption.exists(_.isDigit))
      .sortBy(_.getPath.getName)
      .map(st => FileSlice(st.getPath.toString, st.getPath.getName,
        st.getLen, st.getModificationTime, Map.empty))
      .toSeq
  }

  /** The TIMELINE report: one row per instant file —
    * `(instant_time, action, state)`. */
  def timelineReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    timeline(root, conf).map(i => (i.instant, i.action, i.state))
      .toDF("instant_time", "action", "state")
  }

  /** The 1.x-aware timeline report: [[timelineReport]] plus the
    * completion time a version-8 name carries (`<begin>_<end>.
    * <action>`; null on requested/inflight files and 0.x names) —
    * completion time is what orders VISIBILITY on a 1.x timeline. */
  def timelineReportFull(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    timeline(root, conf)
      .map(i => (i.instant, i.completionTime, i.action, i.state))
      .toDF("instant_time", "completion_time", "action", "state")
  }

  private def qualified(table: String, conf: Configuration): Path = {
    val p = new Path(table)
    p.getFileSystem(conf).makeQualified(p)
  }

  /** Every file slice DECLARED by the completed commits at or before
    * `asOf`: `(instant_time, partition_path, file_id, path, abs_path,
    * declared_rows)` — one task per commit JSON, decoded with the
    * spec's `partitionToWriteStats` shape. */
  /** Refuse any declared table type except COPY_ON_WRITE: a MOR
    * table's base files are superseded row-wise by its log files —
    * reading them as the truth silently resurrects updated rows. */
  private def requireCowTable(root: Path, conf: Configuration): Unit = {
    val fs = root.getFileSystem(conf)
    val props = new java.util.Properties()
    val in = fs.open(
      new Path(new Path(root, ".hoodie"), "hoodie.properties"))
    try props.load(in) finally in.close()
    val tpe = Option(props.getProperty("hoodie.table.type"))
      .getOrElse("COPY_ON_WRITE")
    if (tpe != "COPY_ON_WRITE") {
      throw new UnsupportedOperationException(
        s"$root: hoodie.table.type is $tpe — only COPY_ON_WRITE " +
          "resolves from base files alone; refusing rather than " +
          "resurrecting log-superseded rows")
    }
  }

  private[meta] def declaredSlices(
      spark: SparkSession, table: String,
      asOf: Option[String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    requireCowTable(root, conf)
    val commits = completedCommits(root, timeline(root, conf), asOf)
      .map(i => (i.instant, i.action, i.relFile))
    if (commits.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no completed commits — nothing is live")
    }
    val rootStr = root.toString
    val sconf = new SerializableHadoopConf(conf)
    commits.toDS().flatMap { case (instant, action, relFile) =>
      val r = new Path(rootStr)
      val fs = r.getFileSystem(sconf.value)
      val f = new Path(new Path(r, ".hoodie"), relFile)
      val node = readCommitNode(fs, f)
      val stats = Option(node.get("partitionToWriteStats")).getOrElse(
        throw new IllegalArgumentException(
          s"$f: commit metadata carries no partitionToWriteStats — " +
            "refusing rather than treating the commit as empty"))
      import scala.jdk.CollectionConverters._
      stats.properties().asScala.flatMap { e =>
        e.getValue.elements().asScala.map { ws =>
          def str(n: String): String = Option(ws.get(n)).map(_.asText())
            .getOrElse(throw new IllegalArgumentException(
              s"$f: write stat missing '$n'"))
          val rel = str("path")
          def lng(n: String): Long = Option(ws.get(n)).map(_.asLong())
            .getOrElse(throw new IllegalArgumentException(
              s"$f: write stat for $rel missing $n"))
          (instant, action, e.getKey, str("fileId"), rel,
            new Path(r, rel).toString, lng("numWrites"),
            lng("totalWriteBytes"))
        }
      }
    }.toDF("instant_time", "action", "partition_path", "file_id", "path",
      "abs_path", "declared_rows", "file_size")
  }

  /**
   * The LIVE file slices at `asOf` (None = the latest completed
   * commit): per FILE GROUP, the latest declared slice — copy-on-write
   * supersession, resolved from commit metadata alone (zero footer or
   * data I/O, orphaned base files invisible by construction) — MINUS
   * the file groups a completed `replacecommit` at or before `asOf`
   * REPLACED (clustering / insert-overwrite, r17: the replaced-ids
   * set is commit-declared, driver-bounded at file-group scale — the
   * same boundary every Hudi reader's replaced-groups filter has).
   * One row per live base file.
   */
  def liveFiles(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val writes = completedCommits(root, timeline(root, conf), asOf)
    val replaced = replacedGroups(root, conf, writes).keySet.toSeq
    val latest = declaredSlices(spark, table, asOf)
      .groupBy(col("file_id"))
      .agg(max_by(
        struct(col("instant_time"), col("partition_path"), col("path"),
          col("abs_path"), col("declared_rows"), col("file_size")),
        col("instant_time")).as("w"))
      .select(col("file_id"), col("w.instant_time").as("instant_time"),
        col("w.partition_path").as("partition_path"),
        col("w.path").as("path"), col("w.abs_path").as("abs_path"),
        col("w.declared_rows").as("declared_rows"),
        col("w.file_size").as("file_size"))
    if (replaced.isEmpty) latest
    else latest.filter(!col("file_id").isInCollection(replaced))
  }

  /**
   * LIVE CENSUS with footer conformance — the numbers a COW reader
   * plans by, cross-checked: each live slice's DECLARED `numWrites`
   * against its parquet footer's own row count (one footer read per
   * live file, distributed). `is_match=false` names a commit that lied
   * about what it wrote. One row per live base file.
   */
  def liveCensus(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val live = liveFiles(spark, table, asOf)
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    val footer = live.select(col("abs_path")).as[String]
      .map { p =>
        (p, Footers.read(new Path(p), conf.value).numRows)
      }.toDF("abs_path", "footer_rows")
    live.join(footer, "abs_path")
      .select(col("file_id"), col("partition_path"), col("path"),
        col("instant_time"), col("declared_rows"), col("footer_rows"),
        (col("declared_rows") === col("footer_rows")).as("is_match"))
  }

  /**
   * INCREMENTAL PULL at metadata cost — Hudi's incremental-query
   * contract: every file slice written by the completed commits in
   * `(fromExclusive, toInclusive]`, one row per slice with its commit
   * attribution. `fromExclusive = "0"` pulls from the beginning (the
   * ingester bootstrap); otherwise BOTH endpoints must be completed
   * commits — a pull anchored on an instant the timeline never
   * completed would silently mis-window. A consumer then reads
   * exactly the returned base files — no re-listing, no re-diffing.
   */
  def incrementalPull(
      spark: SparkSession, table: String,
      fromExclusive: String, toInclusive: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    requireCowTable(root, conf)
    val commits = completedCommits(root, timeline(root, conf), None)
      .map(_.instant)
    def requireCommit(t: String, which: String): Unit =
      if (!commits.contains(t)) {
        throw new IllegalArgumentException(
          s"$table: $which instant $t is not a completed commit " +
            s"(completed: ${commits.mkString(", ")})")
      }
    if (fromExclusive != "0") requireCommit(fromExclusive, "from")
    requireCommit(toInclusive, "to")
    if (fromExclusive >= toInclusive) {
      throw new IllegalArgumentException(
        s"$table: pull window ($fromExclusive, $toInclusive] is empty " +
          "or reversed — no increment to read")
    }
    // a replacecommit in the window changed NO logical rows
    // (clustering rewrites what earlier commits inserted) — its
    // outputs are not increments, exactly as the iceberg changelog
    // skips replace snapshots
    declaredSlices(spark, table, Some(toInclusive))
      .filter(col("instant_time") > fromExclusive &&
        col("action") =!= "replacecommit")
      .drop("action")
  }

  /**
   * ROW-LEVEL COW CHANGE FEED by SLICE DIFF (r18) — a copy-on-write
   * commit rewrites whole base files, so "which rows changed" is not
   * recorded anywhere at row granularity (Hudi's own incremental
   * queries lean on the `_hoodie_commit_time` meta column, which
   * foreign-written or meta-stripped tables lack). This feed derives
   * it from CONTENT: for every file group whose live slice was written
   * in `(fromExclusive, toInclusive]`, full-outer join the new slice
   * against the group's prior slice by record key — value changes and
   * new keys emit `upsert` rows (new values), vanished keys emit
   * `delete` rows (old values — the slice diff knows them, unlike the
   * MOR log's key-only deletes), unchanged rows emit NOTHING. Brand
   * new groups emit all rows as upserts.
   *
   * Refusals: a completed `replacecommit` in the window refuses (a
   * clustering rewrite changes no logical rows — diffing its output
   * against nothing would fabricate inserts); a prior slice already
   * cleaned from disk refuses up front (the diff's baseline is gone).
   *
   * Scale posture: reads exactly the window's rewritten slices plus
   * their immediate predecessors; the diff is one equi-join keyed by
   * (group, record key) over touched-slice rows only — change volume,
   * never table volume.
   */
  def cowIncrementalRows(
      spark: SparkSession, table: String,
      fromExclusive: String, toInclusive: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    requireCowTable(root, conf)
    val keyFields = recordKeyFields(root, conf)
    val writes = completedCommits(root, timeline(root, conf), None)
    def requireCommit(t: String, which: String): Unit =
      if (!writes.exists(_.instant == t)) {
        throw new IllegalArgumentException(
          s"$table: $which instant $t is not a completed commit " +
            s"(completed: ${writes.map(_.instant).mkString(", ")})")
      }
    if (fromExclusive != "0") requireCommit(fromExclusive, "from")
    requireCommit(toInclusive, "to")
    if (fromExclusive >= toInclusive) {
      throw new IllegalArgumentException(
        s"$table: pull window ($fromExclusive, $toInclusive] is empty " +
          "or reversed — no increment to read")
    }
    writes.find(w => w.action == "replacecommit" &&
        w.instant > fromExclusive && w.instant <= toInclusive)
      .foreach { w =>
        throw new UnsupportedOperationException(
          s"$table: completed replacecommit ${w.instant} in the window " +
            "— clustering rewrites change no logical rows, and a slice " +
            "diff across one would fabricate changes; refusing")
      }
    // per group: the live slice at `to`, and the prior slice at `from`
    val newSlices = liveFiles(spark, table, Some(toInclusive))
      .filter(col("instant_time") > fromExclusive)
      .select(col("file_id"), col("path"), col("abs_path"))
    // driver boundary: touched-group path lists (file-group-sized)
    val newList = newSlices.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    if (newList.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no file group was rewritten in ($fromExclusive, " +
          s"$toInclusive] — the window carries no changes")
    }
    val priorAll =
      if (fromExclusive == "0") Array.empty[(String, String, String)]
      else liveFiles(spark, table, Some(fromExclusive))
        .select(col("file_id"), col("path"), col("abs_path"))
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getString(2)))
    val touched = newList.map(_._1).toSet
    val priorList = priorAll.filter(t => touched.contains(t._1))
    val fs = root.getFileSystem(conf)
    firstMissingFromDisk(fs, priorList.map(t => new Path(t._3)).toSeq)
      .foreach { p =>
        val t = priorList.find(x => new Path(x._3) == p).get
        throw new UnsupportedOperationException(
          s"$table: prior slice ${t._2} of rewritten group ${t._1} is " +
            "gone from disk (cleaned) — the diff's baseline is missing; " +
            "refusing rather than reporting its rows as inserts")
      }
    val newSchema = spark.read.parquet(newList.head._3).schema
    requireNoReservedColumns(table, newSchema)
    // a SCHEMA-EVOLVED window (column added/dropped/retyped between
    // `from` and `to`) cannot diff: the prior slices lack the new
    // column (or carry a dropped one the diff would silently ignore).
    // Classified refusal up front instead of a raw planner error
    // (r19, ADVICE).
    if (priorList.nonEmpty) {
      val priorSchema =
        spark.read.parquet(priorList.map(_._3): _*).schema
      val pr = priorSchema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
      val nw = newSchema.fields
        .map(f => f.name -> f.dataType.simpleString).toMap
      if (pr != nw) {
        val added = (nw.keySet -- pr.keySet).toSeq.sorted
        val dropped = (pr.keySet -- nw.keySet).toSeq.sorted
        val retyped = nw.keySet.intersect(pr.keySet).toSeq.sorted
          .filter(k => nw(k) != pr(k))
          .map(k => s"$k: ${pr(k)} -> ${nw(k)}")
        throw new UnsupportedOperationException(
          s"$table: the pull window ($fromExclusive, $toInclusive] " +
            "crosses a schema change (added: [" +
            added.mkString(", ") + "], dropped: [" +
            dropped.mkString(", ") + "], retyped: [" +
            retyped.mkString(", ") + "]) — a slice diff across " +
            "evolved schemas cannot classify row changes; refusing")
      }
    }
    def readSlices(list: Seq[(String, String, String)]): DataFrame = {
      val byName = list.map { case (fid, rel, _) =>
        (rel.substring(rel.lastIndexOf('/') + 1), fid)
      }
      import spark.implicits._
      spark.read.parquet(list.map(_._3): _*)
        .withColumn("__name",
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
        .join(broadcast(byName.toDF("__name", "file_id")), "__name")
        .withColumn("__key", keyColumn(keyFields))
        .drop("__name")
    }
    val newRows = readSlices(newList.toSeq)
    val dataCols = newRows.columns.toSeq
      .filterNot(Set("file_id", "__key"))
    val dataFields = newRows.schema.fields
      .filter(f => dataCols.contains(f.name)).toSeq
    requireKeyFields(table, keyFields, dataCols)
    val n = newRows.select(Seq(col("file_id"), col("__key"),
      struct(dataCols.map(col): _*).as("__new")): _*)
    val diffed =
      if (priorList.isEmpty) {
        n.select(Seq(lit("upsert").as("change_type"),
          col("__key").as("record_key")) ++
          dataCols.map(c => col(s"__new.$c").as(c)): _*)
      } else {
        val o = readSlices(priorList.toSeq)
          .select(Seq(col("file_id"), col("__key"),
            struct(dataCols.map(col): _*).as("__old")): _*)
        val j = n.join(o, Seq("file_id", "__key"), "full_outer")
        val upserts = j
          .filter(col("__new").isNotNull &&
            !(col("__new") <=> col("__old")))
          .select(Seq(lit("upsert").as("change_type"),
            col("__key").as("record_key")) ++
            dataCols.map(c => col(s"__new.$c").as(c)): _*)
        val deletes = j.filter(col("__new").isNull)
          .select(Seq(lit("delete").as("change_type"),
            col("__key").as("record_key")) ++
            dataCols.map(c => col(s"__old.$c").as(c)): _*)
        upserts.unionByName(deletes)
      }
    diffed
  }

  /**
   * CLEAN plan at metadata cost — Hudi's KEEP_LATEST_FILE_VERSIONS
   * cleaner policy answered BEFORE deleting anything: per file group,
   * every declared slice past the newest `retainVersions` is
   * reclaimable (a COW rewrite supersedes the group's older slices;
   * readers time-traveling further back than the retained window lose
   * those instants — exactly the cleaner's documented trade). One row
   * per reclaimable slice. `retainVersions < 1` refuses (a plan that
   * reclaims the LIVE slice destroys the table). Undeclared files are
   * never planned here — the cleaner only touches what commits wrote
   * ([[orphanReport]] is the undeclared-file surface).
   */
  def cleanPlan(
      spark: SparkSession, table: String, retainVersions: Int): DataFrame = {
    if (retainVersions < 1) {
      throw new IllegalArgumentException(
        s"$table: retainVersions=$retainVersions would reclaim live " +
          "slices — refusing")
    }
    import org.apache.spark.sql.expressions.Window
    requireNoSavepoints(
      qualified(table, spark.sessionState.newHadoopConf()),
      spark.sessionState.newHadoopConf(), "a clean plan")
    declaredSlices(spark, table, None)
      .withColumn("newer",
        row_number().over(Window.partitionBy(col("file_id"))
          .orderBy(col("instant_time").desc)))
      .filter(col("newer") > retainVersions)
      .select(col("file_id"), col("partition_path"), col("path"),
        col("instant_time"), col("declared_rows"))
  }

  /**
   * MOR CLEAN PLAN at metadata cost (r19) — the cleaner question for
   * MERGE-ON-READ: per file group, every declared BASE slice past the
   * newest `retainVersions` is reclaimable ('superseded' — a
   * compaction's new base supersedes it) AND TAKES ITS ATTACHED LOG
   * CHAIN WITH IT (logs join their base slice by `(file_id,
   * base_instant)` — a log whose base is reclaimed serves no reader);
   * every slice of a group a completed `replacecommit` killed is
   * reclaimable outright ('replaced' — clustering's own cleanup
   * class). One row per reclaimable file, base or log:
   * `(file_id, partition_path, path, is_log, base_instant,
   * declared_rows, reason)`. `retainVersions < 1` refuses (a plan
   * reclaiming the LIVE slice destroys the table). Undeclared files
   * are never planned — the cleaner only touches what commits wrote
   * ([[orphanReport]] owns the rest).
   */
  def morCleanPlan(
      spark: SparkSession, table: String,
      retainVersions: Int): DataFrame = {
    if (retainVersions < 1) {
      throw new IllegalArgumentException(
        s"$table: retainVersions=$retainVersions would reclaim live " +
          "slices — refusing")
    }
    import org.apache.spark.sql.expressions.Window
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    requireNoSavepoints(root, conf, "a clean plan")
    val replaced = replacedGroups(root, conf,
      completedMorInstants(root, timeline(root, conf), None)
        .filter(_.action == "replacecommit")).keySet.toSeq
    val w = morDeclaredWrites(spark, table, None)
    val (replacedWrites, liveGroupWrites) =
      if (replaced.isEmpty) (None, w)
      else (Some(w.filter(col("file_id").isInCollection(replaced))),
        w.filter(!col("file_id").isInCollection(replaced)))
    val bases = liveGroupWrites.filter(!col("is_log"))
      .withColumn("newer",
        row_number().over(Window.partitionBy(col("file_id"))
          .orderBy(col("instant_time").desc)))
    val reclaimBases = bases.filter(col("newer") > retainVersions)
      .select(col("file_id"), col("partition_path"), col("path"),
        col("is_log"), col("base_instant"), col("declared_rows"))
    // the reclaimed slices' log chains ride along — the semi join's
    // build side is (reclaimed-slice)-sized, broadcast
    val reclaimLogs = liveGroupWrites.filter(col("is_log"))
      .join(broadcast(reclaimBases
          .select(col("file_id"), col("base_instant"))),
        Seq("file_id", "base_instant"), "left_semi")
      .select(col("file_id"), col("partition_path"), col("path"),
        col("is_log"), col("base_instant"), col("declared_rows"))
    val superseded = reclaimBases.unionByName(reclaimLogs)
      .withColumn("reason", lit("superseded"))
    replacedWrites match {
      case None => superseded
      case Some(rw) => superseded.unionByName(
        rw.select(col("file_id"), col("partition_path"), col("path"),
          col("is_log"), col("base_instant"), col("declared_rows"))
          .withColumn("reason", lit("replaced")))
    }
  }

  /** A completed SAVEPOINT pins its instant's files against cleaning
    * (the public savepoint contract) — its protection set lives in
    * the savepoint JSON this tier does not decode, so any reclaim
    * plan over a savepointed table REFUSES by name rather than
    * planning a reclaim that may violate the pin (r19). */
  private def requireNoSavepoints(
      root: Path, conf: Configuration, what: String): Unit =
    timeline(root, conf)
      .find(i => i.action == "savepoint" && i.state == "completed")
      .foreach { i =>
        throw new UnsupportedOperationException(
          s"$root: completed savepoint ${i.instant} pins files " +
            s"against cleaning, and its protection set (the savepoint " +
            "JSON) is not modeled — refusing " + what +
            " that could violate the pin")
      }

  /**
   * ORPHAN report — base files ON DISK that no completed commit
   * declares (failed-write leftovers; the timeline-filtered live view
   * never reads them, but they cost storage until removed): the
   * distributed footer listing of the table's partition dirs
   * anti-joined against every declared slice. One row per orphan with
   * its footer row count. The `.hoodie` dir is hidden from the
   * listing by name, so timeline files never appear.
   */
  def orphanReport(spark: SparkSession, table: String): DataFrame = {
    val declared = declaredSlices(spark, table, None)
      .select(col("abs_path")).distinct()
    val disk = spark.read.format("metadata")
      .option("source", "parquet").option("level", "file")
      .load(table)
      .select(col("filepath"), col("filename"), col("num_rows"))
    disk.join(declared, disk("filepath") === declared("abs_path"),
        "left_anti")
      .select(col("filename"), col("num_rows"))
  }

  /**
   * PARTITION-pruned planning at metadata cost: "which live files
   * serve partition X" answered from the commits' declared
   * `partitionPath` alone, then (via [[readPartitionPruned]]) a read
   * that touches ONLY those files. Refuses a partition no commit ever
   * wrote (a typo'd partition must not read as a legitimately-empty
   * one). The surviving-path collect is the bounded,
   * partition-sized driver boundary every pruned-read path here has.
   */
  def partitionPrunedFiles(
      spark: SparkSession, table: String, partition: String): DataFrame = {
    val live = liveFiles(spark, table)
    val matching = live.filter(col("partition_path") === partition)
    // the happy path collects NOTHING (at 100k partitions the known
    // list is a 100k-string driver array); the full declared list is
    // only materialized to name the refusal
    if (matching.limit(1).count() == 0) {
      val known = live.select(col("partition_path")).distinct()
        .collect().map(_.getString(0)).sorted
      throw new IllegalArgumentException(
        s"$table: no live partition '$partition' (declared: " +
          s"${known.mkString(", ")})")
    }
    matching
  }

  /** The executable form of [[partitionPrunedFiles]]: scan exactly
    * the surviving base files. */
  def readPartitionPruned(
      spark: SparkSession, table: String, partition: String): DataFrame = {
    val paths = partitionPrunedFiles(spark, table, partition)
      .select(col("abs_path")).collect().map(_.getString(0)).toSeq
    spark.read.parquet(paths: _*)
  }

  /** The avro writer schema a commit declared in its
    * `extraMetadata.schema`, as top-level field names. None when the
    * commit carries no schema. */
  private def declaredFields(
      node: com.fasterxml.jackson.databind.JsonNode): Option[Seq[String]] =
    Option(node.get("extraMetadata")).flatMap(m => Option(m.get("schema")))
      .map { s =>
        import scala.jdk.CollectionConverters._
        new org.apache.avro.Schema.Parser().parse(s.asText())
          .getFields.asScala.map(_.name()).toSeq
      }

  /** The JSON body of one completed instant's metadata file
    * (`<instant>.<action>`). */
  private def actionNode(
      root: Path, conf: Configuration,
      relFile: String): com.fasterxml.jackson.databind.JsonNode =
    readCommitNode(root.getFileSystem(conf),
      new Path(new Path(root, ".hoodie"), relFile))

  /**
   * SCHEMA HISTORY from the commits' own `extraMetadata.schema` (the
   * avro writer schema Hudi stamps into each commit): one row per
   * completed commit — `(instant_time, n_fields, fields_csv)`; a
   * commit without a declared schema surfaces with nulls (no
   * evidence), never dropped. Timeline-sized driver work.
   */
  def schemaHistory(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val commits = completedCommits(root, timeline(root, conf), None)
    if (commits.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no completed commits — no schema history")
    }
    commits.map { i =>
      val fields = declaredFields(actionNode(root, conf, i.relFile))
      (i.instant, fields.map(_.size), fields.map(_.mkString(",")))
    }.toDF("instant_time", "n_fields", "fields_csv")
  }

  /**
   * SCHEMA CONFORMANCE — the [[IcebergMeta.schemaConformance]] /
   * DeltaMeta analog for Hudi: the LATEST completed commit's declared
   * avro fields vs each LIVE base file's own footer fields (one
   * footer-facts pass over the data tree, live membership by the
   * commit-metadata resolution). Old slices predating a schema
   * evolution surface with the new fields in `missing_csv` — the
   * backfill question evolution leaves behind. Refuses when the
   * latest commit declares no schema (nothing to conform to).
   */
  def schemaConformance(spark: SparkSession, table: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val commits = completedCommits(root, timeline(root, conf), None)
    if (commits.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no completed commits — nothing live to audit")
    }
    val newest = commits.maxBy(_.instant)
    val declared = declaredFields(actionNode(root, conf, newest.relFile))
      .getOrElse(throw new IllegalArgumentException(
        s"$table: commit ${newest.instant} declares no " +
          "extraMetadata.schema — nothing to conform to"))
    val live = liveFiles(spark, table).select(col("abs_path"))
    val present = MetaValues.schemaFactsDf(spark, root.toString)
      .select(col("filepath"),
        split(col("path"), "\\.").getItem(0).as("field"))
      .distinct()
    live.join(present, live("abs_path") === present("filepath"), "left")
      .groupBy(col("abs_path").as("path"))
      .agg(collect_set(col("field")).as("present"))
      .select(col("path"),
        lit(declared.size).as("n_declared"),
        when(size(col("present")) === 0, lit(null))
          .otherwise(size(col("present"))).cast("int").as("n_present"),
        when(size(col("present")) === 0, lit(null).cast("string"))
          .otherwise(array_join(array_sort(array_except(
            lit(declared.toArray), col("present"))), ","))
          .as("missing_csv"))
  }

  /**
   * STREAMING INCREMENTAL-INGEST store — the streaming twin of
   * [[incrementalPull]]: one `Trigger.AvailableNow` pass of the
   * TIMELINE stream (`source=hudi, level=timeline`); each micro-batch
   * carries exactly the newly arrived instant files, and every new
   * COMPLETED commit lands its own declared slices as an idempotent
   * `inc_<instant>` increment (re-delivery overwrites the same
   * subdir; already-seen timeline files never re-trigger,
   * checkpointed). An ingester tails [[readIncrementsStore]] and
   * touches each arriving base file once.
   */
  def maintainIncrementsStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "hudi").option("level", "timeline")
      .option("streamlagms", "0").load(table)
    val q = src.select("instant_time", "action", "state")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // timeline-sized driver boundary (instant names, not slices)
        val completed = batch.collect()
          .filter(r => r.getString(1) == "commit" &&
            r.getString(2) == "completed")
          .map(_.getString(0)).sorted
        if (completed.nonEmpty) {
          val store = new java.io.File(storeDir)
          store.mkdirs()
          StoreIO.sweepTemp(store)
          // only COMPLETED (renamed-into-place) increments count; a
          // foreign inc_* name refuses rather than mis-reading state
          val seen = StoreIO.parseIds(store, "inc").toSet
          StoreIO.publishConcurrently(completed.filterNot(seen.contains)) { c =>
            StoreIO.publishIncrement(
              declaredSlices(spark, table, Some(c))
                .filter(col("instant_time") === c).drop("action"),
              store, s"inc_$c")
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Every increment row of a [[maintainIncrementsStore]] store. */
  def readIncrementsStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir + "/inc_*")

  /**
   * STREAMING MOR INCREMENTAL-INGEST store — the merge-on-read twin of
   * [[maintainIncrementsStore]]: each newly COMPLETED write instant
   * (`deltacommit` or `commit`) lands its declared writes — base
   * parquet AND log files, the [[morIncrementalPull]] row shape — as
   * an idempotent crash-safe `inc_<instant>` increment
   * ([[StoreIO.publishIncrement]]). A MOR ingester tails
   * [[readMorIncrementsStore]], reads each arriving base file once and
   * merges arriving logs itself (declared counts are the planning
   * surface, per the tier note).
   */
  def maintainMorIncrementsStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "hudi").option("level", "timeline")
      .option("streamlagms", "0").load(table)
    val q = src.select("instant_time", "action", "state")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // timeline-sized driver boundary (instant names, not slices)
        val completed = batch.collect()
          .filter(r => (r.getString(1) == "commit" ||
            r.getString(1) == "deltacommit") &&
            r.getString(2) == "completed")
          .map(_.getString(0)).sorted
        if (completed.nonEmpty) {
          val store = new java.io.File(storeDir)
          store.mkdirs()
          StoreIO.sweepTemp(store)
          val seen = StoreIO.parseIds(store, "inc").toSet
          StoreIO.publishConcurrently(completed.filterNot(seen.contains)) { c =>
            StoreIO.publishIncrement(
              morDeclaredWrites(spark, table, Some(c))
                .filter(col("instant_time") === c)
                .select(col("instant_time"), col("partition_path"),
                  col("file_id"), col("path"), col("is_log"),
                  col("base_instant"), col("declared_rows"),
                  col("file_size")),
              store, s"inc_$c")
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Every increment row of a [[maintainMorIncrementsStore]] store. */
  def readMorIncrementsStore(
      spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir + "/inc_*")

  /**
   * STREAMING ROW-LEVEL MOR CHANGE-FEED store — the streaming twin of
   * [[morIncrementalRows]] (and the Hudi sibling of the iceberg
   * changelog store): one `Trigger.AvailableNow` pass of the timeline
   * stream; each newly COMPLETED write instant lands ITS OWN
   * row-level change increment (`inc_<instant>`, crash-safe via
   * [[StoreIO.publishIncrement]]) computed over the single-instant
   * window `(previous write, instant]` — so per-instant attribution
   * survives multi-instant micro-batch jumps, exactly like the
   * iceberg store's per-snapshot walk. The FIRST write instant lands
   * as the bootstrap (`from="0"`: the merged view then, no deletes).
   * Re-delivered instants never re-land (names are the ledger).
   */
  def maintainMorChangesStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "hudi").option("level", "timeline")
      .option("streamlagms", "0").load(table)
    val q = src.select("instant_time", "action", "state")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // timeline-sized driver boundary (instant names, not rows)
        val arrived = batch.collect()
          .filter(r => (r.getString(1) == "commit" ||
            r.getString(1) == "deltacommit") &&
            r.getString(2) == "completed")
          .map(_.getString(0)).sorted
        if (arrived.nonEmpty) {
          val store = new java.io.File(storeDir)
          store.mkdirs()
          StoreIO.sweepTemp(store)
          val seen = StoreIO.parseIds(store, "inc").toSet
          // the table's FULL completed write order gives each arrived
          // instant its true predecessor, even across batch jumps
          val conf = spark.sessionState.newHadoopConf()
          val root = qualified(table, conf)
          val allWrites = completedMorInstants(root, timeline(root, conf),
            None).map(_.instant).sorted
          StoreIO.publishConcurrently(arrived.filterNot(seen.contains)) { inst =>
            val prev = allWrites.takeWhile(_ < inst).lastOption
              .getOrElse("0")
            StoreIO.publishIncrement(
              morIncrementalRows(spark, table, prev, inst)
                .withColumn("instant_time", lit(inst)),
              store, s"inc_$inst")
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Every change row of a [[maintainMorChangesStore]] store. */
  def readMorChangesStore(
      spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir + "/inc_*")

  /**
   * STREAMING COW CHANGE-FEED store — the copy-on-write twin of
   * [[maintainMorChangesStore]], backed by the SLICE DIFF
   * ([[cowIncrementalRows]]): each newly COMPLETED commit lands its
   * own row-level change increment over the single-commit window
   * `(previous commit, commit]` (per-instant attribution across batch
   * jumps; the first commit lands as the bootstrap). The store must
   * be maintained BEFORE the cleaner reclaims prior slices — a
   * cleaned diff baseline refuses rather than fabricating inserts
   * (the [[cowIncrementalRows]] contract).
   */
  def maintainCowChangesStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "hudi").option("level", "timeline")
      .option("streamlagms", "0").load(table)
    val q = src.select("instant_time", "action", "state")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val arrived = batch.collect()
          .filter(r => r.getString(1) == "commit" &&
            r.getString(2) == "completed")
          .map(_.getString(0)).sorted
        if (arrived.nonEmpty) {
          val store = new java.io.File(storeDir)
          store.mkdirs()
          StoreIO.sweepTemp(store)
          val seen = StoreIO.parseIds(store, "inc").toSet
          val conf = spark.sessionState.newHadoopConf()
          val root = qualified(table, conf)
          val allWrites = completedCommits(root, timeline(root, conf),
            None).map(_.instant).sorted
          StoreIO.publishConcurrently(arrived.filterNot(seen.contains)) { inst =>
            val prev = allWrites.takeWhile(_ < inst).lastOption
              .getOrElse("0")
            StoreIO.publishIncrement(
              cowIncrementalRows(spark, table, prev, inst)
                .withColumn("instant_time", lit(inst)),
              store, s"inc_$inst")
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Every change row of a [[maintainCowChangesStore]] store. */
  def readCowChangesStore(
      spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir + "/inc_*")

  // ---------------------------------------------------------------------
  // MERGE-ON-READ tier — declared-stats depth (HoodieDeltaWriteStat).
  //
  // A MOR table's writes are DELTACOMMITs: each file group is a base
  // parquet plus a chain of log files (`.{fileId}_{baseInstant}.log.
  // {version}_{writeToken}` — hidden dot-files); a COMPACTION `commit`
  // rewrites the base merging its logs. What this tier models is the
  // PLANNING surface Hudi's own timeline resolution gives a reader:
  // per file group the latest base slice and the log files attached to
  // it, with the deltacommits' DECLARED row counts
  // (HoodieDeltaWriteStat.numWrites). Per-row merge — resolving which
  // base rows a log block supersedes — needs the HoodieLogFormat block
  // walk and is EXPLICITLY not offered: declared counts are reported
  // as declared, never presented as merged row counts.
  //
  // Scale posture: same as the COW tier — timeline-sized driver
  // listing, one task per completed instant JSON, file-group-keyed
  // metadata-scale shuffles, one footer read per live BASE file.
  // ---------------------------------------------------------------------

  /** Log-file NAME shape: `.{fileId}_{baseInstant}.log.{ver}_{token}`
    * — the base instant the log attaches to is IN the name. */
  private val logNameRe = """^\.(.+)_(\d+)\.log\.(\d+)_(.+)$""".r

  /** Completed visibility-affecting instants of a MOR (or COW) table:
    * `deltacommit` (MOR writes), `commit` (inserts / compaction), and
    * `replacecommit` (clustering / insert-overwrite, modeled r17 via
    * [[replacedGroups]] exactly as on the COW side). `restore`
    * refuses; clean/rollback pass through. */
  private def completedMorInstants(
      root: Path, tl: Seq[HudiInstant],
      asOf: Option[String]): Seq[HudiInstant] = {
    val completed = tl.filter(_.state == "completed")
    completed.find(_.action == "restore")
      .foreach { i =>
        throw new UnsupportedOperationException(
          s"$root: timeline carries a completed ${i.action} " +
            s"(${i.instant}) — restore rewrites visibility in ways " +
            "this tier does not model; refusing")
      }
    val writes = completed
      .filter(i => i.action == "commit" || i.action == "deltacommit" ||
        i.action == "replacecommit")
    requireLinearCompletions(root, writes)
    asOf match {
      case None => writes
      case Some(t) =>
        if (!writes.exists(_.instant == t)) {
          throw new IllegalArgumentException(
            s"$root: no completed commit/deltacommit at instant $t " +
              s"(completed: ${writes.map(_.instant).mkString(", ")})")
        }
        completed.filter(_.action == "clean").map(_.instant)
          .filter(_ > t).sorted.lastOption.foreach { c =>
            throw new UnsupportedOperationException(
              s"$root: time travel to $t crosses completed clean $c — " +
                "cleaned slices are gone from disk; refusing rather " +
                "than failing on a missing base file")
          }
        writes.filter(_.instant <= t)
    }
  }

  /** Every write DECLARED by the completed commits/deltacommits at or
    * before `asOf`, base and log files both: `(instant_time, action,
    * partition_path, file_id, path, abs_path, is_log, base_instant,
    * declared_rows, file_size)`. One task per instant JSON. A log
    * write stat whose base attachment cannot be resolved (neither the
    * log name nor a declared `baseFile` carries the base instant)
    * refuses — a log silently attached to the wrong slice corrupts
    * the census. */
  private[meta] def morDeclaredWrites(
      spark: SparkSession, table: String,
      asOf: Option[String]): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val instants = completedMorInstants(root, timeline(root, conf), asOf)
      .map(i => (i.instant, i.action, i.relFile))
    if (instants.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no completed commits/deltacommits — nothing is live")
    }
    val rootStr = root.toString
    val sconf = new SerializableHadoopConf(conf)
    instants.toDS().flatMap { case (instant, action, relFile) =>
      val r = new Path(rootStr)
      val fs = r.getFileSystem(sconf.value)
      val f = new Path(new Path(r, ".hoodie"), relFile)
      val node = readCommitNode(fs, f)
      val stats = Option(node.get("partitionToWriteStats")).getOrElse(
        throw new IllegalArgumentException(
          s"$f: commit metadata carries no partitionToWriteStats — " +
            "refusing rather than treating the commit as empty"))
      import scala.jdk.CollectionConverters._
      stats.properties().asScala.flatMap { e =>
        e.getValue.elements().asScala.map { ws =>
          def str(n: String): Option[String] =
            Option(ws.get(n)).map(_.asText()).filter(_.nonEmpty)
          val rel = str("path").getOrElse(
            throw new IllegalArgumentException(
              s"$f: write stat missing 'path'"))
          def lng(n: String): Long = Option(ws.get(n)).map(_.asLong())
            .getOrElse(throw new IllegalArgumentException(
              s"$f: write stat for $rel missing $n"))
          val name = rel.substring(rel.lastIndexOf('/') + 1)
          val isLog = name.contains(".log.")
          val baseInstant =
            if (!isLog) instant
            else name match {
              case logNameRe(_, bi, _, _) => bi
              case _ => str("baseFile") match {
                // base file name: <fileId>_<token>_<instant>.parquet
                case Some(bf) if bf.endsWith(".parquet") &&
                    bf.lastIndexOf('_') >= 0 =>
                  bf.substring(bf.lastIndexOf('_') + 1,
                    bf.length - ".parquet".length)
                case _ => throw new IllegalArgumentException(
                  s"$f: log write '$rel' resolves to no base instant " +
                    "(unparseable name, no baseFile) — refusing rather " +
                    "than attaching the log to the wrong slice")
              }
            }
          (instant, action, e.getKey,
            str("fileId").getOrElse(throw new IllegalArgumentException(
              s"$f: write stat for $rel missing fileId")),
            rel, new Path(r, rel).toString, isLog, baseInstant,
            lng("numWrites"), lng("totalWriteBytes"))
        }
      }
    }.toDF("instant_time", "action", "partition_path", "file_id", "path",
      "abs_path", "is_log", "base_instant", "declared_rows", "file_size")
  }

  /**
   * MOR FILE GROUPS at `asOf` (None = latest): per file group the
   * latest BASE slice plus the log chain attached to exactly that
   * slice by later completed deltacommits — the file-slice view a MOR
   * snapshot reader plans from. Logs attached to a SUPERSEDED base
   * (compacted away) drop out by the base-instant join, exactly as
   * Hudi's own file-system view resolves slices. One row per live
   * file group; `declared_log_rows` is the deltacommits' own claim
   * (merge not performed — see the tier note).
   */
  def morFileGroups(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val replaced = replacedGroups(root, conf,
      completedMorInstants(root, timeline(root, conf), asOf)
        .filter(_.action == "replacecommit")).keySet.toSeq
    val w0 = morDeclaredWrites(spark, table, asOf)
    // clustering / insert-overwrite (r17): groups a completed
    // replacecommit at or before asOf replaced are dead — their logs
    // drop with them
    val w =
      if (replaced.isEmpty) w0
      else w0.filter(!col("file_id").isInCollection(replaced))
    val bases = w.filter(!col("is_log"))
      .groupBy(col("file_id"))
      .agg(max_by(
        struct(col("instant_time"), col("partition_path"), col("path"),
          col("abs_path"), col("declared_rows"), col("file_size")),
        col("instant_time")).as("b"))
      .select(col("file_id"), col("b.instant_time").as("base_instant"),
        col("b.partition_path").as("partition_path"),
        col("b.path").as("base_path"),
        col("b.abs_path").as("base_abs_path"),
        col("b.declared_rows").as("declared_base_rows"),
        col("b.file_size").as("base_file_size"))
    val logs = w.filter(col("is_log"))
      .groupBy(col("file_id"), col("base_instant"))
      .agg(count(lit(1)).as("n_logs"),
        sum(col("declared_rows")).cast("long").as("declared_log_rows"),
        array_join(array_sort(collect_list(col("path"))), ",")
          .as("log_paths_csv"))
    // a LOG-ONLY file group (inserts landed in logs before any base
    // slice exists — some Hudi index types write these) has no base
    // row to attach to: silently omitting it would undercount every
    // census and the merge, so it refuses by name (r18). Logs on a
    // SUPERSEDED base instant still drop legitimately — their file
    // group has a newer base.
    val baseFids = bases.select(col("file_id"))
    logs.join(baseFids, Seq("file_id"), "left_anti")
      .select(col("file_id")).limit(1).collect().headOption.foreach { r =>
        throw new UnsupportedOperationException(
          s"$table: file group ${r.getString(0)} is LOG-ONLY (declared " +
            "log writes with no base slice) — base-less groups are not " +
            "modeled; refusing rather than omitting a live group from " +
            "the census/merge")
      }
    bases.join(logs, Seq("file_id", "base_instant"), "left")
      .select(col("file_id"), col("partition_path"), col("base_instant"),
        col("base_path"), col("base_abs_path"),
        col("declared_base_rows"), col("base_file_size"),
        coalesce(col("n_logs"), lit(0L)).as("n_logs"),
        coalesce(col("declared_log_rows"), lit(0L))
          .as("declared_log_rows"),
        coalesce(col("log_paths_csv"), lit("")).as("log_paths_csv"))
  }

  /**
   * MOR INCREMENTAL PULL at metadata cost — the merge-on-read twin of
   * [[incrementalPull]]: every write (base parquet or log file) the
   * completed commits/deltacommits in `(fromExclusive, toInclusive]`
   * declared, one row per write with its commit attribution and
   * `is_log` shape. An incremental MOR consumer reads exactly the
   * returned base files plus log files (merging the latter is its
   * job — the declared counts are the planning surface, per the tier
   * note). `fromExclusive = "0"` bootstraps; otherwise both endpoints
   * must be completed write instants.
   */
  def morIncrementalPull(
      spark: SparkSession, table: String,
      fromExclusive: String, toInclusive: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val writes = completedMorInstants(root, timeline(root, conf), None)
      .map(_.instant)
    def requireWrite(t: String, which: String): Unit =
      if (!writes.contains(t)) {
        throw new IllegalArgumentException(
          s"$table: $which instant $t is not a completed " +
            s"commit/deltacommit (completed: ${writes.mkString(", ")})")
      }
    if (fromExclusive != "0") requireWrite(fromExclusive, "from")
    requireWrite(toInclusive, "to")
    if (fromExclusive >= toInclusive) {
      throw new IllegalArgumentException(
        s"$table: pull window ($fromExclusive, $toInclusive] is empty " +
          "or reversed — no increment to read")
    }
    // a replacecommit in the window changed NO logical rows — its
    // outputs are not increments (same rule as the COW pull); a MOR
    // compaction `commit` DOES ride (the consumer switches to the new
    // base and stops reading its logs — the file-level contract)
    morDeclaredWrites(spark, table, Some(toInclusive))
      .filter(col("instant_time") > fromExclusive &&
        col("action") =!= "replacecommit")
      .select(col("instant_time"), col("partition_path"), col("file_id"),
        col("path"), col("is_log"), col("base_instant"),
        col("declared_rows"), col("file_size"))
  }

  /**
   * MOR CENSUS with base-footer conformance: [[morFileGroups]] plus
   * each live BASE file's own parquet row count (one footer read per
   * group, distributed) — `base_match=false` names a deltacommit that
   * lied about its base write. Log files are reported at DECLARED
   * depth only (`n_logs`, `declared_log_rows`): their row-level truth
   * lives behind the HoodieLogFormat block walk this tier explicitly
   * does not perform. One row per live file group.
   */
  def morCensus(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val fg = morFileGroups(spark, table, asOf)
    val conf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    val footer = fg.select(col("base_abs_path")).as[String]
      .map(p => (p, Footers.read(new Path(p), conf.value).numRows))
      .toDF("base_abs_path", "footer_base_rows")
    fg.join(footer, "base_abs_path")
      .select(col("file_id"), col("partition_path"), col("base_instant"),
        col("base_path"), col("declared_base_rows"),
        col("footer_base_rows"),
        (col("declared_base_rows") === col("footer_base_rows"))
          .as("base_match"),
        col("n_logs"), col("declared_log_rows"))
  }

  // ---------------------------------------------------------------------
  // MERGE-ON-READ tier, PER-ROW depth (r18) — the HoodieLogFormat
  // block walk the r17 tier explicitly refused: avro data blocks
  // decoded with their commits' own writer schemas, delete blocks,
  // rollback command blocks and corrupt-region skips per the spec's
  // reader rules ([[HudiLogFormat]]), merged onto the base slice by
  // record key with last-event-wins semantics (the spec's default
  // overwrite-with-latest payload; partial-update payloads refuse).
  //
  // Scale posture: the BASE side never shuffles — untouched base rows
  // survive through a broadcast LEFT-ANTI join against the (log-sized)
  // touched-key set, and the only aggregation keys LOG events, whose
  // volume is bounded by the un-compacted write increments (MOR's own
  // design invariant). One walk task per file group, the same
  // file-group parallelism Hudi's own snapshot reader uses; a group's
  // log chain is buffered in its task (bounded by per-group log volume
  // between compactions — the reader-memory boundary Hudi's own
  // spillable merge has).
  // ---------------------------------------------------------------------

  /** The public KeyGenUtils placeholders composite key parts render
    * null / empty values to. */
  private[meta] val NullKeyPart = "__null__"
  private[meta] val EmptyKeyPart = "__empty__"

  /** The table's record-key FIELDS from `hoodie.properties` — the
    * merge key. A single field merges on its plain stringified value
    * (the simple key generator's rendering); multiple fields merge on
    * the complex key generator's `f1:v1,f2:v2` rendering (r19 — the
    * r18 composite refusal lifted). */
  private[meta] def recordKeyFields(
      root: Path, conf: Configuration): Seq[String] = {
    val fs = root.getFileSystem(conf)
    val props = new java.util.Properties()
    val in = fs.open(
      new Path(new Path(root, ".hoodie"), "hoodie.properties"))
    try props.load(in) finally in.close()
    val k = Option(props.getProperty("hoodie.table.recordkey.fields"))
      .map(_.trim).filter(_.nonEmpty)
      .getOrElse(throw new UnsupportedOperationException(
        s"$root: hoodie.properties declares no " +
          "hoodie.table.recordkey.fields — cannot merge log records " +
          "onto base rows without the record key"))
    val fields = k.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (fields.isEmpty) {
      throw new UnsupportedOperationException(
        s"$root: hoodie.table.recordkey.fields '$k' names no fields — " +
          "cannot merge without a record key")
    }
    fields
  }

  /** `__key` as a Spark column: the plain stringified value for a
    * single-field key; the complex key generator's public
    * `field1:val1,field2:val2` rendering for composite keys (null →
    * `__null__`, empty string → `__empty__`, the KeyGenUtils
    * placeholders) — the SAME rendering [[avroRecordKey]] applies to
    * log events, so base rows and log events meet on one key space. */
  private def keyColumn(fields: Seq[String]): org.apache.spark.sql.Column =
    if (fields.size == 1) col(fields.head).cast("string")
    else concat_ws(",", fields.map { f =>
      val s = col(f).cast("string")
      concat(lit(f + ":"),
        coalesce(when(s === "", lit(EmptyKeyPart)).otherwise(s),
          lit(NullKeyPart)))
    }: _*)

  /** One log record's record key under `fields` — the avro twin of
    * [[keyColumn]]. A key field missing from the writer schema
    * refuses (rows unmergeable). */
  private def avroRecordKey(
      r: org.apache.avro.generic.GenericRecord, fields: Seq[String],
      where: String): String = {
    def valueOf(f: String): Any = r.getSchema.getField(f) match {
      case null => throw new IllegalArgumentException(
        s"$where: log record schema lacks the record key " +
          s"field '$f' — rows unmergeable")
      case fld => r.get(fld.pos())
    }
    if (fields.size == 1) String.valueOf(valueOf(fields.head))
    else fields.map { f =>
      f + ":" + (valueOf(f) match {
        case null => NullKeyPart
        case x =>
          val s = x.toString
          if (s.isEmpty) EmptyKeyPart else s
      })
    }.mkString(",")
  }

  /** Every `fields` member must be a base column — refuse by name
    * otherwise (a merge on a missing key field corrupts rows). */
  private def requireKeyFields(
      table: String, fields: Seq[String], cols: Seq[String]): Unit =
    fields.filterNot(cols.contains).headOption.foreach { f =>
      throw new IllegalArgumentException(
        s"$table: record key field '$f' is not a base column " +
          s"(${cols.mkString(", ")})")
    }

  /** The table's declared precombine (ordering) field, if any. */
  private[meta] def precombineField(
      root: Path, conf: Configuration): Option[String] = {
    val fs = root.getFileSystem(conf)
    val props = new java.util.Properties()
    val in = fs.open(
      new Path(new Path(root, ".hoodie"), "hoodie.properties"))
    try props.load(in) finally in.close()
    Option(props.getProperty("hoodie.table.precombine.field"))
      .map(_.trim).filter(_.nonEmpty)
  }

  /** Whether the table declares change-data-capture
    * (`hoodie.table.cdc.enabled`) — the gate on the feed's native-
    * image path: cdc blocks only exist when the writer had this set,
    * so non-cdc tables pay ZERO of the cdc machinery's jobs. */
  private[meta] def cdcEnabled(root: Path, conf: Configuration): Boolean = {
    val fs = root.getFileSystem(conf)
    val props = new java.util.Properties()
    val in = fs.open(
      new Path(new Path(root, ".hoodie"), "hoodie.properties"))
    try props.load(in) finally in.close()
    Option(props.getProperty("hoodie.table.cdc.enabled"))
      .exists(_.trim.equalsIgnoreCase("true"))
  }

  /** LATEST-EVENT RESOLUTION per (file group, record key) — the
    * payload contract (r19): without a declared precombine field,
    * the last ARRIVED event wins (`__seq`, the overwrite-with-latest
    * default). With `hoodie.table.precombine.field` set, same-key
    * events resolve by (precombine value, sequence) — the higher
    * ordering value wins and arrival order only breaks ties, per the
    * default payload's preCombine contract. A NULL ordering value
    * sorts lowest: a delete event carries no payload (its ordering is
    * the DeleteRecord default), so an ordered update beats a
    * same-key delete regardless of arrival — the documented
    * late-unordered-delete behavior. `carryCols` ride through
    * unchanged. The aggregate keys LOG events only (log-sized
    * shuffle), same posture at any precombine setting. */
  private[meta] def resolveLatestEvents(
      events: DataFrame, carryCols: Seq[String],
      pcField: Option[String]): DataFrame = {
    // bare long ordering when no precombine field is declared — a
    // one-field struct ordering costs real time in the aggregate
    // (measured ~1.5x on the merge floor, r19)
    val ord = pcField match {
      case Some(f) => struct(col(f), col("__seq"))
      case None => col("__seq")
    }
    events.groupBy(col("file_id"), col("__key"))
      .agg(max_by(struct(carryCols.map(col): _*), ord).as("e"))
      .select(Seq(col("file_id"), col("__key")) ++
        carryCols.map(n => col(s"e.$n").as(n)): _*)
  }

  /** One avro value as the Spark-typed value `dt` expects; anything
    * else refuses classified (a mis-typed merge corrupts rows). */
  private def avroToSpark(
      v: Any, dt: org.apache.spark.sql.types.DataType,
      field: String, where: String): Any = {
    import org.apache.spark.sql.types._
    (v, dt) match {
      case (null, _) => null
      case (u: org.apache.avro.util.Utf8, StringType) => u.toString
      case (s: String, StringType) => s
      case (i: java.lang.Integer, IntegerType) => i
      case (i: java.lang.Integer, LongType) => i.longValue()
      case (l: java.lang.Long, LongType) => l
      case (d: java.lang.Double, DoubleType) => d
      case (f: java.lang.Float, FloatType) => f
      case (f: java.lang.Float, DoubleType) => f.doubleValue()
      case (b: java.lang.Boolean, BooleanType) => b
      case (bb: java.nio.ByteBuffer, BinaryType) =>
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out)
        out
      case (other, _) => throw new IllegalArgumentException(
        s"$where: log record field '$field' carries " +
          s"${other.getClass.getSimpleName} where the base schema " +
          s"expects $dt — refusing a mis-typed merge")
    }
  }

  /** The attribution/bookkeeping column names the merge machinery
    * claims — a base table carrying one of them would make the
    * internal joins ambiguous; refuse classified up front rather than
    * surfacing a planner error (r18 self-review). */
  private def requireNoReservedColumns(
      table: String,
      dataSchema: org.apache.spark.sql.types.StructType): Unit = {
    val reserved = Set("file_id", "__key", "__name", "__seq", "__del",
      "__instant", "__new", "__old")
    dataSchema.fieldNames.find(reserved.contains).foreach { c =>
      throw new UnsupportedOperationException(
        s"$table: base column '$c' collides with the merge machinery's " +
          "internal attribution columns — refusing rather than " +
          "mis-joining rows")
    }
  }

  /** Decoded, VALID log events of every live file group with logs:
    * `(file_id, __seq, __key, __del, __instant, __cdc,
    * <data columns>)` — one walk task per file group, blocks
    * validated/rolled-back/filtered by [[HudiLogFormat.validBlocks]]
    * against the completed instants. `__cdc=false` rows are MERGE
    * PAYLOAD (avro data / delete blocks); `__cdc=true` rows are the
    * cdc-data blocks' NATIVE CHANGE EVIDENCE (r19) — op `i`/`u`
    * records surface their full-row AFTER image in the data columns,
    * op `d` records surface nulls with `__del=true`. A cdc record
    * whose op is unknown, or whose `i`/`u` after image is missing or
    * partial, refuses by name (key-only supplemental logging is not
    * modeled). */
  private def morLogEvents(
      spark: SparkSession, rootStr: String, groups: DataFrame,
      completed: Set[String], keyFields: Seq[String],
      dataSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val sconf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val outSchema = StructType(Seq(
      StructField("file_id", StringType),
      StructField("__seq", LongType),
      StructField("__key", StringType),
      StructField("__del", BooleanType),
      StructField("__instant", StringType),
      StructField("__cdc", BooleanType)) ++ dataSchema.fields)
    val fields = dataSchema.fields.toSeq
    groups.filter(col("n_logs") > 0)
      .select(col("file_id"), col("log_paths_csv"),
        col("declared_log_rows")).as[(String, String, Long)]
      .flatMap { case (fid, csv, declaredLogRows) =>
        val conf = sconf.value
        val root = new Path(rootStr)
        val where = s"$rootStr (file group $fid)"
        // VERSION order, numerically — the csv is lexicographic and
        // "10" sorts before "2" there
        val ordered = csv.split(",").filter(_.nonEmpty).toSeq.map { rel =>
          val name = rel.substring(rel.lastIndexOf('/') + 1)
          name match {
            case logNameRe(_, _, ver, _) => (ver.toInt, rel)
            case _ => throw new IllegalArgumentException(
              s"$where: unparseable log file name '$name'")
          }
        }.sortBy(_._1).map(_._2)
        val chain = ordered.flatMap(rel =>
          HudiLogFormat.walkFile(new Path(root, rel), conf))
        val valid = HudiLogFormat.validBlocks(chain, completed, where)
        // a WHOLLY-corrupt declared chain is a data-loss signal, not a
        // skippable partial append: the deltacommits claim rows this
        // walk cannot reach anywhere — refusing beats silently merging
        // to base-only rows (partial tail corruption still skips, per
        // the spec's reader rule)
        if (valid.isEmpty && declaredLogRows > 0 && chain.exists(_.corrupt)) {
          throw new IllegalArgumentException(
            s"$where: the deltacommits declare $declaredLogRows log " +
              "rows but the log chain yields no valid block (all " +
              "corrupt) — refusing rather than silently dropping " +
              "declared updates")
        }
        var seq = 0L
        valid.iterator.flatMap { b =>
          val instant = b.header(HudiLogFormat.InstantTime)
          b.typeOrd match {
            case HudiLogFormat.AvroDataBlock =>
              HudiLogFormat.dataRecords(b, where).map { r =>
                seq += 1
                val key = avroRecordKey(r, keyFields, where)
                val data = fields.map { sf =>
                  r.getSchema.getField(sf.name) match {
                    case null => throw new UnsupportedOperationException(
                      s"$where: log record schema lacks base column " +
                        s"'${sf.name}' — partial-update payloads are " +
                        "not modeled; refusing rather than nulling the " +
                        "column")
                    case f => avroToSpark(r.get(f.pos()), sf.dataType,
                      sf.name, where)
                  }
                }
                org.apache.spark.sql.Row.fromSeq(
                  Seq(fid, seq, key, false, instant, false) ++ data)
              }
            case HudiLogFormat.DeleteBlock =>
              HudiLogFormat.deleteKeys(b, where).map { k =>
                seq += 1
                org.apache.spark.sql.Row.fromSeq(
                  Seq(fid, seq, k, true, instant, false) ++
                    fields.map(_ => null))
              }
            case HudiLogFormat.CdcDataBlock =>
              // cdc records: {op, key, before, after} with full-row
              // images — the writer's own post-merge change evidence
              HudiLogFormat.dataRecords(b, where).map { r =>
                seq += 1
                def strField(n: String): String =
                  r.getSchema.getField(n) match {
                    case null => throw new IllegalArgumentException(
                      s"$where: cdc record at offset ${b.offset} " +
                        s"carries no '$n' field — not the " +
                        "{op, key, before, after} change shape")
                    case f => Option(r.get(f.pos())).map(_.toString)
                      .getOrElse(throw new IllegalArgumentException(
                        s"$where: cdc record at offset ${b.offset} " +
                          s"has a null '$n' — changes unattributable"))
                  }
                val op = strField("op")
                val key = strField("key")
                val after = r.getSchema.getField("after") match {
                  case null => throw new IllegalArgumentException(
                    s"$where: cdc record at offset ${b.offset} " +
                      "carries no 'after' field — key-only " +
                      "supplemental logging is not modeled")
                  case f => r.get(f.pos())
                    .asInstanceOf[org.apache.avro.generic.GenericRecord]
                }
                val data = op match {
                  case "i" | "u" =>
                    if (after == null) {
                      throw new IllegalArgumentException(
                        s"$where: cdc '$op' record at offset " +
                          s"${b.offset} has no after image — the " +
                          "change's row value is unrecoverable")
                    }
                    fields.map { sf =>
                      after.getSchema.getField(sf.name) match {
                        case null =>
                          throw new UnsupportedOperationException(
                            s"$where: cdc after image lacks base " +
                              s"column '${sf.name}' — partial images " +
                              "are not modeled; refusing rather than " +
                              "nulling the column")
                        case f => avroToSpark(after.get(f.pos()),
                          sf.dataType, sf.name, where)
                      }
                    }
                  case "d" => fields.map(_ => null)
                  case other => throw new IllegalArgumentException(
                    s"$where: cdc record at offset ${b.offset} " +
                      s"declares unknown op '$other' (i/u/d expected)")
                }
                org.apache.spark.sql.Row.fromSeq(
                  Seq(fid, seq, key, op == "d", instant, true) ++ data)
              }
            case other => throw new UnsupportedOperationException(
              s"$where: ${HudiLogFormat.blockTypeName(other)} log block " +
                "at offset " + b.offset + " — only avro data and delete " +
                "blocks are modeled (hfile/parquet blocks are other " +
                "engines' encodings); refusing a partial merge")
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Live groups, merged rows tagged with (file group, record key),
    * the decoded log events, and the data columns — the shared core of
    * [[morMergedRows]], [[morMergedCensus]] and
    * [[morIncrementalRows]]. */
  private def morMerged(
      spark: SparkSession, table: String,
      asOf: Option[String]): (DataFrame, DataFrame, DataFrame, Seq[String]) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val completed = completedMorInstants(root, timeline(root, conf), asOf)
      .map(_.instant).toSet
    val keyFields = recordKeyFields(root, conf)
    val groups = morFileGroups(spark, table, asOf)
    // driver boundary: the base-path list (file-group-sized, the same
    // class as readPartitionPruned's surviving paths)
    val basePaths = groups.select(col("base_abs_path"))
      .collect().map(_.getString(0)).toSeq
    if (basePaths.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no live base files — nothing to merge")
    }
    val base0 = spark.read.parquet(basePaths: _*)
    val dataSchema = base0.schema
    requireNoReservedColumns(table, dataSchema)
    requireKeyFields(table, keyFields, dataSchema.fieldNames.toSeq)
    val dataCols = dataSchema.fieldNames.toSeq
    // file-group attribution by base FILENAME (unique by construction:
    // <fileId>_<token>_<instant>.parquet), broadcast — never a shuffle
    // of the base rows
    val fidByName = groups.select(
      regexp_extract(col("base_path"), "([^/]+)$", 1).as("__name"),
      col("file_id"))
    val base = base0
      .withColumn("__name",
        regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
      .join(broadcast(fidByName), "__name")
      .withColumn("__key", keyColumn(keyFields))
      .drop("__name")
    // the SNAPSHOT merge resolves from payload blocks only — cdc rows
    // are change evidence for the feed, exactly as Hudi's own merged
    // scanner ignores them (r19)
    val events = morLogEvents(spark, root.toString, groups, completed,
      keyFields, dataSchema).filter(!col("__cdc"))
    // event resolution per (group, key): arrival order, or
    // (precombine value, arrival) when the table declares an ordering
    // field ([[resolveLatestEvents]], r19); the aggregate keys LOG
    // events only (log-sized shuffle)
    val pcField = precombineField(root, conf)
    pcField.filterNot(dataCols.contains).foreach { f =>
      throw new IllegalArgumentException(
        s"$table: precombine field '$f' is not a base column " +
          s"(${dataCols.mkString(", ")})")
    }
    val latest = resolveLatestEvents(events,
      "__del" +: dataCols, pcField)
    // untouched base rows survive via a BROADCAST left-anti join on
    // the touched keys — zero base-side shuffle; touched keys resolve
    // from their latest log payload (insert/update) or drop (delete)
    val untouched = base
      .join(broadcast(latest.select(col("file_id"), col("__key"))),
        Seq("file_id", "__key"), "left_anti")
      .select(Seq(col("file_id"), col("__key")) ++ dataCols.map(col): _*)
    val survivors = latest.filter(!col("__del"))
      .select(Seq(col("file_id"), col("__key")) ++ dataCols.map(col): _*)
    (groups, untouched.unionByName(survivors), events, dataCols)
  }

  /**
   * The LIVE ROWS of a merge-on-read table at `asOf` (None = latest)
   * — the question a MOR snapshot reader exists to answer, resolved
   * per the spec's reader rules: per file group, the latest base
   * slice's rows with the valid log chain's avro data blocks
   * (upserts/inserts, decoded with their commits' own writer schemas)
   * and delete blocks applied by record key, last event wins;
   * rolled-back, uncommitted and corrupt log blocks are invisible
   * ([[HudiLogFormat.validBlocks]]). One walk task per file group;
   * base rows never shuffle (broadcast anti-join against the log-sized
   * touched-key set).
   */
  def morMergedRows(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val (_, merged, _, dataCols) = morMerged(spark, table, asOf)
    merged.select(dataCols.map(col): _*)
  }

  /**
   * MOR CENSUS at MERGED depth — [[morCensus]]'s declared-stats view
   * plus the per-group row count the log merge actually resolves to:
   * one row per live file group, `(file_id, partition_path,
   * base_instant, declared_base_rows, n_logs, declared_log_rows,
   * merged_rows)`. Declared numbers are the commits' own claims (kept
   * verbatim, lies visible); `merged_rows` is ground truth from the
   * block walk.
   */
  def morMergedCensus(
      spark: SparkSession, table: String,
      asOf: Option[String] = None): DataFrame = {
    val (groups, merged, _, _) = morMerged(spark, table, asOf)
    val counts = merged.groupBy(col("file_id"))
      .agg(count(lit(1)).as("merged_rows"))
    groups.join(counts, Seq("file_id"), "left")
      .select(col("file_id"), col("partition_path"), col("base_instant"),
        col("declared_base_rows"), col("n_logs"),
        col("declared_log_rows"),
        coalesce(col("merged_rows"), lit(0L)).as("merged_rows"))
  }

  /** First of `paths` missing from disk, probed with ONE `listStatus`
    * per DISTINCT PARENT DIRECTORY — never a per-file exists RPC
    * (r19, ADVICE #8): object stores price LIST and HEAD alike, and
    * slices cluster under few partition directories, so the probe
    * count is dir-bounded. A missing parent marks all its children
    * missing. */
  private[meta] def firstMissingFromDisk(
      fs: org.apache.hadoop.fs.FileSystem,
      paths: Seq[Path]): Option[Path] = {
    val onDisk: Set[String] = paths.map(_.getParent).distinct
      .flatMap { d =>
        try fs.listStatus(d).toSeq.map(_.getPath.toUri.getPath)
        catch {
          case _: java.io.FileNotFoundException => Seq.empty[String]
        }
      }.toSet
    paths.find(p => !onDisk.contains(p.toUri.getPath))
  }

  /** The declared table type from `hoodie.properties` (defaults to
    * COPY_ON_WRITE, the property's own default). */
  private def tableType(root: Path, conf: Configuration): String = {
    val fs = root.getFileSystem(conf)
    val props = new java.util.Properties()
    val in = fs.open(
      new Path(new Path(root, ".hoodie"), "hoodie.properties"))
    try props.load(in) finally in.close()
    Option(props.getProperty("hoodie.table.type"))
      .getOrElse("COPY_ON_WRITE")
  }

  /** The HoodieMetadataRecord avro shape this tier reads out of (and
    * its fixtures write into) HFile metadata-table cells: the public
    * `files` partition payload — record key, payload type, and the
    * file → (size, isDeleted) map. */
  private[meta] val MetadataPayloadAvroSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"HoodieMetadataRecord","fields":[
        |{"name":"key","type":"string"},
        |{"name":"type","type":"int"},
        |{"name":"filesystemMetadata","type":["null",{"type":"map",
        |  "values":{"type":"record","name":"HoodieMetadataFileInfo",
        |    "fields":[{"name":"size","type":"long"},
        |      {"name":"isDeleted","type":"boolean"}]}}],
        |  "default":null}]}""".stripMargin.replace("\n", ""))

  /** The `(key, type, filesystemMetadata)` Spark row shape metadata
    * records resolve to, base and log sides alike. */
  private val MetadataRecordSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("key", StringType),
      StructField("type", IntegerType),
      StructField("filesystemMetadata", MapType(StringType,
        StructType(Seq(StructField("size", LongType),
          StructField("isDeleted", BooleanType)))))))
  }

  /** Decode one HFile image's metadata cells into
    * `(key, type, filesystemMetadata)` rows: [[HFile.scanCells]] then
    * an avro [[MetadataPayloadAvroSchema]] decode per value. A cell
    * whose payload key disagrees with its HFile row key refuses (the
    * index disagrees with itself); malformed cells refuse
    * classified. */
  private def decodeMetadataCells(
      bytes: Array[Byte], where: String): Seq[org.apache.spark.sql.Row] = {
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](
      new org.apache.avro.Schema.Parser()
        .parse(MetadataPayloadAvroSchema.toString))
    HFile.scanCells(bytes, where).map { case (row, value) =>
      val dec = org.apache.avro.io.DecoderFactory.get()
        .binaryDecoder(value, null)
      val r =
        try reader.read(null, dec)
        catch {
          case e @ (_: java.io.IOException | _: RuntimeException) =>
            throw new IllegalArgumentException(
              s"$where: cell '$row' does not decode as a " +
                s"HoodieMetadataRecord (${e.getMessage}) — refusing")
        }
      val key = String.valueOf(r.get("key"))
      if (key != row) {
        throw new IllegalArgumentException(
          s"$where: cell row '$row' carries payload key '$key' — the " +
            "index disagrees with itself; refusing")
      }
      val fsm = r.get("filesystemMetadata") match {
        case null => null
        case m: java.util.Map[_, _] =>
          import scala.jdk.CollectionConverters._
          m.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.map {
            case (k, v) =>
              val vr = v.asInstanceOf[
                org.apache.avro.generic.GenericRecord]
              String.valueOf(k) -> org.apache.spark.sql.Row(
                vr.get("size").asInstanceOf[Long],
                vr.get("isDeleted").asInstanceOf[Boolean])
          }.toMap
        case other => throw new IllegalArgumentException(
          s"$where: cell '$row' filesystemMetadata is " +
            s"${other.getClass.getSimpleName} — not the map shape")
      }
      org.apache.spark.sql.Row(key, r.get("type").asInstanceOf[Int], fsm)
    }
  }

  /** `(key, type, filesystemMetadata)` rows decoded from HFILE base
    * files of the metadata table's `files` partition — one scan task
    * per file. */
  private def metadataHFileRecords(
      spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val sconf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    paths.toDS().flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(sconf.value)
      val len = fs.getFileStatus(path).getLen
      if (len > (1L << 30)) {
        throw new UnsupportedOperationException(
          s"$p: ${len}B metadata-table HFile — not index-sized; " +
            "refusing a driver-memory-scale read")
      }
      val bytes = new Array[Byte](len.toInt)
      val in = fs.open(path)
      try in.readFully(0, bytes) finally in.close()
      decodeMetadataCells(bytes, p)
    }(org.apache.spark.sql.Encoders.row(MetadataRecordSchema))
  }

  /** `(key, type, filesystemMetadata, __seq)` rows decoded from the
    * metadata table's UN-COMPACTED log chains (r19): per file group,
    * the valid blocks of the version-ordered chain
    * ([[HudiLogFormat.validBlocks]] against the METADATA table's own
    * completed deltacommits — rollbacks/uncommitted/corrupt blocks
    * invisible), each `hfile-data` block's content a complete HFile
    * image whose cells decode like the base. `__seq` is the chain
    * position (per-key/per-file resolution is newest-wins, the
    * HoodieMetadataPayload merge). Avro-data and delete blocks are
    * not the metadata writer's `files` encoding — refuse by name. */
  private def metadataHFileLogRecords(
      spark: SparkSession, mdRootStr: String, groups: DataFrame,
      completed: Set[String]): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val sconf = new SerializableHadoopConf(
      spark.sessionState.newHadoopConf())
    val outSchema = StructType(
      MetadataRecordSchema.fields :+ StructField("__seq", LongType))
    groups.filter(col("n_logs") > 0)
      .select(col("file_id"), col("log_paths_csv"),
        col("declared_log_rows")).as[(String, String, Long)]
      .flatMap { case (fid, csv, declaredLogRows) =>
        val conf = sconf.value
        val root = new Path(mdRootStr)
        val where = s"$mdRootStr (file group $fid)"
        val ordered = csv.split(",").filter(_.nonEmpty).toSeq.map { rel =>
          val name = rel.substring(rel.lastIndexOf('/') + 1)
          name match {
            case logNameRe(_, _, ver, _) => (ver.toInt, rel)
            case _ => throw new IllegalArgumentException(
              s"$where: unparseable log file name '$name'")
          }
        }.sortBy(_._1).map(_._2)
        val chain = ordered.flatMap(rel =>
          HudiLogFormat.walkFile(new Path(root, rel), conf))
        val valid = HudiLogFormat.validBlocks(chain, completed, where)
        // the data-table merge's data-loss rule, restated here: a
        // wholly-corrupt declared chain means the index's newest
        // listings are unreachable — refusing beats auditing against
        // a silently-stale index
        if (valid.isEmpty && declaredLogRows > 0 &&
            chain.exists(_.corrupt)) {
          throw new IllegalArgumentException(
            s"$where: the deltacommits declare $declaredLogRows index " +
              "records in logs but the chain yields no valid block " +
              "(all corrupt) — refusing a stale audit")
        }
        var seq = 0L
        valid.flatMap { b =>
          b.typeOrd match {
            case HudiLogFormat.HfileDataBlock =>
              decodeMetadataCells(b.content, where).map { r =>
                seq += 1
                org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2), seq)
              }
            case other => throw new UnsupportedOperationException(
              s"$where: ${HudiLogFormat.blockTypeName(other)} log " +
                s"block at offset ${b.offset} — the metadata table's " +
                "files partition is hfile-data encoded; refusing a " +
                "partial index merge")
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * METADATA-TABLE `files` partition AUDIT (r18) — Hudi's own file
   * listing (`.hoodie/metadata/`, itself a Hudi table whose `files`
   * partition holds one record per data partition with a
   * `filesystemMetadata` map of file → (size, isDeleted), the spec's
   * HoodieMetadataPayload shape) cross-checked against the
   * COMMIT-DECLARED live view this tier derives from the timeline:
   * one row per (partition, file) seen on either side —
   * `(partition_path, file_name, is_listed, listed_size, is_declared,
   * declared_match)`. At 100k+ partitions Hudi's readers list from
   * the metadata table instead of replaying commits; this audit is
   * the drift detector between the two views (a stale entry or a
   * lagging index surfaces as `declared_match=false`).
   *
   * Scope gates (each a named refusal, never a wrong audit): the
   * metadata table must exist; its base files must be parquet or
   * HFILE (r19 — the scan-only [[HFile]] reader lifts the r18
   * refusal; any other base format refuses by name). UN-COMPACTED
   * LOG CHAINS are walked too (r19): their `hfile-data` blocks'
   * embedded HFile images decode like the base, merged newest-wins
   * per (partition, file) — the HoodieMetadataPayload merge — with
   * rollback/uncommitted/corrupt invisibility from the metadata
   * table's own timeline; non-hfile log blocks and wholly-corrupt
   * declared chains refuse by name. Deleted entries and the
   * `__all_partitions__` record (type 1) are filtered per the spec.
   */
  def metadataFilesAudit(spark: SparkSession, table: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val fs = root.getFileSystem(conf)
    val mdRoot = new Path(new Path(root, ".hoodie"), "metadata")
    if (!fs.exists(new Path(new Path(mdRoot, ".hoodie"),
        "hoodie.properties"))) {
      throw new IllegalArgumentException(
        s"$table: no .hoodie/metadata table — nothing to audit " +
          "(the table was written with the metadata index disabled)")
    }
    val mdGroups = morFileGroups(spark, mdRoot.toString)
      .filter(col("partition_path") === "files")
    // file-group-count-sized driver boundary, same as every pruned read
    val groupRows = mdGroups
      .select(col("base_abs_path"), col("n_logs"))
      .collect()
    val basePaths = groupRows.map(_.getString(0)).toSeq
    val hasLogs = groupRows.exists(_.getLong(1) > 0)
    if (basePaths.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: the metadata table declares no files partition — " +
          "nothing to audit")
    }
    // the metadata table's base files are parquet OR HFile (the
    // format Hudi's metadata writer actually defaults to) — r19
    // lifts the r18 HFile refusal via the scan-only [[HFile]] reader
    val (hfilePaths, parquetPaths) =
      basePaths.partition(_.endsWith(".hfile"))
    parquetPaths.find(!_.endsWith(".parquet")).foreach { p =>
      throw new UnsupportedOperationException(
        s"$table: metadata-table base file $p is neither parquet nor " +
          "HFile — an unknown base format; refusing")
    }
    val fromParquet =
      if (parquetPaths.isEmpty) None
      else {
        val r = spark.read.parquet(parquetPaths: _*)
        Seq("key", "type", "filesystemMetadata").foreach { c =>
          if (!r.columns.contains(c)) {
            throw new IllegalArgumentException(
              s"$table: metadata-table files records carry no '$c' " +
                s"column (got ${r.columns.mkString(", ")}) — not the " +
                "HoodieMetadataPayload shape; refusing")
          }
        }
        Some(r.select(col("key"), col("type"), col("filesystemMetadata")))
      }
    val fromHfile =
      if (hfilePaths.isEmpty) None
      else Some(metadataHFileRecords(spark, hfilePaths))
    val records = (fromParquet.toSeq ++ fromHfile.toSeq)
      .reduce(_ unionByName _)
      .withColumn("__seq", lit(0L))
    // UN-COMPACTED metadata logs (r19): the chains' hfile-data blocks
    // carry the index's newest listings — merged over the base
    // newest-wins PER (partition, file), the HoodieMetadataPayload
    // merge (a log record's map combines into the base record's, it
    // never erases other files' entries)
    val withLogs =
      if (!hasLogs) records
      else records.unionByName(metadataHFileLogRecords(spark,
        mdRoot.toString, mdGroups,
        completedMorInstants(mdRoot, timeline(mdRoot, conf), None)
          .map(_.instant).toSet))
    val listed = withLogs.filter(col("type") === 2)
      .select(col("key").as("partition_path"), col("__seq"),
        explode(col("filesystemMetadata")).as(Seq("file_name", "info")))
      .groupBy(col("partition_path"), col("file_name"))
      .agg(max_by(col("info"), col("__seq")).as("info"))
      .filter(!col("info.isDeleted"))
      .select(col("partition_path"), col("file_name"),
        col("info.size").as("listed_size"),
        lit(true).as("is_listed"))
    val declared0 =
      if (tableType(root, conf) == "MERGE_ON_READ") {
        // Hudi's metadata `files` partition lists LOG files alongside
        // base files — a base-only declared side would flag every live
        // log file as undeclared drift (r19, ADVICE). Declared = each
        // live group's base slice plus its attached log chain.
        val groups = morFileGroups(spark, table)
        groups.select(col("partition_path"),
            col("base_path").as("path"))
          .unionByName(groups.filter(col("n_logs") > 0)
            .select(col("partition_path"),
              explode(split(col("log_paths_csv"), ",")).as("path")))
      } else {
        liveFiles(spark, table).select(col("partition_path"), col("path"))
      }
    val declared = declared0
      .select(col("partition_path"),
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        lit(true).as("is_declared"))
    listed.join(declared, Seq("partition_path", "file_name"),
        "full_outer")
      .select(col("partition_path"), col("file_name"),
        coalesce(col("is_listed"), lit(false)).as("is_listed"),
        col("listed_size"),
        coalesce(col("is_declared"), lit(false)).as("is_declared"),
        (coalesce(col("is_listed"), lit(false)) &&
          coalesce(col("is_declared"), lit(false))).as("declared_match"))
  }

  /**
   * ROW-LEVEL MOR INCREMENTAL FEED (r18) — the Hudi counterpart of the
   * delta change feed / iceberg changelog: every row whose latest
   * write lands in `(fromExclusive, toInclusive]`, AT ITS MERGED VALUE
   * as of `toInclusive` — `(change_type, record_key, <data columns>)`
   * with `change_type` `upsert` (rows of base files added in the
   * window, log upserts, delete-then-update resurrections) or `delete`
   * (keys whose final event in the window is a delete; data columns
   * null — the delete payload carries only the key, per the log
   * format). `fromExclusive = "0"` bootstraps (everything live at
   * `to`, no deletes). A delete of a key that never existed surfaces
   * as a delete row — the same contract Hudi's own delete payloads
   * have. Attribution is by adding instant for base files (the
   * linear-history guard makes request order = completion order).
   *
   * Scale posture: EVENTS-ONLY plus the window's own base files — a
   * touched key's merged value at `to` IS its latest event payload
   * (log payloads are full rows, the partial-update refusal
   * guarantees it), so the feed never scans bases outside the window:
   * per-increment cost = the window-added base files + the touched
   * groups' log chains, with log-sized shuffles throughout. The
   * streaming store ([[maintainMorChangesStore]]) therefore pays per
   * instant exactly what that instant wrote — never a full-table
   * merge per increment.
   */
  def morIncrementalRows(
      spark: SparkSession, table: String,
      fromExclusive: String, toInclusive: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = qualified(table, conf)
    val writeInstants = completedMorInstants(root, timeline(root, conf),
      None)
    val writes = writeInstants.map(_.instant)
    def requireWrite(t: String, which: String): Unit =
      if (!writes.contains(t)) {
        throw new IllegalArgumentException(
          s"$table: $which instant $t is not a completed " +
            s"commit/deltacommit (completed: ${writes.mkString(", ")})")
      }
    if (fromExclusive != "0") requireWrite(fromExclusive, "from")
    requireWrite(toInclusive, "to")
    if (fromExclusive >= toInclusive) {
      throw new IllegalArgumentException(
        s"$table: pull window ($fromExclusive, $toInclusive] is empty " +
          "or reversed — no increment to read")
    }
    // a replacecommit (clustering / insert-overwrite) in the window
    // changed NO logical rows, but its outputs land as window-new base
    // files — left in, every clustered row would surface as a
    // fabricated 'upsert'. Same refusal as cowIncrementalRows and the
    // same exclusion rule morIncrementalPull applies (r19, ADVICE).
    writeInstants.find(w => w.action == "replacecommit" &&
        w.instant > fromExclusive && w.instant <= toInclusive)
      .foreach { w =>
        throw new UnsupportedOperationException(
          s"$table: completed replacecommit ${w.instant} in the window " +
            "— clustering rewrites change no logical rows, and feeding " +
            "its outputs as changes would fabricate upserts; refusing")
      }
    val completed = completedMorInstants(root, timeline(root, conf),
      Some(toInclusive)).map(_.instant).toSet
    val keyFields = recordKeyFields(root, conf)
    // ONE action over the (file-group-sized) groups relation; every
    // driver-side derivation below reads this local array instead of
    // firing its own job — the feed's per-increment job count matters
    // in the streaming store, which calls this once per instant
    val groupRows = morFileGroups(spark, table, Some(toInclusive))
      .select(col("file_id"), col("base_instant"), col("base_path"),
        col("base_abs_path"), col("n_logs"), col("log_paths_csv"),
        col("declared_log_rows"))
      .collect()
    if (groupRows.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no live base files at $toInclusive — nothing to feed")
    }
    import spark.implicits._
    val groups = groupRows.map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getLong(4), r.getString(5),
      r.getLong(6))).toSeq
      .toDF("file_id", "base_instant", "base_path", "base_abs_path",
        "n_logs", "log_paths_csv", "declared_log_rows")
    // the window's own base files (inserts / compaction outputs) — the
    // ONLY base files this feed ever reads
    val newBases = groups
      .filter(col("base_instant") > fromExclusive &&
        col("base_instant") <= toInclusive)
      .select(col("file_id"), col("base_path"), col("base_abs_path"))
    val newBasePaths = groupRows
      .filter(r => r.getString(1) > fromExclusive &&
        r.getString(1) <= toInclusive)
      .map(_.getString(3)).toSeq
    // the data schema comes from any live base footer (one read)
    val dataSchema =
      spark.read.parquet(groupRows.head.getString(3)).schema
    requireNoReservedColumns(table, dataSchema)
    requireKeyFields(table, keyFields, dataSchema.fieldNames.toSeq)
    val dataCols = dataSchema.fieldNames.toSeq
    val allEvents = morLogEvents(spark, root.toString, groups, completed,
      keyFields, dataSchema)
    val events = allEvents.filter(!col("__cdc"))
    // NATIVE CDC EVIDENCE (r19), gated on the table's OWN
    // `hoodie.table.cdc.enabled` (cdc blocks only exist when the
    // writer had it set — a non-cdc table pays ZERO of these jobs,
    // the byte-for-byte r18 path): a file group whose chain carries
    // cdc-data blocks resolves its changes from the writer's own
    // before/after images — no payload re-derivation; groups without
    // cdc keep the DERIVED path (per-group autonomy). Cdc images are
    // written POST-resolution by the writer, so they order by
    // arrival alone.
    val useCdc = cdcEnabled(root, conf)
    // latest event per touched key at `to` — merged truth for every
    // key any log ever wrote (full-row payloads), resolved by the
    // same payload contract as the merge ([[resolveLatestEvents]])
    val pcField = precombineField(root, conf)
    pcField.filterNot(dataCols.contains).foreach { f =>
      throw new IllegalArgumentException(
        s"$table: precombine field '$f' is not a base column " +
          s"(${dataCols.mkString(", ")})")
    }
    val latest = resolveLatestEvents(events,
      Seq("__del", "__instant") ++ dataCols, pcField)
    val windowKeys = events
      .filter(col("__instant") > fromExclusive &&
        col("__instant") <= toInclusive)
      .select(col("file_id"), col("__key")).distinct()
    val derivedTouchedPlain = latest
      .join(windowKeys, Seq("file_id", "__key"), "left_semi")
    val (touchedLatest, antiKeySet) =
      if (!useCdc) {
        (derivedTouchedPlain, latest.select(col("file_id"), col("__key")))
      } else {
        val cdcEvents = allEvents.filter(col("__cdc"))
        val cdcGroups = cdcEvents.select(col("file_id")).distinct()
        val cdcLatest = resolveLatestEvents(cdcEvents,
          Seq("__del", "__instant") ++ dataCols, None)
        val cdcTouched = cdcLatest.join(
          cdcEvents.filter(col("__instant") > fromExclusive &&
              col("__instant") <= toInclusive)
            .select(col("file_id"), col("__key")).distinct(),
          Seq("file_id", "__key"), "left_semi")
        (derivedTouchedPlain
          .join(broadcast(cdcGroups), Seq("file_id"), "left_anti")
          .unionByName(cdcTouched),
          latest.select(col("file_id"), col("__key"))
            .unionByName(cdcLatest.select(col("file_id"), col("__key"))))
      }
    val eventUpserts = touchedLatest.filter(!col("__del"))
      .select(Seq(col("file_id"), col("__key")) ++ dataCols.map(col): _*)
    // window-added base rows whose keys no event ever touched (a
    // touched key's truth lives in eventUpserts/deletes instead); the
    // anti join broadcasts the log-sized key set
    val newBaseRows =
      if (newBasePaths.isEmpty) None
      else Some(spark.read.parquet(newBasePaths: _*)
        .withColumn("__name",
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
        .join(broadcast(newBases.select(
          regexp_extract(col("base_path"), "([^/]+)$", 1).as("__name"),
          col("file_id"))), "__name")
        .withColumn("__key", keyColumn(keyFields))
        .join(broadcast(antiKeySet), Seq("file_id", "__key"), "left_anti")
        .select(Seq(col("file_id"), col("__key")) ++
          dataCols.map(col): _*))
    val upserts = (Seq(eventUpserts) ++ newBaseRows.toSeq)
      .reduce(_ unionByName _)
      .select(Seq(lit("upsert").as("change_type"),
        col("__key").as("record_key")) ++ dataCols.map(col): _*)
    // a window key whose latest event is a delete died last. A
    // BOOTSTRAP carries no deletes: the consumer starts from nothing,
    // so a key that died before `to` never existed for it (the
    // delta-CDF/iceberg bootstrap contract).
    if (fromExclusive == "0") upserts
    else {
      val deletes = touchedLatest.filter(col("__del"))
        .select(Seq(lit("delete").as("change_type"),
          col("__key").as("record_key")) ++
          dataSchema.fields.toSeq.map(f =>
            lit(null).cast(f.dataType).as(f.name)): _*)
      upserts.unionByName(deletes)
    }
  }

  // ---------------------------------------------------------------------
  // Deterministic fixture writer (tests + oracle queries)
  // ---------------------------------------------------------------------

  /**
   * Hand-write a filesystem Hudi COW table against the public spec:
   * two completed commits — c1 (20240101...) inserts file groups
   * `fid0`/`fid1` under `p=0`, c2 (20240102...) REWRITES fid0 (a new
   * slice of the same group — copy-on-write supersession) and inserts
   * `fid2` under `p=1`. Each instant leaves its `requested`/`inflight`
   * markers; a DANGLING incomplete instant (20240103....requested)
   * and an ORPHAN base file (`fid3_...` declared by no commit) are
   * both planted — neither may reach the live view. c1's stats for
   * fid1 LIE about `numWrites` by +1, so the census conformance flag
   * is exercised. Returns rows per relative base-file path.
   */
  /** Write the given `(relPath -> slice)` base files in ONE Spark job
    * (a tagged union through [[FixtureIO.writeSlices]]) instead of one
    * coalesce(1) job per file — the same job-count cut the delta/iceberg
    * builders took in the previous round (guide §1.2: fewer passes).
    * Slices must share a schema; each lands as exactly one parquet file
    * at its relPath, rows ascending by the frame's first column. */
  private def writeBaseSlices(root: java.io.File, tmpBase: String,
      slices: Seq[(String, DataFrame)]): Seq[(String, Long)] = {
    val tagged = slices.zipWithIndex
      .map { case ((_, df), i) => df.withColumn("__fslice", lit(i)) }
      .reduce(_ unionByName _)
    val counts = FixtureIO.writeSlices(tagged, col("__fslice"), slices.size,
      tmpBase,
      { i =>
        val dst = new java.io.File(root, slices(i)._1)
        dst.getParentFile.mkdirs()
        dst
      }, dropCols = Seq("__fslice"))
    slices.indices.map(i => slices(i)._1 -> counts(i))
  }

  def writeHudiFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_fixture\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    def writeSlice(part: String, fid: String, instant: String,
        slice: DataFrame): (String, Long) = {
      val rel = s"$part/${fid}_0-0-0_$instant.parquet"
      val dst = new java.io.File(root, rel)
      dst.getParentFile.mkdirs()
      rel -> FixtureIO.writeSingleParquet(slice, dst,
        dir + s"_hudi_${fid}_$instant")
    }
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val g0 = base.filter(pmod(col("doc_id"), lit(3)) === 0)
    // all four declared base files in ONE job; c2's fid0 slice rewrites
    // the same group's rows with n_chars bumped (an update), superseding s0
    val Seq(s0, s1, s0b, s2) = writeBaseSlices(root, dir + "_hudi", Seq(
      s"p=0/fid0_0-0-0_$c1.parquet" -> g0,
      s"p=0/fid1_0-0-0_$c1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=0/fid0_0-0-0_$c2.parquet" ->
        g0.withColumn("n_chars", col("n_chars") + 1L),
      s"p=1/fid2_0-0-0_$c2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2)))
    // the orphan: a base file no commit declares (a failed write's
    // leftover) — must never surface. Kept as its own tiny write: the
    // un-ordered limit must not ride a union exchange (row choice would
    // become plan-dependent)
    writeSlice("p=1", "fid3", "20240103000000000",
      base.filter(pmod(col("doc_id"), lit(3)) === 2).limit(5))
    def stat(part: String, fid: String, rel: String, rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def avroFieldsJson(names: Seq[String]): String =
      names.map { n =>
        val t = if (n == "doc_id" || n == "n_chars") "long" else "string"
        s"""{\\"name\\":\\"$n\\",\\"type\\":[\\"null\\",\\"$t\\"]}"""
      }.mkString(",")
    def commit(instant: String, op: String,
        byPart: Map[String, Seq[String]],
        schemaFields: Seq[String]): Unit = {
      val stats = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString(",")
      // the commit stamps its avro writer schema (escaped JSON-in-JSON,
      // the way hudi's own commit metadata carries it)
      val schema = "{\\\"type\\\":\\\"record\\\",\\\"name\\\":\\\"graft\\\"," +
        "\\\"fields\\\":[" + avroFieldsJson(schemaFields) + "]}"
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit").toPath,
        (s"""{"partitionToWriteStats":{$stats},"operationType":"$op",""" +
          s""""extraMetadata":{"schema":"$schema"}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit.inflight").toPath,
        Array.empty[Byte])
    }
    commit(c1, "upsert", Map("p=0" -> Seq(
      stat("p=0", "fid0", s0._1, s0._2),
      // the planted lie: one more row than fid1's file holds
      stat("p=0", "fid1", s1._1, s1._2 + 1))),
      Seq("doc_id", "lang", "n_chars"))
    // c2 EVOLVES the declared schema (+quality) — no base file carries
    // the new field yet, the classic backfill gap conformance flags
    commit(c2, "upsert", Map(
      "p=0" -> Seq(stat("p=0", "fid0", s0b._1, s0b._2)),
      "p=1" -> Seq(stat("p=1", "fid2", s2._1, s2._2))),
      Seq("doc_id", "lang", "n_chars", "quality"))
    // the dangling incomplete instant
    java.nio.file.Files.write(
      new java.io.File(hoodie, "20240103000000000.commit.requested").toPath,
      Array.empty[Byte])
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s0b._1 -> s0b._2, s2._1 -> s2._2)
  }

  /**
   * Hand-write a filesystem Hudi COW table shaped for the SLICE-DIFF
   * change feed ([[cowIncrementalRows]]): c1 inserts `fid0`
   * (doc_id%3==0) and `fid1` (%3==1) under `p=0`; c2 REWRITES fid0 —
   * the %15==0 keys DROPPED (deletes), the %12==0-but-not-%15==0 keys
   * updated (n_chars+100), the rest byte-identical (must emit
   * nothing) — and inserts `fid2` (%3==2) under `p=1`. fid1 is
   * untouched (must never be read, let alone emitted).
   * `hoodie.table.recordkey.fields=doc_id`. Returns rows per relative
   * base-file path.
   */
  def writeHudiCowDiffFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_cowdiff_fixture\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n" +
        "hoodie.table.recordkey.fields=doc_id\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val g0 = base.filter(pmod(col("doc_id"), lit(3)) === 0)
    // all four base files in ONE job; fid0's c2 slice is the rewrite:
    // drop %15==0, bump %12==0 survivors, keep the rest
    val Seq(s0, s1, s0b, s2) = writeBaseSlices(root, dir + "_hudicd", Seq(
      s"p=0/fid0_0-0-0_$c1.parquet" -> g0,
      s"p=0/fid1_0-0-0_$c1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=0/fid0_0-0-0_$c2.parquet" ->
        g0.filter(pmod(col("doc_id"), lit(15)) =!= 0)
          .withColumn("n_chars",
            when(pmod(col("doc_id"), lit(12)) === 0,
              col("n_chars") + 100L).otherwise(col("n_chars"))),
      s"p=1/fid2_0-0-0_$c2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2)))
    def stat(part: String, fid: String, rel: String, rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def commit(instant: String, byPart: Map[String, Seq[String]]): Unit = {
      val stats = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString(",")
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit").toPath,
        (s"""{"partitionToWriteStats":{$stats},""" +
          """"operationType":"upsert"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.commit.inflight").toPath,
        Array.empty[Byte])
    }
    commit(c1, Map("p=0" -> Seq(
      stat("p=0", "fid0", s0._1, s0._2),
      stat("p=0", "fid1", s1._1, s1._2))))
    commit(c2, Map(
      "p=0" -> Seq(stat("p=0", "fid0", s0b._1, s0b._2)),
      "p=1" -> Seq(stat("p=1", "fid2", s2._1, s2._2))))
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s0b._1 -> s0b._2, s2._1 -> s2._2)
  }

  /**
   * Hand-write a filesystem Hudi 1.x (table version 8) COW table: the
   * ACTIVE timeline lives under `.hoodie/timeline/`, COMPLETED
   * instants are named `<beginTime>_<endTime>.<action>` (begin = the
   * request time file slices embed, end = the completion time that
   * orders visibility), requested/inflight markers keep the 0.x
   * shape, and `.hoodie/timeline/history/` holds the archived-LSM
   * subdirectory the active listing must skip. Content mirrors
   * [[writeHudiFixtureTable]] exactly — c1 inserts fid0/fid1 under
   * `p=0` (fid1's declared numWrites LIES by +1), c2 rewrites fid0
   * and inserts fid2 under `p=1` with an evolved declared schema, an
   * ORPHAN base file and a dangling requested instant are planted —
   * so the 0.x oracles' numbers carry over verbatim. Returns rows per
   * relative base-file path.
   */
  def writeHudiV1xFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    val tdir = new java.io.File(hoodie, "timeline")
    tdir.mkdirs()
    // the archived-LSM subdirectory: present, never listed as active
    val history = new java.io.File(tdir, "history")
    history.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(history, "00000001.parquet").toPath,
      Array.fill[Byte](8)(0x11))
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_v1x_fixture\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=8\n" +
        "hoodie.timeline.layout.version=2\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val (c1End, c2End) = ("20240101000000500", "20240102000000500")
    def writeSlice(part: String, fid: String, instant: String,
        slice: DataFrame): (String, Long) = {
      val rel = s"$part/${fid}_0-0-0_$instant.parquet"
      val dst = new java.io.File(root, rel)
      dst.getParentFile.mkdirs()
      rel -> FixtureIO.writeSingleParquet(slice, dst,
        dir + s"_hudiv1x_${fid}_$instant")
    }
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val g0v = base.filter(pmod(col("doc_id"), lit(3)) === 0)
    // all four declared base files in ONE job (see writeBaseSlices)
    val Seq(s0, s1, s0b, s2) = writeBaseSlices(root, dir + "_hudiv1x", Seq(
      s"p=0/fid0_0-0-0_$c1.parquet" -> g0v,
      s"p=0/fid1_0-0-0_$c1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=0/fid0_0-0-0_$c2.parquet" ->
        g0v.withColumn("n_chars", col("n_chars") + 1L),
      s"p=1/fid2_0-0-0_$c2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2)))
    // the orphan: a base file no commit declares. Own tiny write — the
    // un-ordered limit must not ride a union exchange
    writeSlice("p=1", "fid3", "20240103000000000",
      base.filter(pmod(col("doc_id"), lit(3)) === 2).limit(5))
    def stat(part: String, fid: String, rel: String, rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def avroFieldsJson(names: Seq[String]): String =
      names.map { n =>
        val t = if (n == "doc_id" || n == "n_chars") "long" else "string"
        s"""{\\"name\\":\\"$n\\",\\"type\\":[\\"null\\",\\"$t\\"]}"""
      }.mkString(",")
    def commit(begin: String, end: String, op: String,
        byPart: Map[String, Seq[String]],
        schemaFields: Seq[String]): Unit = {
      val stats = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString(",")
      val schema = "{\\\"type\\\":\\\"record\\\",\\\"name\\\":\\\"graft\\\"," +
        "\\\"fields\\\":[" + avroFieldsJson(schemaFields) + "]}"
      java.nio.file.Files.write(
        new java.io.File(tdir, s"${begin}_$end.commit").toPath,
        (s"""{"partitionToWriteStats":{$stats},"operationType":"$op",""" +
          s""""extraMetadata":{"schema":"$schema"}}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(tdir, s"$begin.commit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(tdir, s"$begin.commit.inflight").toPath,
        Array.empty[Byte])
    }
    commit(c1, c1End, "upsert", Map("p=0" -> Seq(
      stat("p=0", "fid0", s0._1, s0._2),
      // the planted lie: one more row than fid1's file holds
      stat("p=0", "fid1", s1._1, s1._2 + 1))),
      Seq("doc_id", "lang", "n_chars"))
    commit(c2, c2End, "upsert", Map(
      "p=0" -> Seq(stat("p=0", "fid0", s0b._1, s0b._2)),
      "p=1" -> Seq(stat("p=1", "fid2", s2._1, s2._2))),
      Seq("doc_id", "lang", "n_chars", "quality"))
    // the dangling incomplete instant
    java.nio.file.Files.write(
      new java.io.File(tdir, "20240103000000000.commit.requested").toPath,
      Array.empty[Byte])
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s0b._1 -> s0b._2, s2._1 -> s2._2)
  }

  /**
   * Extend [[writeHudiFixtureTable]] with a `.hoodie/metadata/` table
   * (the spec's metadata index, itself a Hudi MOR table) whose `files`
   * partition carries parquet-base HoodieMetadataPayload records —
   * with two PLANTED divergences for [[metadataFilesAudit]]: the
   * index still lists fid0's SUPERSEDED c1 slice (a stale entry,
   * size 77) and MISSES fid2 (a lagging index); a `__all_partitions__`
   * type-1 record and an `isDeleted=true` entry (the orphan) are
   * planted too — both must be filtered, never audited. Returns the
   * data table's rows per relative base-file path.
   */
  def writeHudiMetadataFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = writeHudiFixtureTable(spark, dir, docs)
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val mdRoot = new java.io.File(dir, ".hoodie/metadata")
    val mdHoodie = new java.io.File(mdRoot, ".hoodie")
    mdHoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_md_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val infoType = StructType(Seq(
      StructField("size", LongType, nullable = false),
      StructField("isDeleted", BooleanType, nullable = false)))
    val mdSchema = StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("type", IntegerType, nullable = false),
      StructField("filesystemMetadata",
        MapType(StringType, infoType, valueContainsNull = false))))
    def name(rel: String): String = rel.substring(rel.lastIndexOf('/') + 1)
    val fid0c1 = s"p=0/fid0_0-0-0_$c1.parquet"
    val fid0c2 = s"p=0/fid0_0-0-0_$c2.parquet"
    val fid1c1 = s"p=0/fid1_0-0-0_$c1.parquet"
    val recs = Seq(
      Row("__all_partitions__", 1,
        Map("p=0" -> Row(0L, false), "p=1" -> Row(0L, false))),
      Row("p=0", 2, Map(
        name(fid0c2) -> Row(rows(fid0c2), false),
        name(fid1c1) -> Row(rows(fid1c1), false),
        // STALE: the superseded c1 slice still listed as live
        name(fid0c1) -> Row(77L, false))),
      // LAGGING: fid2 missing; the orphan present but isDeleted
      Row("p=1", 2, Map(
        "fid3_0-0-0_20240103000000000.parquet" -> Row(5L, true))))
    val mdDf = spark.createDataFrame(
      spark.sparkContext.parallelize(recs, 1), mdSchema)
    val mdInstant = "20240102000001000"
    val baseRel = s"files/files-0000_0-0-0_$mdInstant.parquet"
    val dst = new java.io.File(mdRoot, baseRel)
    dst.getParentFile.mkdirs()
    val nRecs = FixtureIO.writeSingleParquet(mdDf, dst, dir + "_hudimd")
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"files":[{"fileId":"files-0000",""" +
        s""""path":"$baseRel","numWrites":$nRecs,"numDeletes":0,""" +
        s""""numInserts":$nRecs,"totalWriteBytes":${dst.length()},""" +
        s""""partitionPath":"files"}]},"operationType":"upsert"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit.requested").toPath,
      Array.empty[Byte])
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit.inflight").toPath,
      Array.empty[Byte])
    rows
  }

  /**
   * [[writeHudiMetadataFixtureTable]]'s HFILE twin (r19): the same
   * data table and the same planted divergences (stale fid0-c1 entry
   * size 77, lagging fid2, a type-1 `__all_partitions__` record, an
   * `isDeleted` orphan), but the metadata `files` partition's base
   * file is a real HFILE — CRC32C-checksummed blocks, a root index
   * (two cells per block, so the index carries several entries), and
   * avro [[MetadataPayloadAvroSchema]] cell values — written at HFile
   * major version `hfileMajor` (2 or 3). Returns the data table's
   * rows per relative base-file path.
   */
  def writeHudiMetadataHFileFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame,
      hfileMajor: Int = 2): Map[String, Long] = {
    val rows = writeHudiFixtureTable(spark, dir, docs)
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val mdRoot = new java.io.File(dir, ".hoodie/metadata")
    val mdHoodie = new java.io.File(mdRoot, ".hoodie")
    mdHoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_mdh_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def name(rel: String): String = rel.substring(rel.lastIndexOf('/') + 1)
    val fid0c1 = s"p=0/fid0_0-0-0_$c1.parquet"
    val fid0c2 = s"p=0/fid0_0-0-0_$c2.parquet"
    val fid1c1 = s"p=0/fid1_0-0-0_$c1.parquet"
    def payload(key: String, tpe: Int,
        files: Seq[(String, Long, Boolean)]): Array[Byte] = {
      val r = new org.apache.avro.generic.GenericData.Record(
        MetadataPayloadAvroSchema)
      r.put("key", key)
      r.put("type", tpe)
      val m = new java.util.HashMap[String, AnyRef]()
      val infoSchema = MetadataPayloadAvroSchema
        .getField("filesystemMetadata").schema().getTypes.get(1)
        .getValueType
      files.foreach { case (n, size, deleted) =>
        val fr = new org.apache.avro.generic.GenericData.Record(infoSchema)
        fr.put("size", java.lang.Long.valueOf(size))
        fr.put("isDeleted", java.lang.Boolean.valueOf(deleted))
        m.put(n, fr)
      }
      r.put("filesystemMetadata", m)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get()
        .binaryEncoder(bos, null)
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](MetadataPayloadAvroSchema)
        .write(r, enc)
      enc.flush()
      bos.toByteArray
    }
    // cells in row-key order, the HFile invariant
    val cells = Seq(
      "__all_partitions__" -> payload("__all_partitions__", 1,
        Seq(("p=0", 0L, false), ("p=1", 0L, false))),
      "p=0" -> payload("p=0", 2, Seq(
        (name(fid0c2), rows(fid0c2), false),
        (name(fid1c1), rows(fid1c1), false),
        (name(fid0c1), 77L, false))),
      "p=1" -> payload("p=1", 2, Seq(
        ("fid3_0-0-0_20240103000000000.parquet", 5L, true))))
    val bytes = HFile.write(cells, perBlock = 2, majorVersion = hfileMajor)
    val mdInstant = "20240102000001000"
    val baseRel = s"files/files-0000_0-0-0_$mdInstant.hfile"
    val dst = new java.io.File(mdRoot, baseRel)
    dst.getParentFile.mkdirs()
    java.nio.file.Files.write(dst.toPath, bytes)
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"files":[{"fileId":"files-0000",""" +
        s""""path":"$baseRel","numWrites":${cells.size},"numDeletes":0,""" +
        s""""numInserts":${cells.size},"totalWriteBytes":${dst.length()},""" +
        s""""partitionPath":"files"}]},"operationType":"upsert"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit.requested").toPath,
      Array.empty[Byte])
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant.deltacommit.inflight").toPath,
      Array.empty[Byte])
    rows
  }

  /**
   * [[writeHudiMetadataHFileFixtureTable]] plus an UN-COMPACTED
   * metadata LOG (r19): a second metadata deltacommit appends a log
   * file to the files-0000 slice whose single `hfile-data` block
   * carries the index CATCHING UP — a p=0 record tombstoning the
   * stale fid0-c1 entry (isDeleted) and a p=1 record adding the
   * previously-lagging fid2 — followed by a garbage tail (a failed
   * append the walk must skip). The merged audit is therefore fully
   * clean: three rows, all matched; the stale row disappears
   * entirely (tombstoned AND undeclared). Returns the data table's
   * rows per relative base-file path.
   */
  def writeHudiMetadataHFileLogFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val rows = writeHudiMetadataHFileFixtureTable(spark, dir, docs)
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val mdRoot = new java.io.File(dir, ".hoodie/metadata")
    val mdHoodie = new java.io.File(mdRoot, ".hoodie")
    val baseInstant = "20240102000001000"
    val mdInstant2 = "20240102000002000"
    def payload(key: String,
        files: Seq[(String, Long, Boolean)]): Array[Byte] = {
      val r = new org.apache.avro.generic.GenericData.Record(
        MetadataPayloadAvroSchema)
      r.put("key", key)
      r.put("type", 2)
      val m = new java.util.HashMap[String, AnyRef]()
      val infoSchema = MetadataPayloadAvroSchema
        .getField("filesystemMetadata").schema().getTypes.get(1)
        .getValueType
      files.foreach { case (n, size, deleted) =>
        val fr = new org.apache.avro.generic.GenericData.Record(infoSchema)
        fr.put("size", java.lang.Long.valueOf(size))
        fr.put("isDeleted", java.lang.Boolean.valueOf(deleted))
        m.put(n, fr)
      }
      r.put("filesystemMetadata", m)
      val bos = new java.io.ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get()
        .binaryEncoder(bos, null)
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](MetadataPayloadAvroSchema)
        .write(r, enc)
      enc.flush()
      bos.toByteArray
    }
    val img = HFile.write(Seq(
      "p=0" -> payload("p=0",
        Seq((s"fid0_0-0-0_$c1.parquet", 77L, true))),
      "p=1" -> payload("p=1",
        Seq((s"fid2_0-0-0_$c2.parquet",
          rows(s"p=1/fid2_0-0-0_$c2.parquet"), false)))),
      perBlock = 2)
    import HudiLogFormat._
    val logRel = s"files/.files-0000_$baseInstant.log.1_0-0-0"
    val logBytes = frameBlock(HfileDataBlock,
        Map(InstantTime -> mdInstant2), img) ++
      Array.tabulate[Byte](17)(i => (i % 5 + 1).toByte)
    val dst = new java.io.File(mdRoot, logRel)
    java.nio.file.Files.write(dst.toPath, logBytes)
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, s"$mdInstant2.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"files":[{"fileId":"files-0000",""" +
        s""""path":"$logRel","numWrites":2,"numDeletes":1,""" +
        s""""numInserts":0,"numUpdateWrites":2,""" +
        s""""totalWriteBytes":${dst.length()},""" +
        s""""partitionPath":"files"}]},"operationType":"upsert"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(mdHoodie,
      s"$mdInstant2.deltacommit.requested").toPath, Array.empty[Byte])
    java.nio.file.Files.write(new java.io.File(mdHoodie,
      s"$mdInstant2.deltacommit.inflight").toPath, Array.empty[Byte])
    rows
  }

  /**
   * Hand-write a filesystem Hudi COW table with a CLUSTERING
   * replacecommit against the public spec: c1 inserts file groups
   * `fid0`/`fid1` under `p=0`, c2 inserts `fid2` under `p=1`, and rc3
   * (a completed `replacecommit`, HoodieReplaceCommitMetadata shape)
   * clusters fid0+fid1 into the single `fid3` — its
   * `partitionToWriteStats` declares the new base and its
   * `partitionToReplaceFileIds` kills the two old groups. The live
   * view after rc3 is {fid3, fid2}; time travel to c2 still serves
   * {fid0, fid1, fid2}; an incremental pull never reports rc3's
   * output (clustering changed no logical rows). Returns rows per
   * relative base-file path.
   */
  def writeHudiClusteredFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_clustered_fixture\n" +
        "hoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.version=6\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (c1, c2, rc3) =
      ("20240101000000000", "20240102000000000", "20240103000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // all four base files in ONE job (see writeBaseSlices); the last is
    // the clustered output: fid0's and fid1's rows in one base file
    val Seq(s0, s1, s2, s3) = writeBaseSlices(root, dir + "_hudicl", Seq(
      s"p=0/fid0_0-0-0_$c1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 0),
      s"p=0/fid1_0-0-0_$c1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=1/fid2_0-0-0_$c2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2),
      s"p=0/fid3_0-0-0_$rc3.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) < 2)))
    def stat(part: String, fid: String, rel: String, rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def marker(name: String): Unit =
      java.nio.file.Files.write(new java.io.File(hoodie, name).toPath,
        Array.empty[Byte])
    def commit(instant: String, action: String, body: String): Unit = {
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.$action").toPath,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      marker(s"$instant.$action.requested")
      marker(s"$instant.$action.inflight")
    }
    commit(c1, "commit",
      s"""{"partitionToWriteStats":{"p=0":[
         |${stat("p=0", "fid0", s0._1, s0._2)},
         |${stat("p=0", "fid1", s1._1, s1._2)}]},
         |"operationType":"upsert"}""".stripMargin.replace("\n", ""))
    commit(c2, "commit",
      s"""{"partitionToWriteStats":{"p=1":[
         |${stat("p=1", "fid2", s2._1, s2._2)}]},
         |"operationType":"upsert"}""".stripMargin.replace("\n", ""))
    commit(rc3, "replacecommit",
      s"""{"partitionToWriteStats":{"p=0":[
         |${stat("p=0", "fid3", s3._1, s3._2)}]},
         |"partitionToReplaceFileIds":{"p=0":["fid0","fid1"]},
         |"operationType":"cluster"}""".stripMargin.replace("\n", ""))
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s2._1 -> s2._2, s3._1 -> s3._2)
  }

  /**
   * Hand-write a filesystem Hudi MERGE-ON-READ table against the
   * public spec: three completed DELTACOMMITs — dc1 inserts base
   * files `fid0`/`fid1` under `p=0` (fid1's declared `numWrites` LIES
   * by +1, exercising base conformance); dc2 appends LOG file v1 to
   * fid0's slice (3 declared update rows, HoodieDeltaWriteStat shape
   * with `baseFile`/`logVersion`) and inserts base `fid2` under
   * `p=1`; dc3 appends log v2 to the same slice (2 declared rows) —
   * a real on-disk `.log` chain. Log files carry the HoodieLogFormat
   * magic (`#HUDI#`) plus opaque payload: this tier reads DECLARED
   * stats, never log blocks, and the census must not touch them. A
   * dangling requested deltacommit and a bare `<instant>.inflight`
   * COMMIT marker (the no-action-token layout real Hudi writes) are
   * planted — neither may surface as completed. Returns rows per
   * relative base-file path.
   */
  def writeHudiMorFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_mor_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (dc1, dc2, dc3) =
      ("20240101000000000", "20240102000000000", "20240103000000000")
    def writeLog(part: String, fid: String, baseInstant: String,
        version: Int, payload: Int): String = {
      val rel = s"$part/.${fid}_$baseInstant.log.${version}_0-0-0"
      val dst = new java.io.File(root, rel)
      dst.getParentFile.mkdirs()
      // HoodieLogFormat magic + opaque bytes: declared stats are the
      // source of truth here, the block payload is never parsed
      java.nio.file.Files.write(dst.toPath,
        "#HUDI#".getBytes(java.nio.charset.StandardCharsets.UTF_8) ++
          Array.fill[Byte](payload)(0x5A))
      rel
    }
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // all three base files in ONE job
    val Seq(s0, s1, s2) = writeBaseSlices(root, dir + "_hudimor", Seq(
      s"p=0/fid0_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 0),
      s"p=0/fid1_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=1/fid2_0-0-0_$dc2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2)))
    val log1 = writeLog("p=0", "fid0", dc1, 1, 64)
    val log2 = writeLog("p=0", "fid0", dc1, 2, 48)
    def baseStat(part: String, fid: String, rel: String,
        rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def logStat(part: String, fid: String, rel: String, baseRel: String,
        version: Int, rows: Long): String = {
      val baseName = baseRel.substring(baseRel.lastIndexOf('/') + 1)
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":0,"numUpdateWrites":$rows,
         |"baseFile":"$baseName","logVersion":$version,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    }
    def deltacommit(instant: String,
        byPart: Map[String, Seq[String]]): Unit = {
      val stats = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString(",")
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit").toPath,
        s"""{"partitionToWriteStats":{$stats},"operationType":"upsert"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    deltacommit(dc1, Map("p=0" -> Seq(
      baseStat("p=0", "fid0", s0._1, s0._2),
      // the planted lie: one more row than fid1's base file holds
      baseStat("p=0", "fid1", s1._1, s1._2 + 1))))
    deltacommit(dc2, Map(
      "p=0" -> Seq(logStat("p=0", "fid0", log1, s0._1, 1, 3L)),
      "p=1" -> Seq(baseStat("p=1", "fid2", s2._1, s2._2))))
    deltacommit(dc3, Map(
      "p=0" -> Seq(logStat("p=0", "fid0", log2, s0._1, 2, 2L))))
    // dangling incomplete deltacommit + the bare .inflight COMMIT marker
    java.nio.file.Files.write(
      new java.io.File(hoodie,
        "20240104000000000.deltacommit.requested").toPath,
      Array.empty[Byte])
    java.nio.file.Files.write(
      new java.io.File(hoodie, "20240105000000000.inflight").toPath,
      Array.empty[Byte])
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s2._1 -> s2._2)
  }

  /**
   * Hand-write a filesystem Hudi MERGE-ON-READ table whose log files
   * carry REAL HoodieLogFormat blocks ([[HudiLogFormat]]) — the
   * per-row merge fixture. Deterministic from `docs` (doc_id is the
   * record key, dense at every scale factor):
   *
   *  - dc1 inserts base `fid0` (doc_id%3==0) and `fid1` (%3==1) under
   *    `p=0`;
   *  - dc2 inserts base `fid2` (%3==2) under `p=1` and appends LOG v1
   *    to fid0's slice: an avro data block UPDATING the %30==0 keys
   *    (n_chars+100), then 24 bytes of mid-file GARBAGE (a failed
   *    append the walk must scan past), then a second data block
   *    INSERTING new keys (doc_id+9000000, lang='xx', n_chars=7) for
   *    the %150==0 keys;
   *  - dc3 appends LOG v2: a DELETE block for the %15==0 keys, then a
   *    data block updating the %60==0 keys to (lang='zz', n_chars=-5)
   *    — delete-then-update resurrection, last event wins;
   *  - dc4 (NEVER completed: requested+inflight only) appended a data
   *    block setting n_chars=-999 everywhere, then was ROLLED BACK:
   *    the completed rollback instant rb5 appended a command block
   *    targeting dc4;
   *  - dc6 (in-flight) appended a data block (n_chars=-888) with no
   *    rollback — invisible purely by the completed-instants rule;
   *  - the log tail is a TRUNCATED partial block (magic + a size that
   *    runs past EOF), the killed-mid-append shape.
   *
   * The merged live view is therefore: fid0's rows with U2 (%60==0 →
   * 'zz'/-5) over U1 (%30==0 → n_chars+100) over base, minus the
   * %15==0 deletes not resurrected by U2, plus the 4 inserts; fid1
   * and fid2 untouched. Returns rows per relative base-file path.
   */
  def writeHudiMorLogFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      // NO precombine field: this fixture pins the OVERWRITE-WITH-
      // LATEST (arrival-order) contract; the precombine fixture
      // ([[writeHudiMorPrecombineFixtureTable]]) pins the ordered one
      ("hoodie.table.name=graft_hudi_morlog_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n" +
        "hoodie.table.recordkey.fields=doc_id\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (dc1, dc2, dc3, dc4, rb5, dc6) =
      ("20240101000000000", "20240102000000000", "20240103000000000",
        "20240104000000000", "20240105000000000", "20240106000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // all three base files in ONE job
    val Seq(s0, s1, s2) = writeBaseSlices(root, dir + "_hudimrl", Seq(
      s"p=0/fid0_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 0),
      s"p=0/fid1_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 1),
      s"p=1/fid2_0-0-0_$dc2.parquet" ->
        base.filter(pmod(col("doc_id"), lit(3)) === 2)))
    // the avro writer schema dc2/dc3 stamp into their data blocks —
    // nullable unions, the shape hudi's own commit schemas use
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_mor","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    def rec(id: Long, lang: Option[String], n: Option[Long]):
        org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(avroSchema)
      r.put("doc_id", id)
      r.put("lang", lang.orNull)
      r.put("n_chars", n.map(java.lang.Long.valueOf).orNull)
      r
    }
    // deterministic event sets, collected doc_id-ordered (fixture-
    // sized driver work, same boundary as every fixture writer here)
    val g = base.filter(pmod(col("doc_id"), lit(3)) === 0)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val u1 = g.filter(_._1 % 30 == 0)
      .map { case (id, l, n) => rec(id, l, n.map(_ + 100L)) }
    val ins = g.filter(_._1 % 150 == 0)
      .map { case (id, _, _) => rec(id + 9000000L, Some("xx"), Some(7L)) }
    val delKeys = g.filter(_._1 % 15 == 0).map(_._1.toString).toSeq
    val u2 = g.filter(_._1 % 60 == 0)
      .map { case (id, _, _) => rec(id, Some("zz"), Some(-5L)) }
    val rolled = g.map { case (id, l, _) => rec(id, l, Some(-999L)) }
    val inflight = g.take(3).map { case (id, l, _) =>
      rec(id, l, Some(-888L)) }
    import HudiLogFormat._
    def dataBlock(instant: String,
        rs: Seq[org.apache.avro.generic.GenericRecord]): Array[Byte] =
      frameBlock(AvroDataBlock,
        Map(InstantTime -> instant, Schema -> avroSchema.toString),
        avroDataContent(avroSchema, rs))
    val garbage = Array.tabulate[Byte](24)(i => (i % 7 + 1).toByte)
    val log1Rel = s"p=0/.fid0_$dc1.log.1_0-0-0"
    val log1 = dataBlock(dc2, u1.toSeq) ++ garbage ++
      dataBlock(dc2, ins.toSeq)
    val truncated = Magic ++ Array[Byte](0, 0, 0, 0, 0, 0, 39, 15, 1, 2)
    val log2Rel = s"p=0/.fid0_$dc1.log.2_0-0-0"
    val log2 = frameBlock(DeleteBlock, Map(InstantTime -> dc3),
        deleteContent(delKeys)) ++
      dataBlock(dc3, u2.toSeq) ++
      dataBlock(dc4, rolled.toSeq) ++
      frameBlock(CommandBlock,
        Map(InstantTime -> rb5, TargetInstantTime -> dc4,
          CommandBlockType -> "0"), Array.empty) ++
      dataBlock(dc6, inflight.toSeq) ++
      truncated
    Seq((log1Rel, log1), (log2Rel, log2)).foreach { case (rel, bytes) =>
      val dst = new java.io.File(root, rel)
      dst.getParentFile.mkdirs()
      java.nio.file.Files.write(dst.toPath, bytes)
    }
    def baseStat(part: String, fid: String, rel: String,
        rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def logStat(part: String, fid: String, rel: String,
        rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":0,"numUpdateWrites":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
    def deltacommit(instant: String,
        byPart: Map[String, Seq[String]]): Unit = {
      val stats = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString(",")
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit").toPath,
        s"""{"partitionToWriteStats":{$stats},"operationType":"upsert"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    deltacommit(dc1, Map("p=0" -> Seq(
      baseStat("p=0", "fid0", s0._1, s0._2),
      baseStat("p=0", "fid1", s1._1, s1._2))))
    deltacommit(dc2, Map(
      "p=0" -> Seq(logStat("p=0", "fid0", log1Rel,
        u1.length.toLong + ins.length)),
      "p=1" -> Seq(baseStat("p=1", "fid2", s2._1, s2._2))))
    deltacommit(dc3, Map(
      "p=0" -> Seq(logStat("p=0", "fid0", log2Rel,
        delKeys.size.toLong + u2.length))))
    // dc4: rolled back, never completed; rb5: the completed rollback;
    // dc6: still in flight
    def marker(name: String): Unit =
      java.nio.file.Files.write(new java.io.File(hoodie, name).toPath,
        Array.empty[Byte])
    marker(s"$dc4.deltacommit.requested")
    marker(s"$dc4.deltacommit.inflight")
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$rb5.rollback").toPath,
      "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    marker(s"$rb5.rollback.requested")
    marker(s"$rb5.rollback.inflight")
    marker(s"$dc6.deltacommit.requested")
    marker(s"$dc6.deltacommit.inflight")
    Map(s0._1 -> s0._2, s1._1 -> s1._2, s2._1 -> s2._2)
  }

  /**
   * Hand-write a Hudi MOR table keyed by a COMPOSITE record key
   * (`hoodie.table.recordkey.fields=doc_id,lang` — the complex key
   * generator's production config) with real HoodieLogFormat blocks.
   * Deterministic from `docs`:
   *
   *  - dc1 inserts base `fid0` (doc_id%2==0) and `fid1` (%2==1) under
   *    `p=0`;
   *  - dc2 appends LOG v1 to fid0's slice: an avro data block UPDATING
   *    the %20==0 keys (n_chars+1000, same doc_id+lang → same
   *    composite key), then a DELETE block whose keys are the
   *    `doc_id:<v>,lang:<v>` renderings of the %50==0 rows (null lang
   *    → `__null__`, the public KeyGenUtils placeholder).
   *
   * Merged live view: fid0's rows minus the %50==0 deletes (the
   * %100==0 update-then-delete keys die — last event wins), with
   * %20==0 survivors at n_chars+1000; fid1 untouched. Returns rows
   * per relative base-file path.
   */
  def writeHudiMorCompositeFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_morck_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n" +
        "hoodie.table.recordkey.fields=doc_id,lang\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (dc1, dc2) = ("20240101000000000", "20240102000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // both base files in ONE job (see writeBaseSlices)
    val Seq(s0, s1) = writeBaseSlices(root, dir + "_hudimck", Seq(
      s"p=0/fid0_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(2)) === 0),
      s"p=0/fid1_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(2)) === 1)))
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_morck","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    val g = base.filter(pmod(col("doc_id"), lit(2)) === 0)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.toString),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val updates = g.filter(_._1 % 20 == 0).map { case (id, l, n) =>
      val r = new org.apache.avro.generic.GenericData.Record(avroSchema)
      r.put("doc_id", id)
      r.put("lang", l.orNull)
      r.put("n_chars",
        n.map(v => java.lang.Long.valueOf(v + 1000L)).orNull)
      r
    }
    // the complex key generator's rendering, delete-block side
    val delKeys = g.filter(_._1 % 50 == 0).map { case (id, l, _) =>
      s"doc_id:$id,lang:${l.filter(_.nonEmpty).getOrElse(
        l.fold(NullKeyPart)(_ => EmptyKeyPart))}"
    }.toSeq
    import HudiLogFormat._
    val logRel = s"p=0/.fid0_$dc1.log.1_0-0-0"
    val logBytes = frameBlock(AvroDataBlock,
        Map(InstantTime -> dc2, Schema -> avroSchema.toString),
        avroDataContent(avroSchema, updates.toSeq)) ++
      frameBlock(DeleteBlock, Map(InstantTime -> dc2),
        deleteContent(delKeys))
    val logDst = new java.io.File(root, logRel)
    logDst.getParentFile.mkdirs()
    java.nio.file.Files.write(logDst.toPath, logBytes)
    def baseStat(fid: String, rel: String, rows: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$rows,
         |"numDeletes":0,"numInserts":$rows,
         |"totalWriteBytes":${new java.io.File(root, rel).length()},
         |"partitionPath":"p=0"}""".stripMargin.replace("\n", "")
    def deltacommit(instant: String, stats: Seq[String]): Unit = {
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit").toPath,
        (s"""{"partitionToWriteStats":{"p=0":[${stats.mkString(",")}]},""" +
          s""""operationType":"upsert"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    deltacommit(dc1, Seq(
      baseStat("fid0", s0._1, s0._2), baseStat("fid1", s1._1, s1._2)))
    deltacommit(dc2, Seq(
      s"""{"fileId":"fid0","path":"$logRel",""" +
        s""""numWrites":${updates.length + delKeys.size},""" +
        s""""numDeletes":${delKeys.size},"numInserts":0,""" +
        s""""numUpdateWrites":${updates.length},""" +
        s""""totalWriteBytes":${logDst.length()},""" +
        s""""partitionPath":"p=0"}"""))
    Map(s0._1 -> s0._2, s1._1 -> s1._2)
  }

  /**
   * Hand-write a Hudi MOR table with a PRECOMBINE (ordering) field
   * (`hoodie.table.precombine.field=n_chars`) whose log events arrive
   * in an order that DISAGREES with their ordering values — the
   * resolution must differ from last-wins. Deterministic from `docs`:
   *
   *  - dc1 inserts base `fid0` (all rows) under `p=0`;
   *  - dc2 appends LOG v1: data block A updates the %10==0 keys to
   *    (lang='hi', n_chars=500) — arrives FIRST, HIGH ordering; then
   *    a DELETE block for the %25==0 keys; then data block B updates
   *    the %10==0 keys to (lang='lo', n_chars=100) — arrives LAST,
   *    LOW ordering.
   *
   * Precombine-resolved view: every %10==0 key holds ('hi', 500) — A
   * beats B on ordering (last-wins would say 'lo'/100) and beats the
   * delete (null ordering sorts lowest), so the %50==0
   * update-and-deleted keys SURVIVE; the delete-only keys
   * (%25==0 ∧ ¬%50==0) die. Returns rows per relative base path.
   */
  def writeHudiMorPrecombineFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_morpc_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n" +
        "hoodie.table.recordkey.fields=doc_id\n" +
        "hoodie.table.precombine.field=n_chars\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (dc1, dc2) = ("20240101000000000", "20240102000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    val baseRel = s"p=0/fid0_0-0-0_$dc1.parquet"
    val baseDst = new java.io.File(root, baseRel)
    baseDst.getParentFile.mkdirs()
    val baseRows = FixtureIO.writeSingleParquet(base, baseDst,
      dir + "_hudimpc_fid0")
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_morpc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    def rec(id: Long, lang: String, n: Long):
        org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(avroSchema)
      r.put("doc_id", id)
      r.put("lang", lang)
      r.put("n_chars", java.lang.Long.valueOf(n))
      r
    }
    val ids = base.select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    val hi = ids.filter(_ % 10 == 0).map(rec(_, "hi", 500L))
    val lo = ids.filter(_ % 10 == 0).map(rec(_, "lo", 100L))
    val delKeys = ids.filter(_ % 25 == 0).map(_.toString).toSeq
    import HudiLogFormat._
    def dataBlock(
        rs: Seq[org.apache.avro.generic.GenericRecord]): Array[Byte] =
      frameBlock(AvroDataBlock,
        Map(InstantTime -> dc2, Schema -> avroSchema.toString),
        avroDataContent(avroSchema, rs))
    val logRel = s"p=0/.fid0_$dc1.log.1_0-0-0"
    val logBytes = dataBlock(hi.toSeq) ++
      frameBlock(DeleteBlock, Map(InstantTime -> dc2),
        deleteContent(delKeys)) ++
      dataBlock(lo.toSeq)
    val logDst = new java.io.File(root, logRel)
    java.nio.file.Files.write(logDst.toPath, logBytes)
    def deltacommit(instant: String, stats: Seq[String]): Unit = {
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit").toPath,
        (s"""{"partitionToWriteStats":{"p=0":[${stats.mkString(",")}]},""" +
          s""""operationType":"upsert"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    deltacommit(dc1, Seq(
      s"""{"fileId":"fid0","path":"$baseRel","numWrites":$baseRows,""" +
        s""""numDeletes":0,"numInserts":$baseRows,""" +
        s""""totalWriteBytes":${baseDst.length()},""" +
        s""""partitionPath":"p=0"}"""))
    deltacommit(dc2, Seq(
      s"""{"fileId":"fid0","path":"$logRel",""" +
        s""""numWrites":${hi.length + lo.length + delKeys.size},""" +
        s""""numDeletes":${delKeys.size},"numInserts":0,""" +
        s""""numUpdateWrites":${hi.length + lo.length},""" +
        s""""totalWriteBytes":${logDst.length()},""" +
        s""""partitionPath":"p=0"}"""))
    Map(baseRel -> baseRows)
  }

  /** The cdc record schema the cdc fixture writes:
    * `{op, key, before: [null, img], after: [null, img]}` with
    * full-row images. */
  private[meta] val CdcAvroSchema: org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_cdc","fields":[
        |{"name":"op","type":"string"},
        |{"name":"key","type":"string"},
        |{"name":"before","type":["null",
        |  {"type":"record","name":"graft_cdc_img","fields":[
        |    {"name":"doc_id","type":"long"},
        |    {"name":"lang","type":["null","string"],"default":null},
        |    {"name":"n_chars","type":["null","long"],"default":null}]}],
        |  "default":null},
        |{"name":"after","type":["null","graft_cdc_img"],"default":null}]}"""
        .stripMargin.replace("\n", ""))

  /** One cdc fixture record. `before`/`after` are
    * (doc_id, lang, n_chars) images or None. */
  private[meta] def cdcRec(
      op: String, key: String,
      before: Option[(Long, String, java.lang.Long)],
      after: Option[(Long, String, java.lang.Long)])
      : org.apache.avro.generic.GenericRecord = {
    val imgSchema = CdcAvroSchema.getField("before").schema().getTypes.get(1)
    def img(v: (Long, String, java.lang.Long)) = {
      val r = new org.apache.avro.generic.GenericData.Record(imgSchema)
      r.put("doc_id", v._1); r.put("lang", v._2); r.put("n_chars", v._3)
      r
    }
    val r = new org.apache.avro.generic.GenericData.Record(CdcAvroSchema)
    r.put("op", op)
    r.put("key", key)
    r.put("before", before.map(img).orNull)
    r.put("after", after.map(img).orNull)
    r
  }

  /**
   * Hand-write a Hudi MOR table with CHANGE-DATA-CAPTURE log blocks
   * (`hoodie.table.cdc.enabled=true`, supplemental logging
   * `data_before_after`): fid0's log chain carries a cdc-data block
   * with the writer's own before/after images NEXT TO its payload
   * data/delete blocks, while fid1's chain is plain (derived-path
   * fallback). Deterministic from `docs`:
   *
   *  - dc1 inserts base `fid0` (doc_id%2==0) and `fid1` (%2==1);
   *  - dc2, fid0 (cdc-instrumented): payload data block updates the
   *    %20==0 keys (n_chars+7) and inserts doc_id+7000000
   *    (lang='cc', n_chars=9) for the %100==0 keys; a delete block
   *    kills the doc_id%20==10 keys; the cdc block carries the
   *    matching `u`/`i`/`d` images;
   *  - dc2, fid1 (NO cdc): a payload data block updates the
   *    doc_id%10==5 keys (lang='dv', n_chars+3).
   *
   * The feed must resolve fid0 from the cdc images (native evidence)
   * and fid1 from the derived path, in one answer. Returns rows per
   * relative base path.
   */
  def writeHudiMorCdcFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_hudi_morcdc_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n" +
        "hoodie.table.recordkey.fields=doc_id\n" +
        "hoodie.table.cdc.enabled=true\n" +
        "hoodie.table.cdc.supplemental.logging.mode=data_before_after\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (dc1, dc2) = ("20240101000000000", "20240102000000000")
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"))
    // both base files in ONE job (see writeBaseSlices)
    val Seq(s0, s1) = writeBaseSlices(root, dir + "_hudicdc", Seq(
      s"p=0/fid0_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(2)) === 0),
      s"p=0/fid1_0-0-0_$dc1.parquet" ->
        base.filter(pmod(col("doc_id"), lit(2)) === 1)))
    val dataSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_morcdc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    def rec(id: Long, lang: String, n: java.lang.Long):
        org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(dataSchema)
      r.put("doc_id", id); r.put("lang", lang); r.put("n_chars", n)
      r
    }
    val rows = base.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2))))
    val even = rows.filter(_._1 % 2 == 0)
    val odd = rows.filter(_._1 % 2 == 1)
    def plus(n: java.lang.Long, d: Long): java.lang.Long =
      if (n == null) null else java.lang.Long.valueOf(n + d)
    val updates = even.filter(_._1 % 20 == 0)
    val inserts = even.filter(_._1 % 100 == 0)
      .map(k => (k._1 + 7000000L, "cc", java.lang.Long.valueOf(9L)))
    val deletes = even.filter(_._1 % 20 == 10)
    val payloadRecs =
      updates.map { case (id, l, n) => rec(id, l, plus(n, 7L)) } ++
        inserts.map { case (id, l, n) => rec(id, l, n) }
    val cdcRecs =
      updates.map { case (id, l, n) =>
        cdcRec("u", id.toString, Some((id, l, n)),
          Some((id, l, plus(n, 7L)))) } ++
      inserts.map { case (id, l, n) =>
        cdcRec("i", id.toString, None, Some((id, l, n))) } ++
      deletes.map { case (id, l, n) =>
        cdcRec("d", id.toString, Some((id, l, n)), None) }
    import HudiLogFormat._
    val log0Rel = s"p=0/.fid0_$dc1.log.1_0-0-0"
    val log0 = frameBlock(AvroDataBlock,
        Map(InstantTime -> dc2, Schema -> dataSchema.toString),
        avroDataContent(dataSchema, payloadRecs.toSeq)) ++
      frameBlock(DeleteBlock, Map(InstantTime -> dc2),
        deleteContent(deletes.map(_._1.toString).toSeq)) ++
      frameBlock(CdcDataBlock,
        Map(InstantTime -> dc2, Schema -> CdcAvroSchema.toString),
        avroDataContent(CdcAvroSchema, cdcRecs.toSeq))
    val plainUpdates = odd.filter(_._1 % 10 == 5)
      .map { case (id, _, n) => rec(id, "dv", plus(n, 3L)) }
    val log1Rel = s"p=0/.fid1_$dc1.log.1_0-0-0"
    val log1 = frameBlock(AvroDataBlock,
      Map(InstantTime -> dc2, Schema -> dataSchema.toString),
      avroDataContent(dataSchema, plainUpdates.toSeq))
    Seq((log0Rel, log0), (log1Rel, log1)).foreach { case (rel, bytes) =>
      java.nio.file.Files.write(new java.io.File(root, rel).toPath, bytes)
    }
    def deltacommit(instant: String, stats: Seq[String]): Unit = {
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit").toPath,
        (s"""{"partitionToWriteStats":{"p=0":[${stats.mkString(",")}]},""" +
          s""""operationType":"upsert"}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$instant.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    def baseStat(fid: String, rel: String, n: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$n,""" +
        s""""numDeletes":0,"numInserts":$n,""" +
        s""""totalWriteBytes":${new java.io.File(root, rel).length()},""" +
        s""""partitionPath":"p=0"}"""
    def logStat(fid: String, rel: String, n: Long, nDel: Long): String =
      s"""{"fileId":"$fid","path":"$rel","numWrites":$n,""" +
        s""""numDeletes":$nDel,"numInserts":0,"numUpdateWrites":$n,""" +
        s""""totalWriteBytes":${new java.io.File(root, rel).length()},""" +
        s""""partitionPath":"p=0"}"""
    deltacommit(dc1, Seq(
      baseStat("fid0", s0._1, s0._2), baseStat("fid1", s1._1, s1._2)))
    deltacommit(dc2, Seq(
      logStat("fid0", log0Rel,
        (payloadRecs.length + deletes.length).toLong, deletes.length.toLong),
      logStat("fid1", log1Rel, plainUpdates.length.toLong, 0L)))
    Map(s0._1 -> s0._2, s1._1 -> s1._2)
  }
}
