package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One decoded Delta log segment (a JSON commit or a checkpoint part). */
case class DeltaLogInfo(
    version: Long,
    kind: String, // "commit" | "checkpoint"
    nAdd: Option[Long],
    nRemove: Option[Long],
    hasProtocol: Boolean,
    hasMetadata: Boolean,
    operation: Option[String],
    opTimestamp: Option[Long])

/**
 * Delta Lake metadata tier — the table-format layer ABOVE the raw parquet
 * files the rest of the `meta` package audits. Everything here is decoded
 * against the PUBLIC Delta transaction-log protocol (the `_delta_log`
 * directory of 20-digit zero-padded JSON commits, parquet checkpoints,
 * and a `_last_checkpoint` pointer; each commit line carries exactly one
 * of `add`/`remove`/`metaData`/`protocol`/`commitInfo`/`txn`):
 *
 *  - the `source=delta` / `level=snapshot` datasource level lists the LOG
 *    (not the data files) and emits one row per segment, with action
 *    counts decoded per segment executor-side — JSON commits by a
 *    line-keyed parse, checkpoint parts AT FOOTER COST from the
 *    checkpoint parquet's own column statistics (non-null `add.path`
 *    entries = num_values − null_count; zero page I/O);
 *  - [[snapshotFiles]] reconstructs the LIVE file list as a declarative
 *    plan: distributed parquet read of the latest checkpoint + JSON read
 *    of the commit tail, reconciled by a map-side-combinable
 *    `max_by(action, (version, is_add))` per path — no window sort, no driver-side
 *    log replay, so a checkpoint with millions of `add` entries scales
 *    like any parquet scan;
 *  - composing [[snapshotFiles]] with the parquet file level audits only
 *    files in the CURRENT snapshot and surfaces vacuum-pending files a
 *    raw directory scan would miscount (see `meta_delta_live`).
 *
 * The reference engine stops at the raw-file layer (its source sniff is
 * parquet-vs-file only, reference:
 * src/main/scala/com/github/sadikovi/metadata/DefaultSource.scala:70-81);
 * this tier extends the same five-level model upward to the table format
 * real lakes actually serve queries from.
 */
object DeltaMeta {

  private val CommitRe = "^(\\d{20})\\.json$".r
  private val CkptRe = "^(\\d{20})\\.checkpoint(?:\\..+)?\\.parquet$".r
  // the protocol's OTHER V2-manifest form: a UUID-named ndjson of
  // actions (`<v>.checkpoint.<uuid>.json`). Left unclassified it would
  // be INVISIBLE — a table whose only checkpoint is a JSON manifest
  // would replay commits alone and, after log cleanup, reconstruct
  // from an incomplete base without refusing.
  private val CkptJsonRe = "^(\\d{20})\\.checkpoint\\.[^./]+\\.json$".r

  /** True if `root` has a `_delta_log` child directory. */
  def isDeltaTable(fs: FileSystem, root: Path): Boolean =
    try fs.getFileStatus(new Path(root, "_delta_log")).isDirectory
    catch { case _: java.io.IOException => false }

  /** Version encoded in a log segment's file name, or None for foreign
    * files (`_last_checkpoint`, `.crc` sidecars, temp files). */
  def segmentVersion(name: String): Option[(Long, String)] = name match {
    case CkptJsonRe(v) => Some(v.toLong -> "checkpoint")
    case CommitRe(v) => Some(v.toLong -> "commit")
    case CkptRe(v) => Some(v.toLong -> "checkpoint")
    case _ => None
  }

  /**
   * List the `_delta_log` segments of a Delta table as [[FileSlice]]s —
   * the delta counterpart of the generic recursive listing (which hides
   * underscore-prefixed paths, exactly so DATA scans never see the log).
   * One `listStatus` call; foreign names are dropped here so the reader
   * only ever sees decodable segments. Sorted by (version, name) so
   * multi-part checkpoints group deterministically.
   */
  def listLogSlices(root: Path, conf: Configuration): Seq[FileSlice] = {
    val fs = root.getFileSystem(conf)
    val logDir = new Path(root, "_delta_log")
    if (!isDeltaTable(fs, root)) {
      throw new IllegalArgumentException(
        s"$root is not a Delta table: no _delta_log directory")
    }
    fs.listStatus(logDir).toSeq
      .flatMap { st =>
        segmentVersion(st.getPath.getName).map { case (v, _) =>
          (v, FileSlice(st.getPath.toString, st.getPath.getName, st.getLen,
            st.getModificationTime, Map.empty))
        }
      }
      .sortBy { case (v, f) => (v, f.name) }
      .map(_._2)
  }

  /** Decode one log segment into its [[DeltaLogInfo]] row. */
  def readSegment(path: Path, conf: Configuration, knownSize: Option[Long] = None): DeltaLogInfo =
    segmentVersion(path.getName) match {
      case Some((v, "commit")) => readCommit(path, conf, v)
      case Some((v, "checkpoint")) => readCheckpoint(path, conf, v, knownSize)
      case _ => throw new RuntimeException(
        s"$path is not a Delta log segment (expected <version>.json or <version>.checkpoint*.parquet)")
    }

  /** JSON commit: one action object per line; count the action keys and
    * lift `commitInfo.operation`/`timestamp`. Malformed JSON refuses
    * (classified), it never yields partial counts. */
  private def readCommit(path: Path, conf: Configuration, version: Long): DeltaLogInfo = {
    val fs = path.getFileSystem(conf)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(path)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
      var nAdd = 0L
      var nRemove = 0L
      var hasProtocol = false
      var hasMetadata = false
      var operation: Option[String] = None
      var opTs: Option[Long] = None
      var line = reader.readLine()
      while (line != null) {
        if (line.trim.nonEmpty) {
          val node =
            try mapper.readTree(line)
            catch {
              case e: Exception => throw new RuntimeException(
                s"$path: malformed Delta commit line: ${e.getMessage}")
            }
          if (node.has("add")) nAdd += 1
          if (node.has("remove")) nRemove += 1
          if (node.has("protocol")) hasProtocol = true
          if (node.has("metaData")) hasMetadata = true
          if (node.has("commitInfo")) {
            val ci = node.get("commitInfo")
            if (ci.has("operation")) operation = Some(ci.get("operation").asText)
            if (ci.has("timestamp")) opTs = Some(ci.get("timestamp").asLong)
          }
        }
        line = reader.readLine()
      }
      DeltaLogInfo(version, "commit", Some(nAdd), Some(nRemove),
        hasProtocol, hasMetadata, operation, opTs)
    } finally {
      in.close()
    }
  }

  /** Non-null leaf count for `leaf` from a parquet footer's own column
    * statistics: `num_values − null_count` summed over chunks. None when
    * any chunk lacks a null count (no evidence ≠ zero). The match is
    * EXACT (`Option.contains` is element equality, not a substring
    * test): a writer-specific column whose dotted path merely embeds the
    * leaf (`stats_parsed.add.path…`) never matches, so it cannot
    * double-count the action. */
  private[meta] def footerNonNull(footer: FooterInfo, leaf: String): Option[Long] = {
    val chunks = footer.chunks.filter(_.path.contains(leaf))
    if (chunks.isEmpty) return Some(0L)
    val counts = chunks.map(c => c.stats.flatMap(_.nullCount).map(c.numValues - _))
    if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }

  /** Checkpoint part: action counts AT FOOTER COST — the checkpoint is a
    * parquet file whose `add`/`remove`/... columns are null except on
    * their action's rows, so per-leaf null counts in the footer ARE the
    * action counts. Zero data-page I/O. A V2 (sidecar) MANIFEST parks
    * its file actions elsewhere: its own footer holds NO evidence of
    * them, so `n_add`/`n_remove` report null — never a confident zero
    * for counts that live in the sidecars. */
  private def readCheckpoint(
      path: Path, conf: Configuration, version: Long,
      knownSize: Option[Long]): DeltaLogInfo = {
    // the V2 JSON-manifest form: ndjson of actions, no parquet footer.
    // Like a parquet V2 manifest, its file-action counts live in the
    // sidecars it names, so n_add/n_remove report null — never a
    // confident zero; protocol/metaData presence reads from the lines.
    if (path.getName.endsWith(".json")) {
      val commitShaped = readCommit(path, conf, version)
      return DeltaLogInfo(version, "checkpoint", None, None,
        commitShaped.hasProtocol, commitShaped.hasMetadata, None, None)
    }
    val footer = Footers.read(path, conf, knownSize)
    val isV2Manifest = footer.chunks.exists(c =>
      c.path.contains("sidecar.path") ||
        c.path.contains("checkpointMetadata.version"))
    DeltaLogInfo(version, "checkpoint",
      if (isV2Manifest) None else footerNonNull(footer, "add.path"),
      if (isV2Manifest) None else footerNonNull(footer, "remove.path"),
      footerNonNull(footer, "protocol.minReaderVersion").exists(_ > 0),
      footerNonNull(footer, "metaData.id").exists(_ > 0),
      None, None)
  }

  // ---------------------------------------------------------------------
  // Snapshot reconstruction (live files)
  // ---------------------------------------------------------------------

  /** The protocol's deletion-vector descriptor (v3+ readers): a DELETE
    * without rewrite attaches one to the `add` action; `cardinality` is
    * the number of logically-deleted rows still physically present. */
  private[meta] val dvType = StructType(Seq(
    StructField("storageType", StringType),
    StructField("pathOrInlineDv", StringType),
    StructField("offset", IntegerType),
    StructField("sizeInBytes", IntegerType),
    StructField("cardinality", LongType)))

  /** The `add` struct subset the replay needs (a projection of the
    * protocol's add action; unknown writer fields are simply not read). */
  private val addType = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("modificationTime", LongType),
    StructField("dataChange", BooleanType),
    StructField("stats", StringType),
    StructField("deletionVector", dvType)))

  private val removeType = StructType(Seq(
    StructField("path", StringType),
    StructField("deletionTimestamp", LongType),
    StructField("dataChange", BooleanType)))

  private val logSchema = StructType(Seq(
    StructField("add", addType),
    StructField("remove", removeType)))

  private val sidecarType = StructType(Seq(
    StructField("path", StringType),
    StructField("sizeInBytes", LongType),
    StructField("modificationTime", LongType)))
  private val ckptMetaActionType = StructType(Seq(
    StructField("version", LongType)))

  /** The chosen checkpoint parts as ONE raw action frame: parquet parts
    * as a single parquet scan (schema from the files — consumers
    * re-project via [[ckptStruct]]); a V2 JSON manifest
    * (`<v>.checkpoint.<uuid>.json`, ndjson of actions) through the
    * pinned `wanted` schema, so absent action kinds read as typed
    * nulls. [[selectCheckpointParts]] never selects both forms at
    * once (each single-file form is complete alone). */
  private def readCheckpointRaw(
      spark: SparkSession, ckptPaths: Seq[String],
      wanted: StructType): DataFrame =
    if (ckptPaths.exists(_.endsWith(".json"))) {
      spark.read.schema(wanted).json(ckptPaths: _*)
    } else spark.read.parquet(ckptPaths: _*)

  /**
   * The LIVE file list of a Delta table as a DataFrame:
   * `(path, abs_path, version, size, mod_time, partition_values,
   * num_records, stats)` — one row per file in the current snapshot.
   *
   * Plan shape: distributed parquet scan of the latest checkpoint parts
   * (tagged with the checkpoint version) unioned with a schema-pinned
   * JSON scan of the newer commits (each tagged with its version from
   * the file name), reconciled per path by `max_by(action, (version, is_add))` —
   * an aggregate with map-side partial combine, NOT a window sort. Only
   * paths whose winning action is an `add` survive. Driver work is one
   * log listing; everything else is executors.
   */
  def snapshotFiles(spark: SparkSession, table: String): DataFrame =
    snapshotFilesAt(spark, table, None)

  /** The pinned `(add, remove)` file-action re-projection of one
    * checkpoint-shaped frame: `add`/`remove` re-built FIELD BY FIELD
    * (checkpoints carry protocol/metaData/txn columns and
    * writer-specific add fields the replay doesn't need; a struct cast
    * would demand exact arity), `deletionVector` absent-tolerant
    * (pre-v3 writers), a missing `add`/`remove` column a typed null
    * (a V2 manifest whose file actions all live in sidecars has
    * neither). */
  private def fileActionProjection(df: DataFrame): DataFrame = {
    val names = df.schema.fieldNames.toSet
    val addCol: Column =
      if (!names.contains("add")) lit(null).cast(addType)
      else {
        val addStruct = df.schema("add").dataType.asInstanceOf[StructType]
        // deletionVector appears only on protocol-v3+ writers; absent →
        // null (and each descriptor subfield is matched by name, so a
        // writer with extra fields still decodes)
        val dvCol =
          if (!addStruct.fieldNames.contains("deletionVector")) {
            lit(null).cast(dvType)
          } else {
            val sub = addStruct("deletionVector").dataType.asInstanceOf[StructType]
            def f(name: String, t: DataType): Column =
              (if (sub.fieldNames.contains(name)) {
                col(s"add.deletionVector.$name").cast(t)
              } else lit(null).cast(t)).as(name)
            when(col("add.deletionVector").isNotNull, struct(
              f("storageType", StringType),
              f("pathOrInlineDv", StringType),
              f("offset", IntegerType),
              f("sizeInBytes", IntegerType),
              f("cardinality", LongType)))
          }
        when(col("add").isNotNull, struct(
          col("add.path").as("path"),
          col("add.partitionValues").as("partitionValues"),
          col("add.size").as("size"),
          col("add.modificationTime").as("modificationTime"),
          col("add.dataChange").as("dataChange"),
          col("add.stats").as("stats"),
          dvCol.as("deletionVector")))
      }
    val removeCol: Column =
      if (!names.contains("remove")) lit(null).cast(removeType)
      else when(col("remove").isNotNull, struct(
        col("remove.path").as("path"),
        col("remove.deletionTimestamp").as("deletionTimestamp"),
        col("remove.dataChange").as("dataChange")))
    df.select(addCol.as("add"), removeCol.as("remove"))
  }

  /** The pinned `(add, remove, version)` action frame for a set of log
    * segments: JSON commits through the schema-pinned read (version from
    * the file name), checkpoint parts through the field-by-field
    * re-projection (DV-aware, V2-sidecar-following). Shared by the batch
    * replay and the streaming live-store maintenance.
    *
    * V2 (sidecar) checkpoints — protocol feature `v2Checkpoint` — park
    * their file actions in parquet parts under `_delta_log/_sidecars`; the
    * checkpoint MANIFEST carries `checkpointMetadata` + one `sidecar`
    * pointer row per part (or, sidecar-free, the file actions inline).
    * The sidecar NAMES are a bounded driver boundary (one row per
    * sidecar file); the sidecar CONTENTS stay a distributed parquet
    * scan through the same re-projection as a V1 checkpoint — a
    * checkpoint with millions of adds still scales like any parquet
    * read. A manifest with neither sidecar pointers nor inline file
    * actions is an unknown layout and refuses — no evidence, never an
    * empty live set. */
  private def decodeActions(
      spark: SparkSession, table: String,
      ckptPaths: Seq[String], ckptVersion: Long,
      tailPaths: Seq[String]): DataFrame = {
    val tail =
      if (tailPaths.isEmpty) None
      else Some(spark.read.schema(logSchema).json(tailPaths: _*)
        .withColumn("version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long")))
    val ckpt =
      if (ckptPaths.isEmpty) None
      else {
        // a JSON manifest reads through the pinned schema (its `top`
        // then always carries the V2 columns, which is correct: the
        // form IS a V2 manifest by name)
        val isJsonManifest = ckptPaths.exists(_.endsWith(".json"))
        val raw = readCheckpointRaw(spark, ckptPaths,
          StructType(logSchema.fields ++ Seq(
            StructField("checkpointMetadata", ckptMetaActionType),
            StructField("sidecar", sidecarType))))
        val top = raw.schema.fieldNames.toSet
        val actionFrames: Seq[DataFrame] =
          if (top.contains("checkpointMetadata") || top.contains("sidecar")) {
            // V2: collect the sidecar pointer rows (names only), resolve
            // each against _delta_log/_sidecars, and read the parts as
            // one distributed scan
            val sidecarNames: Seq[String] =
              if (!top.contains("sidecar")) Seq.empty
              else raw.filter(col("sidecar").isNotNull)
                .select(col("sidecar.path")).collect()
                .map(_.getString(0)).toSeq
            // a parquet manifest shows inline actions in its SCHEMA; a
            // pinned-schema JSON read always has the columns, so the
            // inline evidence there is non-null DATA (manifest-sized)
            val hasInline =
              if (isJsonManifest) {
                sidecarNames.nonEmpty || !raw.filter(
                  col("add").isNotNull || col("remove").isNotNull).isEmpty
              } else top.contains("add") || top.contains("remove")
            if (sidecarNames.isEmpty && !hasInline) {
              throw new UnsupportedOperationException(
                s"$table: V2 checkpoint at version $ckptVersion has " +
                  "neither sidecar pointers nor inline add/remove " +
                  "actions — unknown layout, refusing to reconstruct " +
                  "an empty snapshot from it")
            }
            val conf = spark.sessionState.newHadoopConf()
            val scDir = new Path(new Path(table), "_delta_log/_sidecars")
            val scPaths = sidecarNames.map { n =>
              // sidecar paths are URI-encoded names relative to
              // _delta_log/_sidecars — or absolute URIs, like add.path
              val decoded = java.net.URLDecoder.decode(n, "UTF-8")
              val p =
                if (decoded.contains("://") || decoded.startsWith("/")) {
                  new Path(decoded)
                } else new Path(scDir, decoded)
              // the sidecar's OWN filesystem: an absolute URI on another
              // scheme must resolve through its scheme's FS, not throw
              // 'Wrong FS' out of the log directory's
              val fs = p.getFileSystem(conf)
              if (!fs.exists(p)) {
                throw new IllegalArgumentException(
                  s"$table: V2 checkpoint at version $ckptVersion names " +
                    s"sidecar '$n' but it is missing from " +
                    s"$scDir — cannot reconstruct a partial snapshot")
              }
              p.toString
            }
            // the manifest MAY also carry inline file actions next to
            // its pointers; both legs go through the same re-projection
            // (the JSON manifest is included as-is — rows of non-file
            // actions are all-null under the pinned projection and wash
            // out of the replay)
            (if (isJsonManifest || top.contains("add") ||
                top.contains("remove")) Seq(raw)
             else Seq.empty) ++
              (if (scPaths.nonEmpty) {
                Seq(spark.read.parquet(scPaths: _*))
              } else Seq.empty)
          } else Seq(raw)
        Some(actionFrames.map(fileActionProjection)
          .reduce(_ unionByName _)
          .withColumn("version", lit(ckptVersion)))
      }
    (tail, ckpt) match {
      case (Some(t), Some(c)) => c.unionByName(t)
      case (Some(t), None) => t
      case (None, Some(c)) => c
      case (None, None) =>
        throw new IllegalArgumentException(s"$table: empty _delta_log")
    }
  }

  /**
   * TIME TRAVEL at metadata cost: [[snapshotFiles]] as of `asOfVersion`
   * (inclusive; `None` = latest). The replay starts from the newest
   * checkpoint AT OR BELOW the target and applies only commits up to it
   * — the same log arithmetic Delta readers use, still fully
   * declarative. Refuses when the target predates the oldest surviving
   * segment (log-cleaned history cannot be reconstructed — no evidence,
   * never a partial set) or when no segment at or below the target
   * exists.
   */
  def snapshotFilesAt(
      spark: SparkSession, table: String,
      asOfVersion: Option[Long]): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val allSegments = listLogSlices(root, conf)
      .flatMap(f => segmentVersion(f.name).map { case (v, k) => (v, k, f.path) })
    val segments = asOfVersion match {
      case None => allSegments
      case Some(target) =>
        val latest = allSegments.map(_._1).maxOption.getOrElse(-1L)
        if (target > latest) {
          throw new IllegalArgumentException(
            s"$table: version $target is after the latest commit ($latest)")
        }
        val kept = allSegments.filter(_._1 <= target)
        if (kept.isEmpty) {
          throw new IllegalArgumentException(
            s"$table: no log segment at or below version $target")
        }
        kept
    }
    val ckptVersion = segments.collect { case (v, "checkpoint", _) => v }
      .maxOption.getOrElse(-1L)
    // the replay base must be complete: with no usable checkpoint the
    // commit chain has to reach back to version 0 (log cleanup deletes
    // old commits once a checkpoint covers them)
    if (ckptVersion < 0 &&
        !segments.exists { case (v, k, _) => v == 0L && k == "commit" }) {
      throw new IllegalArgumentException(
        s"$table: cannot reconstruct version " +
          s"${asOfVersion.map(_.toString).getOrElse("latest")}: commit 0 " +
          "is gone and no checkpoint at or below the target survives")
    }
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    val tailPaths = segments.collect {
      case (v, "commit", p) if v > ckptVersion => p
    }

    val acts = decodeActions(spark, table, ckptPaths, ckptVersion, tailPaths)

    acts
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("version"), col("add"))
      .filter(col("path").isNotNull)
      .groupBy(col("path"))
      // ordering key is (version, is_add): a remove+add pair of the SAME
      // path in the SAME commit (the deletion-vector / metadata-rewrite
      // shape) reconciles to the add — a bare version key would break
      // the tie arbitrarily
      .agg(max_by(struct(col("add"), col("version")),
        struct(col("version"), col("add").isNotNull)).as("w"))
      .filter(col("w.add").isNotNull) // latest action is an add → live
      .select(col("path"),
        // protocol: `path` is a URI-encoded path relative to the root —
        // OR an absolute URI (shallow clones, external files), which
        // must not be root-prefixed into garbage
        when(col("path").contains("://") || col("path").startsWith("/"),
          url_decode(col("path")))
          .otherwise(concat(lit(root.toString + "/"), url_decode(col("path"))))
          .as("abs_path"),
        col("w.version").as("version"),
        col("w.add.size").as("size"),
        col("w.add.modificationTime").as("mod_time"),
        col("w.add.partitionValues").as("partition_values"),
        // numRecords counts PHYSICAL rows; rows deleted via a deletion
        // vector are still inside the file, so the net live count is
        // num_records − dv_cardinality (see has_dv/dv_cardinality)
        get_json_object(col("w.add.stats"), "$.numRecords").cast("long")
          .as("num_records"),
        col("w.add.stats").as("stats"),
        col("w.add.deletionVector").isNotNull.as("has_dv"),
        coalesce(col("w.add.deletionVector.cardinality"), lit(0L))
          .as("dv_cardinality"),
        col("w.add.deletionVector").as("deletion_vector"))
  }

  /**
   * PER-ROW deletion-vector decode: `(path, pos)` — one row per
   * logically-deleted row position in every live file carrying a DV,
   * decoded from the actual roaring64 payloads (inline, `u`-stub or
   * absolute files) via [[DvCodec]]. Makes the net-rows audit
   * verifiable ROW-WISE: positions join against the file's own rows
   * (`_metadata.row_index`), not just a cardinality subtraction. The
   * decode runs EXECUTOR-side (a flatMap over the descriptor rows —
   * one task per DV, the protocol's own granularity: a vector never
   * spans files); cardinality disagreement between descriptor and
   * payload refuses rather than undercounting.
   */
  def deletedPositions(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val rootStr = {
      val p = new Path(table)
      p.getFileSystem(conf.value).makeQualified(p).toString
    }
    snapshotFiles(spark, table).filter(col("has_dv"))
      .select(col("path"),
        col("deletion_vector.storageType"),
        col("deletion_vector.pathOrInlineDv"),
        col("deletion_vector.offset"),
        col("deletion_vector.sizeInBytes"),
        col("deletion_vector.cardinality"))
      .as[(String, String, String, Option[Int], Int, Long)]
      .flatMap { case (p, st, stub, off, size, card) =>
        val positions = DvCodec.decodeDescriptor(
          st, stub, off, size, new Path(rootStr), conf.value)
        if (positions.length != card) {
          throw new IllegalArgumentException(
            s"$p: deletion vector decodes ${positions.length} positions " +
              s"but its descriptor claims $card — refusing to miscount")
        }
        positions.map(pos => (p, pos))
      }
      .toDF("path", "pos")
  }

  /**
   * VERSION-CHECKSUM audit — Delta writers emit a `<v>.crc` JSON per
   * commit declaring the post-commit table state (`numFiles`,
   * `tableSizeBytes`); this report verifies every surviving one
   * against an INDEPENDENT replay of the log itself: one row per
   * `.crc` with declared vs actual and match flags (a disagreement
   * means the writer's incremental bookkeeping and the log diverged —
   * the first thing to check on a corrupted table). All versions
   * replay in ONE pass (actions ⋈ broadcast version list, the same
   * composite `(version, is_add)` rank per path) — no per-version job
   * loop. A `.crc` older than the replay base (log-cleaned history
   * under a checkpoint) reports null actuals rather than dropping the
   * row or guessing.
   */
  def crcAudit(spark: SparkSession, table: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fs = root.getFileSystem(conf)
    val logDir = new Path(root, "_delta_log")
    val crcFiles = fs.listStatus(logDir).toSeq.map(_.getPath)
      .filter(_.getName.matches("^\\d{20}\\.crc$")).sortBy(_.getName)
    if (crcFiles.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no version-checksum (.crc) files in the log")
    }
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val declared = crcFiles.map { p =>
      val in = fs.open(p)
      val node = try mapper.readTree(in) finally in.close()
      def reqLong(name: String): Long = {
        val x = if (node == null) null else node.get(name)
        if (x == null) throw new IllegalArgumentException(
          s"$p: version-checksum missing '$name'")
        x.asLong()
      }
      (p.getName.take(20).toLong, reqLong("numFiles"),
        reqLong("tableSizeBytes"))
    }
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val hasCommit0 = segments.exists { case (v, k, _) =>
      v == 0L && k == "commit" }
    // prefer the all-commits replay (audits every version); fall back
    // to checkpoint base only when log cleanup forces it
    val (ckptPaths, base) =
      if (hasCommit0) (Seq.empty[String], -1L)
      else if (ckptVersion >= 0) {
        (selectCheckpointParts(table, ckptVersion, segments.collect {
          case (v, "checkpoint", p) if v == ckptVersion => p }), ckptVersion)
      } else {
        throw new IllegalArgumentException(
          s"$table: commit 0 is gone and no checkpoint survives — " +
            "no version is reconstructable to audit against")
      }
    val tailPaths = segments.collect {
      case (v, "commit", p) if v > base => p
    }
    val acts = decodeActions(spark, table, ckptPaths, base, tailPaths)
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("version"), col("add").isNotNull.as("is_add"),
        col("add.size").as("size"))
      .filter(col("path").isNotNull)
    import spark.implicits._
    // the version list is log-bounded (one row per .crc): broadcast it
    // and resolve EVERY version's live set in one aggregation
    val versions = declared.map(_._1).filter(_ >= math.max(base, 0L))
      .toDF("crc_version")
    val actuals = acts
      .join(broadcast(versions), col("version") <= col("crc_version"))
      .groupBy(col("crc_version"), col("path"))
      .agg(max_by(struct(col("is_add"), col("size")),
        struct(col("version"), col("is_add"))).as("w"))
      .filter(col("w.is_add"))
      .groupBy(col("crc_version"))
      .agg(count(lit(1)).cast("long").as("actual_files"),
        sum(col("w.size")).cast("long").as("actual_bytes"))
    declared.toDF("version", "declared_files", "declared_bytes")
      .join(actuals, col("version") === col("crc_version"), "left")
      .select(col("version"), col("declared_files"), col("declared_bytes"),
        col("actual_files"), col("actual_bytes"),
        (col("declared_files") === col("actual_files")).as("files_match"),
        (col("declared_bytes") === col("actual_bytes")).as("bytes_match"))
  }

  /**
   * `_last_checkpoint` POINTER audit — the hint file Delta readers use
   * to skip log listing, verified against the log's actual contents:
   * one row with the pointer's declared version/parts vs what
   * survives on disk (`parts_found`, a completeness verdict through
   * [[selectCheckpointParts]]'s rules, whether a NEWER checkpoint
   * exists that the pointer misses — the stale-pointer shape that
   * makes readers replay more commits than needed — and the commit
   * count past the declared version). Refuses when no
   * `_last_checkpoint` exists; a malformed pointer refuses with the
   * field named.
   */
  def lastCheckpointAudit(spark: SparkSession, table: String): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val fs = root.getFileSystem(conf)
    val ptr = new Path(new Path(root, "_delta_log"), "_last_checkpoint")
    if (!fs.exists(ptr)) {
      throw new IllegalArgumentException(
        s"$table: no _delta_log/_last_checkpoint pointer")
    }
    val in = fs.open(ptr)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    val declaredVersion = {
      val v = if (node == null) null else node.get("version")
      if (v == null) throw new IllegalArgumentException(
        s"$ptr: _last_checkpoint missing 'version'")
      v.asLong()
    }
    val declaredParts = Option(node.get("parts")).map(_.asLong())
    val (_, segments, _) = latestLogSplit(spark, table)
    val atDeclared = segments.collect {
      case (v, "checkpoint", p) if v == declaredVersion => p
    }
    val complete =
      try { selectCheckpointParts(table, declaredVersion, atDeclared).nonEmpty }
      catch { case _: IllegalArgumentException => false }
    val newestCkpt = segments.collect { case (v, "checkpoint", _) => v }
      .maxOption.getOrElse(-1L)
    val commitsAfter = segments.count { case (v, k, _) =>
      k == "commit" && v > declaredVersion }
    import spark.implicits._
    Seq((declaredVersion, declaredParts, atDeclared.size.toLong, complete,
      newestCkpt > declaredVersion, commitsAfter.toLong))
      .toDF("declared_version", "declared_parts", "parts_found",
        "checkpoint_complete", "newer_checkpoint_exists", "commits_after")
  }

  private val protocolType = StructType(Seq(
    StructField("minReaderVersion", IntegerType),
    StructField("minWriterVersion", IntegerType),
    StructField("readerFeatures", ArrayType(StringType)),
    StructField("writerFeatures", ArrayType(StringType))))

  /** The protocol's multipart checkpoint part name:
    * `<v>.checkpoint.<n>.<m>.parquet`, part n of m, 1-based. */
  private val MultipartRe = "\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet$".r

  /** The classic single-file checkpoint name (no part/uuid suffix). */
  private val ClassicCkptRe = "^\\d{20}\\.checkpoint\\.parquet$".r

  /** Select a COMPLETE checkpoint from the parts surviving at one
    * version. The single-file form stands alone; the multipart form
    * (`.checkpoint.<n>.<m>.parquet`) must be the FULL 1..m set — a
    * partial set silently reconstructs a partial snapshot, so it
    * REFUSES unless a complete single-file sibling survives (writers
    * may leave both forms; reading both would double-count actions, so
    * exactly one form is chosen). */
  private[meta] def selectCheckpointParts(
      table: String, version: Long, paths: Seq[String]): Seq[String] = {
    val (multi, single) = paths.partition(p =>
      MultipartRe.findFirstIn(p).isDefined)
    // each non-multipart file (classic `v.checkpoint.parquet` or a
    // UUID-named V2 manifest) is COMPLETE alone, and the protocol
    // allows several to coexist at one version (a classic compat
    // checkpoint beside a V2 manifest; multiple UUID manifests) —
    // reading more than one double-reads the snapshot and mixes
    // incompatible schemas in one scan, so exactly ONE is chosen:
    // the classic form when present (the most interoperable), else
    // the lexicographically last (deterministic across runs)
    val oneSingle: Seq[String] =
      if (single.isEmpty) Seq.empty
      else Seq(single.find(p =>
        ClassicCkptRe.findFirstIn(new Path(p).getName).isDefined)
        .getOrElse(single.max))
    if (multi.isEmpty) oneSingle
    else {
      val parts = multi.map { p =>
        val m = MultipartRe.findFirstMatchIn(p).get
        (m.group(1).toLong, m.group(2).toLong, p)
      }
      val declaredTotals = parts.map(_._2).distinct
      val have = parts.map(_._1).sorted
      val complete = declaredTotals.size == 1 &&
        have == (1L to declaredTotals.head)
      if (oneSingle.nonEmpty) oneSingle // complete alone; never both forms
      else if (complete) parts.sortBy(_._1).map(_._3)
      else throw new IllegalArgumentException(
        s"$table: multipart checkpoint at version $version is " +
          s"incomplete (parts ${have.mkString(",")} of " +
          s"${declaredTotals.mkString("/")} present) and no single-file " +
          "checkpoint survives — refusing to reconstruct a partial " +
          "snapshot")
    }
  }

  /** The surviving log, split around the LATEST checkpoint:
    * `(root, segments as (version, kind, path), checkpoint version — or
    * -1 with no checkpoint)`. The shared driver boundary of every
    * log-derived report (one tuple per surviving segment). */
  private def latestLogSplit(
      spark: SparkSession, table: String): (Path, Seq[(Long, String, String)], Long) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val segments = listLogSlices(root, conf)
      .flatMap(f => segmentVersion(f.name).map { case (v, k) => (v, k, f.path) })
    val ckptVersion = segments.collect { case (v, "checkpoint", _) => v }
      .maxOption.getOrElse(-1L)
    (root, segments, ckptVersion)
  }

  /** Re-project a checkpoint action column to the pinned `target`
    * struct FIELD BY FIELD: absent fields read null (older writers),
    * extra writer fields are not read, an absent column is a typed
    * null. The same absent-tolerant shape [[decodeActions]] uses for
    * `add.deletionVector` — checkpoints written before a feature
    * existed must still replay. */
  private def ckptStruct(raw: DataFrame, colName: String, target: StructType): Column = {
    if (!raw.schema.fieldNames.contains(colName)) lit(null).cast(target)
    else {
      val sub = raw.schema(colName).dataType.asInstanceOf[StructType]
      val fields = target.fields.toSeq.map { f =>
        (if (sub.fieldNames.contains(f.name)) {
          col(s"$colName.${f.name}").cast(f.dataType)
        } else lit(null).cast(f.dataType)).as(f.name)
      }
      when(col(colName).isNotNull, struct(fields: _*))
    }
  }

  /** Reader features whose presence does NOT change what this metadata
    * tier reports: deletionVectors (decoded, net-row aware),
    * v2Checkpoint (sidecar parts followed through the same re-projected
    * replay — see [[decodeActions]]), columnMapping / timestampNtz /
    * typeWidening (data-plane concerns — the log's paths and numRecords
    * are unaffected), vacuumProtocolCheck (vacuum-time only). */
  val UnderstoodReaderFeatures: Set[String] = Set(
    "deletionVectors", "v2Checkpoint", "columnMapping", "timestampNtz",
    "typeWidening", "vacuumProtocolCheck")

  /**
   * The table's PROTOCOL posture, one row: the latest protocol action's
   * versions and feature lists, plus `supported` — whether THIS
   * metadata tier's answers (live set, row counts) remain faithful
   * under that protocol. Reader versions 1/2 are always supported; the
   * table-features version (3) is supported iff every readerFeature is
   * in [[UnderstoodReaderFeatures]] — so a table carrying an unknown
   * future feature reports `supported = false` instead of failing
   * later. The compatibility
   * check a user should run BEFORE trusting any census of a foreign
   * table.
   */
  def protocolInfo(spark: SparkSession, table: String): DataFrame = {
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val commitPaths = segments.collect { case (_, "commit", p) => p }
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    if (commitPaths.isEmpty && ckptPaths.isEmpty) {
      throw new IllegalArgumentException(s"$table: no log segments to scan")
    }
    // union the commit evidence with the latest checkpoint's protocol
    // row (tagged with the checkpoint version): after log cleanup the
    // protocol action can survive ONLY in the checkpoint, and an agg
    // over zero rows would report an all-null posture instead of the
    // real one
    val fromCommits =
      if (commitPaths.isEmpty) None
      else Some(spark.read
        .schema(StructType(Seq(StructField("protocol", protocolType))))
        .json(commitPaths: _*)
        .withColumn("version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
        .select(col("protocol"), col("version")))
    val fromCkpt =
      if (ckptPaths.isEmpty) None
      else {
        val raw = readCheckpointRaw(spark, ckptPaths,
          StructType(Seq(StructField("protocol", protocolType))))
        Some(raw.select(ckptStruct(raw, "protocol", protocolType).as("protocol"),
          lit(ckptVersion).as("version")))
      }
    val protocols = Seq(fromCommits, fromCkpt).flatten
      .reduce(_ unionByName _)
      .filter(col("protocol").isNotNull)
    // no evidence, never a guessed posture: a log whose surviving
    // segments carry NO protocol action cannot be classified
    if (protocols.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no protocol action survives in the log " +
          "(commits or checkpoint) — cannot report a protocol posture")
    }
    protocols
      .agg(max_by(col("protocol"), col("version")).as("p"))
      .select(
        col("p.minReaderVersion").as("min_reader_version"),
        col("p.minWriterVersion").as("min_writer_version"),
        col("p.readerFeatures").as("reader_features"),
        col("p.writerFeatures").as("writer_features"),
        (col("p.minReaderVersion") <= 2 ||
          forall(coalesce(col("p.readerFeatures"), array()),
            f => f.isin(UnderstoodReaderFeatures.toSeq: _*)))
          .as("supported"))
  }

  /**
   * TIMESTAMP AS OF resolution: the LATEST VERSION among commits whose
   * MONOTONIZED timestamp is at or before `tsMs` — `commitInfo
   * .timestamp` when the commit carries one, the segment's file
   * modification time otherwise (the same fallback order Delta readers
   * use), then adjusted the way Delta readers do: a commit whose raw
   * timestamp is not strictly after its predecessor's takes
   * `predecessor + 1 ms`, so writer clock skew can neither hide a
   * commit behind an earlier probe nor time-travel a probe forward
   * past unrequested commits. After adjustment the eligible set is a
   * version PREFIX, so "latest eligible" is well-defined; the winner
   * is picked by VERSION, never by max timestamp. Refuses a timestamp
   * before the first surviving commit. The (version, ts) table is a
   * bounded driver boundary (one pair per log segment). The DuckDB
   * oracle's raw `max(version) where ts <= probe` formula agrees
   * whenever timestamps are monotonic — which every fixture is; the
   * adjustment only changes answers on skewed logs.
   */
  def versionAt(spark: SparkSession, table: String, tsMs: Long): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val slices = listLogSlices(root, conf)
    val commits = slices.flatMap(f =>
      segmentVersion(f.name).collect { case (v, "commit") => (v, f) })
    if (commits.isEmpty) {
      throw new IllegalArgumentException(s"$table: no JSON commits to scan")
    }
    // the protocol's inCommitTimestamps feature makes commitInfo
    // .inCommitTimestamp the AUTHORITATIVE commit time (monotonic by
    // protocol; the wall-clock `timestamp` field and file mtimes are
    // untrusted once the feature is on) — prefer it per commit, fall
    // back to `timestamp`, then to the segment's mtime
    val opTs = spark.read
      .schema(StructType(Seq(StructField("commitInfo", StructType(Seq(
        StructField("timestamp", LongType),
        StructField("inCommitTimestamp", LongType)))))))
      .json(commits.map(_._2.path): _*)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
      .withColumn("cts", coalesce(col("commitInfo.inCommitTimestamp"),
        col("commitInfo.timestamp")))
      .filter(col("cts").isNotNull)
      .groupBy(col("version"))
      .agg(max(col("cts")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = commits
      .map { case (v, f) => (v, opTs.getOrElse(v, f.mtime)) }
      .sortBy(_._1)
    // monotonic adjustment: in version order, each timestamp is at
    // least its predecessor's + 1 ms
    val adjusted = raw.scanLeft((-1L, Long.MinValue)) {
      case ((_, prevTs), (v, ts)) => (v, math.max(ts, prevTs + 1))
    }.drop(1)
    val resolved = adjusted.filter(_._2 <= tsMs)
    if (resolved.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: timestamp $tsMs is before the first surviving commit")
    }
    resolved.maxBy(_._1)._1
  }

  /**
   * A table written with the `inCommitTimestamps` feature's shape:
   * three single-add commits whose WALL `timestamp` fields are
   * useless (all within 1 ms — the clock-skew case the feature
   * exists for) while `inCommitTimestamp` carries the true monotonic
   * commit times 10 s apart. TIMESTAMP AS OF must resolve by ICT; a
   * wall-timestamp reader would send every probe to the last version.
   * Returns per-file row counts.
   */
  def writeIctFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()
    val counts = (0 until 3).map { i =>
      val slice = docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .select(col("doc_id"), col("lang"))
      val tmp = dir + s"_slice$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(root, s"f$i.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      s"f$i.parquet" -> slice.count()
    }.toMap
    val ts0 = 1700000000000L
    def addJson(f: String): String = {
      val size = new java.io.File(root, f).length()
      s"""{"add":{"path":${jstr(f)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":$ts0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(f)}}"}}"""
    }
    (0 until 3).foreach { v =>
      val lines = Seq(
        // wall timestamps all within 1 ms; ICT carries the truth
        s"""{"commitInfo":{"timestamp":${ts0 + v},""" +
          s""""inCommitTimestamp":${ts0 + v * 10000L},""" +
          s""""operation":"WRITE"}}""") ++
        (if (v == 0) Seq(
          """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
            """"writerFeatures":["inCommitTimestamp"]}}""",
          s"""{"metaData":{"id":"graft-ict","format":{"provider":"parquet","options":{}},""" +
            s""""schemaString":"{}","partitionColumns":[],"configuration":{},"createdTime":$ts0}}""")
         else Seq.empty) ++
        Seq(addJson(s"f$v.parquet"))
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    counts
  }

  /** [[snapshotFilesAt]] resolved by TIMESTAMP (see [[versionAt]]). */
  def snapshotFilesAtTime(
      spark: SparkSession, table: String, tsMs: Long): DataFrame =
    snapshotFilesAt(spark, table, Some(versionAt(spark, table, tsMs)))

  /**
   * LATEST TRANSACTION VERSIONS: each streaming writer's
   * `setTransaction` high-water mark — `(app_id, txn_version,
   * table_version)`, the latest `txn` action per appId across the
   * commit log (later TABLE version wins, the protocol's idempotent-
   * writer resume rule). The question a restarting exactly-once writer
   * asks before its first commit.
   */
  private val txnType = StructType(Seq(
    StructField("appId", StringType),
    StructField("version", LongType),
    StructField("lastUpdated", LongType)))

  def latestTransactions(spark: SparkSession, table: String): DataFrame = {
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val commitPaths = segments.collect { case (_, "commit", p) => p }
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    if (commitPaths.isEmpty && ckptPaths.isEmpty) {
      throw new IllegalArgumentException(s"$table: no log segments to scan")
    }
    // commits carry txn actions at their own version; the latest
    // checkpoint preserves each appId's reconciled high-water mark for
    // commits the log cleanup may have deleted — its rows are tagged
    // with the CHECKPOINT version (the state is "as of" it). Without
    // the checkpoint leg, a restarting writer whose last commit was
    // cleaned would see no mark at all and double-commit.
    val fromCommits =
      if (commitPaths.isEmpty) None
      else Some(spark.read
        .schema(StructType(Seq(StructField("txn", txnType))))
        .json(commitPaths: _*)
        .withColumn("table_version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
        .select(col("txn"), col("table_version")))
    val fromCkpt =
      if (ckptPaths.isEmpty) None
      else {
        val raw = readCheckpointRaw(spark, ckptPaths,
          StructType(Seq(StructField("txn", txnType))))
        Some(raw.select(ckptStruct(raw, "txn", txnType).as("txn"),
          lit(ckptVersion).as("table_version")))
      }
    Seq(fromCommits, fromCkpt).flatten
      .reduce(_ unionByName _)
      .filter(col("txn").isNotNull && col("txn.appId").isNotNull)
      .groupBy(col("txn.appId").as("app_id"))
      .agg(max_by(struct(col("txn.version").as("v"),
        col("table_version").as("tv")), col("table_version")).as("w"))
      .select(col("app_id"), col("w.v").as("txn_version"),
        col("w.tv").as("table_version"))
  }

  private val domainMetadataType = StructType(Seq(
    StructField("domain", StringType),
    StructField("configuration", StringType),
    StructField("removed", BooleanType)))

  /**
   * DOMAIN METADATA report — the protocol's `domainMetadata` actions
   * (system- and connector-owned per-table state domains: clustering
   * columns, row-tracking watermarks, ...): the LATEST action per
   * domain across the commit log and the latest checkpoint (which
   * preserves domains whose commits log cleanup deleted). A tombstoned
   * domain SURFACES with `removed = true` rather than vanishing —
   * dropped-silently is indistinguishable from never-existed, and
   * "was removed at version v" is exactly what a connector debugging
   * lost state needs.
   */
  def domainMetadataReport(spark: SparkSession, table: String): DataFrame = {
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val commitPaths = segments.collect { case (_, "commit", p) => p }
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    if (commitPaths.isEmpty && ckptPaths.isEmpty) {
      throw new IllegalArgumentException(s"$table: no log segments to scan")
    }
    val fromCommits =
      if (commitPaths.isEmpty) None
      else Some(spark.read
        .schema(StructType(Seq(
          StructField("domainMetadata", domainMetadataType))))
        .json(commitPaths: _*)
        .withColumn("version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
        .select(col("domainMetadata").as("dm"), col("version")))
    val fromCkpt =
      if (ckptPaths.isEmpty) None
      else {
        val raw = readCheckpointRaw(spark, ckptPaths,
          StructType(Seq(StructField("domainMetadata", domainMetadataType))))
        Some(raw.select(
          ckptStruct(raw, "domainMetadata", domainMetadataType).as("dm"),
          lit(ckptVersion).as("version")))
      }
    Seq(fromCommits, fromCkpt).flatten
      .reduce(_ unionByName _)
      .filter(col("dm").isNotNull && col("dm.domain").isNotNull)
      .groupBy(col("dm.domain").as("domain"))
      .agg(max_by(struct(col("dm.configuration").as("c"),
        col("dm.removed").as("r")), col("version")).as("w"),
        max(col("version")).as("version"))
      .select(col("domain"), col("w.c").as("configuration"),
        col("w.r").as("removed"), col("version"))
  }

  /**
   * The base fixture plus two commits of `domainMetadata` actions:
   * v5 creates `delta.clustering` and `graft.pipeline`; v6 updates
   * `graft.pipeline` (stage 2) and TOMBSTONES `delta.clustering`
   * (`removed: true`) — the report must surface the tombstone, not
   * drop it. Returns per-file row counts.
   */
  def writeDomainMetadataFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val logDir = new java.io.File(dir, "_delta_log")
    val ts5 = 1700000005000L
    // configurations carry embedded JSON — escape the quotes (jstr is
    // a bare wrapper for names that never contain them)
    def esc(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def dm(domain: String, config: String, removed: Boolean): String =
      s"""{"domainMetadata":{"domain":${jstr(domain)},""" +
        s""""configuration":${esc(config)},"removed":$removed}}"""
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${5L}%020d.json").toPath,
      Seq(
        s"""{"commitInfo":{"timestamp":$ts5,"operation":"CLUSTER BY"}}""",
        dm("delta.clustering", """{"clusteringColumns":["doc_id"]}""",
          removed = false),
        dm("graft.pipeline", """{"stage":1}""", removed = false))
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${6L}%020d.json").toPath,
      Seq(
        s"""{"commitInfo":{"timestamp":${ts5 + 1000},"operation":"ALTER"}}""",
        dm("graft.pipeline", """{"stage":2}""", removed = false),
        dm("delta.clustering", "", removed = true))
        .mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  private val metaDataType = StructType(Seq(
    StructField("id", StringType),
    StructField("schemaString", StringType),
    StructField("partitionColumns", ArrayType(StringType)),
    StructField("configuration", MapType(StringType, StringType))))

  /** Field names + the column-mapping physical name of a Spark
    * StructType json — enough for a drift audit and the
    * logical→physical translation without interpreting types. (The
    * mapping key is a literal dotted JSON key inside each field's
    * `metadata`; access it with `getField`, never dotted-path
    * resolution.) */
  private val schemaFieldsType =
    StructType(Seq(StructField("fields", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("type", StringType),
      StructField("metadata", StructType(Seq(
        StructField("delta.columnMapping.physicalName", StringType),
        StructField("delta.columnMapping.id", LongType))))))))))

  /** The decoded `metaData` action frame — `(version, schema_id,
    * fields, partition_columns)`, field names carried as a REAL array
    * (a comma inside a field name must not split it). One row per
    * metaData action in the surviving commits; when log cleanup has
    * deleted commit 0, the latest checkpoint's preserved metaData is
    * prepended as the history BASELINE (tagged with the checkpoint
    * version) — without it the pre-cleanup schema would silently
    * vanish from the history. */
  private def metaDataFrame(spark: SparkSession, table: String): DataFrame = {
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val commitPaths = segments.collect { case (_, "commit", p) => p }
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    if (commitPaths.isEmpty && ckptPaths.isEmpty) {
      throw new IllegalArgumentException(s"$table: no log segments to scan")
    }
    val fromCommits =
      if (commitPaths.isEmpty) None
      else Some(spark.read
        .schema(StructType(Seq(StructField("metaData", metaDataType))))
        .json(commitPaths: _*)
        .withColumn("version",
          regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
        .select(col("metaData"), col("version")))
    // the checkpoint leg joins the history ONLY when commit 0 is gone:
    // while the full commit chain survives, every metaData action is
    // already in it and the checkpoint's copy would duplicate a row
    val logCleaned =
      !segments.exists { case (v, k, _) => v == 0L && k == "commit" }
    val fromCkpt =
      if (ckptPaths.isEmpty || !logCleaned) None
      else {
        val raw = readCheckpointRaw(spark, ckptPaths,
          StructType(Seq(StructField("metaData", metaDataType))))
        Some(raw.select(ckptStruct(raw, "metaData", metaDataType).as("metaData"),
          lit(ckptVersion).as("version")))
      }
    Seq(fromCommits, fromCkpt).flatten
      .reduce(_ unionByName _)
      .filter(col("metaData").isNotNull)
      .select(col("version"),
        col("metaData.id").as("schema_id"),
        from_json(col("metaData.schemaString"), schemaFieldsType)
          .getField("fields").as("fields"),
        col("metaData.partitionColumns").as("partition_columns"),
        col("metaData.configuration").as("configuration"))
  }

  /** The table's COLUMN-MAPPING posture from the latest metaData
    * action: `(mode, logical→physical, logical→field-id)` — mode
    * `"none"` when the `delta.columnMapping.mode` configuration is
    * unset, the maps empty for fields without a physicalName /
    * columnMapping.id. Under mode `name` the PARQUET files carry the
    * physical names (and `add.partitionValues` is keyed by them);
    * under mode `id` they additionally stamp each column's
    * `delta.columnMapping.id` as the parquet field id, and footers
    * match by THAT — so any audit that joins declared fields against
    * footers must translate through the mode's map first. A tiny
    * driver boundary (one pair per declared column). */
  def columnMappingInfo(
      spark: SparkSession, table: String):
      (String, Map[String, String], Map[String, Long]) = {
    val latest = metaDataFrame(spark, table)
      .orderBy(col("version").desc).limit(1)
      .select(
        element_at(col("configuration"), "delta.columnMapping.mode").as("mode"),
        transform(col("fields"), f => struct(
          f.getField("name").as("l"),
          f.getField("metadata")
            .getField("delta.columnMapping.physicalName").as("p"),
          f.getField("metadata")
            .getField("delta.columnMapping.id").as("i"))).as("fp"))
      .collect()
    if (latest.isEmpty) ("none", Map.empty, Map.empty)
    else {
      val r = latest(0)
      val mode = Option(r.getString(0)).getOrElse("none")
      val rows = Option(r.getSeq[org.apache.spark.sql.Row](1))
        .getOrElse(Seq.empty)
      val fp = rows
        .flatMap(x => Option(x.getString(1)).map(p => x.getString(0) -> p))
        .toMap
      val fi = rows
        .flatMap(x => if (x.isNullAt(2)) None
          else Some(x.getString(0) -> x.getLong(2)))
        .toMap
      (mode, fp, fi)
    }
  }

  /**
   * SCHEMA HISTORY at metadata cost: one row per `metaData` action in
   * the surviving log (commits, plus the checkpoint baseline once
   * cleanup has eaten the early commits — see [[metaDataFrame]]); no
   * data file is opened. `n_fields`/`field_names_csv` decode from the
   * action's own schemaString; a drift audit is
   * `schemaHistory(...).orderBy("version")` diffed row to row.
   */
  def schemaHistory(spark: SparkSession, table: String): DataFrame =
    metaDataFrame(spark, table)
      .select(col("version"), col("schema_id"),
        size(col("fields")).as("n_fields"),
        array_join(transform(col("fields"), f => f.getField("name")), ",")
          .as("field_names_csv"),
        array_join(col("partition_columns"), ",").as("partition_columns_csv"))

  /**
   * SCHEMA CONFORMANCE audit: the DECLARED schema (the log's latest
   * metaData action) vs the PHYSICAL schema of every live file's own
   * footer — the backfill question a schema evolution leaves behind
   * ("which files predate the new column"). One row per live file:
   * `(path, n_declared, n_present, missing_csv)`. Both sides are
   * metadata reads; the plan is the live reconstruction LEFT-joined
   * with the footer schema-fact scan — no data page is touched. A live
   * file with NO footer evidence (gone from disk, unreadable footer)
   * still gets a row, with null `n_present`/`missing_csv`: no
   * evidence is reported as no evidence, never as conformance and
   * never by silently dropping the file from the audit.
   */
  def schemaConformance(spark: SparkSession, table: String): DataFrame = {
    // latest declared field list — one tiny driver row; names travel
    // as a real array end to end (a comma INSIDE a field name is data)
    val latest = metaDataFrame(spark, table)
      .orderBy(col("version").desc).limit(1)
      .select(transform(col("fields"), f => f.getField("name")).as("names"),
        col("partition_columns"))
      .collect()
    if (latest.isEmpty) {
      throw new IllegalArgumentException(s"$table: no metaData action in the log")
    }
    // column mapping: under mode `name` the files carry PHYSICAL names;
    // the footer join must compare against them, the report must speak
    // in LOGICAL names. Mode `id` matches by parquet FIELD ID (the
    // footer facts carry it as top_field_id). Unknown modes refuse,
    // never misreport. Checked FIRST: an unsupported table must refuse
    // even with an unreadable declared field list.
    val (mode, mapping, fieldIds) = columnMappingInfo(spark, table)
    if (mode != "none" && mode != "name" && mode != "id") {
      throw new UnsupportedOperationException(
        s"$table: columnMapping mode '$mode' is not supported by the " +
          "conformance audit — refusing rather than matching footers " +
          "under unknown semantics")
    }
    // partition columns never live INSIDE the data files (Delta derives
    // them from partitionValues) — auditing them as "missing" would
    // flag every file of every partitioned table
    val partitionCols =
      Option(latest(0).getSeq[String](1)).getOrElse(Seq.empty).toSet
    val declared = Option(latest(0).getSeq[String](0)).getOrElse(Seq.empty)
      .filterNot(partitionCols.contains)
    // the per-declared-field match key the mode dictates: physical
    // top-level NAME under none/name; stringified FIELD ID under id
    // (footer side: top_field_id). Under id every declared field MUST
    // carry delta.columnMapping.id — a field without one is a protocol
    // violation whose footer identity is unknowable.
    val matchKeys: Seq[String] = mode match {
      case "id" => declared.map { l =>
        fieldIds.getOrElse(l, throw new IllegalArgumentException(
          s"$table: columnMapping mode is 'id' but declared field '$l' " +
            "carries no delta.columnMapping.id — its footer identity " +
            "is unknowable, refusing to misreport")).toString
      }
      case _ => declared.map(l => mapping.getOrElse(l, l))
    }
    val live = snapshotFiles(spark, table).select(col("abs_path"))
    // footer-side identity per TOP-LEVEL field: leaf paths' first
    // dotted segment (nested columns conform if their root field is
    // present), or the root's stamped field id under mode id
    val facts = MetaValues.schemaFactsDf(spark, table)
    val present = (mode match {
      case "id" => facts.select(col("filepath"),
        col("top_field_id").cast("string").as("field"))
        .filter(col("field").isNotNull)
      case _ => facts.select(col("filepath"),
        split(col("path"), "\\.").getItem(0).as("field"))
    }).distinct()
    live.join(present, live("abs_path") === present("filepath"), "left")
      .groupBy(col("abs_path").as("path"))
      .agg(collect_set(col("field")).as("present"))
      // any readable parquet footer has >= 1 field, so an EMPTY present
      // set means the join found no footer at all — null, not zero.
      // (Under mode id an id-less footer also lands here: none of its
      // fields carries the identity the mode matches by, so it has no
      // usable evidence — null, never "everything missing".)
      .select(col("path"),
        lit(declared.size).as("n_declared"),
        when(size(col("present")) === 0, lit(null))
          .otherwise(size(col("present"))).cast("int").as("n_present"),
        when(size(col("present")) === 0, lit(null).cast("string"))
          .otherwise(array_join(array_sort(filter(
            lit(declared.toArray),
            (l, i) => !array_contains(col("present"),
              element_at(lit(matchKeys.toArray), i + 1)))), ","))
          .as("missing_csv"))
  }

  /**
   * LOG-CLEANUP plan — `delta.logRetentionDuration`'s deletion set
   * answered BEFORE touching the log: segments (commits AND older
   * checkpoints) that a NEWER checkpoint makes reconstructible-without
   * and whose modification time has aged past `retainMs` at `nowMs`.
   * One row per deletable segment `(version, kind, filename, age_ms,
   * size)`. The covering checkpoint itself and everything at or after
   * it always stay (deleting them breaks the only replay base);
   * younger-than-retention segments stay (time travel inside the
   * retention window is a published guarantee). REFUSES when the log
   * has no checkpoint at all — with commits as the only history,
   * nothing is coverable and an empty plan would read as "already
   * clean".
   */
  def logCleanupPlan(
      spark: SparkSession, table: String,
      nowMs: Long, retainMs: Long): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val slices = listLogSlices(root, conf)
    val withKind = slices.flatMap(f =>
      segmentVersion(f.name).map { case (v, k) => (v, k, f) })
    // the covering replay base must be COMPLETE: the highest
    // checkpoint version whose part set selectCheckpointParts accepts
    // (an interrupted multipart upload classifies as 'checkpoint' but
    // can replay nothing — planning against it would direct deletion
    // of the only reconstructible history)
    val ckptVersion = withKind.collect { case (v, "checkpoint", _) => v }
      .distinct.sorted(Ordering[Long].reverse)
      .find { v =>
        try {
          selectCheckpointParts(table, v, withKind.collect {
            case (`v`, "checkpoint", f) => f.path
          }).nonEmpty
        } catch { case _: IllegalArgumentException => false }
      }
      .getOrElse(
        throw new UnsupportedOperationException(
          s"$table: the log has no COMPLETE checkpoint — no commit is " +
            "coverable and cleanup would delete the only history; " +
            "refusing to plan an empty-looking answer"))
    val cutoff = nowMs - retainMs
    // sidecar accounting: a deletable V2 manifest is the only thing
    // NAMING its _delta_log/_sidecars parts — once it goes, they leak
    // forever. Plan them alongside, EXCEPT parts a KEPT V2 manifest
    // also names (the protocol allows sharing).
    def isV2ManifestName(n: String): Boolean =
      CkptJsonRe.findFirstIn(n).isDefined ||
        (CkptRe.findFirstIn(n).isDefined &&
          ClassicCkptRe.findFirstIn(n).isEmpty &&
          MultipartRe.findFirstIn(n).isEmpty)
    def sidecarsOf(paths: Seq[String]): Set[String] =
      if (paths.isEmpty) Set.empty
      else {
        val raw = readCheckpointRaw(spark, paths,
          StructType(Seq(StructField("sidecar", sidecarType))))
        // a parquet manifest written without pointer rows has no
        // sidecar column at all — nothing to account for
        if (!raw.schema.fieldNames.contains("sidecar")) Set.empty
        else raw.select(col("sidecar.path"))
          .filter(col("path").isNotNull)
          .collect().map(_.getString(0)).toSet
      }
    val (delSegs, keptSegs) = withKind.partition { case (v, _, f) =>
      v < ckptVersion && f.mtime < cutoff
    }
    val deadV2 = delSegs.collect {
      case (_, "checkpoint", f) if isV2ManifestName(f.name) => f.path
    }
    val keptV2 = keptSegs.collect {
      case (_, "checkpoint", f) if isV2ManifestName(f.name) => f.path
    }
    val deadSidecars = sidecarsOf(deadV2) -- sidecarsOf(keptV2)
    val fs = root.getFileSystem(conf)
    val scDir = new Path(new Path(table), "_delta_log/_sidecars")
    val sidecarRows = deadSidecars.toSeq.sorted.map { n =>
      val decoded = java.net.URLDecoder.decode(n, "UTF-8")
      val p =
        if (decoded.contains("://") || decoded.startsWith("/")) {
          new Path(decoded)
        } else new Path(scDir, decoded)
      val st = try Some(p.getFileSystem(conf).getFileStatus(p))
        catch { case _: Exception => None }
      (-1L, "sidecar", p.getName,
        st.map(nowMs - _.getModificationTime).getOrElse(-1L),
        st.map(_.getLen).getOrElse(-1L))
    }
    (delSegs.map { case (v, k, f) =>
      (v, k, f.name, nowMs - f.mtime, f.size)
    } ++ sidecarRows)
      .toDF("version", "kind", "filename", "age_ms", "size")
  }

  /**
   * INCREMENTAL commit-range diff at metadata cost — the "what changed
   * since version X" question an incremental consumer asks before
   * touching data: one row per FILE ACTION in the commits of
   * `(fromVersion, toVersion]` — `(version, change add|remove, path,
   * num_records, size)`; `num_records` decodes from the add's own
   * stats (null when the writer recorded none, and for removes).
   * REFUSES — never a silent hole — when the range is empty or
   * reversed, when `toVersion` is past the latest segment, or when any
   * commit of the range has been log-cleaned (an incremental consumer
   * fed a gapped diff silently diverges; checkpoints carry no
   * per-version attribution to fill the gap with).
   */
  def commitDiff(
      spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    if (fromVersion >= toVersion) {
      throw new IllegalArgumentException(
        s"$table: version range ($fromVersion, $toVersion] is empty or " +
          "reversed — no increment to diff")
    }
    val segments = listLogSlices(root, conf)
      .flatMap(f => segmentVersion(f.name).map { case (v, k) => (v, k, f.path) })
    val latest = segments.map(_._1).maxOption.getOrElse(-1L)
    if (toVersion > latest) {
      throw new IllegalArgumentException(
        s"$table: version $toVersion is after the latest segment ($latest)")
    }
    val commits = segments.collect {
      case (v, "commit", p) if v > fromVersion && v <= toVersion => (v, p)
    }
    val missing = ((fromVersion + 1) to toVersion).toSet -- commits.map(_._1).toSet
    if (missing.nonEmpty) {
      throw new IllegalArgumentException(
        s"$table: commits ${missing.toSeq.sorted.mkString(", ")} of the " +
          s"range ($fromVersion, $toVersion] are log-cleaned — a gapped " +
          "diff silently diverges, refusing")
    }
    spark.read.schema(logSchema).json(commits.map(_._2): _*)
      .withColumn("version",
        regexp_extract(input_file_name(), "(\\d{20})\\.json", 1).cast("long"))
      .filter(col("add.path").isNotNull || col("remove.path").isNotNull)
      .select(col("version"),
        when(col("add.path").isNotNull, lit("add")).otherwise(lit("remove"))
          .as("change"),
        coalesce(col("add.path"), col("remove.path")).as("path"),
        get_json_object(col("add.stats"), "$.numRecords").cast("long")
          .as("num_records"),
        col("add.size").as("size"))
  }

  /**
   * VACUUM-candidate report: tombstoned files (latest action is a
   * `remove`) whose `deletionTimestamp` is older than `retainMs` before
   * `nowMs` AND are still on disk — exactly what `VACUUM RETAIN` would
   * delete, with byte- and row-exact reclaim from each file's own
   * footer. Younger tombstones are excluded (deleting them breaks
   * readers of older snapshots — the reason VACUUM has a retention
   * window at all). One row per candidate:
   * `(path, deleted_at, age_ms, size, num_rows)`.
   */
  def vacuumCandidates(
      spark: SparkSession, table: String,
      nowMs: Long, retainMs: Long): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    val segments = listLogSlices(root, conf)
      .flatMap(f => segmentVersion(f.name).map { case (v, k) => (v, k, f.path) })
    val ckptVersion = segments.collect { case (v, "checkpoint", _) => v }
      .maxOption.getOrElse(-1L)
    val ckptPaths = selectCheckpointParts(table, ckptVersion,
      segments.collect { case (v, "checkpoint", p) if v == ckptVersion => p })
    val tailPaths = segments.collect {
      case (v, "commit", p) if v > ckptVersion => p
    }
    val cutoff = nowMs - retainMs
    val tombstones = decodeActions(spark, table, ckptPaths, ckptVersion, tailPaths)
      .select(coalesce(col("add.path"), col("remove.path")).as("path"),
        col("version"), col("add"),
        col("remove.deletionTimestamp").as("deleted_at"))
      .filter(col("path").isNotNull)
      .groupBy(col("path"))
      .agg(max_by(struct(col("add"), col("deleted_at"), col("version")),
        struct(col("version"), col("add").isNotNull)).as("w"))
      .filter(col("w.add").isNull && col("w.deleted_at") <= cutoff)
      .select(
        when(col("path").contains("://") || col("path").startsWith("/"),
          url_decode(col("path")))
          .otherwise(concat(lit(root.toString + "/"), url_decode(col("path"))))
          .as("abs_path"),
        col("path"), col("w.deleted_at").as("deleted_at"))
    val footers = spark.read.format("metadata")
      .option("source", "parquet").option("level", "file")
      .option("ignorecorrupt", "true").load(table)
      .select(col("filepath"), col("size"), col("num_rows"))
    // inner join: already-vacuumed tombstones (no file on disk) are not
    // candidates — nothing to reclaim
    tombstones.join(footers, tombstones("abs_path") === footers("filepath"))
      .select(col("path"), col("deleted_at"),
        (lit(nowMs) - col("deleted_at")).as("age_ms"),
        col("size"), col("num_rows"))
  }

  // ---------------------------------------------------------------------
  // Streaming live-state maintenance
  // ---------------------------------------------------------------------

  /**
   * STREAMING live-state maintenance: one `Trigger.AvailableNow` pass of
   * the delta COMMIT STREAM reconciles each micro-batch's newly arrived
   * log segments into a compact per-path live store, so "what is live
   * NOW" costs a store read instead of a log replay. Each batch decodes
   * ONLY its own segments' actions (the stream's checkpoint admits a
   * segment exactly once across restarts) and merges them with the
   * previous store under the same `(version, is_add)` ordering the batch
   * replay uses — re-merging the same actions is a no-op, so
   * foreachBatch's at-least-once redelivery is safe. The store is
   * path-keyed and metadata-sized (one row per ever-seen file); the
   * local dir-swap publish would be a versioned prefix on an object
   * store. Call again after more commits land; only the new segments
   * replay. Live view: [[readLiveStore]].
   */
  def maintainLiveStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "delta").option("level", "snapshot")
      .option("streamlagms", "0").load(table)
    val q = src.select("filepath", "version", "kind")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // log-SEGMENT-sized driver boundary (file names, not actions)
        val segs = batch.select("filepath", "version", "kind").collect()
        if (segs.nonEmpty) {
          val ckptV = segs.filter(_.getString(2) == "checkpoint")
            .map(_.getLong(1)).maxOption.getOrElse(-1L)
          val ckpts = segs.collect {
            case r if r.getString(2) == "checkpoint" && r.getLong(1) == ckptV =>
              r.getString(0)
          }.toSeq
          val tails = segs.collect {
            case r if r.getString(2) == "commit" && r.getLong(1) > ckptV =>
              r.getString(0)
          }.toSeq
          val acts = decodeActions(spark, table, ckpts, ckptV, tails)
            .select(
              coalesce(col("add.path"), col("remove.path")).as("path"),
              col("version"),
              col("add").isNotNull.as("live"),
              get_json_object(col("add.stats"), "$.numRecords").cast("long")
                .as("num_records"),
              coalesce(col("add.deletionVector.cardinality"), lit(0L))
                .as("dv_cardinality"))
            .filter(col("path").isNotNull)
          val store = new java.io.File(storeDir)
          val merged = (if (store.exists()) {
            spark.read.parquet(storeDir).unionByName(acts)
          } else acts)
            .groupBy(col("path"))
            .agg(max_by(
              struct(col("version"), col("live"), col("num_records"),
                col("dv_cardinality")),
              struct(col("version"), col("live"))).as("w"))
            .select(col("path"), col("w.version").as("version"),
              col("w.live").as("live"),
              col("w.num_records").as("num_records"),
              col("w.dv_cardinality").as("dv_cardinality"))
          val next = new java.io.File(storeDir + "_next")
          merged.coalesce(1).write.mode("overwrite").parquet(next.getPath)
          publishStore(storeDir)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Crash-safe local-FS store publish: the fully-written `_next`
    * directory replaces `storeDir` by renaming the PREVIOUS store
    * aside first (`_old`), renaming `_next` into place, and deleting
    * the aside copy LAST — a crash or rename failure at any step
    * leaves either the old or the new store recoverable, never
    * neither (a delete-then-rename publish loses the old store when
    * the rename fails). On an object store this would be a versioned
    * prefix plus a pointer swap instead of renames. */
  private[meta] def publishStore(storeDir: String): Unit = {
    val store = new java.io.File(storeDir)
    val next = new java.io.File(storeDir + "_next")
    val old = new java.io.File(storeDir + "_old")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    if (store.exists() && !store.renameTo(old)) {
      throw new java.io.IOException(
        s"could not stage previous store $storeDir aside for publish")
    }
    if (!next.renameTo(store)) {
      val restored = !old.exists() || old.renameTo(store)
      throw new java.io.IOException(
        s"could not publish store $storeDir" +
          (if (restored) " (previous store restored)"
           else s" (previous store preserved at ${old.getPath})"))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(old)
  }

  /** The live rows of a [[maintainLiveStore]] store. */
  def readLiveStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir).filter(col("live"))
      .select(col("path"), col("version"), col("num_records"),
        col("dv_cardinality"))

  // ---------------------------------------------------------------------
  // Deterministic fixture writer (tests + oracle queries)
  // ---------------------------------------------------------------------

  /** JSON-escape nothing fancy: fixture paths/operations are plain. */
  private def jstr(s: String): String = "\"" + s + "\""

  /**
   * Hand-write a Delta table against the PUBLIC protocol (the AvroMeta
   * writeFixture pattern: our reader must then agree with DuckDB's
   * independent read of the same JSON/parquet): `nFiles` data parquet
   * slices of `rows`, committed across five versions with a checkpoint
   * at v2 and two vacuum-pending removed files —
   *
   *   v0: protocol + metaData + add f0, f1       (JSON)
   *   v1: add f2, f3                             (JSON)
   *   v2: remove f1, add f4                      (JSON)
   *   --- checkpoint.parquet at v2 + _last_checkpoint
   *   v3: remove f2, add f5                      (JSON)
   *   v4: add f6                                 (JSON)
   *
   * Live at v4: f0, f3, f4, f5, f6 (5 files); f1, f2 remain ON DISK
   * (vacuum-pending) — the case a raw directory census miscounts.
   * Every `add.stats` carries the real `numRecords` so the stats-vs-
   * footer audit is exact. Returns the per-file row counts.
   */
  def writeFixtureTable(spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()

    // seven disjoint slices of the docs table, written as f0..f6.parquet
    val n = 7
    val counts = (0 until n).map { i =>
      val slice = docs.filter(pmod(col("doc_id"), lit(n)) === i)
        .select(col("doc_id"), col("lang"))
      val tmp = dir + s"_slice$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(root, s"f$i.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      s"f$i.parquet" -> slice.count()
    }.toMap

    val ts0 = 1700000000000L
    def addJson(f: String, v: Long): String = {
      val size = new java.io.File(root, f).length()
      s"""{"add":{"path":${jstr(f)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":${ts0 + v * 1000},"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(f)}}"}}"""
    }
    def removeJson(f: String, v: Long): String =
      s"""{"remove":{"path":${jstr(f)},"deletionTimestamp":${ts0 + v * 1000},"dataChange":true}}"""
    def commitInfo(v: Long, op: String): String =
      s"""{"commitInfo":{"timestamp":${ts0 + v * 1000},"operation":${jstr(op)}}}"""
    def writeCommit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // real schemaStrings (Spark StructType json), with an EVOLUTION at
    // v4 — the shape a schema-drift audit has to read from the log
    val schemaV0 =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"doc_id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"lang\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}}]}"""
    val schemaV4 =
      """{\"type\":\"struct\",\"fields\":[""" +
        """{\"name\":\"doc_id\",\"type\":\"long\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"lang\",\"type\":\"string\",\"nullable\":true,\"metadata\":{}},""" +
        """{\"name\":\"quality\",\"type\":\"double\",\"nullable\":true,\"metadata\":{}}]}"""
    writeCommit(0, Seq(
      commitInfo(0, "WRITE"),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaV0","partitionColumns":[],"configuration":{},"createdTime":$ts0}}""",
      addJson("f0.parquet", 0), addJson("f1.parquet", 0)))
    writeCommit(1, Seq(commitInfo(1, "WRITE"),
      // a streaming writer's setTransaction marker (exactly-once resume)
      """{"txn":{"appId":"ingest-a","version":10,"lastUpdated":1700000001000}}""",
      addJson("f2.parquet", 1), addJson("f3.parquet", 1)))
    writeCommit(2, Seq(commitInfo(2, "MERGE"),
      removeJson("f1.parquet", 2), addJson("f4.parquet", 2)))
    val metaDataV4 =
      s"""{"metaData":{"id":"graft-fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schemaV4","partitionColumns":[],"configuration":{},"createdTime":$ts0}}"""

    // checkpoint at v2: reconciled state — live adds f0,f2,f3,f4 + the
    // f1 remove tombstone + protocol + metaData + txn rows, one action
    // a row (a REAL checkpoint preserves protocol/metaData/txn so log
    // cleanup can delete the commits that carried them — the
    // checkpoint-replay paths read them from here)
    {
      import spark.implicits._
      // the checkpoint keeps the PRE-deletion-vector add shape (no
      // deletionVector field), exercising the reader's absent-column path
      val ckptAddType = StructType(addType.fields.filterNot(
        _.name == "deletionVector"))
      val ckptProtocolType = StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))
      // the RAW schemaString (the JSON-line variants carry it escaped)
      val schemaV0Raw = schemaV0.replace("\\\"", "\"")
      val adds = Seq("f0.parquet", "f2.parquet", "f3.parquet", "f4.parquet")
      val addRows = adds.map { f =>
        (f, Map.empty[String, String], new java.io.File(root, f).length(),
          ts0, true, s"""{"numRecords":${counts(f)}}""")
      }
      val addDf = addRows
        .toDF("path", "partitionValues", "size", "modificationTime",
          "dataChange", "stats")
        .select(struct(col("path"), col("partitionValues"), col("size"),
          col("modificationTime"), col("dataChange"), col("stats")).as("add"))
        .withColumn("remove", lit(null).cast(removeType))
        .withColumn("protocol", lit(null).cast(ckptProtocolType))
        .withColumn("metaData", lit(null).cast(metaDataType))
        .withColumn("txn", lit(null).cast(txnType))
      val removeDf = Seq(("f1.parquet", ts0 + 2000, true))
        .toDF("path", "deletionTimestamp", "dataChange")
        .select(lit(null).cast(ckptAddType).as("add"),
          struct(col("path"), col("deletionTimestamp"), col("dataChange")).as("remove"))
        .withColumn("protocol", lit(null).cast(ckptProtocolType))
        .withColumn("metaData", lit(null).cast(metaDataType))
        .withColumn("txn", lit(null).cast(txnType))
      val headerDf = spark.range(1)
        .select(lit(null).cast(ckptAddType).as("add"),
          lit(null).cast(removeType).as("remove"),
          struct(lit(1).as("minReaderVersion"), lit(2).as("minWriterVersion")).as("protocol"),
          struct(lit("graft-fixture").as("id"),
            lit(schemaV0Raw).as("schemaString"),
            lit(Array.empty[String]).as("partitionColumns"),
            lit(null).cast(MapType(StringType, StringType))
              .as("configuration")).as("metaData"),
          lit(null).cast(txnType).as("txn"))
      // ingest-a's reconciled high-water mark as of v2 (its v1 commit
      // is what log cleanup would delete first)
      val txnDf = spark.range(1)
        .select(lit(null).cast(ckptAddType).as("add"),
          lit(null).cast(removeType).as("remove"),
          lit(null).cast(ckptProtocolType).as("protocol"),
          lit(null).cast(metaDataType).as("metaData"),
          struct(lit("ingest-a").as("appId"), lit(10L).as("version"),
            lit(ts0 + 1000).as("lastUpdated")).as("txn"))
      val tmp = dir + "_ckpt"
      addDf.unionByName(removeDf).unionByName(headerDf).unionByName(txnDf)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      java.nio.file.Files.write(new java.io.File(logDir, "_last_checkpoint").toPath,
        """{"version":2,"size":7}""".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }

    writeCommit(3, Seq(commitInfo(3, "DELETE"),
      """{"txn":{"appId":"ingest-a","version":11,"lastUpdated":1700000003000}}""",
      """{"txn":{"appId":"ingest-b","version":7,"lastUpdated":1700000003000}}""",
      removeJson("f2.parquet", 3), addJson("f5.parquet", 3)))
    writeCommit(4, Seq(commitInfo(4, "WRITE"), metaDataV4,
      addJson("f6.parquet", 4)))
    counts
  }

  /**
   * The base fixture plus per-version `.crc` version-checksum files,
   * computed CLOSED-FORM from the fixture's own commit plan (v0: +f0
   * +f1; v1: +f2 +f3; v2: −f1 +f4; v3: −f2 +f5; v4: +f6) — independent
   * of any replay code. Version 1 LIES (`numFiles: 99`) so the audit's
   * mismatch flag is exercised on a real disagreement. Returns per-file
   * row counts.
   */
  def writeCrcFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val root = new java.io.File(dir)
    val logDir = new java.io.File(root, "_delta_log")
    def size(f: String): Long = new java.io.File(root, f).length()
    val liveAt: Seq[(Long, Seq[String])] = Seq(
      0L -> Seq("f0", "f1"),
      1L -> Seq("f0", "f1", "f2", "f3"),
      2L -> Seq("f0", "f2", "f3", "f4"),
      3L -> Seq("f0", "f3", "f4", "f5"),
      4L -> Seq("f0", "f3", "f4", "f5", "f6"))
    liveAt.foreach { case (v, files) =>
      val nf = if (v == 1L) 99 else files.size
      val tsb = files.map(f => size(s"$f.parquet")).sum
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.crc").toPath,
        (s"""{"tableSizeBytes":$tsb,"numFiles":$nf,""" +
          s""""numMetadata":1,"numProtocol":1}""")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    counts
  }

  /**
   * A Delta table whose adds carry per-column `minValues`/`maxValues`
   * stats (the protocol's data-skipping shape): five doc_id-RANGE
   * slices written as `f0..f4`, each add declaring its slice's actual
   * doc_id bounds — except f4, whose stats carry `numRecords` ONLY
   * (the no-bounds file a sound pruner must always keep). One commit.
   * Returns per-file row counts.
   */
  def writeStatsPruneFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val step = maxId / 5 + 1
    val slices = (0 until 5).map { i =>
      val slice = docs
        .filter(col("doc_id") >= i * step && col("doc_id") < (i + 1) * step)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
      val tmp = dir + s"_slice$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(root, s"f$i.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      val b = slice.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
        .head()
      (s"f$i.parquet", b.getLong(0), b.getLong(1), b.getLong(2))
    }
    val ts0 = 1700000000000L
    def addJson(f: String, n: Long, bounds: Option[(Long, Long)]): String = {
      val size = new java.io.File(root, f).length()
      val stats = bounds match {
        case Some((mn, mx)) =>
          s"""{\\"numRecords\\":$n,\\"minValues\\":{\\"doc_id\\":$mn},""" +
            s"""\\"maxValues\\":{\\"doc_id\\":$mx}}"""
        case None => s"""{\\"numRecords\\":$n}"""
      }
      s"""{"add":{"path":${jstr(f)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":$ts0,"dataChange":true,"stats":"$stats"}}"""
    }
    val lines = Seq(
      s"""{"commitInfo":{"timestamp":$ts0,"operation":"WRITE"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-statsprune","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"{}","partitionColumns":[],"configuration":{},"createdTime":$ts0}}""") ++
      slices.map { case (f, n, mn, mx) =>
        addJson(f, n, if (f == "f4.parquet") None else Some((mn, mx)))
      }
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${0L}%020d.json").toPath,
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    slices.map(s => s._1 -> s._2).toMap
  }

  /**
   * STATS-based file skipping — the lakehouse data-skipping question
   * at LOG cost: which live files can hold `column` values in
   * `[lo, hi]`, decided from each add's `minValues`/`maxValues` alone.
   * One row per live file with its bounds, `has_bounds`, and
   * `selected`; a file WITHOUT bounds stays selected (no evidence —
   * a sound pruner must read it), never silently skipped.
   */
  def statsPrune(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val mn = get_json_object(col("stats"), s"$$.minValues.$column")
      .cast("long")
    val mx = get_json_object(col("stats"), s"$$.maxValues.$column")
      .cast("long")
    snapshotFiles(spark, table)
      .select(col("path"), col("num_records"),
        mn.as("min_value"), mx.as("max_value"))
      .withColumn("has_bounds",
        col("min_value").isNotNull && col("max_value").isNotNull)
      .withColumn("selected",
        !col("has_bounds") ||
          !(col("max_value") < lo || col("min_value") > hi))
  }

  /**
   * A PARTITIONED Delta table against the public protocol: `docs` split
   * by `lang` into `lang=<x>/` directories, two files per partition
   * (doc_id parity), committed across three versions. Every add carries
   * `partitionValues={"lang": x}` and a stats `numRecords`, so
   * partition-pruned planning — "which files serve `lang = x`" — answers
   * from the log alone, before any data I/O. Returns rows per
   * (lang, parity) file.
   */
  def writePartitionedFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()

    val langs = docs.select("lang").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (lang <- langs; parity <- 0 to 1) {
      val slice = docs
        .filter(col("lang") === lang && pmod(col("doc_id"), lit(2)) === parity)
        .select(col("doc_id"), col("n_chars"))
      val rel = s"lang=$lang/f$parity.parquet"
      val tmp = dir + s"_slice_${lang}_$parity"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(root, rel)
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      counts(rel) = slice.count()
    }

    val ts0 = 1700000000000L
    def addJson(rel: String, lang: String, v: Long): String = {
      val size = new java.io.File(root, rel).length()
      s"""{"add":{"path":${jstr(rel)},"partitionValues":{"lang":${jstr(lang)}},""" +
        s""""size":$size,"modificationTime":${ts0 + v * 1000},"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(rel)}}"}}"""
    }
    def commitInfoLine(v: Long): String =
      s"""{"commitInfo":{"timestamp":${ts0 + v * 1000},"operation":"WRITE"}}"""
    def writeCommit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // v0: protocol + metaData (partitionColumns names lang) + first langs
    val (head, tail2) = langs.splitAt(2)
    writeCommit(0, Seq(
      commitInfoLine(0),
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"graft-part-fixture","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"{}","partitionColumns":["lang"],"configuration":{},"createdTime":$ts0}}""") ++
      head.flatMap(l => (0 to 1).map(p => addJson(s"lang=$l/f$p.parquet", l, 0))))
    writeCommit(1, commitInfoLine(1) +:
      tail2.dropRight(1).flatMap(l => (0 to 1).map(p => addJson(s"lang=$l/f$p.parquet", l, 1))))
    writeCommit(2, commitInfoLine(2) +:
      tail2.takeRight(1).flatMap(l => (0 to 1).map(p => addJson(s"lang=$l/f$p.parquet", l, 2))))
    counts.toMap
  }

  /**
   * The base fixture RE-CHECKPOINTED in the V2 (sidecar) layout — the
   * protocol's `v2Checkpoint` feature: the classic v2 checkpoint part
   * is replaced by a MANIFEST (`<v>.checkpoint.graftv2.parquet`)
   * holding `checkpointMetadata`, one `sidecar` pointer row per part,
   * and the non-file actions (protocol/metaData/txn — the spec keeps
   * them in the manifest), while the add/remove FILE actions move to
   * `_delta_log/_sidecars/{sc1,sc2}.parquet` (adds and removes split
   * across parts). Commits 0..2 are then DELETED (log cleanup, which
   * v2Checkpoint tables rely on): the replay has no JSON fallback —
   * it MUST follow the pointers through the sidecars.
   */
  def writeV2CheckpointFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val logDir = new java.io.File(dir, "_delta_log")
    val classic = new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet")
    val ckpt = spark.read.parquet(classic.getPath)
    val scDir = new java.io.File(logDir, "_sidecars")
    scDir.mkdirs()
    def writeOnePart(df: DataFrame, dst: java.io.File): Unit = {
      val tmp = dir + "_v2tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    // file actions out to the sidecars: adds in sc1, removes in sc2
    writeOnePart(ckpt.filter(col("add").isNotNull).select("add", "remove"),
      new java.io.File(scDir, "sc1.parquet"))
    writeOnePart(
      ckpt.filter(col("add").isNull && col("remove").isNotNull)
        .select("add", "remove"),
      new java.io.File(scDir, "sc2.parquet"))
    // the manifest: non-file actions + checkpointMetadata + pointers,
    // and NO add/remove columns at all
    val protoT = ckpt.schema("protocol").dataType
    val metaT = ckpt.schema("metaData").dataType
    val txnT = ckpt.schema("txn").dataType
    val cmT = StructType(Seq(StructField("version", LongType)))
    val scT = StructType(Seq(
      StructField("path", StringType),
      StructField("sizeInBytes", LongType),
      StructField("modificationTime", LongType)))
    val nonFile = ckpt.filter(col("add").isNull && col("remove").isNull)
      .select(col("protocol"), col("metaData"), col("txn"),
        lit(null).cast(cmT).as("checkpointMetadata"),
        lit(null).cast(scT).as("sidecar"))
    val cmRow = spark.range(1).select(
      lit(null).cast(protoT).as("protocol"),
      lit(null).cast(metaT).as("metaData"),
      lit(null).cast(txnT).as("txn"),
      struct(lit(2L).as("version")).as("checkpointMetadata"),
      lit(null).cast(scT).as("sidecar"))
    val scRows = {
      import spark.implicits._
      Seq("sc1.parquet", "sc2.parquet").map { n =>
        val f = new java.io.File(scDir, n)
        (n, f.length(), f.lastModified())
      }.toDF("p", "s", "m").select(
        lit(null).cast(protoT).as("protocol"),
        lit(null).cast(metaT).as("metaData"),
        lit(null).cast(txnT).as("txn"),
        lit(null).cast(cmT).as("checkpointMetadata"),
        struct(col("p").as("path"), col("s").as("sizeInBytes"),
          col("m").as("modificationTime")).as("sidecar"))
    }
    writeOnePart(nonFile.unionByName(cmRow).unionByName(scRows),
      new java.io.File(logDir, f"${2L}%020d.checkpoint.graftv2.parquet"))
    classic.delete()
    // log cleanup: the commits the checkpoint covers are gone
    logDir.listFiles().filter(f => f.getName.endsWith(".json") &&
      segmentVersion(f.getName).exists(_._1 <= 2L)).foreach(_.delete())
    counts
  }

  /**
   * The base fixture re-checkpointed through the protocol's V2
   * JSON-MANIFEST form: the same `_delta_log/_sidecars` parquet parts
   * as [[writeV2CheckpointFixtureTable]], but the manifest is
   * `2.checkpoint.<uuid>.json` — ndjson of the non-file actions +
   * `checkpointMetadata` + one `sidecar` pointer line per part — and
   * NO parquet checkpoint survives. Commits ≤ 2 are log-cleaned, so
   * the live set MUST reconstruct through the JSON manifest (a reader
   * blind to the form would silently replay from nothing). Returns the
   * per-file row counts.
   */
  def writeV2JsonCheckpointFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val logDir = new java.io.File(dir, "_delta_log")
    val classic = new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet")
    val ckpt = spark.read.parquet(classic.getPath)
    val scDir = new java.io.File(logDir, "_sidecars")
    scDir.mkdirs()
    def writeOnePart(df: DataFrame, dst: java.io.File): Unit =
      FixtureIO.writeSingleParquet(df, dst, dir + "_v2jtmp")
    // file actions out to the sidecars: adds in sc1, removes in sc2
    writeOnePart(ckpt.filter(col("add").isNotNull).select("add", "remove"),
      new java.io.File(scDir, "sc1.parquet"))
    writeOnePart(
      ckpt.filter(col("add").isNull && col("remove").isNotNull)
        .select("add", "remove"),
      new java.io.File(scDir, "sc2.parquet"))
    // the manifest: ndjson — non-file actions from the classic
    // checkpoint (toJSON drops null fields, giving the protocol's
    // one-action-per-line shape), then checkpointMetadata + pointers
    val nonFileLines = ckpt
      .filter(col("add").isNull && col("remove").isNull)
      .select(col("protocol"), col("metaData"), col("txn"))
      .toJSON.collect().toSeq
    val scLines = Seq("sc1.parquet", "sc2.parquet").map { n =>
      val f = new java.io.File(scDir, n)
      s"""{"sidecar":{"path":${jstr(n)},"sizeInBytes":${f.length()},""" +
        s""""modificationTime":${f.lastModified()}}}"""
    }
    val lines = nonFileLines ++
      Seq("""{"checkpointMetadata":{"version":2}}""") ++ scLines
    java.nio.file.Files.write(
      new java.io.File(logDir,
        f"${2L}%020d.checkpoint.graftv2json.json").toPath,
      lines.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    classic.delete()
    // log cleanup: the commits the checkpoint covers are gone (the
    // JSON MANIFEST also ends in .json — segmentVersion classifies it
    // "checkpoint", so the commit-only filter leaves it alone)
    logDir.listFiles().filter(f =>
      segmentVersion(f.getName).exists { case (v, k) =>
        k == "commit" && v <= 2L }).foreach(_.delete())
    counts
  }

  /**
   * The base fixture re-checkpointed in the protocol's MULTIPART form:
   * the classic `2.checkpoint.parquet` is split into two parts
   * (`2.checkpoint.0000000001.0000000002.parquet` +
   * `...0000000002.0000000002.parquet` — adds in part 1, everything
   * else in part 2), the classic file deleted, and commits ≤ 2
   * log-cleaned — so the live set MUST replay through the full part
   * set. Returns the per-file row counts.
   */
  def writeMultipartCheckpointFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val logDir = new java.io.File(dir, "_delta_log")
    val classic = new java.io.File(logDir, f"${2L}%020d.checkpoint.parquet")
    val ckpt = spark.read.parquet(classic.getPath)
    def writeOnePart(df: DataFrame, dst: java.io.File): Unit = {
      val tmp = dir + "_mptmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }
    writeOnePart(ckpt.filter(col("add").isNotNull),
      new java.io.File(logDir,
        f"${2L}%020d.checkpoint.${1L}%010d.${2L}%010d.parquet"))
    writeOnePart(ckpt.filter(col("add").isNull),
      new java.io.File(logDir,
        f"${2L}%020d.checkpoint.${2L}%010d.${2L}%010d.parquet"))
    classic.delete()
    // log cleanup: the commits the checkpoint covers are gone
    logDir.listFiles().filter(f => f.getName.endsWith(".json") &&
      segmentVersion(f.getName).exists(_._1 <= 2L)).foreach(_.delete())
    counts
  }

  /**
   * A COLUMN-MAPPED partitioned table against the public protocol —
   * `delta.columnMapping.mode = name`: data files carry PHYSICAL
   * column names (`c1` for logical `doc_id`), the logical names live
   * only in the metaData schemaString (each field's
   * `metadata."delta.columnMapping.physicalName"`), partition values
   * are keyed by the PHYSICAL partition column name (`c2` for
   * `lang`), and a v2 evolution declares `quality` → `c3` that no
   * file carries. The shape where a mapping-blind audit reports every
   * logical column missing and a mapping-blind prune matches nothing.
   * Two langs × two parity files; returns rows per `p<i>.parquet`.
   */
  def writeColumnMappedFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()

    val counts = scala.collection.mutable.Map.empty[String, Long]
    val partOf = scala.collection.mutable.Map.empty[String, String]
    for (q <- 0 until 4) {
      // quarter q of the docs; p0/p1 are the en partition, p2/p3 zh —
      // and the FILE schema is the physical one: a single column c1
      val slice = docs.filter(pmod(col("doc_id"), lit(4)) === q)
        .select(col("doc_id").as("c1"))
      val rel = s"p$q.parquet"
      val tmp = dir + s"_slice$q"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(root, rel).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      counts(rel) = slice.count()
      partOf(rel) = if (q < 2) "en" else "zh"
    }

    val ts0 = 1700000000000L
    def field(logical: String, phys: String, tpe: String): String =
      s"""{\\"name\\":\\"$logical\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,""" +
        s"""\\"metadata\\":{\\"delta.columnMapping.id\\":${phys.drop(1)},""" +
        s"""\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val schemaV0 = """{\"type\":\"struct\",\"fields\":[""" +
      field("doc_id", "c1", "long") + "," + field("lang", "c2", "string") + "]}"
    val schemaV2 = """{\"type\":\"struct\",\"fields\":[""" +
      field("doc_id", "c1", "long") + "," + field("lang", "c2", "string") +
      "," + field("quality", "c3", "double") + "]}"
    def metaJson(schema: String): String =
      s"""{"metaData":{"id":"graft-colmap","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schema","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.columnMapping.mode":"name",""" +
        s""""delta.columnMapping.maxColumnId":"3"},"createdTime":$ts0}}"""
    def addJson(rel: String, v: Long): String = {
      val size = new java.io.File(root, rel).length()
      // partitionValues keys are the PHYSICAL partition column name
      s"""{"add":{"path":${jstr(rel)},"partitionValues":{"c2":${jstr(partOf(rel))}},""" +
        s""""size":$size,"modificationTime":${ts0 + v * 1000},"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(rel)}}"}}"""
    }
    def writeCommit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    writeCommit(0, Seq(
      s"""{"commitInfo":{"timestamp":$ts0,"operation":"WRITE"}}""",
      // columnMapping requires reader 2 / writer 5 (pre-table-features)
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaJson(schemaV0),
      addJson("p0.parquet", 0), addJson("p1.parquet", 0)))
    writeCommit(1, Seq(
      s"""{"commitInfo":{"timestamp":${ts0 + 1000},"operation":"WRITE"}}""",
      addJson("p2.parquet", 1), addJson("p3.parquet", 1)))
    writeCommit(2, Seq(
      s"""{"commitInfo":{"timestamp":${ts0 + 2000},"operation":"ADD COLUMNS"}}""",
      metaJson(schemaV2)))
    counts.toMap
  }

  /**
   * The column-mapping fixture in `id` MODE: same partitioned shape as
   * [[writeColumnMappedFixtureTable]] (p0/p1 en, p2/p3 zh; physical
   * names c1/c2/c3), but `delta.columnMapping.mode = id` and every
   * data file's parquet footer stamps `c1` with FIELD ID 1 (written
   * through Spark's own `parquet.field.id` schema-metadata channel, so
   * the Thrift `SchemaElement.field_id` is real) — footers match by
   * that id, not by any name. The v2 evolution declares `quality`
   * (id 3, physical c3) that no file carries. Returns rows per
   * `p<i>.parquet`.
   */
  def writeColumnMappedIdFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()

    val counts = scala.collection.mutable.Map.empty[String, Long]
    val partOf = scala.collection.mutable.Map.empty[String, String]
    val c1Meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("parquet.field.id", 1L).build()
    for (q <- 0 until 4) {
      // the FILE schema is the physical one: a single column c1 whose
      // footer SchemaElement carries field_id=1
      val slice = docs.filter(pmod(col("doc_id"), lit(4)) === q)
        .select(col("doc_id").as("c1", c1Meta))
      val rel = s"p$q.parquet"
      counts(rel) = FixtureIO.writeSingleParquet(
        slice, new java.io.File(root, rel), dir + s"_slice$q")
      partOf(rel) = if (q < 2) "en" else "zh"
    }

    val ts0 = 1700000000000L
    def field(logical: String, phys: String, tpe: String): String =
      s"""{\\"name\\":\\"$logical\\",\\"type\\":\\"$tpe\\",\\"nullable\\":true,""" +
        s"""\\"metadata\\":{\\"delta.columnMapping.id\\":${phys.drop(1)},""" +
        s"""\\"delta.columnMapping.physicalName\\":\\"$phys\\"}}"""
    val schemaV0 = """{\"type\":\"struct\",\"fields\":[""" +
      field("doc_id", "c1", "long") + "," + field("lang", "c2", "string") + "]}"
    val schemaV2 = """{\"type\":\"struct\",\"fields\":[""" +
      field("doc_id", "c1", "long") + "," + field("lang", "c2", "string") +
      "," + field("quality", "c3", "double") + "]}"
    def metaJson(schema: String): String =
      s"""{"metaData":{"id":"graft-colmap-id","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"$schema","partitionColumns":["lang"],""" +
        s""""configuration":{"delta.columnMapping.mode":"id",""" +
        s""""delta.columnMapping.maxColumnId":"3"},"createdTime":$ts0}}"""
    def addJson(rel: String, v: Long): String = {
      val size = new java.io.File(root, rel).length()
      // partitionValues keys are the PHYSICAL partition column name
      s"""{"add":{"path":${jstr(rel)},"partitionValues":{"c2":${jstr(partOf(rel))}},""" +
        s""""size":$size,"modificationTime":${ts0 + v * 1000},"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(rel)}}"}}"""
    }
    def writeCommit(v: Long, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        new java.io.File(logDir, f"$v%020d.json").toPath,
        lines.mkString("", "\n", "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    writeCommit(0, Seq(
      s"""{"commitInfo":{"timestamp":$ts0,"operation":"WRITE"}}""",
      // columnMapping requires reader 2 / writer 5 (pre-table-features)
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      metaJson(schemaV0),
      addJson("p0.parquet", 0), addJson("p1.parquet", 0)))
    writeCommit(1, Seq(
      s"""{"commitInfo":{"timestamp":${ts0 + 1000},"operation":"WRITE"}}""",
      addJson("p2.parquet", 1), addJson("p3.parquet", 1)))
    writeCommit(2, Seq(
      s"""{"commitInfo":{"timestamp":${ts0 + 2000},"operation":"ADD COLUMNS"}}""",
      metaJson(schemaV2)))
    counts.toMap
  }

  /**
   * A Delta table with REAL roaring64 deletion vectors, both storage
   * kinds: two data files sorted by `doc_id` (so row POSITIONS are
   * closed-form: position k holds the k-th smallest doc_id of the
   * slice), then a DELETE-without-rewrite commit attaching
   *
   *  - to `f0`: an INLINE DV (`storageType=i`, Z85 payload) deleting
   *    positions 1, 3, 5;
   *  - to `f1`: an on-disk `u`-storage DV (`deletion_vector_<uuid>.bin`
   *    with the version byte + BE length + bitmap + BE CRC framing)
   *    deleting positions 0 and 2.
   *
   * Every byte of both payloads is produced by [[DvCodec.encodeBitmap]]
   * against the PUBLIC format (magic 1681511377 + portable roaring),
   * which the decode side re-reads independently of this writer's
   * in-memory state. Returns rows per file.
   */
  def writeDvBitmapFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val logDir = new java.io.File(root, "_delta_log")
    logDir.mkdirs()

    val counts = (0 to 1).map { parity =>
      val rel = s"f$parity.parquet"
      val slice = docs.filter(pmod(col("doc_id"), lit(2)) === parity)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
      val tmp = dir + s"_slice$parity"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(root, rel).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      rel -> slice.count()
    }.toMap

    val ts0 = 1700000000000L
    def addJson(f: String, dv: String): String = {
      val size = new java.io.File(root, f).length()
      s"""{"add":{"path":${jstr(f)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":$ts0,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(f)}}"""" +
        (if (dv.isEmpty) "}}" else s""","deletionVector":$dv}}""")
    }
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${0L}%020d.json").toPath,
      (Seq(
        s"""{"commitInfo":{"timestamp":$ts0,"operation":"WRITE"}}""",
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"],""" +
          """"writerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"graft-dvbitmap","format":{"provider":"parquet","options":{}},""" +
          s""""schemaString":"{}","partitionColumns":[],"configuration":{},"createdTime":$ts0}}""") ++
        Seq(addJson("f0.parquet", ""), addJson("f1.parquet", "")))
        .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // v1: DELETE-without-rewrite — inline DV on f0, u-storage on f1
    val ts1 = ts0 + 1000
    val inlineData = DvCodec.encodeBitmap(Array(1L, 3L, 5L))
    val padded = inlineData ++
      Array.fill[Byte]((4 - inlineData.length % 4) % 4)(0)
    val inlineDv =
      s"""{"storageType":"i","pathOrInlineDv":${jstr(DvCodec.z85Encode(padded))},""" +
        s""""sizeInBytes":${inlineData.length},"cardinality":3}"""
    val uuid = new java.util.UUID(0x0123456789ABCDEFL, 0xFEDCBA9876543210L)
    val uuidBytes = java.nio.ByteBuffer.allocate(16)
      .putLong(uuid.getMostSignificantBits)
      .putLong(uuid.getLeastSignificantBits).array()
    val (dvOff, dvSize) = DvCodec.writeDvFile(
      new java.io.File(root, s"deletion_vector_$uuid.bin"), Array(0L, 2L))
    val uDv =
      s"""{"storageType":"u","pathOrInlineDv":${jstr(DvCodec.z85Encode(uuidBytes))},""" +
        s""""offset":$dvOff,"sizeInBytes":$dvSize,"cardinality":2}"""
    def removeJson(f: String): String =
      s"""{"remove":{"path":${jstr(f)},"deletionTimestamp":$ts1,"dataChange":true}}"""
    def addDvJson(f: String, dv: String): String = {
      val size = new java.io.File(root, f).length()
      s"""{"add":{"path":${jstr(f)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":$ts1,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(f)}}","deletionVector":$dv}}"""
    }
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${1L}%020d.json").toPath,
      Seq(
        s"""{"commitInfo":{"timestamp":$ts1,"operation":"DELETE"}}""",
        removeJson("f0.parquet"), addDvJson("f0.parquet", inlineDv),
        removeJson("f1.parquet"), addDvJson("f1.parquet", uDv))
        .mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * The base fixture plus a v5 DELETE-without-rewrite: the protocol's
   * deletion-vector commit shape — `remove f0` + `add f0` with the SAME
   * physical file and a `deletionVector` descriptor (3 logically-deleted
   * rows, inline storage). `stats.numRecords` still counts the physical
   * rows; the net live count of f0 drops by 3 without any file rewrite —
   * the case a DV-blind audit silently overcounts.
   */
  def writeDvFixtureTable(spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val root = new java.io.File(dir)
    val logDir = new java.io.File(root, "_delta_log")
    val ts5 = 1700000005000L
    val f0 = "f0.parquet"
    val size = new java.io.File(root, f0).length()
    val lines = Seq(
      s"""{"commitInfo":{"timestamp":$ts5,"operation":"DELETE"}}""",
      // DVs require the table-features protocol (the spec's v3/v7 with
      // the deletionVectors feature named on both sides)
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        """"readerFeatures":["deletionVectors"],""" +
        """"writerFeatures":["deletionVectors"]}}""",
      s"""{"remove":{"path":${jstr(f0)},"deletionTimestamp":$ts5,"dataChange":true}}""",
      s"""{"add":{"path":${jstr(f0)},"partitionValues":{},"size":$size,""" +
        s""""modificationTime":$ts5,"dataChange":true,""" +
        s""""stats":"{\\"numRecords\\":${counts(f0)}}",""" +
        """"deletionVector":{"storageType":"i","pathOrInlineDv":"graftDvFixture",""" +
        """"offset":1,"sizeInBytes":40,"cardinality":3}}}""")
    java.nio.file.Files.write(
      new java.io.File(logDir, f"${5L}%020d.json").toPath,
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }
}
