package graft.meta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The audit/maintenance-plan surface of [[DeltaMeta]] — crc and
  * _last_checkpoint audits, schema history/conformance, log-cleanup
  * plan, commit diff, vacuum candidates. Pure move out of
  * DeltaMeta.scala (r15, file-size split); the self-type keeps every
  * call site `DeltaMeta.x` intact. */
private[meta] trait DeltaMetaAudits extends Serializable { this: DeltaMeta.type =>

  /**
   * RESTORE plan at metadata cost — `RESTORE TABLE ... TO VERSION AS
   * OF v` answered BEFORE writing anything: the file-action diff
   * between the live set THEN and NOW. One row per planned action:
   * `re_add` (live at `toVersion`, gone or CHANGED since — a same-path
   * file whose size or deletion-vector state moved needs its add
   * rewritten too) and `remove` (live now, absent then). Version
   * resolution and out-of-range refusals ride [[snapshotFilesAt]];
   * restoring to the current state refuses — an empty plan reads as
   * "safe no-op" when the caller almost certainly named the wrong
   * version.
   */
  def restorePlan(
      spark: SparkSession, table: String, toVersion: Long): DataFrame = {
    val cols = Seq("path", "num_records", "size", "dv_cardinality")
    val thenDf = snapshotFilesAt(spark, table, Some(toVersion))
      .select(cols.map(col): _*).alias("t")
    val nowDf = snapshotFiles(spark, table)
      .select(cols.map(col): _*).alias("n")
    val reAdd = thenDf.join(nowDf.select("path"), Seq("path"), "left_anti")
      .select(lit("re_add").as("action"), col("path"), col("num_records"))
    val changed = thenDf.join(nowDf, Seq("path"))
      .filter(!(col("t.size") <=> col("n.size")) ||
        !(col("t.dv_cardinality") <=> col("n.dv_cardinality")))
      .select(lit("re_add").as("action"), col("path"),
        col("t.num_records").as("num_records"))
    val remove = nowDf.join(thenDf.select("path"), Seq("path"), "left_anti")
      .select(lit("remove").as("action"), col("path"), col("num_records"))
    val plan = reAdd.unionByName(changed).unionByName(remove)
    if (plan.limit(1).count() == 0) {
      throw new IllegalArgumentException(
        s"$table: version $toVersion IS the current state — an empty " +
          "restore plan is refused, nothing to do")
    }
    plan
  }

  /**
   * ROW-TRACKING audit — the `rowTracking` writer feature's
   * `baseRowId` / `defaultRowCommitVersion` on add actions (the fresh
   * row-id ranges engines hand out for CDC and materialized row ids)
   * verified for DISJOINTNESS across the LIVE files: each file owns
   * `[baseRowId, baseRowId + numRecords)`; two live files whose ranges
   * overlap hand the same row id to two rows — the silent corruption
   * this audit exists to catch. `disjoint` comes from a range-
   * partitioned cumulative max over baseRowId-sorted ranges
   * ([[ScanWindows.withPrevCummax]]; strict — row ids are unique, a
   * shared boundary IS a collision); files declaring no baseRowId
   * report null. On a LOG-CLEANED table the declared side folds in
   * the checkpoint's add rows (r16 — early adds live only there;
   * commit re-adds outrank the checkpoint base). Refuses when NO add
   * action carries row-tracking fields — nothing to audit — and when
   * a sidecar-layout checkpoint manifest hides its adds entirely.
   */
  def rowTrackingAudit(spark: SparkSession, table: String): DataFrame = {
    val (_, segments, ckptVersion) = latestLogSplit(spark, table)
    val commitPaths = segments.collect { case (_, "commit", p) => p }
    if (commitPaths.isEmpty) {
      throw new IllegalArgumentException(s"$table: no commit segments")
    }
    val trackAdd = StructType(Seq(
      StructField("path", StringType),
      StructField("baseRowId", LongType),
      StructField("defaultRowCommitVersion", LongType)))
    // ranked (v*2+1 for commits, v*2 for the checkpoint base) so a
    // commit's re-add at the checkpoint version beats the checkpoint
    val commitDecl = spark.read
      .schema(StructType(Seq(StructField("add", trackAdd))))
      .json(commitPaths: _*)
      .filter(col("add.path").isNotNull)
      .select(col("add.path").as("path"),
        col("add.baseRowId").as("base_row_id"),
        col("add.defaultRowCommitVersion").as("row_commit_version"),
        (regexp_extract(element_at(split(col("_metadata.file_path"), "/"),
          -1), "^0*(\\d+)", 1).cast("long") * 2 + 1).as("rank"))
    // on a LOG-CLEANED table the early adds live only in the
    // checkpoint (the trackAdd fields exist in checkpoint add
    // structs): fold them in, absent fields tolerated as nulls — but
    // a checkpoint manifest with NO add column at all (V2 sidecar
    // layout) HIDES the adds, and that refuses rather than report
    // null base ids as "no evidence"
    val hasCommit0 = segments.exists { case (v, k, _) =>
      v == 0L && k == "commit" }
    val ckptDecl =
      if (hasCommit0 || ckptVersion < 0) None
      else {
        val parts = selectCheckpointParts(table, ckptVersion,
          segments.collect {
            case (v, "checkpoint", p) if v == ckptVersion => p })
        val raw = readCheckpointRaw(spark, parts,
          StructType(Seq(StructField("add", trackAdd))))
        if (!raw.columns.contains("add")) {
          throw new UnsupportedOperationException(
            s"$table: the checkpoint base at version $ckptVersion " +
              "carries no inline add column (sidecar layout) — its " +
              "row-tracking fields are hidden from this audit, " +
              "refusing rather than reporting null base ids")
        }
        val addStruct = raw.schema("add").dataType
          .asInstanceOf[StructType]
        def f(n: String): Column =
          if (addStruct.fieldNames.contains(n)) {
            col(s"add.$n").cast(LongType)
          } else lit(null).cast(LongType)
        Some(raw.filter(col("add.path").isNotNull)
          .select(col("add.path").as("path"),
            f("baseRowId").as("base_row_id"),
            f("defaultRowCommitVersion").as("row_commit_version"),
            lit(ckptVersion * 2).as("rank")))
      }
    val declared = (Seq(commitDecl) ++ ckptDecl.toSeq)
      .reduce(_ unionByName _)
      .groupBy(col("path"))
      .agg(max_by(struct(col("base_row_id"), col("row_commit_version")),
        col("rank")).as("w"))
      .select(col("path"), col("w.base_row_id"),
        col("w.row_commit_version"))
    if (declared.filter(col("base_row_id").isNotNull)
        .limit(1).count() == 0) {
      throw new IllegalArgumentException(
        s"$table: no add action carries baseRowId — row tracking is " +
          "not in evidence, nothing to audit")
    }
    val live = snapshotFiles(spark, table)
      .select(col("path"), col("num_records"))
    val joined = live.join(declared, Seq("path"), "left")
      .withColumn("range_end",
        col("base_row_id") + col("num_records") - 1)
    ScanWindows.withPrevCummax(joined,
      Seq(col("base_row_id"), col("path")), col("range_end"))
      .select(col("path"), col("base_row_id"),
        col("row_commit_version"), col("num_records"),
        when(col("base_row_id").isNull, lit(null).cast("boolean"))
          .when(col("prev_cummax").isNull, lit(true))
          .otherwise(col("base_row_id") > col("prev_cummax"))
          .as("disjoint"))
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
  /**
   * CHANGE DATA FEED over `[fromVersion, toVersion]` — the protocol's
   * CDF resolution rule applied per commit: when a commit carries
   * `cdc` actions, its `_change_data` files are the AUTHORITY (they
   * carry their own `_change_type`, including update pre/post images,
   * and supersede the commit's add/remove for change purposes); a
   * cdc-less commit derives file-granularity changes — `insert` rows
   * from its dataChange adds, `delete` rows from its dataChange
   * removes. Emits the data columns plus `_change_type` and
   * `_commit_version`. THREE scans total regardless of range width
   * (cdc / insert / delete file sets, each tagged with its commit
   * version by a broadcast path→version join) — never a per-version
   * read loop. Refuses on reversed/beyond-latest ranges and on a gap
   * in the commit sequence (a cleaned-up commit silently missing
   * would hand back a feed with holes).
   *
   * DELETION-VECTOR commits RESOLVE row-wise (r16): in a cdc-less
   * commit, dataChange adds and removes pair BY PATH — a same-path
   * pair whose add carries a `deletionVector` is the protocol's DV
   * delete, and the feed emits exactly the rows at (new DV \ old DV)
   * positions, decoded executor-side by [[DvCodec]] (one task per
   * vector); an unpaired remove carrying a DV emits its live
   * REMAINDER (every position the vector does not mark); an unpaired
   * DV-bearing add inserts its unmarked rows.
   *
   * REFUSALS guard the genuinely underivable shapes:
   *
   *  - a cdc-less commit with unpaired dataChange adds AND removes of
   *    different files is an ambiguous update-rewrite — upstream
   *    Delta only derives pure inserts / pure deletes without cdc;
   *  - a same-path pair with NO deletion vectors is an in-place
   *    rewrite whose row changes are unknowable;
   *  - a pair whose OLD vector marks positions the new one drops
   *    UN-deletes rows — resurrection has no feed representation;
   *  - `delta.enableChangeDataFeed` must be in effect at EVERY
   *    version of the range (established by replaying the log's
   *    metaData actions); delta-spark refuses such ranges for the
   *    same reason. A range whose enablement cannot be established
   *    (no metaData action survives at or before it) also refuses.
   */
  def changeFeed(
      spark: SparkSession, table: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(conf).makeQualified(p)
    }
    if (fromVersion > toVersion) {
      throw new IllegalArgumentException(
        s"$table: version range [$fromVersion, $toVersion] is " +
          "reversed — no feed to read")
    }
    val segments = listLogSlices(root, conf)
      .flatMap(f => segmentVersion(f.name).map { case (v, k) => (v, k, f.path) })
    val latest = segments.collect { case (v, "commit", _) => v }
      .maxOption.getOrElse(-1L)
    if (toVersion > latest) {
      throw new IllegalArgumentException(
        s"$table: version $toVersion is after the latest commit ($latest)")
    }
    val commits = segments.collect {
      case (v, "commit", p) if v >= fromVersion && v <= toVersion => (v, p)
    }
    val missing = (fromVersion to toVersion).toSet -- commits.map(_._1).toSet
    if (missing.nonEmpty) {
      throw new IllegalArgumentException(
        s"$table: commits ${missing.toSeq.sorted.mkString(", ")} are " +
          "missing from the log (cleaned up?) — a feed with holes " +
          "silently diverges, refusing")
    }
    // CDF enablement must hold at every version of the range: replay
    // the log's metaData actions (driver: commit-count-sized) and
    // resolve each range version's effective configuration
    val verExpr = regexp_extract(
      element_at(split(col("_metadata.file_path"), "/"), -1),
      "^0*(\\d+)", 1).cast("long").as("v")
    val metaCommitPaths = segments.collect {
      case (v, "commit", p) if v <= toVersion => p
    }
    val cfgs = spark.read
      .schema(StructType(Seq(StructField("metaData", StructType(Seq(
        StructField("configuration", MapType(StringType, StringType))))))))
      .json(metaCommitPaths: _*)
      .select(col("metaData.configuration").as("c"), verExpr)
      .where(col("c").isNotNull)
      .collect()
      .map(r => (r.getLong(1), r.getMap[String, String](0)))
      .sortBy(_._1)
    (fromVersion to toVersion).foreach { v =>
      val eff = cfgs.takeWhile(_._1 <= v).lastOption.getOrElse(
        throw new UnsupportedOperationException(
          s"$table: no metaData action survives at or before version " +
            s"$v — cannot establish delta.enableChangeDataFeed for the " +
            "range (checkpoint-held metadata is not replayed here), " +
            "refusing rather than derive a feed that may be wrong"))
      if (!eff._2.get("delta.enableChangeDataFeed").contains("true")) {
        throw new UnsupportedOperationException(
          s"$table: delta.enableChangeDataFeed was not in effect at " +
            s"version $v — commits written with CDF off record " +
            "update-rewrites as bare add+remove pairs, and deriving " +
            "them at file granularity mislabels unchanged rows; " +
            "refusing, as upstream Delta does for such ranges")
      }
    }
    // classify each commit's file actions (driver: action-count-sized,
    // the commitDiff boundary): cdc files win their commit
    val actType = StructType(Seq(
      StructField("path", StringType),
      StructField("dataChange", BooleanType),
      StructField("deletionVector", StructType(Seq(
        StructField("storageType", StringType),
        StructField("pathOrInlineDv", StringType),
        StructField("offset", IntegerType),
        StructField("sizeInBytes", IntegerType),
        StructField("cardinality", LongType))))))
    val acts = spark.read
      .schema(StructType(Seq(
        StructField("add", actType), StructField("remove", actType),
        StructField("cdc", actType))))
      .json(commits.map(_._2): _*)
      .select(col("add"), col("remove"), col("cdc"), verExpr)
      .collect()
    val cdcVersions = acts.filter(!_.isNullAt(2)).map(_.getLong(3)).toSet
    def abs(rel: String): String = {
      val d = java.net.URLDecoder.decode(rel, "UTF-8")
      if (d.contains("://") || d.startsWith("/")) d
      else root.toString + "/" + d
    }
    // (storageType, pathOrInlineDv, offset, sizeInBytes) — enough to
    // decode the roaring payload executor-side via DvCodec
    def actOf(r: org.apache.spark.sql.Row, k: Int):
        Option[(String, Option[(String, String, Option[Int], Int)])] =
      if (r.isNullAt(k)) None
      else {
        val a = r.getStruct(k)
        if (a.isNullAt(1) || !a.getBoolean(1)) None // dataChange only
        else {
          val dv =
            if (a.isNullAt(2)) None
            else {
              val d = a.getStruct(2)
              Some((d.getString(0), d.getString(1),
                if (d.isNullAt(2)) None else Some(d.getInt(2)),
                d.getInt(3)))
            }
          Some((abs(a.getString(0)), dv))
        }
      }
    // per cdc-less commit: pair dataChange adds/removes BY PATH — a
    // same-path pair whose only difference is the deletionVector is a
    // DV delete (rows at newDV \ oldDV died), fully resolvable; what
    // refuses is the genuinely ambiguous residue
    val wholeInserts = Seq.newBuilder[(String, Long)]
    val dvInserts =
      Seq.newBuilder[(String, Long, (String, String, Option[Int], Int))]
    val wholeDeletes = Seq.newBuilder[(String, Long)]
    val dvRemainderDeletes =
      Seq.newBuilder[(String, Long, (String, String, Option[Int], Int))]
    val dvPairDeletes = Seq.newBuilder[(String, Long,
      (String, String, Option[Int], Int),
      Option[(String, String, Option[Int], Int)])]
    acts.toSeq.filterNot(r => cdcVersions.contains(r.getLong(3)))
      .groupBy(_.getLong(3)).toSeq.sortBy(_._1).foreach { case (v, rs) =>
        val adds = rs.flatMap(actOf(_, 0)).toMap
        val removes = rs.flatMap(actOf(_, 1)).toMap
        val paired = adds.keySet intersect removes.keySet
        val soloAdds = adds -- paired
        val soloRemoves = removes -- paired
        if (soloAdds.nonEmpty && soloRemoves.nonEmpty) {
          throw new UnsupportedOperationException(
            s"$table: cdc-less version $v mixes dataChange adds AND " +
              "removes of different files — an update-rewrite without " +
              "cdc files cannot be attributed row-wise, refusing")
        }
        paired.toSeq.sorted.foreach { p =>
          (adds(p), removes(p)) match {
            case (Some(newDv), oldDv) =>
              dvPairDeletes += ((p, v, newDv, oldDv))
            case (None, Some(_)) =>
              throw new UnsupportedOperationException(
                s"$table: version $v re-adds $p WITHOUT the remove " +
                  "side's deletionVector — previously-deleted rows " +
                  "resurrect, which a change feed cannot represent; " +
                  "refusing")
            case (None, None) =>
              throw new UnsupportedOperationException(
                s"$table: cdc-less version $v rewrites $p in place " +
                  "(same-path dataChange add+remove, no deletion " +
                  "vectors) — its row-level changes are unknowable, " +
                  "refusing")
          }
        }
        soloAdds.toSeq.sortBy(_._1).foreach {
          case (p, None) => wholeInserts += ((p, v))
          case (p, Some(dv)) => dvInserts += ((p, v, dv))
        }
        soloRemoves.toSeq.sortBy(_._1).foreach {
          case (p, None) => wholeDeletes += ((p, v))
          case (p, Some(dv)) => dvRemainderDeletes += ((p, v, dv))
        }
      }
    val cdcFiles = acts.toSeq.flatMap { r =>
      val v = r.getLong(3)
      if (r.isNullAt(2) || !cdcVersions.contains(v)) None
      else Some((abs(r.getStruct(2).getString(0)), v))
    }
    val (wIns, dvIns, wDel, dvRemDel, dvPairs) =
      (wholeInserts.result(), dvInserts.result(), wholeDeletes.result(),
        dvRemainderDeletes.result(), dvPairDeletes.result())
    // roaring payloads decode EXECUTOR-side (one task per DV, the
    // protocol's own granularity); a pair whose old DV marks a
    // position the new one does not REFUSES — those rows resurrect
    val sconf = new SerializableHadoopConf(conf)
    val rootStr = root.toString
    def decodedPositions(
        xs: Seq[(String, Long, (String, String, Option[Int], Int))]):
        DataFrame =
      xs.toDS().flatMap { case (p, v, (st, stub, off, size)) =>
        DvCodec.decodeDescriptor(st, stub, off, size,
          new Path(rootStr), sconf.value)
          .map(pos => (p, pos, v))
      }.toDF("p", "pos", "_commit_version")
    val pairPositions =
      if (dvPairs.isEmpty) None
      else Some(dvPairs.toDS().flatMap {
        case (p, v, (st, stub, off, size), oldDv) =>
          val newPos = DvCodec.decodeDescriptor(st, stub, off, size,
            new Path(rootStr), sconf.value)
          val oldPos = oldDv.map { case (ost, ostub, ooff, osize) =>
            DvCodec.decodeDescriptor(ost, ostub, ooff, osize,
              new Path(rootStr), sconf.value)
          }.getOrElse(Array.empty[Long])
          val newSet = newPos.toSet
          val resurrected = oldPos.filterNot(newSet)
          if (resurrected.nonEmpty) {
            throw new UnsupportedOperationException(
              s"$p: version $v UN-deletes positions " +
                s"${resurrected.take(5).mkString(", ")}… — resurrected " +
                "rows have no change-feed representation, refusing")
          }
          val oldSet = oldPos.toSet
          newPos.filterNot(oldSet).map(pos => (p, pos, v))
      }.toDF("p", "pos", "_commit_version"))
    // whole-file legs: version attached by broadcast path join
    def wholeLeg(fs: Seq[(String, Long)], tpe: Option[String]):
        Option[DataFrame] =
      if (fs.isEmpty) None
      else {
        val versions = broadcast(fs.toDF("p", "_commit_version"))
        val scan = spark.read.parquet(fs.map(_._1).distinct: _*)
        val typed = tpe match {
          case Some(t) => scan.withColumn("_change_type", lit(t))
          case None => scan // cdc files carry their own _change_type
        }
        Some(typed
          .withColumn("p", col("_metadata.file_path"))
          .join(versions, Seq("p"))
          .drop("p"))
      }
    // positional legs: rows selected (semi) or excluded (anti) by the
    // decoded (path, pos) sets against _metadata.row_index
    def posLeg(
        xs: Seq[(String, Long, (String, String, Option[Int], Int))],
        positions: Option[DataFrame],
        keep: Boolean, tpe: String): Option[DataFrame] =
      if (xs.isEmpty && positions.isEmpty) None
      else {
        val pos = positions.getOrElse(decodedPositions(xs))
        val paths = (xs.map(_._1) ++ Seq.empty).distinct
        val scanPaths =
          if (paths.nonEmpty) paths
          else pos.select("p").distinct().collect().map(_.getString(0))
            .toSeq
        val scan = spark.read.parquet(scanPaths: _*)
          .withColumn("p", col("_metadata.file_path"))
          .withColumn("pos", col("_metadata.row_index"))
        val joined =
          if (keep) {
            scan.join(pos, Seq("p", "pos"))
          } else {
            val versions = broadcast(xs.map(x => (x._1, x._2))
              .toDF("p", "_commit_version"))
            scan.join(pos.select("p", "pos"), Seq("p", "pos"),
              "left_anti").join(versions, Seq("p"))
          }
        Some(joined.drop("p", "pos")
          .withColumn("_change_type", lit(tpe)))
      }
    val read = Seq(
      wholeLeg(cdcFiles, None),
      wholeLeg(wIns, Some("insert")),
      wholeLeg(wDel, Some("delete")),
      posLeg(dvIns, None, keep = false, "insert"),
      posLeg(dvRemDel, None, keep = false, "delete"),
      pairPositions.flatMap(pp =>
        posLeg(Seq.empty, Some(pp), keep = true, "delete"))
    ).flatten
    if (read.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no dataChange or cdc actions in [$fromVersion, " +
          s"$toVersion] — the range carries no feed")
    }
    read.reduce(_ unionByName _)
  }

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
}
