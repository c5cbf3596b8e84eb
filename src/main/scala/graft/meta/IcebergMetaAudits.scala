package graft.meta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The audit surface of [[IcebergMeta]] — declared-metadata-vs-evidence
  * reports (specs, manifests, statistics, refs, summaries, sort order,
  * metadata log). Pure move out of IcebergMeta.scala (r15, file-size
  * split); the self-type keeps every call site `IcebergMeta.x` intact. */
private[meta] trait IcebergMetaAudits extends Serializable { this: IcebergMeta.type =>

  /**
   * PARTITION-SPEC evolution audit — iceberg's flagship feature leaves
   * a backfill question behind, exactly like schema evolution does:
   * after `ALTER TABLE ... ADD PARTITION FIELD`, which live files were
   * written under an OLD spec (they answer partition-pruned queries
   * only through full scans until rewritten)? One row per live data
   * file: `(file_path, spec_id, spec_csv, is_default)` — the spec id
   * comes from the file's MANIFEST (the list's `partition_spec_id`;
   * entries inherit their manifest's spec by construction), the
   * rendering from the metadata's `partition-specs` declarations
   * (`name=transform(source-id)` CSV, empty → `unpartitioned`).
   * Refuses when the metadata declares no `partition-specs` list (the
   * v1 legacy single-spec field is not modeled), when a manifest
   * carries no spec id, or when a manifest names a spec the metadata
   * does not declare — a dangling spec id breaks every reader.
   */
  def partitionSpecAudit(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val specsNode = Option(node.get("partition-specs")).getOrElse(
      throw new UnsupportedOperationException(
        s"$mf: no partition-specs list — the v1 legacy single-spec " +
          "field is not modeled; refusing to attribute files to specs"))
    val specs: Map[Int, String] = specsNode.elements().asScala.toSeq.map { sp =>
      val id = req(sp, "spec-id", mf).asInt()
      val fields = Option(sp.get("fields"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(f => s"${req(f, "name", mf).asText()}=" +
          s"${req(f, "transform", mf).asText()}(" +
          s"${req(f, "source-id", mf).asInt()})")
      id -> (if (fields.isEmpty) "unpartitioned" else fields.mkString(","))
    }.toMap
    val defaultSpec = Option(node.get("default-spec-id"))
      .map(_.asInt()).getOrElse(0)
    val current = Option(node.get("current-snapshot-id")).map(_.asLong())
      .flatMap(id => Option(node.get("snapshots"))
        .flatMap(_.elements().asScala.toSeq
          .find(s => req(s, "snapshot-id", mf).asLong() == id)))
      .getOrElse(throw new IllegalArgumentException(
        s"$table: no current snapshot"))
    val hconf = spark.sessionState.newHadoopConf()
    val manifests = readManifestList(
      resolve(root, req(current, "manifest-list", mf).asText()), hconf)
      .map { m =>
        val sid = m.partitionSpecId.getOrElse(
          throw new UnsupportedOperationException(
            s"$table: manifest ${m.manifestPath} carries no " +
              "partition_spec_id — spec attribution is unknowable"))
        if (!specs.contains(sid)) {
          throw new IllegalArgumentException(
            s"$table: manifest ${m.manifestPath} names spec $sid which " +
              s"the metadata does not declare (known: " +
              s"${specs.keys.toSeq.sorted.mkString(", ")})")
        }
        (resolve(root, m.manifestPath).toString, sid)
      }
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    val specsB = specs
    val defB = defaultSpec
    manifests.toDS()
      .flatMap { case (mp, sid) =>
        readManifest(new Path(mp), conf.value)
          .filter(e => e.status != 2 && e.content == 0)
          .map(e => (resolve(new Path(rootStr), e.filePath).toString,
            sid, specsB(sid), sid == defB))
      }
      .toDF("file_path", "spec_id", "spec_csv", "is_default")
  }

  /**
   * MANIFEST-HEALTH report — `rewrite_manifests`' planning question:
   * many small manifests make every planning pass open many files, and
   * high deleted-entry ratios make each open mostly waste. One row per
   * manifest of the CURRENT snapshot's list:
   * `(manifest, content, length, n_added, n_existing, n_deleted,
   * rewrite_group)` — entry counts from the manifest's OWN rows (one
   * decode task per manifest, never trusting the list's declared
   * counts, which [[snapshotSummaryAudit]] exists to doubt), and
   * `rewrite_group` the deterministic bin-pack of UNDER-TARGET
   * manifests (path order, group = ⌊preceding-small-bytes/target⌋ —
   * the compactionPlan packing, applied to metadata files).
   * Right-sized manifests never move (null group); data and delete
   * manifests pack separately (the spec keeps them apart).
   */
  def manifestHealthReport(
      spark: SparkSession, table: String,
      targetBytes: Long = 8L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val info = readTableMetadata(
      currentMetadataFile(root.getFileSystem(hconf), root), hconf)
    requireCensusableVersion(info, table)
    val current = info.snapshots.find(_.isCurrent).getOrElse(
      throw new IllegalArgumentException(s"$table: no current snapshot"))
    val manifests = readManifestList(
      resolve(root, current.manifestList), hconf)
      .map(m => (resolve(root, m.manifestPath).toString,
        m.content, m.manifestLength))
    // bin-pack per content kind, path order — a manifest-count-sized
    // driver computation (the same boundary the list read already is)
    val groups: Map[String, Long] = manifests
      .groupBy(_._2).toSeq.flatMap { case (_, ms) =>
        var acc = 0L
        ms.sortBy(_._1).flatMap { case (p, _, len) =>
          if (len >= targetBytes) None
          else {
            val g = acc / targetBytes
            acc += len
            Some(p -> g)
          }
        }
      }.toMap
    val conf = new SerializableHadoopConf(hconf)
    manifests.toDS()
      .map { case (mp, content, len) =>
        val entries = readManifest(new Path(mp), conf.value)
        (new Path(mp).getName, content, len,
          entries.count(_.status == 1).toLong,
          entries.count(_.status == 0).toLong,
          entries.count(_.status == 2).toLong,
          groups.get(mp))
      }
      .toDF("manifest", "content", "length",
        "n_added", "n_existing", "n_deleted", "rewrite_group")
  }

  /**
   * SNAPSHOT-EXPIRY plan at metadata cost — `expire_snapshots`'
   * storage-reclaim question answered BEFORE deleting anything: which
   * snapshots age out at `expireBeforeMs` (never the current one —
   * expiring it orphans every reader — and never one a named REF
   * holds under the ref's OWN retention policy: tags hold their
   * snapshot, branches hold head + ancestors per
   * `min-snapshots-to-keep`/`max-snapshot-age-ms`, and a non-main ref
   * past its `max-ref-age-ms` is itself expired and holds nothing),
   * and exactly what their removal
   * frees. One row per deletable object, `kind` ∈
   * `snapshot | manifest_list | manifest | data_file | statistics`:
   *
   *  - expired snapshots and their manifest-list files;
   *  - manifests referenced ONLY by expired snapshots (a manifest a
   *    survivor reuses stays);
   *  - files referenced ONLY by expired snapshots — the compaction
   *    leftovers expiry exists to reclaim; computed as
   *    `refs(expired) \ refs(surviving)` with one manifest-decode task
   *    per manifest on each side, the [[orphanFiles]] fan-out;
   *  - `statistics` / `partition-statistics` files keyed to expired
   *    snapshots (expire_snapshots deletes them too — left behind they
   *    are sketches no surviving snapshot can reach).
   *
   * Refuses when nothing expires (an empty plan reads as "safe to run"
   * when the real answer is "the cutoff matched nothing") and when the
   * cutoff would expire EVERY snapshot.
   */
  def expiryPlan(
      spark: SparkSession, table: String, expireBeforeMs: Long): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val mf = currentMetadataFile(fs, root)
    val info = readTableMetadata(mf, hconf)
    requireCensusableVersion(info, table)
    // a snapshot HELD BY A REF (branch/tag) is retained per the REF'S
    // OWN retention policy (r16), matching expire_snapshots:
    //  - a non-main ref older than its `max-ref-age-ms` (age evaluated
    //    at the cutoff instant: expireBeforeMs minus the referenced
    //    snapshot's timestamp) is itself expired and holds NOTHING;
    //  - a live TAG holds exactly its snapshot;
    //  - a live BRANCH holds its head plus parent-chain ancestors per
    //    `min-snapshots-to-keep` (default 1: the head) and
    //    `max-snapshot-age-ms` (ancestors younger than the branch's
    //    own cutoff);
    //  - a ref whose snapshot the metadata no longer lists holds
    //    nothing (there is nothing left to hold).
    val metaNode = {
      val in = fs.open(mf)
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    }
    val byId = info.snapshots.map(s => s.snapshotId -> s).toMap
    val refHeld: Set[Long] = {
      import scala.jdk.CollectionConverters._
      Option(metaNode.get("refs")).filter(_.isObject).map { refs =>
        refs.properties().asScala.toSeq.flatMap { e =>
          val name = e.getKey
          val node = e.getValue
          val snapId = req(node, "snapshot-id", mf).asLong()
          def prop(k: String): Option[Long] =
            Option(node.get(k)).map(_.asLong())
          byId.get(snapId) match {
            case None => Seq.empty // dangling ref holds nothing
            case Some(head) =>
              val refLive = name == "main" || prop("max-ref-age-ms")
                .forall(a => expireBeforeMs - head.timestampMs <= a)
              val isTag = Option(node.get("type"))
                .exists(_.asText() == "tag")
              if (!refLive) Seq.empty
              else if (isTag) Seq(snapId)
              else {
                val minKeep = prop("min-snapshots-to-keep")
                  .map(_.toInt).getOrElse(1)
                val maxAge = prop("max-snapshot-age-ms")
                // head-to-root ancestry walk, cycle-bounded
                val chain = Iterator.iterate(Option(head))(
                  _.flatMap(_.parentSnapshotId.flatMap(byId.get)))
                  .takeWhile(_.isDefined).take(byId.size).map(_.get)
                  .toSeq
                chain.zipWithIndex.collect {
                  case (s, i) if i < minKeep || maxAge.exists(a =>
                    expireBeforeMs - s.timestampMs <= a) => s.snapshotId
                }
              }
          }
        }.toSet
      }.getOrElse(Set.empty)
    }
    val (expired, surviving) = info.snapshots.partition(s =>
      s.timestampMs < expireBeforeMs && !s.isCurrent &&
        !refHeld.contains(s.snapshotId))
    if (expired.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no snapshot is older than $expireBeforeMs (current is " +
          "never expired) — nothing to plan")
    }
    if (surviving.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: the cutoff would expire every snapshot — refusing a " +
          "plan that deletes the table's entire history")
    }
    def manifestsOf(snaps: Seq[IcebergSnapshotInfo]): Map[String, Long] =
      snaps.flatMap(s => readManifestList(resolve(root, s.manifestList), hconf)
        .map(m => resolve(root, m.manifestPath).toString -> m.manifestLength))
        .toMap
    val expiredManifests = manifestsOf(expired)
    val survivingManifests = manifestsOf(surviving)
    val deadManifests = expiredManifests -- survivingManifests.keySet
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    def refs(paths: Seq[String], liveOnly: Boolean): DataFrame =
      paths.toDS().flatMap { mp =>
        readManifest(new Path(mp), conf.value)
          .filter(e => !liveOnly || e.status != 2)
          .map(e => (resolve(new Path(rootStr), e.filePath).toString,
            e.fileSizeBytes))
      }.toDF("path", "bytes").dropDuplicates("path")
    // a file is deletable only when NO surviving snapshot still READS
    // it (ADDED/EXISTING in any surviving manifest). A DELETED-status
    // entry in a survivor does NOT block — no survivor can read
    // through it, and reclaiming exactly those compaction leftovers is
    // what expiry is for. The candidate side takes every status: the
    // expired chain is the last thing naming those files at all.
    val deadFiles = refs(deadManifests.keys.toSeq, liveOnly = false)
      .join(refs(survivingManifests.keys.toSeq, liveOnly = true)
        .select(col("path")), Seq("path"), "left_anti")
    // expire_snapshots also deletes the STATISTICS files keyed to
    // expired snapshots (`statistics` / `partition-statistics` entries
    // carry a snapshot-id): leaving them behind strands Puffin
    // sketches and partition rollups no surviving snapshot can reach.
    // Declared file-size-in-bytes is authoritative when present.
    val statsRows = {
      import scala.jdk.CollectionConverters._
      val expiredIds = expired.map(_.snapshotId).toSet
      Seq("statistics", "partition-statistics").flatMap { key =>
        Option(metaNode.get(key)).map(_.elements().asScala.toSeq)
          .getOrElse(Seq.empty)
          .filter(e => expiredIds.contains(req(e, "snapshot-id", mf).asLong()))
          .map { e =>
            val p = resolve(root, req(e, "statistics-path", mf).asText())
            ("statistics", p.toString,
              Option(e.get("file-size-in-bytes")).map(_.asLong()).getOrElse(
                try fs.getFileStatus(p).getLen
                catch { case _: Exception => -1L }))
          }
      }
    }
    val snapRows = expired.map { s =>
      ("snapshot", s.snapshotId.toString, -1L)
    } ++ expired.map { s =>
      val ml = resolve(root, s.manifestList)
      ("manifest_list", ml.toString,
        try fs.getFileStatus(ml).getLen catch { case _: Exception => -1L })
    } ++ deadManifests.toSeq.map { case (p, len) => ("manifest", p, len) } ++
      statsRows
    snapRows.toDF("kind", "object", "bytes")
      .unionByName(deadFiles
        .select(lit("data_file").as("kind"), col("path").as("object"),
          col("bytes")))
  }

  def orphanFiles(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val info = readTableMetadata(currentMetadataFile(fs, root), hconf)
    // v3 DV files under the data tree would misreport as orphans
    requireCensusableVersion(info, table)
    val manifests = info.snapshots
      .flatMap(s => readManifestList(resolve(root, s.manifestList), hconf))
      .map(m => resolve(root, m.manifestPath).toString)
      .distinct
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    val referenced = manifests.toDS()
      .flatMap(mp => readManifest(new Path(mp), conf.value)
        .map(e => resolve(new Path(rootStr), e.filePath).toString))
      .toDF("ref_path").distinct()
    val disk = spark.read.format("metadata")
      .option("source", "any").option("level", "file")
      .option("ignorecorrupt", "true")
      .load(new Path(root, "data").toString)
      .select(col("filepath"), col("filename"), col("format"),
        col("size"), col("num_rows"))
    disk.join(referenced, disk("filepath") === referenced("ref_path"),
      "left_anti")
      .select(col("filepath").as("abs_path"), col("filename"),
        col("format"), col("size"), col("num_rows"))
  }

  /** Qualified root + current metadata file + its parsed JSON — the
    * shared driver boundary of every metadata-JSON report. */
  private[meta] def currentMetadataNode(
      spark: SparkSession, table: String):
      (Path, org.apache.hadoop.fs.FileSystem, Path,
        com.fasterxml.jackson.databind.JsonNode) = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val mf = currentMetadataFile(fs, root)
    val in = fs.open(mf)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    (root, fs, mf, node)
  }

  /**
   * PUFFIN STATISTICS audit — the table metadata's `statistics` list
   * (format v2+: one entry per snapshot naming a Puffin file of sketch
   * blobs with its declared `blob-metadata`) verified against the
   * Puffin files' OWN footers: one row per ACTUAL footer blob, matched
   * to a declared entry by `(type, snapshot-id)` key (the spec does
   * not pin the declaration to footer order, so a truthful reordered
   * list still matches; each declared entry is consumable once) —
   * `declared_match` is false when no declared entry carries the
   * blob's key (a stale or hand-edited statistics entry sends sketch
   * consumers to the wrong blob), and a declared entry matching NO
   * footer blob surfaces as its own `blob_idx=-1` row. The entry list
   * is a driver boundary at snapshot scale; the footer reads fan out
   * one task per statistics file.
   */
  def statisticsReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val entries = Option(node.get("statistics"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { s =>
        val declared = Option(s.get("blob-metadata"))
          .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
          .map(b => (req(b, "type", mf).asText(),
            Option(b.get("snapshot-id")).map(_.asLong()).getOrElse(-1L)))
        (req(s, "snapshot-id", mf).asLong(),
          req(s, "statistics-path", mf).asText(), declared)
      }
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    entries.toDS()
      .flatMap { case (snapId, path, declared) =>
        val abs = resolve(new Path(rootStr), path)
        val (blobs, _) = PuffinCodec.readFooter(abs, conf.value)
        // the spec does not pin blob-metadata to footer order: match
        // declared entries to footer blobs by (type, snapshot-id) keys,
        // each declared entry consumable once — a truthful but
        // reordered declaration matches; a surplus declared entry (a
        // blob the file does not carry) surfaces as its own row
        val remaining =
          scala.collection.mutable.ArrayBuffer.from(declared)
        val matchedRows = blobs.zipWithIndex.map { case (b, i) =>
          val key = (b.blobType, b.snapshotId.getOrElse(-1L))
          val at = remaining.indexOf(key)
          if (at >= 0) remaining.remove(at)
          (abs.getName, snapId, i, b.blobType,
            b.snapshotId.getOrElse(-1L), b.sequenceNumber.getOrElse(-1L),
            b.offset, b.length,
            if (at >= 0) key._1 else null,
            at >= 0)
        }
        val orphanRows = remaining.toSeq.map { case (t, sid) =>
          (abs.getName, snapId, -1, null.asInstanceOf[String],
            sid, -1L, -1L, -1L, t, false)
        }
        matchedRows ++ orphanRows
      }
      .toDF("filename", "stats_snapshot_id", "blob_idx", "blob_type",
        "blob_snapshot_id", "sequence_number", "offset", "length",
        "declared_type", "declared_match")
  }

  /**
   * NDV audit — each statistics Puffin file's
   * `apache-datasketches-theta-v1` blobs DECODED (compact-theta serial
   * v3, [[PuffinCodec.thetaEstimate]]) and compared against the blob's
   * own declared `ndv` property (the number query planners read
   * without opening the sketch): one row per theta blob with
   * `(fields_csv, declared_ndv, sketch_ndv, ndv_match)` — a stale or
   * hand-edited `ndv` silently skews every join-order and
   * aggregation-strategy decision downstream, and only the sketch body
   * itself can contradict it. `sketch_ndv` is the rounded estimate
   * (exact mode: the retained-entry count). Blobs declaring no `ndv`
   * report null declared (and null match), never dropped. Refuses when
   * the metadata declares no statistics at all; the footer + blob
   * reads fan out one task per statistics file.
   */
  def ndvAudit(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val fieldsById = currentSchemaFieldsById(mf, node)
    import scala.jdk.CollectionConverters._
    val entries = Option(node.get("statistics"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { s =>
        (req(s, "snapshot-id", mf).asLong(),
          req(s, "statistics-path", mf).asText())
      }
    if (entries.isEmpty) {
      throw new UnsupportedOperationException(
        s"$table: metadata declares no statistics files — nothing to audit")
    }
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    entries.toDS()
      .flatMap { case (snapId, path) =>
        val abs = resolve(new Path(rootStr), path)
        val (blobs, _) = PuffinCodec.readFooter(abs, conf.value)
        blobs.filter(_.blobType == PuffinCodec.ThetaV1).map { b =>
          val est = PuffinCodec.thetaEstimate(
            PuffinCodec.decompressBlob(abs, b.compressionCodec,
              PuffinCodec.readBlobBytes(abs, conf.value, b.offset, b.length)))
          val sketchNdv = math.round(est)
          val declared = b.properties.get("ndv").map(_.trim.toLong)
          val fieldsCsv = b.fields
            .map(id => fieldsById.get(id).map(_._1).getOrElse(s"#$id"))
            .mkString(",")
          (abs.getName, snapId, fieldsCsv, declared, sketchNdv,
            declared.map(_ == sketchNdv))
        }
      }
      .toDF("filename", "stats_snapshot_id", "fields_csv",
        "declared_ndv", "sketch_ndv", "ndv_match")
  }

  /**
   * PARTITION-STATISTICS audit — the metadata JSON's
   * `partition-statistics` entry for the CURRENT snapshot (a PARQUET
   * file of per-partition rollups, spec v2+) verified against the
   * manifest chain's own per-partition aggregation: one row per
   * partition (FULL OUTER — a declared-but-dead or live-but-undeclared
   * partition surfaces with nulls on the other side) with
   * files/rows/bytes match flags. Both sides are distributed scans;
   * the partition key is the sorted `k=v` CSV so any partition-spec
   * shape compares. Refuses when no entry exists for the current
   * snapshot.
   */
  def partitionStatsAudit(spark: SparkSession, table: String): DataFrame = {
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val currentSnap = Option(node.get("current-snapshot-id"))
      .map(_.asLong()).getOrElse(
        throw new IllegalArgumentException(s"$mf: no current-snapshot-id"))
    val statsPath = Option(node.get("partition-statistics"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .find(e => req(e, "snapshot-id", mf).asLong() == currentSnap)
      .map(e => req(e, "statistics-path", mf).asText())
      .getOrElse(throw new UnsupportedOperationException(
        s"$table: no partition-statistics entry for current snapshot " +
          s"$currentSnap — nothing declared to audit"))
    val declaredRaw = spark.read.parquet(
      resolve(root, statsPath).toString)
    val partFields = declaredRaw.schema("partition").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    val declared = declaredRaw.select(
      array_join(array_sort(array(partFields.map(f =>
        concat(lit(f + "="), col(s"partition.$f").cast("string"))): _*)),
        ",").as("partition_key"),
      col("data_file_count").cast("long").as("declared_files"),
      col("data_record_count").cast("long").as("declared_rows"),
      col("total_data_file_size_in_bytes").cast("long").as("declared_bytes"))
    val actual = currentFiles(spark, table)
      .filter(col("status") =!= 2 && col("content") === 0)
      .select(
        array_join(array_sort(transform(map_entries(col("partition_values")),
          e => concat(e.getField("key"), lit("="), e.getField("value")))),
          ",").as("partition_key"),
        col("record_count"), col("file_size_bytes"))
      .groupBy(col("partition_key"))
      .agg(count(lit(1)).cast("long").as("actual_files"),
        sum(col("record_count")).cast("long").as("actual_rows"),
        sum(col("file_size_bytes")).cast("long").as("actual_bytes"))
    declared.join(actual, Seq("partition_key"), "full_outer")
      .select(col("partition_key"),
        col("declared_files"), col("declared_rows"), col("declared_bytes"),
        col("actual_files"), col("actual_rows"), col("actual_bytes"),
        (col("declared_files") === col("actual_files")).as("files_match"),
        (col("declared_rows") === col("actual_rows")).as("rows_match"),
        (col("declared_bytes") === col("actual_bytes")).as("bytes_match"))
  }

  /**
   * REFS report — the metadata JSON's `refs` map (named branches/tags
   * → snapshot ids, spec v2+): one row per ref with `resolves` (the
   * named snapshot is still in the `snapshots` list — a DANGLING ref
   * after snapshot expiry breaks every reader that follows it) and
   * `is_current` (the ref points at the current snapshot). Tables
   * without refs report the implicit `main` branch on the current
   * snapshot, the spec's default.
   */
  def refsReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (_, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    // snapshots + current id from the SAME parsed node (one read, one
    // parse — the previous shape parsed the file twice)
    val listed = Option(node.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map(s => req(s, "snapshot-id", mf).asLong()).toSet
    val current = Option(node.get("current-snapshot-id"))
      .map(_.asLong()).filter(_ != -1L)
    val declared = Option(node.get("refs")).filter(_.isObject)
      .map(_.properties().asScala.toSeq.map { e =>
        val name = e.getKey
        val v = e.getValue
        (name,
          Option(v.get("type")).map(_.asText()).getOrElse(
            throw new IllegalArgumentException(
              s"$mf: ref '$name' missing 'type'")),
          req(v, "snapshot-id", mf).asLong())
      })
      .getOrElse(current.toSeq.map(c => ("main", "branch", c)))
    declared.sortBy(_._1)
      .map { case (name, tpe, snap) =>
        (name, tpe, snap, listed.contains(snap), current.contains(snap))
      }
      .toDF("ref_name", "ref_type", "snapshot_id", "resolves", "is_current")
  }

  /**
   * SNAPSHOT-SUMMARY audit — each snapshot's declared summary metrics
   * (`added-data-files` / `added-records`, the numbers engines show in
   * history views and planners trust for incremental reads) verified
   * against the snapshot's OWN manifest list: the sums of
   * `added_files_count` / `added_rows_count` over its DATA manifests
   * (`content=0`; delete manifests never count as data). One row per
   * snapshot with match flags; a snapshot declaring neither metric
   * reports null declared (and null matches) rather than being
   * dropped. The snapshot list is a driver boundary at snapshot scale;
   * manifest-list reads fan out one task per snapshot.
   */
  def snapshotSummaryAudit(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val snaps = Option(node.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { s =>
        def summaryLong(k: String): Option[Long] =
          Option(s.get("summary")).flatMap(su => Option(su.get(k)))
            .map(_.asLong())
        (req(s, "snapshot-id", mf).asLong(),
          req(s, "manifest-list", mf).asText(),
          summaryLong("added-data-files"), summaryLong("added-records"))
      }
    if (snaps.isEmpty) {
      throw new IllegalArgumentException(s"$table: no snapshots listed")
    }
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    snaps.toDS()
      .map { case (snapId, mlPath, declFiles, declRecords) =>
        val entries = readManifestList(
          resolve(new Path(rootStr), mlPath), conf.value)
        val data = entries.filter(_.content == 0)
        // "added by THIS snapshot" needs added_snapshot_id: a snapshot's
        // manifest list REUSES prior snapshots' manifests verbatim
        // (their added counts intact), so summing all data manifests
        // would inflate every snapshot after the first. Manifests
        // lacking the field — or attributed manifests lacking counts —
        // make the actual side unknowable: report NULL actuals, never
        // a zero that flags a truthful declaration as a lie.
        val attributable = data.forall(_.addedSnapshotId.isDefined)
        val mine = data.filter(_.addedSnapshotId.contains(snapId))
        val counted = attributable && mine.forall(m =>
          m.addedFiles.isDefined && m.addedRows.isDefined)
        val actFiles =
          if (counted) Some(mine.flatMap(_.addedFiles).sum) else None
        val actRecords =
          if (counted) Some(mine.flatMap(_.addedRows).sum) else None
        (snapId, declFiles, declRecords, actFiles, actRecords,
          for { d <- declFiles; a <- actFiles } yield d == a,
          for { d <- declRecords; a <- actRecords } yield d == a)
      }
      .toDF("snapshot_id", "declared_added_files", "declared_added_records",
        "actual_added_files", "actual_added_records",
        "files_match", "records_match")
  }

  /**
   * [[snapshotSummaryAudit]] in LONG form — one row per audited CELL:
   * `(snapshot_id, metric ∈ {added_files, added_records}, declared,
   * actual, is_match)`. A wide-row hash mismatch in a cross-engine
   * compare says nothing about WHICH number diverged; the long form
   * makes a single divergent cell visible as a row-level difference.
   */
  def snapshotSummaryAuditCells(
      spark: SparkSession, table: String): DataFrame = {
    val wide = snapshotSummaryAudit(spark, table)
    val files = wide.select(
      col("snapshot_id"), lit("added_files").as("metric"),
      col("declared_added_files").as("declared"),
      col("actual_added_files").as("actual"),
      col("files_match").as("is_match"))
    val records = wide.select(
      col("snapshot_id"), lit("added_records").as("metric"),
      col("declared_added_records").as("declared"),
      col("actual_added_records").as("actual"),
      col("records_match").as("is_match"))
    files.unionByName(records)
  }

  /**
   * The RAW INPUTS behind [[snapshotSummaryAudit]], one row per fact:
   * `(item, metric, value)` —
   *
   *  - `file:<name>` / `footer_rows`: each live-or-ever-referenced
   *    data file's parquet-footer row count (what a recompute-from-
   *    evidence side reads);
   *  - `snap:<id>` / `declared_added_files|declared_added_records`:
   *    the snapshot summary's declared metrics (the JSON-parse side);
   *  - `list:<id>/<manifest>` / `added_files_count|added_rows_count|
   *    added_snapshot_id|content`: each snapshot's manifest-list
   *    entries (the attribution side the audit sums).
   *
   * Exists so a cross-engine divergence in the summary audit
   * localizes: if this query agrees across engines while the audit
   * does not, the divergence is in the audit's arithmetic; if a
   * `file:` row diverges it is footer decode; a `snap:` row, JSON
   * parse; a `list:` row, avro manifest-list decode.
   */
  def summaryInputsReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val snaps = Option(node.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { s =>
        def summaryLong(k: String): Option[Long] =
          Option(s.get("summary")).flatMap(su => Option(su.get(k)))
            .map(_.asLong())
        (req(s, "snapshot-id", mf).asLong(),
          req(s, "manifest-list", mf).asText(),
          summaryLong("added-data-files"), summaryLong("added-records"))
      }
    if (snaps.isEmpty) {
      throw new IllegalArgumentException(s"$table: no snapshots listed")
    }
    val declRows = snaps.flatMap { case (id, _, df, dr) =>
      df.map(v => (s"snap:$id", "declared_added_files", v)).toSeq ++
        dr.map(v => (s"snap:$id", "declared_added_records", v)).toSeq
    }
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val listRows = snaps.map { case (id, ml, _, _) => (id, ml) }.toDS()
      .flatMap { case (id, ml) =>
        readManifestList(resolve(new Path(rootStr), ml), conf.value)
          .flatMap { e =>
            val name = new Path(e.manifestPath).getName
            val item = s"list:$id/$name"
            Seq(
              e.addedFiles.map(v => (item, "added_files_count", v)),
              e.addedRows.map(v => (item, "added_rows_count", v)),
              e.addedSnapshotId.map(v => (item, "added_snapshot_id", v)),
              Some((item, "content", e.content.toLong))).flatten
          }
      }
    // every DATA file any manifest has ever referenced (added, existing
    // or deleted — content=0 entries), footer-counted; manifests fan
    // out one task each, deduped by path (a manifest reused across
    // snapshots repeats its entries verbatim)
    val manifestPaths = snaps.map { case (id, ml, _, _) => (id, ml) }.toDS()
      .flatMap { case (_, ml) =>
        readManifestList(resolve(new Path(rootStr), ml), conf.value)
          .filter(_.content == 0).map(_.manifestPath)
      }
      .distinct()
    val fileRows = manifestPaths
      .flatMap { mp =>
        readManifest(resolve(new Path(rootStr), mp), conf.value)
          .filter(_.content == 0).map(_.filePath)
      }
      .distinct()
      .map { fp =>
        val p = resolve(new Path(rootStr), fp)
        val n = Footers.read(p, conf.value).numRows
        (s"file:${p.getName}", "footer_rows", n)
      }
    fileRows.toDF("item", "metric", "value")
      .unionByName(listRows.toDF("item", "metric", "value"))
      .unionByName(declRows.toDF("item", "metric", "value"))
  }

  /**
   * SORT-ORDER audit — the table's DECLARED write order
   * (`sort-orders` / `default-sort-order-id`, the metadata surface
   * engines consult before skipping a re-sort) verified against what
   * the data files' OWN footer statistics say: one row per live data
   * file with the default order's rendering, the file's min/max on the
   * order's first key, and `in_order` — whether the file's key
   * interval stays clear of every earlier interval when files are laid
   * out by ascending min (the cumulative-max window form: O(n log n),
   * never a pairwise self-join — a 100k-file table must not pay n²;
   * the comparison is non-strict, so duplicate keys spanning a file
   * boundary still audit as sorted, matching [[MetaPrune.sortAudit]]).
   * A table actually written in its declared order has disjoint file
   * intervals whichever direction it sorts; an out-of-order file
   * flags itself AND the files it collides with (honest interval
   * math). Files whose stats are missing report NULL `in_order` — no
   * evidence, never assumed sorted.
   *
   * Live data files are matched to footers by file NAME (iceberg
   * writers name data files uniquely — UUID-suffixed); the footer walk
   * covers the table's `data/` subtree. REFUSES when the metadata
   * declares no sort-orders / default id, the default id dangles, the
   * default order is the unsorted one (order-id 0, no fields), its
   * first field is not an identity transform (a transform's order is
   * not measurable from column stats), or the source-id is unknown.
   */
  def sortOrderAudit(spark: SparkSession, table: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val fieldsById = currentSchemaFieldsById(mf, node)
    val defaultId = Option(node.get("default-sort-order-id"))
      .map(_.asInt()).getOrElse(
        throw new IllegalArgumentException(
          s"$mf: no default-sort-order-id — the table declares no " +
            "write order to audit"))
    val orders = Option(node.get("sort-orders"))
      .map(_.elements().asScala.toSeq).getOrElse(
        throw new IllegalArgumentException(
          s"$mf: no sort-orders list — the table declares no write " +
            "order to audit"))
    val order = orders.find(o =>
      req(o, "order-id", mf).asInt() == defaultId).getOrElse(
      throw new IllegalArgumentException(
        s"$mf: default-sort-order-id $defaultId names no declared " +
          s"sort order (declared: ${orders.map(o =>
            req(o, "order-id", mf).asInt()).mkString(", ")})"))
    val fields = Option(order.get("fields"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map { f =>
        val sid = req(f, "source-id", mf).asInt()
        val name = fieldsById.getOrElse(sid,
          throw new IllegalArgumentException(
            s"$mf: sort order $defaultId references field id $sid " +
              "which the current schema does not declare"))._1
        (req(f, "transform", mf).asText(), name,
          req(f, "direction", mf).asText(),
          req(f, "null-order", mf).asText())
      }
    if (fields.isEmpty) {
      throw new IllegalArgumentException(
        s"$mf: default sort order $defaultId is the unsorted order — " +
          "nothing to audit")
    }
    val (transform, keyName, _, _) = fields.head
    if (transform != "identity") {
      throw new UnsupportedOperationException(
        s"$mf: sort order $defaultId leads with transform " +
          s"'$transform' — only identity order is measurable from " +
          "column statistics, refusing rather than mis-auditing")
    }
    val sortCsv = fields.map { case (t, n, d, no) => s"$t($n) $d $no" }
      .mkString(",")
    val liveNames = currentFiles(spark, table)
      .filter(col("status") =!= 2 && col("content") === 0)
      .select(element_at(split(col("abs_path"), "/"), -1).as("file"))
      .distinct()
    import org.apache.spark.sql.graft.ColumnBridge
    val decode = (c: org.apache.spark.sql.Column) => ColumnBridge.column(
      graft.functions.PlainStatLong(
        ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val perFile = spark.read.format("metadata")
      .option("level", "column").option("footercache", "false")
      .load(new Path(root, "data").toString)
      .filter(col("path") === keyName)
      .select(element_at(split(col("filepath"), "/"), -1).as("file"),
        decode(col("statistics.min_value")).as("mn"),
        decode(col("statistics.max_value")).as("mx"))
      .groupBy(col("file"))
      .agg(min(col("mn")).as("file_min"), max(col("mx")).as("file_max"),
        (count(lit(1)) === count(col("mn")) &&
          count(lit(1)) === count(col("mx"))).as("bounded"))
      .join(liveNames, Seq("file"), "left_semi")
    // cumulative max WITHOUT a single-task global window (r16):
    // [[ScanWindows.withPrevCummax]] — range-partitioned, boundary
    // maxima carried by a bucket-count-sized broadcast prefix
    ScanWindows.withPrevCummax(perFile,
      Seq(col("file_min"), col("file_max"), col("file")),
      when(col("bounded"), col("file_max")))
      .select(col("file"),
        lit(defaultId).as("sort_order_id"),
        lit(sortCsv).as("sort_csv"),
        when(col("bounded"), col("file_min")).as("file_min"),
        when(col("bounded"), col("file_max")).as("file_max"),
        when(!col("bounded"), lit(null).cast("boolean"))
          .when(col("prev_cummax").isNull, lit(true))
          .otherwise(col("file_min") >= col("prev_cummax")).as("in_order"))
  }

  /** Decode a single-value-serialized bound (spec Appendix D) for an
    * int/long field: 4 or 8 bytes little-endian. Any other width
    * refuses — a misread bound silently prunes live data. */
  private[meta] def boundLong(bytes: Array[Byte], where: String): Long =
    bytes.length match {
      case 8 => java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      case 4 => java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong
      case n => throw new IllegalArgumentException(
        s"$where: bound payload is $n bytes — not an int/long single " +
          "value, refusing rather than mis-pruning")
    }

  /**
   * MANIFEST-BOUNDS file pruning — the way iceberg engines actually
   * plan scans: each manifest entry's `lower_bounds`/`upper_bounds`
   * (map<field id, single-value binary>, spec r126/r128) answer "can
   * this file hold `column` ∈ [lo, hi]?" WITHOUT opening a single
   * footer. One row per live data file: the decoded bounds and
   * `survives` — false only when the bounds PROVE disjointness; a file
   * with no bounds for the field survives (no evidence never prunes,
   * the spec's metrics contract). The manifest walk fans out one task
   * per manifest; nothing data-sized visits the driver — and when
   * `column` is an identity PARTITION field, whole manifests whose
   * manifest-LIST partition summaries prove disjointness are never
   * even opened (r16; see [[manifestSummaryPrune]] — their files
   * cannot survive, so they are absent from the output entirely).
   * Refuses when `column` is unknown or not an int/long (other
   * single-value types need their own comparator — decoding them as
   * integers would mis-prune).
   */
  def manifestBoundsPrune(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame =
    boundsByFile(spark, table, column, partitionRange = Some((lo, hi)))
      .select(col("data_path"), col("lower"), col("upper"),
        (col("lower").isNull || col("upper").isNull ||
          (col("lower") <= hi && col("upper") >= lo)).as("survives"))

  /**
   * CLUSTERING quality from MANIFEST bounds — [[MetaPrune
   * .clusteringReport]]'s overlap-depth math (`span_sum /
   * global_span` = the average number of files a random point of the
   * key range lands in) computed from the manifests' r126/r128 value
   * bounds instead of footer stats: the "should I re-cluster?" answer
   * at MANIFEST cost, zero data or footer I/O. Integer-exact outputs
   * (the caller divides); bounds-less files count in `n_unbounded` —
   * no evidence, never assumed clustered. One aggregate row.
   */
  def boundsClusteringReport(
      spark: SparkSession, table: String, column: String): DataFrame =
    boundsByFile(spark, table, column)
      .agg(count(lit(1)).cast("long").as("n_files"),
        sum(when(col("lower").isNull || col("upper").isNull, 1L)
          .otherwise(0L)).cast("long").as("n_unbounded"),
        min(col("lower")).as("global_min"),
        max(col("upper")).as("global_max"),
        sum(col("upper") - col("lower")).cast("long").as("span_sum"))
      .select(lit(column).as("col_name"), col("n_files"),
        col("n_unbounded"), col("global_min"), col("global_max"),
        col("span_sum"),
        (col("global_max") - col("global_min")).as("global_span"))

  /**
   * EQUALITY-point pruning on a STRING column from manifest bounds —
   * "which files can hold `column` = value" at manifest cost: string
   * bounds are raw UTF-8 (the spec allows them TRUNCATED — a truncated
   * lower bound only lowers, a truncated-and-incremented upper only
   * raises, so containment stays conservative and never mis-prunes).
   * Bounds-less files survive; non-string columns refuse.
   */
  def manifestBoundsPruneString(
      spark: SparkSession, table: String, column: String,
      value: String): DataFrame =
    boundsWalk[String](spark, table, column, Set("string"),
      (b, _) => new String(b, java.nio.charset.StandardCharsets.UTF_8))
      .select(col("data_path"), col("lower"), col("upper"),
        (col("lower").isNull || col("upper").isNull ||
          (col("lower") <= value && col("upper") >= value)).as("survives"))

  /**
   * RANGE pruning on a STRING column from manifest bounds (r16) —
   * `column ∈ [lo, hi]` decided per file at manifest cost. The spec
   * allows string bounds TRUNCATED: a truncated lower bound only
   * LOWERS and a truncated-then-incremented upper only RAISES, so the
   * containment test `lower <= hi && upper >= lo` stays conservative
   * under truncation — it may keep a file it could have pruned, it
   * never prunes a file that could match. Bounds-less files survive;
   * non-string columns refuse.
   */
  def manifestBoundsPruneStringRange(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame =
    boundsWalk[String](spark, table, column, Set("string"),
      (b, _) => new String(b, java.nio.charset.StandardCharsets.UTF_8))
      .select(col("data_path"), col("lower"), col("upper"),
        (col("lower").isNull || col("upper").isNull ||
          (col("lower") <= hi && col("upper") >= lo)).as("survives"))

  /**
   * RANGE pruning on a DATE column from manifest bounds (r16) — dates
   * single-value-serialize as 4-byte little-endian int EPOCH-DAYS
   * (spec Appendix D), so the integer comparator is exact; `lo`/`hi`
   * are ISO dates and the decoded bounds surface as real DATEs. A
   * payload of any other width refuses (a misread bound silently
   * prunes live data). Bounds-less files survive.
   */
  def manifestBoundsPruneDate(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val loD = java.time.LocalDate.parse(lo).toEpochDay
    val hiD = java.time.LocalDate.parse(hi).toEpochDay
    boundsWalk[Long](spark, table, column, Set("date"), (b, w) => {
      if (b.length != 4) {
        throw new IllegalArgumentException(
          s"$w: date bound payload is ${b.length} bytes — dates " +
            "serialize as 4-byte int epoch-days, refusing rather " +
            "than mis-pruning")
      }
      boundLong(b, w)
    })
      .select(col("data_path"),
        date_from_unix_date(col("lower").cast("int")).as("lower"),
        date_from_unix_date(col("upper").cast("int")).as("upper"),
        (col("lower").isNull || col("upper").isNull ||
          (col("lower") <= hiD && col("upper") >= loD)).as("survives"))
  }

  /**
   * RANGE pruning on a DECIMAL column from manifest bounds (r16) —
   * decimals single-value-serialize as the UNSCALED value's minimal
   * two's-complement BIG-endian bytes (spec Appendix D; note the
   * endianness flip vs int/long), rescaled by the column's declared
   * scale. Payloads past 16 bytes (decimal's max precision) refuse.
   * Bounds-less files survive; non-decimal columns refuse.
   */
  def manifestBoundsPruneDecimal(
      spark: SparkSession, table: String, column: String,
      lo: BigDecimal, hi: BigDecimal): DataFrame = {
    val (_, _, mf, node) = currentMetadataNode(spark, table)
    val tpe = currentSchemaFieldsById(mf, node).collectFirst {
      case (_, (n, t)) if n == column => t
    }.getOrElse(throw new IllegalArgumentException(
      s"$table: no field '$column' in the current schema"))
    val decimalRe = """decimal\((\d+),\s*(\d+)\)""".r
    val scale = tpe match {
      case decimalRe(_, s) => s.toInt
      case other => throw new UnsupportedOperationException(
        s"$table: field '$column' is $other — only decimal bounds " +
          "decode here; comparing another type's payload would " +
          "mis-prune")
    }
    boundsWalk[BigDecimal](spark, table, column, Set(tpe), (b, w) => {
      if (b.isEmpty || b.length > 16) {
        throw new IllegalArgumentException(
          s"$w: decimal bound payload is ${b.length} bytes — not a " +
            "minimal two's-complement unscaled value, refusing " +
            "rather than mis-pruning")
      }
      BigDecimal(new java.math.BigInteger(b), scale)
    })
      .select(col("data_path"), col("lower"), col("upper"),
        (col("lower").isNull || col("upper").isNull ||
          (col("lower") <= lit(hi) && col("upper") >= lit(lo)))
          .as("survives"))
  }

  /**
   * ROLLBACK plan at metadata cost — `rollback_to_snapshot` answered
   * BEFORE touching the table: the live-data-file diff between
   * `toSnapshot` and the current snapshot (both resolved through
   * their own manifest lists, per-snapshot complete). One row per
   * planned change: `re_add` (live then, not now — files a later
   * overwrite dropped) and `remove` (live now, absent then). Unknown
   * snapshot ids refuse via [[IcebergMeta.filesAt]]; rolling back to
   * the current snapshot refuses — an empty plan reads as "safe
   * no-op" when the caller almost certainly named the wrong snapshot.
   */
  def rollbackPlan(
      spark: SparkSession, table: String, toSnapshot: Long): DataFrame = {
    def live(snap: Option[Long]): DataFrame =
      filesAt(spark, table, snap)
        .filter(col("status") =!= 2 && col("content") === 0)
        .select(col("abs_path").as("path"), col("record_count"))
        .dropDuplicates("path")
    val thenDf = live(Some(toSnapshot))
    val nowDf = live(None)
    val plan = thenDf.join(nowDf.select("path"), Seq("path"), "left_anti")
      .select(lit("re_add").as("action"), col("path"), col("record_count"))
      .unionByName(
        nowDf.join(thenDf.select("path"), Seq("path"), "left_anti")
          .select(lit("remove").as("action"), col("path"),
            col("record_count")))
    if (plan.limit(1).count() == 0) {
      throw new IllegalArgumentException(
        s"$table: snapshot $toSnapshot serves the SAME live data files " +
          "as the current snapshot — an empty rollback plan is refused")
    }
    plan
  }

  /**
   * MANIFEST-METRICS audit — the per-field `value_counts` /
   * `null_value_counts` (spec r109/r110: total values INCLUDING
   * nulls, and nulls — the numbers NOT-NULL pruning and planner
   * cardinalities trust without opening a footer) verified against
   * the data files' OWN footers: per live data file, declared counts
   * for `column` vs the footer's summed chunk `num_values` and
   * statistics `null_count`. Files declaring nothing report null
   * declared (and null matches) — surfaced, never dropped; footer
   * sides missing statistics report null actuals (no evidence is not
   * agreement). Footer reads fan out per file; manifest rows stay
   * manifest-sized. Refuses when NO live data file declares metrics
   * for the column — an all-null audit reads as "verified" when the
   * truth is "nothing to verify". Live files match footers by name
   * (iceberg data-file names are unique by writer contract).
   */
  def metricsAudit(
      spark: SparkSession, table: String, column: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val byId = currentSchemaFieldsById(mf, node)
    val fieldId = byId.collectFirst {
      case (id, (n, _)) if n == column => id
    }.getOrElse(throw new IllegalArgumentException(
      s"$table: no field '$column' in the current schema (known: " +
        s"${byId.values.map(_._1).toSeq.sorted.mkString(", ")})"))
    val hconf = spark.sessionState.newHadoopConf()
    val info = readTableMetadata(mf, hconf)
    requireCensusableVersion(info, table)
    val current = info.snapshots.find(_.isCurrent).getOrElse(
      throw new IllegalArgumentException(s"$table: no current snapshot"))
    val manifests = readManifestList(
      resolve(root, current.manifestList), hconf)
      .filter(_.content == 0)
      .map(m => resolve(root, m.manifestPath).toString)
    val conf = new SerializableHadoopConf(hconf)
    val declared = manifests.toDS()
      .flatMap { mp =>
        readManifest(new Path(mp), conf.value)
          .filter(e => e.status != 2 && e.content == 0)
          .map(e => (new Path(e.filePath).getName,
            e.valueCounts.get(fieldId), e.nullValueCounts.get(fieldId)))
      }
      .toDF("file", "declared_values", "declared_nulls")
      .dropDuplicates("file")
    if (declared.filter(col("declared_values").isNotNull ||
        col("declared_nulls").isNotNull).limit(1).count() == 0) {
      throw new IllegalArgumentException(
        s"$table: no live data file declares value_counts/" +
          s"null_value_counts for '$column' — nothing to audit")
    }
    val actual = spark.read.format("metadata")
      .option("level", "column").option("footercache", "false")
      .load(new Path(root, "data").toString)
      .filter(col("path") === column)
      .select(element_at(split(col("filepath"), "/"), -1).as("file"),
        col("num_values"), col("statistics.null_count").as("nc"))
      .groupBy(col("file"))
      .agg(sum(col("num_values")).cast("long").as("actual_values"),
        when(count(lit(1)) === count(col("nc")),
          sum(col("nc")).cast("long")).as("actual_nulls"))
    declared.join(actual, Seq("file"), "left")
      .select(col("file"), col("declared_values"), col("declared_nulls"),
        col("actual_values"), col("actual_nulls"),
        (col("declared_values") === col("actual_values"))
          .as("values_match"),
        (col("declared_nulls") === col("actual_nulls")).as("nulls_match"))
  }

  /**
   * READ only the files a range predicate on `column` can touch, per
   * the manifests' value bounds — the EXECUTABLE form of
   * [[manifestBoundsPrune]] (planning at manifest cost, then one
   * distributed scan of exactly the surviving files). The predicate
   * itself is NOT applied: callers compose it, and Catalyst pushes it
   * into the surviving files' row groups — the same contract as
   * [[MetaPrune.readPruned]]. The surviving-path list is the MetaPrune
   * driver boundary (file-count-sized). An empty survivor set returns
   * an empty frame that keeps the table's schema.
   */
  def readBoundsPruned(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val all = manifestBoundsPrune(spark, table, column, lo, hi)
      .select(col("data_path"), col("survives")).collect()
    val surviving = all.filter(_.getBoolean(1)).map(_.getString(0)).toSeq
    if (surviving.nonEmpty) {
      spark.read.parquet(surviving: _*)
    } else {
      // preserve schema with an empty relation over the full file set;
      // when manifest-summary pruning dropped every manifest, fall
      // back to the unpruned walk for a schema donor
      val donors =
        if (all.nonEmpty) all.map(_.getString(0)).toSeq
        else boundsByFile(spark, table, column)
          .select("data_path").collect().map(_.getString(0)).toSeq
      if (donors.isEmpty) {
        throw new IllegalArgumentException(
          s"$table: no live data files — nothing to read, and no " +
            "schema to preserve an empty result with")
      }
      spark.read.parquet(donors: _*).limit(0)
    }
  }

  /** The int/long instantiation of [[boundsWalk]] shared by
    * [[manifestBoundsPrune]] / [[boundsClusteringReport]]. */
  private def boundsByFile(
      spark: SparkSession, table: String, column: String,
      partitionRange: Option[(Long, Long)] = None): DataFrame =
    boundsWalk[Long](spark, table, column, Set("int", "long"), boundLong,
      partitionRange)

  /** For each declared partition spec: the POSITION of the identity
    * field over schema field `fieldId` within the spec's field list —
    * the manifest list's `partitions` summaries are in exactly this
    * order. Specs not partitioning by the field are absent. */
  private def identitySummaryIndex(
      node: com.fasterxml.jackson.databind.JsonNode,
      mf: Path, fieldId: Int): Map[Int, Int] = {
    import scala.jdk.CollectionConverters._
    Option(node.get("partition-specs"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .flatMap { sp =>
        val id = req(sp, "spec-id", mf).asInt()
        Option(sp.get("fields"))
          .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
          .zipWithIndex.collectFirst {
            case (f, i) if req(f, "source-id", mf).asInt() == fieldId &&
              req(f, "transform", mf).asText() == "identity" => id -> i
          }
      }.toMap
  }

  /** Whole-manifest keep decision from the list's partition summaries:
    * false ONLY when the summary PROVES every file's `column` value is
    * outside `[lo, hi]` (identity partition: each file's rows share
    * one value, and a null partition value never satisfies a range
    * predicate — SQL semantics — so `contains_null` cannot rescue a
    * bounds-disjoint manifest). Any missing evidence keeps. */
  private def summaryKeep(specIdx: Map[Int, Int], lo: Long, hi: Long)(
      m: IcebergManifestInfo): Boolean = {
    val disjoint = for {
      specId <- m.partitionSpecId
      idx <- specIdx.get(specId)
      sums <- m.partitionSummaries
      s <- sums.lift(idx)
      l <- s.lowerBound
      u <- s.upperBound
    } yield boundLong(l, m.manifestPath) > hi ||
      boundLong(u, m.manifestPath) < lo
    !disjoint.getOrElse(false)
  }

  /**
   * MANIFEST-LIST partition-summary pruning report — the FIRST prune
   * real planners apply at scale: before opening ANY manifest, the
   * manifest list's per-partition-field summaries (`partitions`, spec
   * field 507: contains_null + lower/upper bound per field of the
   * manifest's spec) already prove whole manifests disjoint from
   * `column ∈ [lo, hi]`. One row per DATA manifest of the current
   * snapshot: `(manifest, spec_id, contains_null, lower, upper,
   * survives, added_rows_count)` — `survives=false` means the bounds
   * tier never opens it (a thousand-manifest table answers a
   * partition-ranged plan with ONE manifest-list read). Manifests
   * with no summary for the field survive (no evidence never
   * prunes). Refuses when `column` is unknown, not int/long, or not
   * an identity partition field in ANY declared spec — with nothing
   * to prune on, an all-survives report reads as evidence when it is
   * vacuous.
   */
  def manifestSummaryPrune(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val byId = currentSchemaFieldsById(mf, node)
    val fieldId = byId.collectFirst {
      case (id, (n, _)) if n == column => id
    }.getOrElse(throw new IllegalArgumentException(
      s"$table: no field '$column' in the current schema (known: " +
        s"${byId.values.map(_._1).toSeq.sorted.mkString(", ")})"))
    val tpe = byId(fieldId)._2
    if (!Set("int", "long").contains(tpe)) {
      throw new UnsupportedOperationException(
        s"$table: field '$column' is $tpe — only int/long partition " +
          "summaries decode here; comparing another type's payload " +
          "would mis-prune")
    }
    val specIdx = identitySummaryIndex(node, mf, fieldId)
    if (specIdx.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no partition spec declares identity($column) — the " +
          "manifest list carries no summary to prune on")
    }
    val hconf = spark.sessionState.newHadoopConf()
    val info = readTableMetadata(mf, hconf)
    requireCensusableVersion(info, table)
    val current = info.snapshots.find(_.isCurrent).getOrElse(
      throw new IllegalArgumentException(s"$table: no current snapshot"))
    // manifest-list-entry scale: the same driver boundary every
    // manifest-list consumer has
    readManifestList(resolve(root, current.manifestList), hconf)
      .filter(_.content == 0)
      .map { m =>
        val s = for {
          specId <- m.partitionSpecId
          idx <- specIdx.get(specId)
          sums <- m.partitionSummaries
          s <- sums.lift(idx)
        } yield s
        (new Path(m.manifestPath).getName, m.partitionSpecId,
          s.map(_.containsNull),
          s.flatMap(_.lowerBound).map(boundLong(_, m.manifestPath)),
          s.flatMap(_.upperBound).map(boundLong(_, m.manifestPath)),
          summaryKeep(specIdx, lo, hi)(m), m.addedRows)
      }
      .toDF("manifest", "spec_id", "contains_null", "lower", "upper",
        "survives", "added_rows_count")
  }

  /** The shared manifest walk behind every bounds consumer: one
    * `(data_path, lower, upper)` row per live data file of the current
    * snapshot, bounds decoded for `column` via `decode` (null when the
    * entry carries none). Validation refusals live here: unknown
    * column, column type outside `wantTypes` (decoding a bound under
    * the wrong type mis-prunes). */
  private def boundsWalk[T: scala.reflect.runtime.universe.TypeTag](
      spark: SparkSession, table: String, column: String,
      wantTypes: Set[String],
      decode: (Array[Byte], String) => T,
      partitionRange: Option[(Long, Long)] = None): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val byId = currentSchemaFieldsById(mf, node)
    val fieldId = byId.collectFirst {
      case (id, (n, _)) if n == column => id
    }.getOrElse(throw new IllegalArgumentException(
      s"$table: no field '$column' in the current schema (known: " +
        s"${byId.values.map(_._1).toSeq.sorted.mkString(", ")})"))
    val tpe = byId(fieldId)._2
    if (!wantTypes.contains(tpe)) {
      throw new UnsupportedOperationException(
        s"$table: field '$column' is $tpe — only " +
          s"${wantTypes.toSeq.sorted.mkString("/")} bounds decode here; " +
          "comparing another type's payload would mis-prune")
    }
    val hconf = spark.sessionState.newHadoopConf()
    val info = readTableMetadata(mf, hconf)
    requireCensusableVersion(info, table)
    val current = info.snapshots.find(_.isCurrent).getOrElse(
      throw new IllegalArgumentException(s"$table: no current snapshot"))
    val dataManifests = readManifestList(
      resolve(root, current.manifestList), hconf)
      .filter(_.content == 0)
    // manifest-LIST partition-summary prune (r16): when the column is
    // an identity partition field and the caller carries a range,
    // provably-disjoint manifests are never opened at all — the prune
    // real planners apply before any manifest I/O
    val kept = partitionRange match {
      case None => dataManifests
      case Some((lo, hi)) =>
        val specIdx = identitySummaryIndex(node, mf, fieldId)
        dataManifests.filter(summaryKeep(specIdx, lo, hi))
    }
    val manifests = kept.map(m => resolve(root, m.manifestPath).toString)
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    manifests.toDS()
      .flatMap { mp =>
        readManifest(new Path(mp), conf.value)
          .filter(e => e.status != 2 && e.content == 0)
          .map { e =>
            (resolve(new Path(rootStr), e.filePath).toString,
              e.lowerBounds.get(fieldId).map(decode(_, e.filePath)),
              e.upperBounds.get(fieldId).map(decode(_, e.filePath)))
          }
      }
      .toDF("data_path", "lower", "upper")
      // a file can appear in several manifests (added in one, existing
      // in a rewritten one) with differing bounds PRESENCE: aggregate
      // deterministically — min/max ignore nulls, so a bounded entry
      // always beats an unbounded duplicate, and two bounded entries
      // widen conservatively (never a run-to-run coin flip, which
      // dropDuplicates was)
      .groupBy(col("data_path"))
      .agg(min(col("lower")).as("lower"), max(col("upper")).as("upper"))
  }

  /**
   * SNAPSHOT-LOG audit — the metadata's `snapshot-log` (the
   * (timestamp, snapshot-id) history TIMESTAMP AS OF walks): one row
   * per entry in log order with `listed` (the id still resolves in the
   * snapshots list — expiry normally trims the log with the snapshot,
   * so a DANGLING entry sends time travel to a snapshot that no longer
   * exists) and `monotone` (timestamps non-decreasing — a clock-skewed
   * entry makes the binary search engines run over this log return the
   * wrong snapshot silently). First entry is vacuously monotone.
   * Refuses when the metadata carries no snapshot-log.
   */
  def snapshotLogReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (_, _, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val entries = Option(node.get("snapshot-log"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { e =>
        (req(e, "timestamp-ms", mf).asLong(),
          req(e, "snapshot-id", mf).asLong())
      }
    if (entries.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: current metadata ($mf) carries no snapshot-log — " +
          "nothing to audit")
    }
    val listed = Option(node.get("snapshots"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .map(s => req(s, "snapshot-id", mf).asLong()).toSet
    val current = Option(node.get("current-snapshot-id")).map(_.asLong())
    entries.zipWithIndex.map { case ((ts, id), i) =>
      (i.toLong, id, ts, listed.contains(id), current.contains(id),
        i == 0 || entries(i - 1)._1 <= ts)
    }.toDF("idx", "snapshot_id", "timestamp_ms", "listed", "is_current",
      "monotone")
  }

  /**
   * METADATA-LOG audit — the current metadata's `metadata-log` lineage
   * (previous metadata files with their commit times, the chain
   * metadata time travel walks): one row per entry with `exists` on
   * disk — a listed-but-deleted file breaks every rollback/time-travel
   * that needs it, and surfacing the hole beats failing mid-walk.
   * Refuses when the current metadata lists no lineage at all.
   */
  def metadataLogReport(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, fs, mf, node) = currentMetadataNode(spark, table)
    import scala.jdk.CollectionConverters._
    val entries = Option(node.get("metadata-log"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { e =>
        (req(e, "timestamp-ms", mf).asLong(),
          req(e, "metadata-file", mf).asText())
      }
    if (entries.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: current metadata ($mf) lists no metadata-log lineage")
    }
    entries.map { case (ts, file) =>
      val p = resolve(root, file)
      (p.getName, ts, fs.exists(p))
    }.toDF("filename", "timestamp_ms", "exists")
  }

  /**
   * ROW-LINEAGE audit (format v3) — the Iceberg mirror of
   * [[DeltaMetaAudits.rowTrackingAudit]]: v3 assigns every data file a
   * `first_row_id` range of width `record_count` (explicit on the
   * entry, spec field 142, or INHERITED positionally — the manifest's
   * own `first_row_id`, field 520, plus the accumulated record counts
   * of the preceding added entries that also inherited). Live files'
   * ranges must be DISJOINT and live BELOW the metadata's declared
   * `next-row-id` — two files sharing a row id silently corrupt CDC
   * and materialized lineage columns. One row per live data file:
   * `(file_path, first_row_id, record_count, disjoint, within_next)`.
   * Refuses on non-v3 tables, a missing `next-row-id`, an inheriting
   * entry under a manifest that declares no `first_row_id`, and an
   * EXISTING entry with no explicit value (an existing file was
   * assigned before — null there is missing evidence, not
   * inheritance). Scale: one task per manifest (inheritance is a
   * per-manifest ordered fold, executor-side); the disjointness check
   * is the range-partitioned cumulative max, never a single-task
   * window.
   */
  def rowLineageAudit(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val (root, _, mf, node) = currentMetadataNode(spark, table)
    val hconf = spark.sessionState.newHadoopConf()
    val info = readTableMetadata(mf, hconf)
    if (info.formatVersion < 3) {
      throw new UnsupportedOperationException(
        s"$table: row lineage is a format-v3 feature; this table is " +
          s"v${info.formatVersion} — nothing to audit")
    }
    val nextRowId = Option(node.get("next-row-id")).map(_.asLong())
      .getOrElse(throw new IllegalArgumentException(
        s"$table: v3 metadata carries no next-row-id — row lineage is " +
          "not in evidence, nothing to audit"))
    val current = info.snapshots.find(_.isCurrent).getOrElse(
      throw new IllegalArgumentException(s"$table: no current snapshot"))
    val manifests = readManifestList(resolve(root, current.manifestList), hconf)
      .filter(_.content == 0)
      .map(m => (resolve(root, m.manifestPath).toString, m.firstRowId))
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    val resolved = manifests.toDS().flatMap { case (mp, mFirst) =>
      var acc = 0L
      readManifest(new Path(mp), conf.value)
        .filter(e => e.status != 2 && e.content == 0)
        .map { e =>
          val first = e.firstRowId match {
            case Some(v) => v
            case None if e.status == 1 =>
              val base = mFirst.getOrElse(
                throw new IllegalArgumentException(
                  s"$mp: added entry ${e.filePath} inherits first_row_id " +
                    "but the manifest declares none — refusing rather " +
                    "than inventing a range"))
              val v = base + acc
              acc += e.recordCount
              v
            case None =>
              throw new IllegalArgumentException(
                s"$mp: existing entry ${e.filePath} carries no " +
                  "first_row_id — an existing file was assigned before; " +
                  "null is missing evidence, not inheritance")
          }
          (resolve(new Path(rootStr), e.filePath).toString,
            first, e.recordCount)
        }
    }.toDF("file_path", "first_row_id", "record_count")
      // a file in several manifests carries the same assigned range;
      // min/max keep the aggregate deterministic either way
      .groupBy(col("file_path"))
      .agg(min(col("first_row_id")).as("first_row_id"),
        max(col("record_count")).as("record_count"))
      .withColumn("range_end",
        col("first_row_id") + col("record_count") - 1)
    ScanWindows.withPrevCummax(resolved,
      Seq(col("first_row_id"), col("file_path")), col("range_end"))
      .select(col("file_path"), col("first_row_id"), col("record_count"),
        when(col("prev_cummax").isNull, lit(true))
          .otherwise(col("first_row_id") > col("prev_cummax"))
          .as("disjoint"),
        (col("range_end") < nextRowId).as("within_next"))
  }

  /**
   * The v3 row-lineage READ path: the current snapshot's live data
   * rows with their MATERIALIZED `_row_id` — each file's
   * `first_row_id` (resolved exactly as [[rowLineageAudit]] does,
   * inheritance included) plus the row's position in its file. ONE
   * scan of the live files; the (file → first_row_id) map rides a
   * broadcast join against `_metadata.file_path`, so the data never
   * shuffles. Refuses — via [[rowLineageAudit]] — before reading a
   * single data byte when the lineage itself is not auditable, and
   * refuses here when any live range OVERLAPS (materialized ids would
   * silently collide) — `within_next` stays report-only (a stale
   * next-row-id mis-plans future assignments but does not corrupt
   * existing ids).
   */
  def readWithRowIds(spark: SparkSession, table: String): DataFrame = {
    val lineage = rowLineageAudit(spark, table)
    val overlapping = lineage.filter(!col("disjoint"))
      .select(col("file_path")).collect().map(_.getString(0))
    if (overlapping.nonEmpty) {
      throw new IllegalArgumentException(
        s"$table: live first_row_id ranges overlap " +
          s"(${overlapping.sorted.mkString(", ")}) — materialized row " +
          "ids would collide; refusing rather than emitting duplicates")
    }
    val paths = lineage.select(col("file_path"))
      .collect().map(_.getString(0)).toSeq
    spark.read.parquet(paths: _*)
      // the _metadata pseudo-column resolves only on the scan relation
      // — capture both fields as real columns before joining
      .withColumn("__fp", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(broadcast(lineage.select(col("file_path").as("__fp"),
        col("first_row_id"))), Seq("__fp"))
      .withColumn("_row_id", col("first_row_id") + col("__pos"))
      .drop("__fp", "__pos", "first_row_id")
  }
}
