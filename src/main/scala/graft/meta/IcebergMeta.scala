package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One snapshot entry of an Iceberg table-metadata file. */
case class IcebergSnapshotInfo(
    snapshotId: Long,
    timestampMs: Long,
    manifestList: String,
    operation: Option[String],
    isCurrent: Boolean,
    // the spec's ancestry pointer — the lineage authority for
    // incremental ranges (wall-clock is only the no-pointer fallback)
    parentSnapshotId: Option[Long] = None)

/** Decoded Iceberg table-metadata JSON. */
case class IcebergTableInfo(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    currentSnapshotId: Option[Long],
    snapshots: Seq[IcebergSnapshotInfo])

/** One manifest-list entry: a pointer to one manifest file.
  * `content`: 0 data manifest, 1 delete manifest (format v2; absent in
  * v1 lists → 0). */
case class IcebergManifestInfo(
    manifestPath: String,
    manifestLength: Long,
    content: Int,
    addedFiles: Option[Long],
    existingFiles: Option[Long],
    deletedFiles: Option[Long],
    addedRows: Option[Long] = None,
    addedSnapshotId: Option[Long] = None,
    // the manifest's data sequence number (v2+): entries with a null
    // sequence_number and status ADDED inherit it
    sequenceNumber: Option[Long] = None,
    // which partition spec the manifest's entries were written under
    partitionSpecId: Option[Int] = None)

/** One manifest entry: one data or delete file with its census numbers.
  * `status`: 0 existing, 1 added, 2 deleted (the spec's enum).
  * `content`: 0 data, 1 position deletes, 2 equality deletes (format
  * v2; absent in v1 files → 0). A merge-on-read census that ignored
  * `content` would count delete-file rows as data rows. */
case class IcebergFileEntry(
    status: Int,
    content: Int,
    filePath: String,
    fileFormat: String,
    recordCount: Long,
    fileSizeBytes: Long,
    partition: Map[String, String],
    // format-v3 deletion-vector fields: the Puffin file named by
    // filePath holds this entry's DV blob for referencedDataFile at
    // (contentOffset, contentSizeInBytes); recordCount is the DV's
    // cardinality
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    // format-v2 equality deletes (content=2): the schema field ids the
    // delete file's rows match data rows BY VALUE on (spec r136
    // equality_ids); None on data/position entries
    equalityIds: Option[Seq[Int]] = None,
    // the entry's own data sequence number (v2+, spec r134
    // sequence_number); null in the file means INHERIT the manifest's
    // when the entry is ADDED — resolved by the caller that knows the
    // manifest-list entry
    sequenceNumber: Option[Long] = None,
    // the entry's own committing snapshot (spec r101 snapshot_id);
    // null means INHERIT the manifest-list entry's added_snapshot_id —
    // a compacted manifest keeps each entry's ORIGINAL committer here
    snapshotId: Option[Long] = None)

/**
 * Iceberg metadata tier — the second table format above the raw-file
 * layer, decoded against the PUBLIC Iceberg table spec: a `metadata/`
 * directory of versioned `*.metadata.json` table-metadata files (plus a
 * `version-hint.text` pointer for filesystem tables), per-snapshot
 * manifest LISTS (Avro), and manifests (Avro) whose entries each
 * describe one data file with its record/byte counts. Census questions
 * ("how many live files/rows in the current snapshot") answer from the
 * manifest chain WITHOUT touching a data file — and compose with the
 * parquet tier to cross-check manifest record counts against the files'
 * own footers.
 *
 * Decode reuse mirrors the ORC tier's: the Avro containers are read
 * through the avro library Spark already ships (`DataFileReader`,
 * field access BY NAME so real manifests' extra fields pass through),
 * the JSON through Jackson. [[currentFiles]] distributes the manifest
 * walk — one task per manifest — so a snapshot with thousands of
 * manifests scales like any other scan; only the (small) metadata JSON
 * and manifest list are read at the driver.
 */
object IcebergMeta {

  /** True if `root` looks like a filesystem Iceberg table (a
    * version-hint pointer or any `*.metadata.json` under `metadata/`). */
  def isIcebergTable(fs: FileSystem, root: Path): Boolean =
    try {
      val meta = new Path(root, "metadata")
      fs.getFileStatus(meta).isDirectory &&
        (fs.exists(new Path(meta, "version-hint.text")) ||
          fs.listStatus(meta).exists(_.getPath.getName.endsWith(".metadata.json")))
    } catch { case _: java.io.IOException => false }

  /** List the table's `*.metadata.json` files under `metadata/` as
    * [[FileSlice]]s — the iceberg counterpart of the delta log listing
    * (the snapshot level lists table METADATA, not data files). */
  def listMetadataSlices(root: Path, conf: Configuration): Seq[FileSlice] = {
    val fs = root.getFileSystem(conf)
    if (!isIcebergTable(fs, root)) {
      throw new IllegalArgumentException(
        s"$root is not an Iceberg table: no metadata/*.metadata.json")
    }
    fs.listStatus(new Path(root, "metadata")).toSeq
      .filter(_.getPath.getName.endsWith(".metadata.json"))
      .sortBy(st => (metadataVersion(st.getPath.getName), st.getPath.getName))
      .map(st => FileSlice(st.getPath.toString, st.getPath.getName,
        st.getLen, st.getModificationTime, Map.empty))
  }

  private val VersionedName = "^v(\\d+)\\.metadata\\.json$".r
  private val SequencedName = "^(\\d+)-.*\\.metadata\\.json$".r

  /** Numeric version of a metadata-file name: filesystem-table
    * `v12.metadata.json` → 12, catalog-style `00012-<uuid>.metadata.json`
    * → 12, anything else → -1 (falls back to name order). A plain
    * lexicographic sort would rank `v9` above `v10` and resolve every
    * table with ≥10 commits to a STALE snapshot. */
  def metadataVersion(name: String): Long = name match {
    case VersionedName(n) => n.toLong
    case SequencedName(n) => n.toLong
    case _ => -1L
  }

  /** The table's CURRENT metadata file: via `version-hint.text` when
    * present (the spec's filesystem-table pointer), else the
    * numerically-latest `*.metadata.json` (see [[metadataVersion]]). */
  def currentMetadataFile(fs: FileSystem, root: Path): Path = {
    val meta = new Path(root, "metadata")
    val hint = new Path(meta, "version-hint.text")
    if (fs.exists(hint)) {
      val in = fs.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      val p = new Path(meta, s"v$v.metadata.json")
      if (fs.exists(p)) return p
    }
    val candidates = fs.listStatus(meta)
      .filter(_.getPath.getName.endsWith(".metadata.json"))
      .map(_.getPath)
      .sortBy(p => (metadataVersion(p.getName), p.getName))
    if (candidates.isEmpty) {
      throw new IllegalArgumentException(
        s"$root is not an Iceberg table: no metadata/*.metadata.json")
    }
    candidates.last
  }

  /** A required JSON field, or a classified refusal naming the file and
    * the field — the iceberg counterpart of the delta tier's
    * malformed-commit-line contract (a foreign `*.metadata.json` must
    * not surface as a bare NullPointerException). */
  private def req(node: com.fasterxml.jackson.databind.JsonNode,
      field: String, file: Path): com.fasterxml.jackson.databind.JsonNode = {
    val n = node.get(field)
    if (n == null || n.isNull) {
      throw new RuntimeException(
        s"Malformed Iceberg metadata $file: missing required field '$field'")
    }
    n
  }

  /** Decode one table-metadata JSON file. */
  def readTableMetadata(file: Path, conf: Configuration): IcebergTableInfo = {
    val fs = file.getFileSystem(conf)
    val in = fs.open(file)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    if (node == null || !node.isObject) {
      throw new RuntimeException(
        s"Malformed Iceberg metadata $file: not a JSON object")
    }
    val current =
      if (node.has("current-snapshot-id") &&
          node.get("current-snapshot-id").asLong() != -1L)
        Some(node.get("current-snapshot-id").asLong())
      else None
    import scala.jdk.CollectionConverters._
    val snaps = Option(node.get("snapshots")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty).map { s =>
        IcebergSnapshotInfo(
          snapshotId = req(s, "snapshot-id", file).asLong(),
          timestampMs = req(s, "timestamp-ms", file).asLong(),
          manifestList = req(s, "manifest-list", file).asText(),
          operation = Option(s.get("summary"))
            .flatMap(su => Option(su.get("operation"))).map(_.asText()),
          isCurrent = current.contains(s.get("snapshot-id").asLong()),
          parentSnapshotId =
            Option(s.get("parent-snapshot-id")).map(_.asLong()))
      }
    IcebergTableInfo(
      formatVersion = req(node, "format-version", file).asInt(),
      tableUuid = Option(node.get("table-uuid")).map(_.asText()).getOrElse(""),
      location = Option(node.get("location")).map(_.asText()).getOrElse(""),
      currentSnapshotId = current,
      snapshots = snaps)
  }

  /** One decoded schema of the table metadata's `schemas` list. */
  case class IcebergSchemaInfo(
      schemaId: Int,
      nFields: Int,
      fieldNames: Seq[String],
      isCurrent: Boolean)

  /**
   * SCHEMA HISTORY at metadata cost: every schema the table metadata
   * still lists (iceberg keeps superseded schemas in `schemas`, with
   * `current-schema-id` naming the live one) — the iceberg counterpart
   * of the delta tier's metaData history. Reads ONE small JSON file.
   */
  def schemaHistory(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val file = currentMetadataFile(fs, root)
    val in = fs.open(file)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    import scala.jdk.CollectionConverters._
    val currentId = Option(node.get("current-schema-id")).map(_.asInt())
    val schemas = Option(node.get("schemas"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { s =>
        val id = req(s, "schema-id", file).asInt()
        val names = Option(s.get("fields"))
          .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
          .map(f => req(f, "name", file).asText())
        IcebergSchemaInfo(id, names.size, names, currentId.contains(id))
      }
    schemas.toDS()
      .select(col("schemaId").as("schema_id"),
        col("nFields").as("n_fields"),
        array_join(col("fieldNames"), ",").as("field_names_csv"),
        col("isCurrent").as("is_current"))
  }

  /**
   * SCHEMA CONFORMANCE audit — the iceberg counterpart of the delta
   * tier's: the CURRENT declared schema (the metadata's `schemas`
   * entry named by `current-schema-id`) vs the PHYSICAL footer schema
   * of every live DATA file of the current snapshot (manifest chain ⋈
   * footer schema facts; no data page is touched). One row per live
   * file: `(path, n_declared, n_present, missing_csv)` — the backfill
   * question a schema evolution leaves behind. A live file with NO
   * footer evidence surfaces with null `n_present`/`missing_csv`
   * (LEFT join): no evidence is never conformance and never a
   * silently-dropped row.
   */
  def schemaConformance(spark: SparkSession, table: String): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val file = currentMetadataFile(fs, root)
    val in = fs.open(file)
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    import scala.jdk.CollectionConverters._
    val currentId = Option(node.get("current-schema-id")).map(_.asInt())
      .getOrElse(throw new IllegalArgumentException(
        s"$table: no current-schema-id in $file"))
    val declared = Option(node.get("schemas"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .find(s => req(s, "schema-id", file).asInt() == currentId)
      .map(s => Option(s.get("fields")).map(_.elements().asScala.toSeq)
        .getOrElse(Seq.empty).map(f => req(f, "name", file).asText()))
      .getOrElse(throw new IllegalArgumentException(
        s"$table: current-schema-id $currentId has no schemas entry in $file"))
    val live = currentFiles(spark, table)
      .filter(col("status") =!= 2 && col("content") === 0)
      .select(col("abs_path"))
    // physical TOP-LEVEL names from each file's own footer; the data
    // subtree is scanned directly (the mixed-depth table root defeats
    // generic partition discovery)
    val present = MetaValues.schemaFactsDf(spark,
      new Path(root, "data").toString)
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
            lit(declared.toArray), col("present"))), ",")).as("missing_csv"))
  }

  private def openAvro(file: Path, conf: Configuration): org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord] = {
    val fs = file.getFileSystem(conf)
    val len = fs.getFileStatus(file).getLen
    val in = fs.open(file)
    val seekable = new org.apache.avro.file.SeekableInput {
      override def read(b: Array[Byte], off: Int, l: Int): Int = in.read(b, off, l)
      override def seek(p: Long): Unit = in.seek(p)
      override def tell(): Long = in.getPos
      override def length(): Long = len
      override def close(): Unit = in.close()
    }
    new org.apache.avro.file.DataFileReader(seekable,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
  }

  private def str(v: AnyRef): String = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s => s.toString
  }

  private def optLong(r: org.apache.avro.generic.GenericRecord, name: String): Option[Long] =
    if (r.getSchema.getField(name) == null) None
    else Option(r.get(name)).map(_.asInstanceOf[Number].longValue())

  /** `content` decode shared by both manifest layers: absent in format
    * v1 (data by definition) → 0. */
  private def contentOf(r: org.apache.avro.generic.GenericRecord): Int =
    optLong(r, "content").map(_.toInt).getOrElse(0)

  /** Decode a manifest LIST (one entry per manifest of a snapshot). */
  def readManifestList(file: Path, conf: Configuration): Seq[IcebergManifestInfo] = {
    val reader = openAvro(file, conf)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[IcebergManifestInfo]
      while (reader.hasNext) {
        val r = reader.next()
        out += IcebergManifestInfo(
          manifestPath = str(r.get("manifest_path")),
          manifestLength = r.get("manifest_length").asInstanceOf[Number].longValue(),
          content = contentOf(r),
          addedFiles = optLong(r, "added_files_count")
            .orElse(optLong(r, "added_data_files_count")),
          existingFiles = optLong(r, "existing_files_count")
            .orElse(optLong(r, "existing_data_files_count")),
          deletedFiles = optLong(r, "deleted_files_count")
            .orElse(optLong(r, "deleted_data_files_count")),
          addedRows = optLong(r, "added_rows_count"),
          addedSnapshotId = optLong(r, "added_snapshot_id"),
          sequenceNumber = optLong(r, "sequence_number"),
          partitionSpecId = optLong(r, "partition_spec_id").map(_.toInt))
      }
      out.toSeq
    } finally {
      reader.close()
    }
  }

  /** Decode a MANIFEST (one entry per data file). */
  def readManifest(file: Path, conf: Configuration): Seq[IcebergFileEntry] = {
    val reader = openAvro(file, conf)
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[IcebergFileEntry]
      while (reader.hasNext) {
        val r = reader.next()
        val df = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        // v3 deletion vectors are Puffin-format delete entries carrying
        // referenced_data_file + a blob span; decoded by [[PuffinCodec]]
        // so the census can subtract them. Checked PER ENTRY (not just
        // via the table's format-version) so a mislabeled v2 table
        // still classifies its DVs instead of censusing them as data;
        // a Puffin entry that is NOT a well-formed DV (wrong content,
        // no referenced file, no blob span) REFUSES — there is no
        // faithful way to count it.
        val fmt = str(df.get("file_format"))
        def optStr(name: String): Option[String] = {
          val f = df.getSchema.getField(name)
          if (f == null) None else Option(df.get(name)).map(_.toString)
        }
        def optDfLong(name: String): Option[Long] = {
          val f = df.getSchema.getField(name)
          if (f == null) None
          else Option(df.get(name)).map(_.asInstanceOf[Number].longValue())
        }
        val refFile = optStr("referenced_data_file")
        val cOffset = optDfLong("content_offset")
        val cSize = optDfLong("content_size_in_bytes")
        val eqIds: Option[Seq[Int]] = {
          val f = df.getSchema.getField("equality_ids")
          if (f == null) None
          else Option(df.get("equality_ids")).map {
            case l: java.util.List[_] =>
              import scala.jdk.CollectionConverters._
              l.asScala.toSeq.map(_.asInstanceOf[Number].intValue())
            case other => throw new IllegalArgumentException(
              s"$file: equality_ids is ${other.getClass.getName}, " +
                "expected an int array")
          }
        }
        if (fmt != null && fmt.equalsIgnoreCase("puffin") &&
            (contentOf(df) != 1 || refFile.isEmpty ||
              cOffset.isEmpty || cSize.isEmpty)) {
          throw new UnsupportedOperationException(
            s"$file: manifest entry ${str(df.get("file_path"))} is " +
              "Puffin-format but not a well-formed v3 deletion vector " +
              "(content=1 with referenced_data_file + content_offset + " +
              "content_size_in_bytes) — refusing rather than miscounting")
        }
        // the partition struct (the spec's r102) is typed per partition
        // spec; decode generically — field names from the manifest's own
        // schema, values stringified the way the delta tier renders
        // partitionValues (null stays null-marked absent)
        val partition = df.getSchema.getField("partition") match {
          case null => Map.empty[String, String]
          case _ =>
            df.get("partition") match {
              case pr: org.apache.avro.generic.GenericRecord =>
                import scala.jdk.CollectionConverters._
                pr.getSchema.getFields.asScala.flatMap { pf =>
                  Option(pr.get(pf.name())).map(v => pf.name() -> v.toString)
                }.toMap
              case _ => Map.empty[String, String]
            }
        }
        out += IcebergFileEntry(
          status = r.get("status").asInstanceOf[Number].intValue(),
          content = contentOf(df),
          filePath = str(df.get("file_path")),
          fileFormat = str(df.get("file_format")),
          recordCount = df.get("record_count").asInstanceOf[Number].longValue(),
          fileSizeBytes = df.get("file_size_in_bytes").asInstanceOf[Number].longValue(),
          partition = partition,
          referencedDataFile = refFile,
          contentOffset = cOffset,
          contentSizeInBytes = cSize,
          equalityIds = eqIds,
          sequenceNumber = optLong(r, "sequence_number"),
          snapshotId = optLong(r, "snapshot_id"))
      }
      out.toSeq
    } finally {
      reader.close()
    }
  }

  /**
   * File entries of the table's CURRENT snapshot as a DataFrame:
   * `(status, content, file_path, file_format, record_count,
   * file_size_bytes, abs_path, manifest_path)`. Live files are
   * `status != 2` (the spec's DELETED); `content` distinguishes data
   * files (0) from position/equality DELETE files (1/2) — a
   * merge-on-read census must subtract delete-file rows, not add them.
   * Driver work: one metadata JSON + one manifest list (both small);
   * the per-manifest decode fans out as a typed flatMap over the
   * manifest paths — one task per manifest, the scale unit of a big
   * snapshot.
   */
  def currentFiles(spark: SparkSession, table: String): DataFrame =
    filesAt(spark, table, None)

  /**
   * TIME TRAVEL at metadata cost: [[currentFiles]] as of `snapshotId`
   * (`None` = the current snapshot). Any snapshot still listed in the
   * table metadata resolves through its own manifest list; an expired
   * (metadata-removed) id refuses with the surviving ids named — no
   * evidence, never a partial set.
   */
  def filesAt(
      spark: SparkSession, table: String,
      snapshotId: Option[Long]): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val fs = root.getFileSystem(hconf)
    val info = readTableMetadata(currentMetadataFile(fs, root), hconf)
    requireCensusableVersion(info, table)
    val current = snapshotId match {
      case None => info.snapshots.find(_.isCurrent).getOrElse(
        throw new IllegalArgumentException(s"$table: no current snapshot"))
      case Some(id) => info.snapshots.find(_.snapshotId == id).getOrElse(
        throw new IllegalArgumentException(
          s"$table: no snapshot $id (surviving: " +
            s"${info.snapshots.map(_.snapshotId).mkString(", ")})"))
    }
    filesFromManifestList(spark, root, current.manifestList)
  }

  /** Format versions 1–3 census faithfully (v3 deletion vectors
    * decode through [[PuffinCodec]]; their manifest `record_count` is
    * the DV cardinality, so count subtraction stays exact and
    * [[positionDeleteRows]] resolves them row-wise). Anything NEWER
    * refuses up front with the version named — an unknown future
    * format may change what "live rows" means in ways this tier
    * cannot see. (The per-entry Puffin well-formedness check in
    * [[readManifest]] backstops tables whose metadata lies about the
    * version.) */
  private def requireCensusableVersion(
      info: IcebergTableInfo, where: String): Unit = {
    if (info.formatVersion > 3) {
      throw new UnsupportedOperationException(
        s"$where: Iceberg format-version ${info.formatVersion} is newer " +
          "than this census tier understands (max 3) — refusing rather " +
          "than miscounting under unknown semantics")
    }
  }

  /** The one-task-per-manifest fan-out for one snapshot's manifest
    * list — shared by [[filesAt]] and the streaming store refresh. */
  private[meta] def filesFromManifestList(
      spark: SparkSession, root: Path, manifestList: String): DataFrame = {
    import spark.implicits._
    val hconf = spark.sessionState.newHadoopConf()
    val manifests = readManifestList(
      resolve(root, manifestList), hconf)
      .map(m => (resolve(root, m.manifestPath).toString, m.sequenceNumber))
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    manifests.toDS()
      .flatMap { case (mp, mlSeq) =>
        readManifest(new Path(mp), conf.value)
          .map { e =>
            // spec r134 inheritance: an entry writing NULL
            // sequence_number inherits the manifest's data sequence
            // number — but only for ADDED entries (existing/deleted
            // entries must carry their own; a null there stays null,
            // "no evidence")
            val dataSeq = e.sequenceNumber
              .orElse(if (e.status == 1) mlSeq else None)
            (e.status, e.content, e.filePath, e.fileFormat,
              e.recordCount, e.fileSizeBytes,
              resolve(new Path(rootStr), e.filePath).toString, mp,
              e.partition, e.referencedDataFile, e.contentOffset,
              e.contentSizeInBytes, e.equalityIds, dataSeq)
          }
      }
      .toDF("status", "content", "file_path", "file_format",
        "record_count", "file_size_bytes", "abs_path", "manifest_path",
        "partition_values", "referenced_data_file", "content_offset",
        "content_size", "equality_ids", "data_sequence_number")
  }

  /**
   * POSITION-DELETE rows of the current snapshot: `(data_path, pos)` —
   * one row per logically-deleted row position, from BOTH delete
   * shapes: format-v2 position-delete parquet files (the spec's
   * `(file_path, pos)` rows, a distributed parquet scan) and
   * format-v3 PUFFIN deletion vectors (decoded distributed by
   * [[PuffinCodec]], one unit per DV — blob spans and payloads stay
   * executor-side) — the merge-on-read audit verified row-wise, not
   * just by record_count subtraction. REFUSES when an EQUALITY delete
   * file (`content=2`) is live: its deletes resolve only through a
   * data scan, and silently ignoring it would undercount. The one
   * driver boundary is a 3-field classification row per delete ENTRY
   * (manifest-entry scale — the v2 parquet path list needs it anyway),
   * collected in a single manifest walk.
   */
  def positionDeleteRows(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val live = currentFiles(spark, table).filter(col("status") =!= 2)
    val dels = live.filter(col("content") =!= 0)
    val isDv = col("file_format").isNotNull &&
      upper(col("file_format")) === "PUFFIN"
    // ONE manifest walk collects the delete-entry CLASSIFICATION
    // (3 small fields per entry — manifest-entry scale, the same
    // driver boundary the v2 parquet path list needs anyway); the DV
    // PAYLOADS never visit the driver
    val delMeta = dels
      .select(col("content"), isDv.as("is_dv"), col("abs_path")).collect()
    if (delMeta.exists(_.getInt(0) == 2)) {
      throw new UnsupportedOperationException(
        s"$table: equality delete files are live — their deleted rows " +
          "resolve only through a data scan (equalityDeleteRows); " +
          "refusing a partial position audit")
    }
    val empty = Seq.empty[(String, Long)].toDF("data_path", "pos")
    // BOTH legs render data_path through the same resolve(root, _)
    // rule: a relocated table's delete rows must join its live
    // abs_path uniformly whether they came from a v2 parquet or a DV
    val tableRoot = {
      val hconf = spark.sessionState.newHadoopConf()
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val rootPrefix = tableRoot.toString
    def resolved(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(c.contains("://") || c.startsWith("/"), c)
        .otherwise(concat(lit(rootPrefix + "/"), c))
    // v2 shape: position-delete PARQUET files carry (file_path, pos)
    // rows themselves — a distributed parquet scan
    val posFiles = delMeta.filter(r => !r.getBoolean(1))
      .map(_.getString(2)).distinct.toSeq
    val fromFiles =
      if (posFiles.isEmpty) empty
      else spark.read.parquet(posFiles: _*)
        .select(resolved(col("file_path")).as("data_path"),
          col("pos").cast("long").as("pos"))
    // v3 shape: PUFFIN deletion-vector blobs, decoded DISTRIBUTED —
    // one decode unit per DV, the format's own granularity (a vector
    // never spans data files); the blob spans and payloads stay
    // executor-side. A cardinality disagreement between the manifest's
    // record_count and the decoded payload refuses rather than
    // undercounting. Skipped entirely (no second manifest walk) when
    // the classification found no DV entries.
    val fromDvs =
      if (!delMeta.exists(_.getBoolean(1))) empty
      else {
        val hconf = spark.sessionState.newHadoopConf()
        val root = {
          val p = new Path(table)
          p.getFileSystem(hconf).makeQualified(p)
        }
        val rootStr = root.toString
        val conf = new SerializableHadoopConf(hconf)
        dels.filter(isDv)
          .select(col("abs_path"), col("referenced_data_file"),
            col("content_offset"), col("content_size"), col("record_count"))
          // a DV entry carried by more than one manifest of the
          // snapshot must decode ONCE (the v2 parquet leg gets the
          // same guard via its path distinct)
          .dropDuplicates("abs_path", "content_offset", "content_size")
          .as[(String, String, Long, Long, Long)]
          .flatMap { case (puffinPath, ref, off, size, card) =>
            val positions = PuffinCodec.readDvBlob(
              new Path(puffinPath), conf.value, off, size)
            if (positions.length != card) {
              throw new IllegalArgumentException(
                s"$puffinPath: deletion vector for $ref decodes " +
                  s"${positions.length} positions but its manifest entry " +
                  s"claims $card — refusing to miscount")
            }
            val abs = resolve(new Path(rootStr), ref).toString
            positions.map(p => (abs, p))
          }
          .toDF("data_path", "pos")
      }
    fromFiles.unionByName(fromDvs)
  }

  /** Field id → (name, type-as-text) of the table's CURRENT schema
    * (the `schemas` entry named by `current-schema-id`; v1 fallback:
    * the bare `schema` field). Nested types map to their JSON rendering
    * — callers that can only match primitives refuse on those. */
  private def currentSchemaFieldsById(
      mf: Path, node: com.fasterxml.jackson.databind.JsonNode):
      Map[Int, (String, String)] = {
    import scala.jdk.CollectionConverters._
    val schemaNode = Option(node.get("current-schema-id")).flatMap { sid =>
      Option(node.get("schemas")).flatMap(_.elements().asScala.toSeq
        .find(s => Option(s.get("schema-id")).exists(_.asInt() == sid.asInt())))
    }.orElse(Option(node.get("schema"))).getOrElse(
      throw new IllegalArgumentException(
        s"$mf: no current schema (neither schemas/current-schema-id nor schema)"))
    Option(schemaNode.get("fields")).map(_.elements().asScala.toSeq)
      .getOrElse(Seq.empty)
      .map { f =>
        val t = f.get("type")
        val tpe = if (t != null && t.isTextual) t.asText() else String.valueOf(t)
        req(f, "id", mf).asInt() -> (req(f, "name", mf).asText(), tpe)
      }.toMap
  }

  /**
   * EQUALITY-DELETE rows of the current snapshot, resolved ROW-WISE
   * (format v2 merge-on-read, the Flink-writer shape): each live
   * equality-delete file (`content=2`) carries VALUE rows; a data row
   * is deleted when it equals a delete row on the delete file's
   * `equality_ids` columns (null matches null — the spec's
   * IS-NOT-DISTINCT semantics). One output row per deleted data row:
   * `(data_path, eq_cols, key_csv)` — the file it lives in, the
   * matched column names (field-id order), and the matched values
   * (`|`-joined, nulls as `NULL`). The resolution reads the union of
   * every group's in-scope data files ONCE ([[eqMatchedRows]]) and
   * null-safe-joins against the delete files' distinct keys —
   * Catalyst broadcasts the delete side when its file sizes are small
   * (the overwhelmingly common shape; no hint is forced, so a
   * pathological delete set can still shuffle-join).
   *
   * SEQUENCE SCOPING (spec r134): an equality delete applies only to
   * data files whose DATA SEQUENCE NUMBER is STRICTLY LESS than the
   * delete file's — rows appended after the delete must survive even
   * when their keys match. When the table carries sequence numbers
   * everywhere, the scope is enforced per delete group; when NOTHING
   * carries one (the v1-compat shape), the delete applies to every
   * live data file; MIXED evidence refuses — guessing either way
   * over- or under-deletes.
   *
   * PARTITION SCOPING (spec: delete-file scope): an equality delete
   * written under a PARTITIONED spec (its manifest entry carries a
   * non-empty partition tuple) applies only to data files of the SAME
   * partition; one written under the unpartitioned spec (empty tuple)
   * is a GLOBAL delete and applies to every sequence-in-scope data
   * file. A key that recurs across partitions must survive everywhere
   * except the delete's own partition — applying a partitioned delete
   * table-wide silently over-deletes.
   *
   * REFUSES — never a partial answer — when: no equality-delete file
   * is live; a delete entry lacks `equality_ids` or is not parquet; an
   * id is missing from the current schema; an equality column is
   * float/double (NaN != NaN under join equality while Iceberg pins
   * NaN == NaN for delete matching — resolving through a join would
   * silently miss those rows); or sequence evidence is mixed. Driver
   * boundaries: the delete-entry classification (entry scale) and the
   * live data path list (the MetaPrune surviving-paths idiom).
   */
  def equalityDeleteRows(spark: SparkSession, table: String): DataFrame =
    eqMatchedRows(spark, table)
      .select(col("data_path"), col("eq_cols"), col("key_csv"))

  /**
   * The validated, sequence- and partition-scoped delete GROUPS of the
   * current snapshot — one `(equality column names, distinct delete
   * keys, in-scope data paths)` triple per (id set, delete sequence,
   * partition tuple). All of [[equalityDeleteRows]]'s refusals live
   * here (shared with every consumer): no live equality delete,
   * non-parquet delete file, missing equality_ids, unknown field id,
   * float/double equality column, mixed sequence evidence. Groups
   * whose scope is empty are dropped (nothing to delete from).
   */
  private def eqDeleteGroups(
      spark: SparkSession, table: String):
      Seq[(Seq[String], DataFrame, Seq[String])] = {
    val (_, _, mf, node) = currentMetadataNode(spark, table)
    val fieldsById = currentSchemaFieldsById(mf, node)
    val live = currentFiles(spark, table).filter(col("status") =!= 2)
    val eqEntries = live.filter(col("content") === 2)
      .select(col("abs_path"), col("file_format"), col("equality_ids"),
        col("data_sequence_number"), col("partition_values"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getSeq[Int](2)).map(_.toSeq),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getMap[String, String](4).toSeq.sortBy(_._1)))
    if (eqEntries.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: no equality delete files are live — nothing to resolve")
    }
    eqEntries.foreach { case (p, fmt, ids, _, _) =>
      if (fmt == null || !fmt.equalsIgnoreCase("parquet")) {
        throw new UnsupportedOperationException(
          s"$table: equality delete file $p is ${String.valueOf(fmt)}, " +
            "only parquet delete files are supported")
      }
      if (ids.forall(_.isEmpty)) {
        throw new IllegalArgumentException(
          s"$table: equality delete file $p declares no equality_ids — " +
            "its match columns are unknowable, refusing to guess")
      }
    }
    val dataRaw = live
      .filter(col("content") === 0)
      .select(col("abs_path"), col("data_sequence_number"),
        col("file_format"), col("partition_values"))
      .collect()
    // a NON-parquet data file cannot be scanned by the semi join — and
    // silently leaving it out of every delete's scope would hand the
    // caller an answer missing its deleted rows. Refuse, like the
    // delete-file side does.
    dataRaw.find(r => r.getString(2) == null ||
        !r.getString(2).equalsIgnoreCase("parquet")).foreach { r =>
      throw new UnsupportedOperationException(
        s"$table: data file ${r.getString(0)} is " +
          s"${String.valueOf(r.getString(2))} — only parquet data files " +
          "can be equality-resolved; a scope silently missing it would " +
          "miscount")
    }
    val dataFiles = dataRaw
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getMap[String, String](3).toSeq.sortBy(_._1)))
      .distinct.toSeq
    if (dataFiles.isEmpty) return Seq.empty
    // sequence posture: all-carry → strict scoping; none-carry → the
    // v1-compat apply-to-all; mixed → unknowable, refuse
    val seqs = eqEntries.map(_._4) ++ dataFiles.map(_._2)
    val scoped = seqs.forall(_.isDefined)
    if (!scoped && seqs.exists(_.isDefined)) {
      throw new UnsupportedOperationException(
        s"$table: sequence-number evidence is MIXED (some entries carry " +
          "data_sequence_number, some do not) — the delete scope is " +
          "unknowable, refusing rather than over- or under-deleting")
    }
    // group by (id set, delete sequence, partition tuple): exactly the
    // data files the spec says the group applies to — a NON-empty
    // partition tuple (a delete written under a partitioned spec)
    // scopes the group to same-partition data files; an empty tuple
    // (the unpartitioned-spec shape) is a global delete
    eqEntries
      .groupBy(e => (e._3.get, if (scoped) e._4 else None, e._5)).toSeq
      .flatMap { case ((ids, delSeq, delPart), entries) =>
        val cols = ids.map { id =>
          fieldsById.getOrElse(id, throw new IllegalArgumentException(
            s"$table: equality_ids references field id $id which the " +
              s"current schema does not declare (known: " +
              s"${fieldsById.keys.toSeq.sorted.mkString(", ")})"))
        }
        cols.foreach { case (name, tpe) =>
          if (tpe == "float" || tpe == "double") {
            throw new UnsupportedOperationException(
              s"$table: equality column '$name' is $tpe — NaN equality " +
                "under the spec differs from join equality; refusing a " +
                "resolution that would silently miss NaN-keyed deletes")
          }
        }
        val seqScope = delSeq match {
          case Some(ds) => dataFiles.collect {
            case (p, Some(fs), part) if fs < ds => (p, part)
          }
          case None => dataFiles.map(d => (d._1, d._3))
        }
        val inScope =
          if (delPart.isEmpty) seqScope.map(_._1)
          else seqScope.collect { case (p, part) if part == delPart => p }
        if (inScope.isEmpty) None
        else {
          val names = cols.map(_._1)
          val delKeys = spark.read.parquet(entries.map(_._1).distinct: _*)
            .select(names.map(col): _*).dropDuplicates().alias("k")
          Some((names, delKeys, inScope))
        }
      }
  }

  /**
   * Equality deletes resolved to POSITIONS — `(data_path, pos)`, the
   * same shape as [[positionDeleteRows]]: each group's null-safe semi
   * join carries `_metadata.row_index` through, and the union is
   * DISTINCT so a row matched by several delete groups counts once.
   * The building block of [[equalityNetCensus]].
   */
  def equalityDeletePositions(spark: SparkSession, table: String): DataFrame =
    eqMatchedRows(spark, table)
      .select(col("data_path"), col("pos"))
      .dropDuplicates("data_path", "pos")

  /**
   * The shared resolution behind [[equalityDeleteRows]] /
   * [[equalityDeletePositions]]: ONE distributed scan over the union
   * of every delete group's in-scope data files (instead of one
   * `spark.read.parquet` per group — G groups over the same table must
   * not read the data G times), tagged with the groups each file is in
   * scope for via a broadcast `(gid, data_path)` membership join
   * (manifest-entry scale, the same driver boundary the path list
   * already is). Matching joins on `(gid, key)` where key is
   * `to_json(struct(group columns))` — JSON escaping keeps string keys
   * injective and null fields drop identically on both sides, so
   * string equality of the rendered key IS the spec's null-safe
   * column-wise equality (the delete side is cast to the scan side's
   * column types first, so both render through the same types).
   * Emits one row per (matched data row, matching group):
   * `(data_path, pos, eq_cols, key_csv)`.
   */
  private def eqMatchedRows(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val groups = eqDeleteGroups(spark, table).zipWithIndex.map {
      case ((names, delKeys, inScope), gid) => (gid, names, delKeys, inScope)
    }
    if (groups.isEmpty) {
      return Seq.empty[(String, Long, String, String)]
        .toDF("data_path", "pos", "eq_cols", "key_csv")
    }
    val allPaths = groups.flatMap(_._4).distinct
    val allNames = groups.flatMap(_._2).distinct
    val scan = spark.read.parquet(allPaths: _*)
      .select(col("_metadata.file_path").as("data_path") +:
        col("_metadata.row_index").as("pos") +:
        allNames.map(col): _*)
    val scanType = scan.schema.map(f => f.name -> f.dataType).toMap
    def jsonKey(names: Seq[String]): org.apache.spark.sql.Column =
      to_json(struct(names.map(col): _*))
    val delKeysAll = groups.map { case (gid, names, delKeys, _) =>
      delKeys
        .select(names.map(n => delKeys(n).cast(scanType(n)).as(n)): _*)
        .select(lit(gid).as("gid"), jsonKey(names).as("eq_key"))
        .dropDuplicates()
    }.reduce(_ unionByName _)
    val membership = broadcast(
      groups.flatMap { case (gid, _, _, paths) => paths.map((gid, _)) }
        .toDF("gid", "data_path"))
    def byGid(value: Int => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      groups.tail.foldLeft(
        when(col("gid") === groups.head._1, value(groups.head._1))) {
        case (acc, (gid, _, _, _)) => acc.when(col("gid") === gid, value(gid))
      }
    val namesOf = groups.map(g => g._1 -> g._2).toMap
    scan.join(membership, Seq("data_path"))
      .withColumn("eq_key", byGid(gid => jsonKey(namesOf(gid))))
      .join(delKeysAll, Seq("gid", "eq_key"), "left_semi")
      .select(col("data_path"), col("pos"),
        byGid(gid => lit(namesOf(gid).mkString(","))).as("eq_cols"),
        byGid(gid => array_join(array(namesOf(gid).map(n =>
          coalesce(col(n).cast("string"), lit("NULL"))): _*), "|"))
          .as("key_csv"))
  }

  /**
   * The EXACT net census under equality deletes — the working path the
   * metadata-cost census refuses into: one row per live data file with
   * `(record_count, eq_deleted, net_rows)` where `eq_deleted` counts
   * DISTINCT [[equalityDeletePositions]] rows (a row matched by
   * several delete groups is subtracted once). Data files outside
   * every delete's scope (or matching nothing) report `eq_deleted` 0.
   * Position deletes (`content=1`) are NOT folded in here — compose
   * with [[positionDeleteRows]] when a table carries both shapes.
   */
  def equalityNetCensus(spark: SparkSession, table: String): DataFrame = {
    val deleted = equalityDeletePositions(spark, table)
      .groupBy(col("data_path"))
      .agg(count(lit(1)).cast("long").as("eq_deleted"))
    currentFiles(spark, table)
      .filter(col("status") =!= 2 && col("content") === 0)
      .select(col("abs_path").as("data_path"),
        col("record_count"))
      .join(deleted, Seq("data_path"), "left")
      .select(col("data_path"), col("record_count"),
        coalesce(col("eq_deleted"), lit(0L)).as("eq_deleted"),
        (col("record_count") - coalesce(col("eq_deleted"), lit(0L)))
          .as("net_rows"))
  }

  /**
   * INCREMENTAL APPEND SCAN at metadata cost — the "what arrived since
   * snapshot X" question every incremental ingest asks: one row per
   * file the snapshots in `(fromSnapshot, toSnapshot]` ADDED, resolved
   * from `toSnapshot`'s OWN manifest list (per-snapshot complete) by
   * manifest-list attribution — a manifest with
   * `added_snapshot_id > fromSnapshot` contributes its ADDED entries
   * (`status=1`); reused older manifests contribute nothing, exactly
   * like the summary audit's attribution rule. Emits data AND delete
   * files (`content` distinguishes them — an incremental consumer must
   * see new deletes, or it resurrects rows). The range resolves by the
   * spec's `parent-snapshot-id` ancestry chain (to → from) when any
   * snapshot carries one — same-millisecond commits resolve and
   * retained non-ancestors are excluded; with NO parent pointers
   * anywhere (old writers) it falls back to timestamp order. Refuses
   * when either snapshot id is not in the metadata's snapshot list,
   * when `from` is not an ancestor of `to` (or, in the fallback, not
   * strictly older / timestamps tie), or when any manifest of the
   * range lacks `added_snapshot_id` (attribution unknowable — never a
   * guessed increment).
   */
  def appendedFiles(
      spark: SparkSession, table: String,
      fromSnapshot: Long, toSnapshot: Long): DataFrame = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val info = readTableMetadata(
      currentMetadataFile(root.getFileSystem(hconf), root), hconf)
    requireCensusableVersion(info, table)
    def snap(id: Long) = info.snapshots.find(_.snapshotId == id).getOrElse(
      throw new IllegalArgumentException(
        s"$table: no snapshot $id (surviving: " +
          s"${info.snapshots.map(_.snapshotId).mkString(", ")})"))
    val from = snap(fromSnapshot)
    val to = snap(toSnapshot)
    if (fromSnapshot == toSnapshot) {
      throw new IllegalArgumentException(
        s"$table: snapshot $fromSnapshot equals $toSnapshot — an empty " +
          "range has no increment")
    }
    // snapshot ids committed in (from, to]. The AUTHORITY is the
    // spec's parent-snapshot-id ancestry chain, walked to → from: it
    // resolves same-millisecond commits and excludes retained
    // NON-ancestors (a rolled-back or branch snapshot whose timestamp
    // falls inside the window must not attribute entries). Wall-clock
    // ordering is only the fallback when NO snapshot carries a parent
    // pointer (old writers) — and there a shared millisecond refuses,
    // because timestamp lineage with a tie is a guess.
    val inRange: Set[Long] =
      if (info.snapshots.exists(_.parentSnapshotId.isDefined)) {
        val byId = info.snapshots.map(s => s.snapshotId -> s).toMap
        val walked = scala.collection.mutable.Set.empty[Long]
        var cur = to
        while (cur.snapshotId != fromSnapshot) {
          walked += cur.snapshotId
          cur = cur.parentSnapshotId match {
            case None =>
              throw new IllegalArgumentException(
                s"$table: snapshot $fromSnapshot is not an ancestor of " +
                  s"$toSnapshot (the parent chain ends at " +
                  s"${cur.snapshotId}) — the range has no lineage, " +
                  "refusing rather than guessing an increment")
            case Some(p) => byId.getOrElse(p,
              throw new IllegalArgumentException(
                s"$table: snapshot ${cur.snapshotId} names parent $p " +
                  "which the metadata no longer lists (expired " +
                  "mid-chain) — lineage is broken, refusing"))
          }
        }
        walked.toSet
      } else {
        info.snapshots.groupBy(_.timestampMs).find(_._2.size > 1).foreach {
          case (ts, snaps) =>
            throw new UnsupportedOperationException(
              s"$table: snapshots ${snaps.map(_.snapshotId).mkString(", ")} " +
                s"share timestamp-ms $ts — no parent-snapshot-id lineage " +
                "exists and the timestamp lineage is ambiguous, refusing " +
                "an increment that could silently drop a " +
                "same-millisecond commit")
        }
        if (from.timestampMs >= to.timestampMs) {
          throw new IllegalArgumentException(
            s"$table: snapshot $fromSnapshot (${from.timestampMs}) is not " +
              s"strictly before $toSnapshot (${to.timestampMs}) — an " +
              "empty or reversed range has no increment")
        }
        info.snapshots
          .filter(s => s.timestampMs > from.timestampMs &&
            s.timestampMs <= to.timestampMs)
          .map(_.snapshotId).toSet
      }
    val manifests = readManifestList(resolve(root, to.manifestList), hconf)
    manifests.foreach { m =>
      if (m.addedSnapshotId.isEmpty) {
        throw new UnsupportedOperationException(
          s"$table: manifest ${m.manifestPath} carries no " +
            "added_snapshot_id — increment attribution is unknowable, " +
            "refusing rather than guessing")
      }
    }
    // a manifest ADDED in range may still carry entries committed
    // earlier (compaction rewrites merge manifests): the entry's own
    // snapshot_id wins when present, the manifest attribution is the
    // inheritance fallback — so only manifests attributed in-range
    // need opening at all
    val wanted = manifests
      .filter(m => m.addedSnapshotId.exists(inRange.contains))
      .map(m => (resolve(root, m.manifestPath).toString,
        m.sequenceNumber, m.addedSnapshotId.get))
    import spark.implicits._
    val rootStr = root.toString
    val conf = new SerializableHadoopConf(hconf)
    val inRangeB = inRange // serializable copy for the closure
    wanted.toDS()
      .flatMap { case (mp, mlSeq, mlSnap) =>
        readManifest(new Path(mp), conf.value)
          .filter(e => e.status == 1 &&
            inRangeB.contains(e.snapshotId.getOrElse(mlSnap)))
          .map(e => (e.filePath, e.content,
            resolve(new Path(rootStr), e.filePath).toString,
            e.recordCount, e.fileSizeBytes,
            e.sequenceNumber.orElse(mlSeq)))
      }
      .toDF("file_path", "content", "abs_path", "record_count",
        "file_size_bytes", "data_sequence_number")
  }

  /**
   * STREAMING current-snapshot store maintenance — the iceberg sibling
   * of the delta tier's live store: one `Trigger.AvailableNow` pass of
   * the metadata stream; each micro-batch that carries NEW metadata
   * versions refreshes the store from the NEWEST one's current
   * snapshot (iceberg manifest lists are per-snapshot complete, so a
   * refresh — not a merge — is the correct maintenance step; batches
   * with no new metadata touch nothing). Checkpointed: already-seen
   * metadata files never re-trigger a refresh. Live view:
   * [[readCurrentStore]].
   */
  def maintainCurrentStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val root = {
      val hconf = spark.sessionState.newHadoopConf()
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val src = spark.readStream.format("metadata")
      .option("source", "iceberg").option("level", "snapshot")
      .option("streamlagms", "0").load(table)
    val q = src.select("filename", "manifest_list", "is_current")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // metadata-FILE-sized driver boundary (a few rows per version)
        val rows = batch.select("filename", "manifest_list", "is_current")
          .collect()
        if (rows.nonEmpty) {
          val newest = rows.maxBy(r => (metadataVersion(r.getString(0)),
            r.getString(0)))
          rows.filter(r => r.getString(0) == newest.getString(0) &&
            r.getBoolean(2)).map(_.getString(1)).headOption.foreach { ml =>
            // same v3 refusal as the batch census path: the store must
            // never be refreshed from a snapshot it would miscount
            requireCensusableVersion(
              readTableMetadata(new Path(new Path(root, "metadata"),
                newest.getString(0)), spark.sessionState.newHadoopConf()),
              table)
            val next = new java.io.File(storeDir + "_next")
            filesFromManifestList(spark, root, ml)
              .coalesce(1).write.mode("overwrite").parquet(next.getPath)
            // crash-safe rename-aside publish (shared with the delta
            // live store): old or new store always survives
            DeltaMeta.publishStore(storeDir)
          }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** The current-snapshot rows of a [[maintainCurrentStore]] store. */
  def readCurrentStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)

  /**
   * STREAMING INCREMENTAL-INGEST store — the streaming twin of
   * [[appendedFiles]]: one `Trigger.AvailableNow` pass of the metadata
   * stream; the FIRST current snapshot seen lands as the BASELINE
   * increment (its full live file set — an ingester starting mid-life
   * must bootstrap from somewhere), and each later batch that carries
   * a NEW current snapshot appends exactly
   * `appendedFiles(prevSeen, new)` as its own increment. Increments
   * are parquet subdirs keyed `inc_<timestamp>_<snapshot>` — re-running
   * a snapshot's increment overwrites its own subdir (idempotent), and
   * already-seen metadata files never re-trigger (checkpointed). An
   * ingester tails [[readAppendsStore]] and touches each arriving file
   * once — no re-listing, no re-diffing.
   */
  def maintainAppendsStore(
      spark: SparkSession, table: String,
      storeDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val src = spark.readStream.format("metadata")
      .option("source", "iceberg").option("level", "snapshot")
      .option("streamlagms", "0").load(table)
    val q = src.select("filename", "snapshot_id", "timestamp_ms", "is_current")
      .writeStream.outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // metadata-FILE-sized driver boundary (a few rows per version)
        val rows = batch.collect()
        if (rows.nonEmpty) {
          val newestFile = rows.map(_.getString(0))
            .maxBy(n => (metadataVersion(n), n))
          rows.filter(r => r.getString(0) == newestFile && r.getBoolean(3))
            .headOption.foreach { cur =>
              val curSnap = cur.getLong(1)
              val curTs = cur.getLong(2)
              val store = new java.io.File(storeDir)
              store.mkdirs()
              // previously ingested increments, keyed by commit time
              // (snapshot ids are opaque; timestamps order the lineage)
              val seen = Option(store.listFiles()).getOrElse(Array.empty)
                .filter(_.getName.startsWith("inc_"))
                .map { f =>
                  val p = f.getName.split("_")
                  (p(1).toLong, p(2).toLong) // (ts, snapshot)
                }
              val prev = seen.sortBy(_._1).lastOption
              // emit when this SNAPSHOT is new and not older than the
              // last increment: a same-millisecond NEW snapshot is not
              // silently skipped — it reaches appendedFiles, whose
              // ambiguity refusal fails the batch LOUDLY instead
              val seenSnaps = seen.map(_._2).toSet
              if (!seenSnaps.contains(curSnap) &&
                  !prev.exists(_._1 > curTs)) {
                val inc = prev match {
                  case None =>
                    // bootstrap: the first seen snapshot's live set IS
                    // the first increment
                    filesAt(spark, table, Some(curSnap))
                      .filter(col("status") =!= 2)
                      .select(col("file_path"), col("content"),
                        col("abs_path"), col("record_count"),
                        col("file_size_bytes"), col("data_sequence_number"))
                  case Some((_, prevSnap)) =>
                    appendedFiles(spark, table, prevSnap, curSnap)
                }
                inc.withColumn("snapshot_id", lit(curSnap))
                  .coalesce(1).write.mode("overwrite")
                  .parquet(new java.io.File(store,
                    s"inc_${curTs}_$curSnap").getPath)
              }
            }
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Every increment row of a [[maintainAppendsStore]] store. */
  def readAppendsStore(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir + "/inc_*")

  /**
   * TIMESTAMP AS OF resolution: the snapshot with the latest
   * `timestamp-ms` at or before `tsMs` (iceberg snapshots carry their
   * commit time in the table metadata — resolution is one small JSON
   * read). Refuses a timestamp before the first listed snapshot.
   */
  def snapshotIdAt(spark: SparkSession, table: String, tsMs: Long): Long = {
    val hconf = spark.sessionState.newHadoopConf()
    val root = {
      val p = new Path(table)
      p.getFileSystem(hconf).makeQualified(p)
    }
    val info = readTableMetadata(
      currentMetadataFile(root.getFileSystem(hconf), root), hconf)
    val eligible = info.snapshots.filter(_.timestampMs <= tsMs)
    if (eligible.isEmpty) {
      throw new IllegalArgumentException(
        s"$table: timestamp $tsMs is before the first listed snapshot")
    }
    eligible.maxBy(s => (s.timestampMs, s.snapshotId)).snapshotId
  }

  /** [[filesAt]] resolved by TIMESTAMP (see [[snapshotIdAt]]). */
  def filesAtTime(spark: SparkSession, table: String, tsMs: Long): DataFrame =
    filesAt(spark, table, Some(snapshotIdAt(spark, table, tsMs)))

  /**
   * ORPHAN-file report — iceberg's `remove_orphan_files` question at
   * metadata cost: files under the table's data tree that NO manifest
   * of ANY snapshot still listed in the table metadata references
   * (a DELETED-status entry is still a reference — expiring it is
   * `expire_snapshots`' job, not orphan cleanup). The reference set
   * fans out one task per manifest across ALL snapshots; the disk side
   * is the one-scan `source=any` census, so non-parquet debris
   * (aborted-write temp files, foreign uploads) surfaces too. One row
   * per orphan: `(abs_path, filename, format, size, num_rows)`.
   */
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
   * holds: branches/tags retain their snapshots regardless of age),
   * and exactly what their removal
   * frees. One row per deletable object, `kind` ∈
   * `snapshot | manifest_list | manifest | data_file`:
   *
   *  - expired snapshots and their manifest-list files;
   *  - manifests referenced ONLY by expired snapshots (a manifest a
   *    survivor reuses stays);
   *  - files referenced ONLY by expired snapshots — the compaction
   *    leftovers expiry exists to reclaim; computed as
   *    `refs(expired) \ refs(surviving)` with one manifest-decode task
   *    per manifest on each side, the [[orphanFiles]] fan-out.
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
    // a snapshot HELD BY A REF (branch/tag) is retained regardless of
    // age — expiring it strands every reader following the ref; the
    // spec's retention walks refs first. (Ref-specific max-age
    // policies are a catalog concern; the filesystem plan protects
    // every named ref.)
    val refHeld: Set[Long] = {
      val in = fs.open(mf)
      val node =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      import scala.jdk.CollectionConverters._
      Option(node.get("refs")).filter(_.isObject).map { refs =>
        refs.properties().asScala
          .map(e => req(e.getValue, "snapshot-id", mf).asLong()).toSet
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
    val snapRows = expired.map { s =>
      ("snapshot", s.snapshotId.toString, -1L)
    } ++ expired.map { s =>
      val ml = resolve(root, s.manifestList)
      ("manifest_list", ml.toString,
        try fs.getFileStatus(ml).getLen catch { case _: Exception => -1L })
    } ++ deadManifests.toSeq.map { case (p, len) => ("manifest", p, len) }
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
  private def currentMetadataNode(
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
            PuffinCodec.readBlobBytes(abs, conf.value, b.offset, b.length))
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
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("file_min"), col("file_max"), col("file"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    perFile
      .withColumn("prev_cummax", max(when(col("bounded"), col("file_max")))
        .over(w))
      .select(col("file"),
        lit(defaultId).as("sort_order_id"),
        lit(sortCsv).as("sort_csv"),
        when(col("bounded"), col("file_min")).as("file_min"),
        when(col("bounded"), col("file_max")).as("file_max"),
        when(!col("bounded"), lit(null).cast("boolean"))
          .when(col("prev_cummax").isNull, lit(true))
          .otherwise(col("file_min") >= col("prev_cummax")).as("in_order"))
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
   * The base fixture re-rooted under a SECOND metadata version:
   * `v2.metadata.json` (same table state) whose `metadata-log` lists
   * the real v1 file and a `v0.metadata.json` that never existed —
   * the broken-lineage shape the audit must surface. `version-hint`
   * moves to 2. Returns per-data-file row counts.
   */
  def writeMetadataLogFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val metaDir = new java.io.File(dir, "metadata")
    val v1 = new java.io.File(metaDir, "v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(v1.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"current-snapshot-id\":2,"
    require(txt.contains(marker), s"fixture metadata missing '$marker'")
    val log =
      """"metadata-log":[
        |{"timestamp-ms":1699999999000,
        | "metadata-file":"metadata/v0.metadata.json"},
        |{"timestamp-ms":1700000000000,
        | "metadata-file":"metadata/v1.metadata.json"}],"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v2.metadata.json").toPath,
      txt.replace(marker, marker + log)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /** Spec paths are absolute URIs of the writing environment; fixture
    * and relocated tables resolve relative to the table root. */
  private def resolve(root: Path, p: String): Path = {
    val raw = new Path(p)
    if (raw.isAbsolute && p.contains("://")) raw
    else if (p.startsWith("/")) raw
    else new Path(root, p)
  }

  // ---------------------------------------------------------------------
  // Deterministic fixture writer (tests + oracle queries)
  // ---------------------------------------------------------------------

  private def avroSchema(json: String): org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(json)

  private val manifestListSchema = avroSchema(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int","default":0},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"added_files_count","type":"int"},
      |{"name":"existing_files_count","type":"int"},
      |{"name":"deleted_files_count","type":"int"},
      |{"name":"added_rows_count","type":"long"}]}""".stripMargin)

  private val manifestSchema = avroSchema(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def writeAvro(
      file: java.io.File, schema: org.apache.avro.Schema,
      rows: Seq[org.apache.avro.generic.GenericRecord]): Unit = {
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    try {
      w.create(schema, file)
      rows.foreach(w.append)
    } finally {
      w.close()
    }
  }

  private val partManifestSchema = avroSchema(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
      |    {"name":"lang","type":"string"}]}},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  /**
   * A PARTITIONED filesystem Iceberg table against the public spec:
   * `docs` split by `lang` into `data/lang=<x>/` (two files per
   * partition, doc_id parity), ONE snapshot whose single manifest
   * carries each file's typed `partition` record (the spec's r102) —
   * so "which files serve lang = x" answers from the manifest chain
   * alone. Returns rows per `lang=<x>/f<p>.parquet`.
   */
  def writePartitionedFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()

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
      val dst = new java.io.File(dataDir, rel)
      dst.getParentFile.mkdirs()
      java.nio.file.Files.copy(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      counts(rel) = slice.count()
    }

    def entry(rel: String, lang: String): org.apache.avro.generic.GenericRecord = {
      val dfSchema = partManifestSchema.getField("data_file").schema()
      val pr = new org.apache.avro.generic.GenericData.Record(
        dfSchema.getField("partition").schema())
      pr.put("lang", lang)
      val df = new org.apache.avro.generic.GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"data/$rel")
      df.put("file_format", "PARQUET")
      df.put("partition", pr)
      df.put("record_count", counts(rel))
      df.put("file_size_in_bytes", new java.io.File(dataDir, rel).length())
      val e = new org.apache.avro.generic.GenericData.Record(partManifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), partManifestSchema,
      langs.flatMap(l => (0 to 1).map(p => entry(s"lang=$l/f$p.parquet", l))))
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq {
        val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
        r.put("manifest_path", "metadata/m0.avro")
        r.put("manifest_length", new java.io.File(metaDir, "m0.avro").length())
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("added_snapshot_id", 1L)
        r.put("added_files_count", langs.size * 2)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", counts.values.sum)
        r
      })
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-part-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":1,
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts.toMap
  }

  /**
   * The partitioned fixture plus a PARTITION-STATISTICS file (spec
   * v2+): `metadata/partition-stats-1.parquet` carries one rollup row
   * per `lang` partition — computed CLOSED-FORM from the writer's own
   * per-file counts, except the first lang, which LIES about
   * `data_file_count` (3 instead of 2) so the audit's mismatch flag is
   * exercised. The metadata JSON's `partition-statistics` list names
   * the file for snapshot 1. Returns rows per `lang=<x>/f<p>.parquet`.
   */
  def writePartitionStatsFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writePartitionedFixtureTable(spark, dir, docs)
    val root = new java.io.File(dir)
    val metaDir = new java.io.File(root, "metadata")
    val langs = counts.keys.map(_.split("/")(0).stripPrefix("lang="))
      .toSeq.distinct.sorted
    val liar = langs.head
    import spark.implicits._
    val rollups = langs.map { lang =>
      val files = counts.filter(_._1.startsWith(s"lang=$lang/")).toSeq
      val bytes = files.map { case (rel, _) =>
        new java.io.File(new java.io.File(root, "data"), rel).length()
      }.sum
      (lang, if (lang == liar) 3L else files.size.toLong,
        files.map(_._2).sum, bytes)
    }
    val tmp = dir + "_pstats"
    rollups.toDF("lang", "fc", "rc", "bytes")
      .select(struct(col("lang")).as("partition"),
        lit(0).as("spec_id"),
        col("rc").as("data_record_count"),
        col("fc").as("data_file_count"),
        col("bytes").as("total_data_file_size_in_bytes"))
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(metaDir, "partition-stats-1.parquet")
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    val mf = new java.io.File(metaDir, "v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"current-snapshot-id\":1,"
    require(txt.contains(marker), s"fixture metadata missing '$marker'")
    val entry =
      s""""partition-statistics":[{"snapshot-id":1,
         |"statistics-path":"metadata/partition-stats-1.parquet",
         |"file-size-in-bytes":${dst.length()}}],"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(mf.toPath,
      txt.replace(marker, marker + entry)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * Hand-write a filesystem Iceberg table against the PUBLIC spec:
   * six parquet slices of `docs` under `data/`, TWO snapshots —
   * snap 1 (append f0..f2) and the CURRENT snap 2 whose manifest list
   * points at three manifests: m0 REUSED VERBATIM (the spec's append
   * shape — `added_snapshot_id=1` with snap 1's original added counts
   * intact, so attribution-blind summary sums are observably wrong),
   * m2 (f3,f4 added + f5 DELETED — written, then removed in snap 2,
   * still on disk), and
   * the DELETE manifest m3 (`content=1`) carrying one position-delete
   * file `del0.parquet` (a real parquet of `(file_path, pos)` rows)
   * that deletes the first 2 positions of f0 — the format-v2
   * merge-on-read shape. The metadata JSON carries both snapshots +
   * `current-snapshot-id`; `version-hint.text` points at it. Live data
   * files at snap 2: f0..f4 (5 files), net rows = their sum minus the
   * 2 deleted positions. Returns the per-data-file row counts.
   */
  def writeFixtureTable(spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()

    val n = 6
    val counts = (0 until n).map { i =>
      val slice = docs.filter(pmod(col("doc_id"), lit(n)) === i)
        .select(col("doc_id"), col("lang"))
      val tmp = dir + s"_slice$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dataDir, s"f$i.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      s"f$i.parquet" -> slice.count()
    }.toMap

    // a REAL position-delete file (the spec's merge-on-read shape):
    // (file_path, pos) rows deleting the first 2 positions of f0
    val f0Abs = new java.io.File(dataDir, "f0.parquet").getAbsolutePath
    val deletedPositions = 2L
    locally {
      import spark.implicits._
      val tmp = dir + "_del"
      Seq((f0Abs, 0L), (f0Abs, 1L)).toDF("file_path", "pos")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dataDir, "del0.parquet").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    }

    def entry(status: Int, f: String, content: Int = 0,
        records: Option[Long] = None): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(
        manifestSchema.getField("data_file").schema())
      df.put("content", content)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", records.getOrElse(counts(f)))
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      val e = new org.apache.avro.generic.GenericData.Record(manifestSchema)
      e.put("status", status)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    // snap 1: one manifest, f0..f2 added
    writeAvro(new java.io.File(metaDir, "m0.avro"), manifestSchema,
      Seq(entry(1, "f0.parquet"), entry(1, "f1.parquet"), entry(1, "f2.parquet")))
    // snap 2 REUSES m0 verbatim (the spec's append shape: prior
    // manifests ride along with added_snapshot_id=1 and their ORIGINAL
    // added counts intact — the shape that makes summary attribution
    // observable: summing every data manifest would inflate snap 2's
    // actuals by snap 1's); m2 adds f3,f4 and DELETES f5; m3 is the
    // DELETE manifest (content=1 at both layers)
    writeAvro(new java.io.File(metaDir, "m2.avro"), manifestSchema,
      Seq(entry(1, "f3.parquet"), entry(1, "f4.parquet"), entry(2, "f5.parquet")))
    writeAvro(new java.io.File(metaDir, "m3.avro"), manifestSchema,
      Seq(entry(1, "del0.parquet", content = 1,
        records = Some(deletedPositions))))

    def mlEntry(path: String, added: Int, existing: Int, deleted: Int,
        rows: Long, content: Int = 0,
        addedBySnap: Long = 1L): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("added_snapshot_id", addedBySnap)
      r.put("added_files_count", added)
      r.put("existing_files_count", existing)
      r.put("deleted_files_count", deleted)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 3, 0, 0,
        counts("f0.parquet") + counts("f1.parquet") + counts("f2.parquet"))))
    writeAvro(new java.io.File(metaDir, "snap-2.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 3, 0, 0,
        counts("f0.parquet") + counts("f1.parquet") + counts("f2.parquet"),
        addedBySnap = 1L),
        mlEntry("m2.avro", 2, 0, 1,
          counts("f3.parquet") + counts("f4.parquet"), addedBySnap = 2L),
        mlEntry("m3.avro", 1, 0, 0, deletedPositions, content = 1,
          addedBySnap = 2L)))

    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":2,
         |"current-schema-id":1,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"}]},
         |{"schema-id":1,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"},
         | {"id":3,"name":"n_chars","required":false,"type":"long"}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":${ts0 + 1000},
         | "manifest-list":"metadata/snap-2.avro",
         | "summary":{"operation":"overwrite"}}]}""".stripMargin
    java.nio.file.Files.write(new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /** The format-v3 manifest shape: `data_file` grows the DV span
    * fields (`referenced_data_file`, `content_offset`,
    * `content_size_in_bytes`), null on ordinary data entries. */
  private val dvManifestSchema = avroSchema(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"referenced_data_file","type":["null","string"],"default":null},
      |  {"name":"content_offset","type":["null","long"],"default":null},
      |  {"name":"content_size_in_bytes","type":["null","long"],"default":null}]}}]}""".stripMargin)

  /**
   * A format-v3 filesystem table against the public spec: two
   * doc_id-sorted parquet slices (`f0`, `f1`, doc_id parity) under
   * `data/`, ONE snapshot whose manifest list carries a data manifest
   * (both files added) plus a DELETE manifest (`content=1`) whose two
   * entries are PUFFIN deletion vectors — both blobs live in the one
   * `data/dv0.puffin` file (the v3 writer layout: DVs of a commit
   * share a Puffin file, addressed by `content_offset` /
   * `content_size_in_bytes`). The vectors delete positions 1,3,5 of
   * f0 and 0,2 of f1; each entry's `record_count` is its DV
   * cardinality. Returns per-data-file row counts.
   */
  def writeDvFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()

    val counts = (0 to 1).map { parity =>
      val rel = s"f$parity.parquet"
      val slice = docs.filter(pmod(col("doc_id"), lit(2)) === parity)
        .select(col("doc_id"), col("lang")).orderBy(col("doc_id"))
      val tmp = dir + s"_slice$parity"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(dataDir, rel).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
      rel -> slice.count()
    }.toMap

    // one Puffin file, two deletion-vector-v1 blobs (f0's and f1's)
    val dv0 = Array(1L, 3L, 5L)
    val dv1 = Array(0L, 2L)
    val spans = PuffinCodec.writePuffinFile(
      new java.io.File(dataDir, "dv0.puffin"),
      Seq(dv0, dv1).map(p => (PuffinCodec.DeletionVectorV1,
        Map("cardinality" -> p.length.toString),
        PuffinCodec.encodeDvBlob(p))))

    def dataEntry(f: String): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(
        dvManifestSchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", counts(f))
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      val e = new org.apache.avro.generic.GenericData.Record(dvManifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    def dvEntry(refFile: String, span: (Long, Long),
        cardinality: Long): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(
        dvManifestSchema.getField("data_file").schema())
      df.put("content", 1)
      df.put("file_path", "data/dv0.puffin")
      df.put("file_format", "PUFFIN")
      df.put("record_count", cardinality)
      df.put("file_size_in_bytes", new java.io.File(dataDir, "dv0.puffin").length())
      df.put("referenced_data_file", s"data/$refFile")
      df.put("content_offset", span._1)
      df.put("content_size_in_bytes", span._2)
      val e = new org.apache.avro.generic.GenericData.Record(dvManifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), dvManifestSchema,
      Seq(dataEntry("f0.parquet"), dataEntry("f1.parquet")))
    writeAvro(new java.io.File(metaDir, "m1.avro"), dvManifestSchema,
      Seq(dvEntry("f0.parquet", spans(0), dv0.length.toLong),
        dvEntry("f1.parquet", spans(1), dv1.length.toLong)))
    def mlEntry(path: String, added: Int, rows: Long,
        content: Int): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("added_snapshot_id", 1L)
      r.put("added_files_count", added)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 2, counts.values.sum, 0),
        mlEntry("m1.avro", 2, dv0.length.toLong + dv1.length.toLong, 1)))
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":3,"table-uuid":"graft-iceberg-dv-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":1,
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"delete"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /** The format-v2 manifest shape for EQUALITY deletes: `data_file`
    * grows `equality_ids` (the spec's field-id list), null on ordinary
    * data entries. */
  private val eqManifestSchema = avroSchema(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

  /** [[eqManifestSchema]] plus the typed `partition` record (r102) —
    * the shape a PARTITIONED spec's writer produces for both its data
    * files and its partition-scoped equality deletes. */
  private val eqPartManifestSchema = avroSchema(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file","fields":[
      |  {"name":"content","type":"int","default":0},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"partition","type":{"type":"record","name":"r102","fields":[
      |    {"name":"lang","type":"string"}]}},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

  /** The v2 manifest-LIST shape with per-manifest data sequence
    * numbers (spec: `sequence_number`), which entries inherit when
    * ADDED with a null of their own. */
  private val seqManifestListSchema = avroSchema(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":["null","long"],"default":null},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null},
      |{"name":"added_files_count","type":"int"},
      |{"name":"existing_files_count","type":"int"},
      |{"name":"deleted_files_count","type":"int"},
      |{"name":"added_rows_count","type":"long"}]}""".stripMargin)

  /**
   * A format-v2 filesystem table with EQUALITY deletes (the Flink
   * merge-on-read shape) against the public spec: two parity slices of
   * `docs` (`f0`, `f1`: doc_id, lang — lang NULLED for doc_ids 0 and 8
   * so null-key matching is exercised) added at SEQUENCE 1, then a
   * second snapshot at SEQUENCE 2 carrying BOTH a DELETE manifest
   * (`content=1`) of two equality-delete PARQUET files and a new data
   * file `f2.parquet` whose three rows all MATCH delete keys — the
   * strictly-less sequence scope means every f2 row must SURVIVE (a
   * commit's own data is never hit by its own deletes):
   *
   *  - `eq0.parquet`, `equality_ids=[1]` (doc_id): rows 0, 1, 2 and a
   *    -1 that matches nothing;
   *  - `eq1.parquet`, `equality_ids=[1,2]` (doc_id, lang): doc 4 with
   *    its REAL lang (matches), doc 6 with a wrong lang (no match),
   *    and doc 8 with NULL lang (matches — null equals null under the
   *    spec's delete semantics).
   *
   * The schema declares field 3 `score` (double) that no file carries,
   * so a test can plant `equality_ids=[3]` and pin the float/double
   * refusal. Returns per-data-file row counts.
   */
  def writeEqDeleteFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()

    def writeOne(df: DataFrame, rel: String): Long =
      FixtureIO.writeSingleParquet(df, new java.io.File(dataDir, rel),
        dir + "_eqtmp")
    val base = docs.select(col("doc_id"),
      when(col("doc_id").isin(0L, 8L), lit(null).cast("string"))
        .otherwise(col("lang")).as("lang"))
    val counts = (0 to 1).map { parity =>
      val rel = s"f$parity.parquet"
      rel -> writeOne(
        base.filter(pmod(col("doc_id"), lit(2)) === parity), rel)
    }.toMap
    val lang4 = docs.filter(col("doc_id") === 4L)
      .select(col("lang")).head().getString(0)
    locally {
      import spark.implicits._
      val eq0 = Seq(0L, 1L, 2L, -1L).toDF("doc_id")
      // (0, NULL) ALSO matches doc 0 (already deleted by eq0): the
      // row is reported under both id sets, but a net census must
      // subtract it ONCE (distinct positions)
      val eq1 = Seq((4L, Option(lang4)), (6L, Some("xx-no-such")),
        (8L, None: Option[String]), (0L, None: Option[String]))
        .toDF("doc_id", "lang")
      writeOne(eq0, "eq0.parquet")
      writeOne(eq1, "eq1.parquet")
      // f2: LATE arrivals (sequence 2, same commit as the deletes) —
      // every row re-uses a key the deletes match, and every row must
      // survive the strictly-less sequence scope
      val f2 = Seq((0L, None: Option[String]), (4L, Option(lang4)),
        (8L, None: Option[String])).toDF("doc_id", "lang")
      writeOne(f2, "f2.parquet")
    }

    def entry(f: String, content: Int, records: Long,
        eqIds: Seq[Int]): org.apache.avro.generic.GenericRecord = {
      val dfSchema = eqManifestSchema.getField("data_file").schema()
      val df = new org.apache.avro.generic.GenericData.Record(dfSchema)
      df.put("content", content)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", records)
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      if (eqIds.nonEmpty) {
        import scala.jdk.CollectionConverters._
        df.put("equality_ids",
          new org.apache.avro.generic.GenericData.Array[Integer](
            dfSchema.getField("equality_ids").schema().getTypes.get(1),
            eqIds.map(Integer.valueOf).asJava))
      }
      val e = new org.apache.avro.generic.GenericData.Record(eqManifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), eqManifestSchema,
      Seq(entry("f0.parquet", 0, counts("f0.parquet"), Nil),
        entry("f1.parquet", 0, counts("f1.parquet"), Nil)))
    writeAvro(new java.io.File(metaDir, "m1.avro"), eqManifestSchema,
      Seq(entry("eq0.parquet", 2, 4L, Seq(1)),
        entry("eq1.parquet", 2, 3L, Seq(1, 2))))
    writeAvro(new java.io.File(metaDir, "m2.avro"), eqManifestSchema,
      Seq(entry("f2.parquet", 0, 3L, Nil)))
    def mlEntry(path: String, added: Int, rows: Long, content: Int,
        seq: Long, snap: Long): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(seqManifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("added_snapshot_id", snap)
      r.put("added_files_count", added)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), seqManifestListSchema,
      Seq(mlEntry("m0.avro", 2,
        counts("f0.parquet") + counts("f1.parquet"), 0, 1L, 1L)))
    // snap 2 (sequence 2): m0 reused verbatim, the delete manifest, and
    // the same-commit data file f2 — both at sequence 2, so the deletes
    // scope to sequence-1 files only
    writeAvro(new java.io.File(metaDir, "snap-2.avro"), seqManifestListSchema,
      Seq(mlEntry("m0.avro", 2,
        counts("f0.parquet") + counts("f1.parquet"), 0, 1L, 1L),
        mlEntry("m2.avro", 1, 3L, 0, 2L, 2L),
        mlEntry("m1.avro", 2, 7L, 1, 2L, 2L)))
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-eq-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":2,
         |"current-schema-id":0,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"},
         | {"id":3,"name":"score","required":false,"type":"double"}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":${ts0 + 1000},
         | "manifest-list":"metadata/snap-2.avro",
         | "summary":{"operation":"overwrite"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts + ("f2.parquet" -> 3L)
  }

  /**
   * A PARTITIONED format-v2 table with BOTH equality-delete scopes —
   * the over-deletion trap partition scoping exists to dodge: two
   * `lang` partitions (the first two langs of `docs`, sorted) whose
   * data files carry `(key, lang)` where `key = doc_id % 50` — so the
   * SAME key values live in BOTH partitions — all at sequence 1, then
   * a second snapshot (sequence 2) adding
   *
   *  - `eq_part.parquet` (keys 0, 1, 2), `equality_ids=[1]`, written
   *    under the PARTITIONED spec with partition tuple `{lang=A}` —
   *    it must delete those keys from `fA.parquet` ONLY; the same
   *    keys in `fB.parquet` are the cross-partition survivors a
   *    table-wide application would silently kill;
   *  - `eq_glob.parquet` (key 7), `equality_ids=[1]`, written under
   *    the UNPARTITIONED spec (its manifest entry carries no
   *    partition field) — a GLOBAL delete that reaches both
   *    partitions.
   *
   * Layout: `data/lang=<A>/fA.parquet`, `data/lang=<B>/fB.parquet`,
   * deletes at `data/`. Returns per-data-file row counts keyed by
   * basename.
   */
  def writeEqDeletePartitionedFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()
    val langs = docs.filter(col("lang").isNotNull).select("lang")
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    require(langs.size >= 2,
      s"partitioned eq fixture needs >= 2 langs, got ${langs.size}")
    val (langA, langB) = (langs.head, langs(1))
    def writeOne(df: DataFrame, rel: String): Long = {
      val dst = new java.io.File(dataDir, rel)
      dst.getParentFile.mkdirs()
      FixtureIO.writeSingleParquet(df, dst,
        dir + "_eqptmp_" + rel.replaceAll("[^A-Za-z0-9]", "_"))
    }
    val keyed = docs.select(
      pmod(col("doc_id"), lit(50)).cast("long").as("key"), col("lang"))
    val counts = Map(
      "fA.parquet" -> writeOne(
        keyed.filter(col("lang") === langA), s"lang=$langA/fA.parquet"),
      "fB.parquet" -> writeOne(
        keyed.filter(col("lang") === langB), s"lang=$langB/fB.parquet"))
    locally {
      import spark.implicits._
      writeOne(Seq(0L, 1L, 2L).toDF("key"), "eq_part.parquet")
      writeOne(Seq(7L).toDF("key"), "eq_glob.parquet")
    }
    def entry(schema: org.apache.avro.Schema, rel: String, content: Int,
        records: Long, lang: Option[String],
        eqIds: Seq[Int]): org.apache.avro.generic.GenericRecord = {
      val dfSchema = schema.getField("data_file").schema()
      val df = new org.apache.avro.generic.GenericData.Record(dfSchema)
      df.put("content", content)
      df.put("file_path", s"data/$rel")
      df.put("file_format", "PARQUET")
      lang.foreach { l =>
        val pr = new org.apache.avro.generic.GenericData.Record(
          dfSchema.getField("partition").schema())
        pr.put("lang", l)
        df.put("partition", pr)
      }
      df.put("record_count", records)
      df.put("file_size_in_bytes", new java.io.File(dataDir, rel).length())
      if (eqIds.nonEmpty) {
        import scala.jdk.CollectionConverters._
        df.put("equality_ids",
          new org.apache.avro.generic.GenericData.Array[Integer](
            dfSchema.getField("equality_ids").schema().getTypes.get(1),
            eqIds.map(Integer.valueOf).asJava))
      }
      val e = new org.apache.avro.generic.GenericData.Record(schema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), eqPartManifestSchema,
      Seq(entry(eqPartManifestSchema, s"lang=$langA/fA.parquet", 0,
          counts("fA.parquet"), Some(langA), Nil),
        entry(eqPartManifestSchema, s"lang=$langB/fB.parquet", 0,
          counts("fB.parquet"), Some(langB), Nil)))
    writeAvro(new java.io.File(metaDir, "m1.avro"), eqPartManifestSchema,
      Seq(entry(eqPartManifestSchema, "eq_part.parquet", 2, 3L,
        Some(langA), Seq(1))))
    writeAvro(new java.io.File(metaDir, "m2.avro"), eqManifestSchema,
      Seq(entry(eqManifestSchema, "eq_glob.parquet", 2, 1L, None, Seq(1))))
    def mlEntry(path: String, added: Int, rows: Long, content: Int,
        seq: Long, snap: Long): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(seqManifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", 0)
      r.put("content", content)
      r.put("sequence_number", seq)
      r.put("added_snapshot_id", snap)
      r.put("added_files_count", added)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), seqManifestListSchema,
      Seq(mlEntry("m0.avro", 2, counts.values.sum, 0, 1L, 1L)))
    writeAvro(new java.io.File(metaDir, "snap-2.avro"), seqManifestListSchema,
      Seq(mlEntry("m0.avro", 2, counts.values.sum, 0, 1L, 1L),
        mlEntry("m1.avro", 1, 3L, 1, 2L, 2L),
        mlEntry("m2.avro", 1, 1L, 1, 2L, 2L)))
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-eqpart-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":2,
         |"current-schema-id":0,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"key","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":${ts0 + 1000},
         | "manifest-list":"metadata/snap-2.avro",
         | "summary":{"operation":"overwrite"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * A COMPACTED table — the shape snapshot expiry exists to reclaim:
   * snap 1 (m0) adds two parity slices `f0`/`f1`; snap 2 (the current
   * one, manifest list = `m1` ONLY, m0 not reused) is the compaction
   * rewrite — `c0.parquet` (all rows) ADDED, f0/f1 carried as
   * status=DELETED entries. Expiring snap 1 must free exactly
   * `snap-1.avro` + `m0.avro` + `f0`/`f1` while `c0` (and `m1`,
   * `snap-2.avro`) stay. Returns per-data-file row counts.
   */
  def writeCompactedFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()
    def writeOne(df: DataFrame, rel: String): Long =
      FixtureIO.writeSingleParquet(df, new java.io.File(dataDir, rel),
        dir + "_ctmp")
    val base = docs.select(col("doc_id"), col("lang"))
    val counts = Map(
      "f0.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(2)) === 0),
        "f0.parquet"),
      "f1.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(2)) === 1),
        "f1.parquet"),
      "c0.parquet" -> writeOne(base, "c0.parquet"))
    def entry(status: Int, f: String): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(
        manifestSchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", counts(f))
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      val e = new org.apache.avro.generic.GenericData.Record(manifestSchema)
      e.put("status", status)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), manifestSchema,
      Seq(entry(1, "f0.parquet"), entry(1, "f1.parquet")))
    writeAvro(new java.io.File(metaDir, "m1.avro"), manifestSchema,
      Seq(entry(1, "c0.parquet"),
        entry(2, "f0.parquet"), entry(2, "f1.parquet")))
    def mlEntry(path: String, added: Int, deleted: Int, rows: Long,
        snap: Long): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", 0)
      r.put("content", 0)
      r.put("added_snapshot_id", snap)
      r.put("added_files_count", added)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", deleted)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 2, 0,
        counts("f0.parquet") + counts("f1.parquet"), 1L)))
    writeAvro(new java.io.File(metaDir, "snap-2.avro"), manifestListSchema,
      Seq(mlEntry("m1.avro", 1, 2, counts("c0.parquet"), 2L)))
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-compacted",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":2,
         |"current-schema-id":0,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":${ts0 + 1000},
         | "manifest-list":"metadata/snap-2.avro",
         | "summary":{"operation":"replace"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * A table whose PARTITION SPEC EVOLVED: snap 1 (m0, spec 0 —
   * unpartitioned) adds `f0`/`f1`; snap 2 (current) keeps m0 and adds
   * m1 under spec 1 (`lang` identity) with `p0`/`p1`. The metadata
   * declares both specs with `default-spec-id: 1` — so f0/f1 are the
   * backfill candidates [[partitionSpecAudit]] must flag. Returns
   * per-data-file row counts.
   */
  def writeSpecEvolutionFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()
    def writeOne(df: DataFrame, rel: String): Long =
      FixtureIO.writeSingleParquet(df, new java.io.File(dataDir, rel),
        dir + "_stmp")
    val base = docs.select(col("doc_id"), col("lang"))
    val counts = Map(
      "f0.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(4)) === 0),
        "f0.parquet"),
      "f1.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(4)) === 1),
        "f1.parquet"),
      "p0.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(4)) === 2),
        "p0.parquet"),
      "p1.parquet" -> writeOne(base.filter(pmod(col("doc_id"), lit(4)) === 3),
        "p1.parquet"))
    def entry(f: String): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(
        manifestSchema.getField("data_file").schema())
      df.put("content", 0)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", counts(f))
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      val e = new org.apache.avro.generic.GenericData.Record(manifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), manifestSchema,
      Seq(entry("f0.parquet"), entry("f1.parquet")))
    writeAvro(new java.io.File(metaDir, "m1.avro"), manifestSchema,
      Seq(entry("p0.parquet"), entry("p1.parquet")))
    def mlEntry(path: String, specId: Int, added: Int, rows: Long,
        snap: Long): org.apache.avro.generic.GenericRecord = {
      val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
      r.put("manifest_path", s"metadata/$path")
      r.put("manifest_length", new java.io.File(metaDir, path).length())
      r.put("partition_spec_id", specId)
      r.put("content", 0)
      r.put("added_snapshot_id", snap)
      r.put("added_files_count", added)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", rows)
      r
    }
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 0, 2,
        counts("f0.parquet") + counts("f1.parquet"), 1L)))
    writeAvro(new java.io.File(metaDir, "snap-2.avro"), manifestListSchema,
      Seq(mlEntry("m0.avro", 0, 2,
        counts("f0.parquet") + counts("f1.parquet"), 1L),
        mlEntry("m1.avro", 1, 2,
          counts("p0.parquet") + counts("p1.parquet"), 2L)))
    val ts0 = 1700000000000L
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-specs",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":2,
         |"current-schema-id":0,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"}]}],
         |"default-spec-id":1,
         |"partition-specs":[
         |{"spec-id":0,"fields":[]},
         |{"spec-id":1,"fields":[
         | {"name":"lang","transform":"identity","source-id":2,
         |  "field-id":1000}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":$ts0,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}},
         |{"snapshot-id":2,"timestamp-ms":${ts0 + 1000},
         | "manifest-list":"metadata/snap-2.avro",
         | "summary":{"operation":"append"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * A table DECLARING a write order (`sort-orders` order-id 1:
   * identity(doc_id) asc nulls-first, named by
   * `default-sort-order-id`; the unsorted order-id 0 is also listed,
   * as real writers do) whose data MOSTLY honors it: four doc_id
   * quartile files f0..f3 — except the SECOND-smallest doc is planted
   * in f2, so f2's min dips into f0's range and the interval audit
   * must flag f2 (and the f1 it now shadows) as out of order while f0
   * and f3 stay clean. One snapshot, one manifest. Returns
   * per-data-file row counts.
   */
  def writeSortOrderFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val dataDir = new java.io.File(root, "data")
    val metaDir = new java.io.File(root, "metadata")
    dataDir.mkdirs()
    metaDir.mkdirs()
    val n = docs.count()
    require(n >= 8, s"sort-order fixture needs >= 8 docs, got $n")
    // global rank at fixture scale (one-partition window is the cost
    // of a deterministic quartile split)
    val ranked = docs.select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))))
    val assigned = ranked.withColumn("f",
      when(col("rk") === 2, lit(2)) // the planted out-of-order straggler
        .otherwise(floor((col("rk") - 1) * 4 / lit(n)).cast("int")))
    val counts = (0 until 4).map { i =>
      val rel = s"f$i.parquet"
      rel -> FixtureIO.writeSingleParquet(
        assigned.filter(col("f") === i).select("doc_id", "lang")
          .sort("doc_id"),
        new java.io.File(dataDir, rel), dir + s"_sotmp$i")
    }.toMap
    def entry(f: String): org.apache.avro.generic.GenericRecord = {
      val dfSchema = manifestSchema.getField("data_file").schema()
      val df = new org.apache.avro.generic.GenericData.Record(dfSchema)
      df.put("content", 0)
      df.put("file_path", s"data/$f")
      df.put("file_format", "PARQUET")
      df.put("record_count", counts(f))
      df.put("file_size_in_bytes", new java.io.File(dataDir, f).length())
      val e = new org.apache.avro.generic.GenericData.Record(manifestSchema)
      e.put("status", 1)
      e.put("snapshot_id", null)
      e.put("data_file", df)
      e
    }
    writeAvro(new java.io.File(metaDir, "m0.avro"), manifestSchema,
      (0 until 4).map(i => entry(s"f$i.parquet")))
    writeAvro(new java.io.File(metaDir, "snap-1.avro"), manifestListSchema,
      Seq {
        val r = new org.apache.avro.generic.GenericData.Record(manifestListSchema)
        r.put("manifest_path", "metadata/m0.avro")
        r.put("manifest_length", new java.io.File(metaDir, "m0.avro").length())
        r.put("partition_spec_id", 0)
        r.put("content", 0)
        r.put("added_snapshot_id", 1L)
        r.put("added_files_count", 4)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", counts.values.sum)
        r
      })
    val metadataJson =
      s"""{"format-version":2,"table-uuid":"graft-iceberg-sortorder-fixture",
         |"location":"${root.getAbsolutePath}",
         |"current-snapshot-id":1,
         |"current-schema-id":0,
         |"schemas":[
         |{"schema-id":0,"type":"struct","fields":[
         | {"id":1,"name":"doc_id","required":false,"type":"long"},
         | {"id":2,"name":"lang","required":false,"type":"string"}]}],
         |"default-sort-order-id":1,
         |"sort-orders":[
         |{"order-id":0,"fields":[]},
         |{"order-id":1,"fields":[
         | {"transform":"identity","source-id":1,
         |  "direction":"asc","null-order":"nulls-first"}]}],
         |"snapshots":[
         |{"snapshot-id":1,"timestamp-ms":1700000000000,
         | "manifest-list":"metadata/snap-1.avro",
         | "summary":{"operation":"append"}}]}""".stripMargin
    java.nio.file.Files.write(
      new java.io.File(metaDir, "v1.metadata.json").toPath,
      metadataJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.write(
      new java.io.File(metaDir, "version-hint.text").toPath,
      "1".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * The base fixture with SUMMARY METRICS on both snapshots (string
   * values, the spec's rendering): snap 1 declares its true
   * `added-data-files`/`added-records`; snap 2's `added-records` LIES
   * by one — the audit must flag exactly that cell. Returns per-file
   * row counts.
   */
  def writeSummaryFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val mf = new java.io.File(dir, "metadata/v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val rows1 = counts("f0.parquet") + counts("f1.parquet") + counts("f2.parquet")
    val rows2 = counts("f3.parquet") + counts("f4.parquet")
    val m1 = "\"summary\":{\"operation\":\"append\"}"
    val m2 = "\"summary\":{\"operation\":\"overwrite\"}"
    require(txt.contains(m1) && txt.contains(m2), "fixture summaries changed")
    java.nio.file.Files.write(mf.toPath,
      txt.replace(m1, "\"summary\":{\"operation\":\"append\"," +
          s""""added-data-files":"3","added-records":"$rows1"}""")
        .replace(m2, "\"summary\":{\"operation\":\"overwrite\"," +
          s""""added-data-files":"2","added-records":"${rows2 + 1}"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * The base fixture plus an NDV-bearing STATISTICS file: two REAL
   * compact-theta sketches (exact mode, [[PuffinCodec
   * .encodeThetaSketchExact]]) in `metadata/ndv-2.puffin` —
   *
   *  - fields=[2] (`lang`): the sketch encodes the TRUE distinct lang
   *    count over the current snapshot's data files (f0..f4, the
   *    writer contract), but the declared `ndv` property LIES by +3;
   *  - fields=[1] (`doc_id`): sketch and declared `ndv` agree.
   *
   * The audit must flag exactly the lang row. Returns per-data-file
   * row counts.
   */
  def writeNdvFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    // the current snapshot's data rows: slices 0..4 of the pmod-6 split
    val live = docs.filter(pmod(col("doc_id"), lit(6)) < 5)
    val langNdv = live.select(col("lang")).distinct().count()
    val docNdv = live.select(col("doc_id")).distinct().count()
    val metaDir = new java.io.File(dir, "metadata")
    val stats = new java.io.File(metaDir, "ndv-2.puffin")
    PuffinCodec.writePuffinFile(stats, Seq(
      (PuffinCodec.ThetaV1, Map("ndv" -> (langNdv + 3).toString),
        PuffinCodec.encodeThetaSketchExact(langNdv)),
      (PuffinCodec.ThetaV1, Map("ndv" -> docNdv.toString),
        PuffinCodec.encodeThetaSketchExact(docNdv))),
      snapshotId = 2L, sequenceNumber = 2L,
      fieldsPerBlob = Seq(Seq(2), Seq(1)))
    val mf = new java.io.File(metaDir, "v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"current-snapshot-id\":2,"
    require(txt.contains(marker), s"fixture metadata missing '$marker'")
    val statsJson =
      s""""statistics":[{"snapshot-id":2,
         |"statistics-path":"metadata/ndv-2.puffin",
         |"file-size-in-bytes":${stats.length()},
         |"blob-metadata":[
         |{"type":"apache-datasketches-theta-v1","snapshot-id":2,
         | "sequence-number":2,"fields":[2],
         | "properties":{"ndv":"${langNdv + 3}"}},
         |{"type":"apache-datasketches-theta-v1","snapshot-id":2,
         | "sequence-number":2,"fields":[1],
         | "properties":{"ndv":"$docNdv"}}]}],"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(mf.toPath,
      txt.replace(marker, marker + statsJson)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * The base fixture plus a `refs` map: the `main` branch on the
   * current snapshot, a `v1` tag on the superseded one, and a `stale`
   * tag on an EXPIRED snapshot id (99) — the dangling shape
   * [[refsReport]] must surface. Returns per-data-file row counts.
   */
  def writeRefsFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val mf = new java.io.File(dir, "metadata/v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"current-snapshot-id\":2,"
    require(txt.contains(marker), s"fixture metadata missing '$marker'")
    val refs =
      """"refs":{"main":{"snapshot-id":2,"type":"branch"},""" +
        """"v1":{"snapshot-id":1,"type":"tag"},""" +
        """"stale":{"snapshot-id":99,"type":"tag"}},"""
    java.nio.file.Files.write(mf.toPath,
      txt.replace(marker, marker + refs)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }

  /**
   * The base fixture plus a STATISTICS entry (the spec's Puffin sketch
   * layout): `metadata/stats-2.puffin` carries two blobs — an
   * `apache-datasketches-theta-v1` NDV sketch and a
   * `deletion-vector-v1`-shaped placeholder — both stamped
   * snapshot-id 2; the metadata JSON's `statistics` list declares the
   * file with its `blob-metadata`. Returns per-data-file row counts.
   */
  def writeStatsFixtureTable(
      spark: SparkSession, dir: String, docs: DataFrame): Map[String, Long] = {
    val counts = writeFixtureTable(spark, dir, docs)
    val metaDir = new java.io.File(dir, "metadata")
    val stats = new java.io.File(metaDir, "stats-2.puffin")
    // blob bodies are opaque to the footer layer; deterministic bytes
    val theta = Array.tabulate[Byte](64)(i => (i * 7 + 3).toByte)
    val extra = PuffinCodec.encodeDvBlob(Array(0L))
    PuffinCodec.writePuffinFile(stats, Seq(
      ("apache-datasketches-theta-v1", Map("ndv" -> "42"), theta),
      (PuffinCodec.DeletionVectorV1, Map.empty[String, String], extra)),
      snapshotId = 2L, sequenceNumber = 2L)
    val mf = new java.io.File(metaDir, "v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"current-snapshot-id\":2,"
    require(txt.contains(marker), s"fixture metadata missing '$marker'")
    val statsJson =
      s""""statistics":[{"snapshot-id":2,
         |"statistics-path":"metadata/stats-2.puffin",
         |"file-size-in-bytes":${stats.length()},
         |"blob-metadata":[
         |{"type":"apache-datasketches-theta-v1","snapshot-id":2,
         | "sequence-number":2,"fields":[],"properties":{"ndv":"42"}},
         |{"type":"deletion-vector-v1","snapshot-id":2,
         | "sequence-number":2,"fields":[],"properties":{}}]}],"""
        .stripMargin.replace("\n", "")
    java.nio.file.Files.write(mf.toPath,
      txt.replace(marker, marker + statsJson)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    counts
  }
}
