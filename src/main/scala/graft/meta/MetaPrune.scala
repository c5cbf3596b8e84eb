package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Stats-driven data-file pruning: the metadata source put to work on the
 * DATA it describes. A numeric range predicate is evaluated against every
 * column chunk's `min_value`/`max_value` statistics (read from footers
 * only — no data pages touched), and the data scan then opens ONLY the
 * files whose ranges may intersect. At 100 TB this is the difference
 * between listing+scanning a full table and scanning the few files a
 * selective predicate actually needs, using exactly the per-file metadata
 * scan that already parallelizes across the cluster.
 *
 * Semantics are conservative (sound, never lossy): a file is kept when ANY
 * of its chunks' ranges intersects `[lo, hi]`, when a chunk lacks
 * statistics, or when the column is absent — missing evidence never drops
 * a file. The caller re-applies the predicate on the surviving rows, so
 * pruning only removes I/O, never rows.
 *
 * Statistics bytes are the writer's plain little-endian encodings (the
 * raw form the metadata schema deliberately preserves); INT32/INT64 are
 * supported here — the types range predicates target in practice.
 */
object MetaPrune {

  /** Decode a plain-encoded signed integer statistic (driver-side view of
    * the [[graft.functions.PlainStatLong]] executor expression). */
  private[meta] def decodeLong(bytes: Array[Byte], parquetType: String): Option[Long] =
    Option(graft.functions.PlainStatLong.compute(bytes,
      org.apache.spark.unsafe.types.UTF8String.fromString(parquetType))).map(_.longValue())

  /** The two parquet-mr unsigned renderings — legacy converted types
    * (`UINT_32`) and logical annotations (`INTEGER(32,false)`) — shared by
    * the driver-side [[hasUnsigned]] and the executor-side Column guard in
    * [[filesInRange]]: ONE definition, so the spec that pins one pins
    * both. */
  private[meta] val UnsignedSubstring = "UINT_"
  private[meta] val UnsignedRegex = "INTEGER\\(\\d+,\\s*false\\)"

  /** Whether a reconstructed parquet schema string declares ANY unsigned
    * integer column. Signed decoding of unsigned stats is unsound (an
    * unsigned max can read as a negative signed value and wrongly exclude
    * a file), and the pinned column-level schema exposes only the physical
    * type — so any unsigned declaration disables pruning for that file. */
  private[meta] def hasUnsigned(schema: String): Boolean =
    schema.contains(UnsignedSubstring) || UnsignedRegex.r.findFirstIn(schema).isDefined

  /**
   * Data-file paths under `path` whose chunk statistics for `column` admit
   * values in `[lo, hi]` (plus files where that cannot be ruled out:
   * missing stats, absent column, or an unsigned schema).
   */
  def filesInRange(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): Seq[String] = {
    // Per-chunk range evaluation runs EXECUTOR-side (codegen
    // PlainStatLong decode + one boolean per chunk), then collapses to one
    // row per file with a map-side-combined max: the driver receives
    // surviving file paths only — never chunk stat bytes or schema
    // strings, which at a million-file table would be GBs of driver heap.
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val chunkAdmits = spark.read.format("metadata").option("level", "column")
      .load(path)
      .filter(col("path") === column)
      .select(col("filepath"),
        decode(col("statistics.min_value")).as("mn"),
        decode(col("statistics.max_value")).as("mx"))
      // missing/undecodable stats: cannot rule the chunk out
      .select(col("filepath"), (col("mn").isNull || col("mx").isNull ||
        (col("mx") >= lo && col("mn") <= hi)).as("adm"))
      .groupBy(col("filepath")).agg(max(col("adm")).as("adm"))
    // One parquet-file-level pass serves both soundness guards: the full
    // file list (schema drift — a file lacking the column is kept, via the
    // left join's null `adm`) and the unsigned check (signed decoding of
    // unsigned stats is unsound, so any unsigned declaration — or a
    // missing schema — keeps the file). The footers were just decoded by
    // the column scan, so with the default footer cache this pass is
    // memory lookups, not re-reads.
    val unsignedRisk = col("schema").isNull ||
      col("schema").contains(UnsignedSubstring) ||
      col("schema").rlike(UnsignedRegex)
    spark.read.format("metadata").option("level", "file")
      .load(path).select(col("filepath"), unsignedRisk.as("risk"))
      .join(chunkAdmits, Seq("filepath"), "left")
      .filter(col("risk") || col("adm").isNull || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Read only the files a range predicate on `column` can touch. The
    * predicate itself is NOT applied — callers compose it, and Catalyst
    * additionally pushes it into the surviving files' row groups. */
  def readPruned(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val files = filesInRange(spark, path, column, lo, hi)
    if (files.isEmpty) {
      // preserve schema with an empty relation over the full listing
      spark.read.parquet(path).limit(0)
    } else {
      // basePath keeps Hive partition-column discovery working when leaf
      // files are listed explicitly — both branches and the full scan must
      // agree on schema. Only directories are legal basePaths; a
      // single-file root has no partition columns to preserve.
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val reader =
        if (fs.getFileStatus(fs.makeQualified(p)).isDirectory) {
          spark.read.option("basePath", path)
        } else {
          spark.read
        }
      reader.parquet(files: _*)
    }
  }
}
