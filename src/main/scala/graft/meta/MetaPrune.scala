package graft.meta

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Decode a plain-encoded signed integer statistic. */
  private[meta] def decodeLong(bytes: Array[Byte], parquetType: String): Option[Long] =
    parquetType match {
      case "INT32" if bytes.length >= 4 =>
        Some(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong)
      case "INT64" if bytes.length >= 8 =>
        Some(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong)
      case _ => None
    }

  /** Whether a reconstructed parquet schema string declares ANY unsigned
    * integer column. Signed decoding of unsigned stats is unsound (an
    * unsigned max can read as a negative signed value and wrongly exclude
    * a file), and the pinned column-level schema exposes only the physical
    * type — so any unsigned declaration disables pruning for that file.
    * Covers both parquet-mr renderings: legacy converted types (`UINT_32`)
    * and logical annotations (`INTEGER(32,false)`). */
  private[meta] def hasUnsigned(schema: String): Boolean =
    schema.contains("UINT_") || raw"INTEGER\(\d+,\s*false\)".r.findFirstIn(schema).isDefined

  /**
   * Data-file paths under `path` whose chunk statistics for `column` admit
   * values in `[lo, hi]` (plus files where that cannot be ruled out:
   * missing stats, absent column, or an unsigned schema).
   */
  def filesInRange(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): Seq[String] = {
    val chunks = spark.read.format("metadata").option("level", "column")
      .load(path)
      .filter(col("path") === column)
      .select(col("filepath"), col("type"),
        col("statistics.min_value").as("mn"), col("statistics.max_value").as("mx"))
      .collect()
      .map { r =>
        val tpe = r.getString(1)
        val mn = Option(r.getAs[Array[Byte]]("mn")).flatMap(decodeLong(_, tpe))
        val mx = Option(r.getAs[Array[Byte]]("mx")).flatMap(decodeLong(_, tpe))
        (r.getString(0), mn, mx)
      }
    val byFile = chunks.groupBy(_._1)
    // One parquet-file-level pass serves both soundness guards: the full
    // file list (schema drift — a file lacking the column is kept) and the
    // schema string (unsigned columns disable pruning for that file). The
    // footers were just decoded by the column scan, so with the default
    // footer cache this pass is memory lookups, not re-reads.
    val fileSchemas = spark.read.format("metadata").option("level", "file")
      .load(path).select(col("filepath"), col("schema")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val withColumn = byFile.collect {
      case (file, cs) =>
        val unsignedRisk = fileSchemas.get(file).flatten.forall(hasUnsigned)
        val admits = unsignedRisk || cs.exists {
          case (_, Some(mn), Some(mx)) => mx >= lo && mn <= hi
          case _ => true // missing stats: cannot rule the chunk out
        }
        file -> admits
    }
    val noColumn = fileSchemas.keys.filterNot(byFile.contains)
    (withColumn.collect { case (f, true) => f } ++ noColumn).toSeq.sorted
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
