package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Stats-driven FILE pruning for ORC tables — the [[MetaPrune]] story
 * replayed through the `orc-column` metadata level: the footer's typed
 * min/max decide which files a range predicate can possibly touch, the
 * surviving paths feed a normal `spark.read.orc`, and Catalyst still
 * pushes the predicate into those files' stripes. Soundness contract
 * identical to the parquet side: missing statistics (or a file lacking
 * the column — schema drift) KEEP the file; pruning only ever drops
 * certain-impossible files. The probe runs executor-side; the driver
 * collects surviving paths only.
 */
object OrcPrune {

  /** Files whose `column` [min, max] intersects `[lo, hi]` — plus every
    * file the stats cannot judge. */
  def filesInRange(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): Seq[String] = {
    val cols = spark.read.format("metadata")
      .option("level", "column").option("source", "orc").load(path)
    val admits = cols.filter(col("path") === column)
      .groupBy(col("filepath"))
      .agg(max(col("min_long").isNull || col("max_long").isNull ||
        (col("max_long") >= lo && col("min_long") <= hi)).as("adm"))
    // a file without the column at all (schema drift) never appears in
    // `admits`; the left join's null keeps it — missing evidence is
    // never permission to drop
    spark.read.format("metadata")
      .option("level", "file").option("source", "orc").load(path)
      .select(col("filepath"))
      .join(admits, Seq("filepath"), "left")
      .filter(col("adm").isNull || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Read only the files a range predicate on `column` can touch. The
    * predicate itself is NOT applied — callers compose it, and Catalyst
    * additionally pushes it into the surviving files' stripes. */
  def readPrunedLong(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val files = filesInRange(spark, path, column, lo, hi)
    if (files.isEmpty) {
      spark.read.orc(path).limit(0)
    } else {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val reader =
        if (fs.getFileStatus(fs.makeQualified(p)).isDirectory) {
          spark.read.option("basePath", path)
        } else {
          spark.read
        }
      reader.orc(files: _*)
    }
  }
}
