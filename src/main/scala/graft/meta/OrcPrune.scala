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

  /** [[filesInRange]] for a STRING column: the orc-column level's
    * string bounds against the probe's lexicographic range; same
    * soundness (missing stats or column keep the file). */
  def filesInStringRange(
      spark: SparkSession, path: String, column: String,
      lo: String, hi: String): Seq[String] = {
    val cols = spark.read.format("metadata")
      .option("level", "column").option("source", "orc").load(path)
    val admits = cols.filter(col("path") === column)
      .groupBy(col("filepath"))
      .agg(max(col("min_string").isNull || col("max_string").isNull ||
        (col("max_string") >= lo && col("min_string") <= hi)).as("adm"))
    spark.read.format("metadata")
      .option("level", "file").option("source", "orc").load(path)
      .select(col("filepath"))
      .join(admits, Seq("filepath"), "left")
      .filter(col("adm").isNull || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /**
   * STRIPE-skip report for a long-range predicate — the ORC sibling of
   * the parquet page-skip report: per (file), how many stripes and rows
   * a stripe-statistics-aware reader must touch for `column IN [lo,
   * hi]`, decoded from the file tail's per-stripe column statistics
   * (`Reader.getStripeStatistics` — the structure ORC's own predicate
   * pushdown consults). One row per file: `n_stripes_total`,
   * `n_stripes_needed`, `rows_total`, `rows_covered`. Soundness:
   * a stripe whose statistics are missing or untyped stays needed.
   * Runs executor-side via a typed flatMap over the file listing
   * (per-file tail reads, metadata-scale rows).
   */
  def stripeSkipReport(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    spark.read.format("metadata")
      .option("level", "file").option("source", "orc").load(path)
      .select(col("filepath")).as[String]
      .map { fp =>
        val p = new org.apache.hadoop.fs.Path(fp)
        val reader = org.apache.orc.OrcFile.createReader(
          p, org.apache.orc.OrcFile.readerOptions(conf.value))
        try {
          import scala.jdk.CollectionConverters._
          val schema = reader.getSchema
          val colId = schema.getFieldNames.asScala.indexOf(column) match {
            case -1 => -1
            case i => schema.getChildren.get(i).getId
          }
          val stripes = reader.getStripes.asScala.toSeq
          val stats = reader.getStripeStatistics.asScala.toSeq
          var needed = 0
          var covered = 0L
          stripes.zipWithIndex.foreach { case (s, i) =>
            val admit =
              if (colId < 0 || i >= stats.length) true // no evidence: keep
              else stats(i).getColumnStatistics()(colId) match {
                case ic: org.apache.orc.IntegerColumnStatistics =>
                  ic.getMaximum >= lo && ic.getMinimum <= hi
                case _ => true
              }
            if (admit) { needed += 1; covered += s.getNumberOfRows }
          }
          (fp, stripes.length, needed, reader.getNumberOfRows, covered)
        } finally reader.close()
      }
      .toDF("filepath", "n_stripes_total", "n_stripes_needed",
        "rows_total", "rows_covered")
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
