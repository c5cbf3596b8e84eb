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

  /**
   * ROW-GROUP-granular skip report for a long-range predicate — one
   * level finer than [[stripeSkipReport]], from the `orc-rowindex`
   * metadata level (per-10k-row index entries, the exact structure
   * ORC's reader consults before decoding a row group). Fully
   * DECLARATIVE: a filter + groupBy over the rowindex scan, no typed
   * map. Per file: `n_groups_total`, `n_groups_needed`, `rows_total`,
   * `rows_covered`. Soundness: an entry with missing long bounds stays
   * needed; a file written without the index contributes zero entries
   * (callers treat it as all-needed via the stripe report).
   */
  def rowIndexSkipReport(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val admit = col("min_long").isNull || col("max_long").isNull ||
      (col("max_long") >= lo && col("min_long") <= hi)
    spark.read.format("metadata")
      .option("level", "rowindex").option("source", "orc").load(path)
      .filter(col("path") === column)
      .groupBy(col("filepath"))
      .agg(count(lit(1)).cast("long").as("n_groups_total"),
        sum(when(admit, 1L).otherwise(0L)).cast("long").as("n_groups_needed"),
        sum(col("num_rows")).cast("long").as("rows_total"),
        sum(when(admit, col("num_rows")).otherwise(0L))
          .cast("long").as("rows_covered"))
  }

  /**
   * BLOOM-granular skip report for a point/IN probe: per (file), how
   * many row groups a reader consulting BOTH the row-group statistics
   * and the bloom filter streams must decode for `column IN (probes)`.
   * Admission mirrors the ORC reader's own SARG evaluation — a group is
   * needed iff its stats range admits SOME probe AND its bloom filter
   * might contain SOME probe; missing evidence (no index, no bloom,
   * untyped stats) keeps the group. The bloom streams are decoded
   * through orc-core's own `BloomFilterIO` (no false negatives by
   * construction). Executor-side per-file tail+index reads via a typed
   * map (the stripe-report pattern); output is metadata-scale.
   */
  def bloomSkipReport(
      spark: SparkSession, path: String, column: String,
      probes: Seq[Long]): DataFrame = {
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
          val stride = reader.getRowIndexStride
          var total = 0L
          var needed = 0L
          var covered = 0L
          if (stride <= 0 || colId < 0) {
            // no index or no column: every row is needed
            total = 0L
            needed = 0L
            covered = reader.getNumberOfRows
          } else {
            val sarg = new Array[Boolean](schema.getMaximumId + 1)
            sarg(colId) = true
            val rr = reader.rows()
              .asInstanceOf[org.apache.orc.impl.RecordReaderImpl]
            try {
              val defaultEncoding = org.apache.orc.OrcProto.ColumnEncoding
                .newBuilder()
                .setKind(org.apache.orc.OrcProto.ColumnEncoding.Kind.DIRECT)
                .build()
              reader.getStripes.asScala.toSeq.zipWithIndex.foreach { case (s, si) =>
                val idx = rr.readRowIndex(si, null, sarg)
                val ri = idx.getRowGroupIndex()(colId)
                val bfi = idx.getBloomFilterIndex()(colId)
                val kind = idx.getBloomFilterKinds()(colId)
                val nGroups = ((s.getNumberOfRows + stride - 1) / stride).toInt
                (0 until nGroups).foreach { e =>
                  total += 1
                  val rows =
                    if (e == nGroups - 1) s.getNumberOfRows - e.toLong * stride
                    else stride.toLong
                  val statsAdmit =
                    if (ri == null || e >= ri.getEntryCount) true
                    else org.apache.orc.impl.ColumnStatisticsImpl.deserialize(
                      schema.findSubtype(colId),
                      ri.getEntry(e).getStatistics) match {
                      case ic: org.apache.orc.IntegerColumnStatistics =>
                        probes.exists(v =>
                          ic.getMinimum <= v && v <= ic.getMaximum)
                      case _ => true
                    }
                  val bloomAdmit =
                    if (!statsAdmit) true // short-circuit; stats already drop it
                    else if (bfi == null || e >= bfi.getBloomFilterCount) true
                    else {
                      val bf = org.apache.orc.util.BloomFilterIO.deserialize(
                        kind, defaultEncoding, reader.getWriterVersion,
                        schema.findSubtype(colId).getCategory,
                        bfi.getBloomFilter(e))
                      if (bf == null) true else probes.exists(bf.testLong)
                    }
                  if (statsAdmit && bloomAdmit) { needed += 1; covered += rows }
                }
              }
            } finally {
              rr.close()
            }
          }
          (fp, total, needed, reader.getNumberOfRows, covered)
        } finally {
          reader.close()
        }
      }
      .toDF("filepath", "n_groups_total", "n_groups_needed",
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
