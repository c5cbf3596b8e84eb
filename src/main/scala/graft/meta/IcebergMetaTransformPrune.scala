package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IcebergTransformHash

/**
 * TRANSFORM-aware partition pruning — the prune Iceberg planners apply
 * to tables partitioned by `bucket[N]` / `truncate[W]` / `day`
 * (reference scope: the reference explores file metadata for parquet
 * only, `/root/reference/src/main/scala/com/github/sadikovi/metadata/
 * DefaultSource.scala:20-60`; this tier extends the same
 * metadata-level planning to Iceberg's transformed partition tuples).
 * Every file's manifest entry carries its partition TUPLE (spec r102);
 * for a transformed field the tuple holds `transform(source_column)`,
 * so a probe on the SOURCE column prunes by applying the same
 * transform to the probe driver-side and comparing tuple values —
 * zero footer or data I/O, one distributed manifest walk. A file with
 * no value for the field survives (no evidence never prunes).
 */
private[meta] trait IcebergMetaTransformPrune extends Serializable {
  this: IcebergMeta.type =>

  /** The DEFAULT spec's partition field applying `transform` (matched
    * by regex) to `column`: `(partition_field_name, regex groups)`.
    * Refuses when the column is unknown or no default-spec field
    * carries the transform — with nothing to prune on, an
    * all-survives report reads as evidence when it is vacuous. */
  private def transformField(
      spark: SparkSession, table: String, column: String,
      transformRe: scala.util.matching.Regex,
      wantTypes: Set[String], transformName: String): (String, Seq[String], String) = {
    val (_, _, mf, node) = currentMetadataNode(spark, table)
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
          s"${wantTypes.toSeq.sorted.mkString("/")} sources prune " +
          s"through $transformName; transforming another type's probe " +
          "would mis-prune")
    }
    import scala.jdk.CollectionConverters._
    val defaultSpec = Option(node.get("default-spec-id")).map(_.asInt())
      .getOrElse(throw new IllegalArgumentException(
        s"$table: no default-spec-id — cannot resolve the write spec"))
    val specFields = Option(node.get("partition-specs"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
      .find(sp => req(sp, "spec-id", mf).asInt() == defaultSpec)
      .map(sp => Option(sp.get("fields"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty))
      .getOrElse(throw new IllegalArgumentException(
        s"$table: default spec $defaultSpec is not declared in " +
          "partition-specs"))
    specFields.collectFirst {
      case f if req(f, "source-id", mf).asInt() == fieldId &&
        transformRe.findFirstMatchIn(req(f, "transform", mf).asText())
          .isDefined =>
        val m = transformRe
          .findFirstMatchIn(req(f, "transform", mf).asText()).get
        (req(f, "name", mf).asText(),
          (1 to m.groupCount).map(m.group), tpe)
    }.getOrElse(throw new IllegalArgumentException(
      s"$table: the default partition spec declares no " +
        s"$transformName($column) field (declared: " +
        specFields.map(f => req(f, "transform", mf).asText() +
          "(" + req(f, "source-id", mf).asInt() + ")")
          .mkString(", ") + ") — nothing to prune on"))
  }

  /** Live data files of the current snapshot with the partition
    * tuple's value for `field` — one row per file. A file listed in
    * several manifests (added in one, existing in a rewritten one)
    * carries the SAME partition tuple in both (the tuple is intrinsic
    * to the file), so first-per-path dedup is deterministic. */
  private def partitionValueByFile(
      spark: SparkSession, table: String, field: String): DataFrame =
    filesAt(spark, table, None)
      .filter(col("status") =!= 2 && col("content") === 0)
      .groupBy(col("abs_path").as("data_path"))
      .agg(first(col("partition_values").getItem(field), ignoreNulls = true)
        .as("part_value"))

  /**
   * `bucket[N]` equality-probe pruning: which live files can hold
   * `column = value`? The probe's bucket is computed driver-side with
   * the spec's Appendix-B hash ([[graft.functions.IcebergTransformHash]],
   * vector-pinned); a file survives iff its tuple's bucket matches —
   * or carries no value (no evidence). One row per live data file:
   * `(data_path, part_bucket, survives)`.
   */
  def bucketPrune(
      spark: SparkSession, table: String, column: String,
      value: Any): DataFrame = {
    val (field, groups, tpe) = transformField(
      spark, table, column, """^bucket\[(\d+)\]$""".r,
      Set("int", "long", "string"), "bucket")
    val n = groups.head.toInt
    val expected = (tpe, value) match {
      case ("string", s: String) => IcebergTransformHash.bucketString(s, n)
      case ("string", other) => throw new IllegalArgumentException(
        s"$table: '$column' is a string — probe with a String, got " +
          s"${other.getClass.getSimpleName}")
      case (_, v: Long) => IcebergTransformHash.bucketLong(v, n)
      case (_, v: Int) => IcebergTransformHash.bucketLong(v.toLong, n)
      case (_, other) => throw new IllegalArgumentException(
        s"$table: '$column' is $tpe — probe with a Long, got " +
          s"${other.getClass.getSimpleName}")
    }
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        col("part_value").cast("int").as("part_bucket"),
        (col("part_value").isNull ||
          col("part_value").cast("int") === expected).as("survives"))
  }

  /**
   * `truncate[W]` range pruning on an int/long source: which live
   * files can hold `column ∈ [lo, hi]`? Truncate is monotone
   * (floor-to-multiple-of-W), so a file whose tuple value `t`
   * satisfies `truncate(lo) <= t <= truncate(hi)` can hold in-range
   * rows and anything outside provably cannot. One row per live data
   * file: `(data_path, part_trunc, survives)`.
   */
  def truncatePrune(
      spark: SparkSession, table: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val (field, groups, _) = transformField(
      spark, table, column, """^truncate\[(\d+)\]$""".r,
      Set("int", "long"), "truncate")
    val w = groups.head.toLong
    val tLo = IcebergTransformHash.truncateLong(lo, w)
    val tHi = IcebergTransformHash.truncateLong(hi, w)
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        col("part_value").cast("long").as("part_trunc"),
        (col("part_value").isNull ||
          col("part_value").cast("long").between(tLo, tHi))
          .as("survives"))
  }

  /**
   * `day` range pruning on a timestamp source: which live files can
   * hold `column`'s DATE in `[lo, hi]` (ISO dates)? The tuple value is
   * the spec's epoch-days int. Accepts the spec's `day` spelling and
   * the legacy `days` some writers emit. One row per live data file:
   * `(data_path, part_day, survives)` with the day surfaced as a real
   * DATE.
   */
  def daysPrune(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val (field, _, _) = transformField(
      spark, table, column, """^days?$""".r,
      Set("timestamp", "timestamptz"), "day")
    val loD = java.time.LocalDate.parse(lo).toEpochDay
    val hiD = java.time.LocalDate.parse(hi).toEpochDay
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        date_from_unix_date(col("part_value").cast("int")).as("part_day"),
        (col("part_value").isNull ||
          col("part_value").cast("long").between(loD, hiD))
          .as("survives"))
  }

  /**
   * `hour` range pruning on a timestamp source — the transform
   * hour-partitioned event/CDC tables actually use: tuple values are
   * the spec's hours-since-epoch int (Appendix A), the same epoch
   * arithmetic as `day` one unit down. Probes are ISO local
   * date-times read as UTC (the spec's `hour` is defined on the UTC
   * epoch). Accepts `hour`/`hours` spellings. One row per live data
   * file: `(data_path, part_hour, survives)` with the tuple surfaced
   * as a real timestamp.
   */
  def hoursPrune(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val (field, _, _) = transformField(
      spark, table, column, """^hours?$""".r,
      Set("timestamp", "timestamptz"), "hour")
    // floorDiv, not /: the spec's hour transform floors toward
    // negative infinity, and truncating division would round a
    // pre-1970 non-aligned probe boundary UP one hour (r17 ADVICE)
    def hoursOf(iso: String): Long =
      Math.floorDiv(java.time.LocalDateTime.parse(iso)
        .toEpochSecond(java.time.ZoneOffset.UTC), 3600L)
    val (loH, hiH) = (hoursOf(lo), hoursOf(hi))
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        timestamp_seconds(col("part_value").cast("long") * 3600L)
          .as("part_hour"),
        (col("part_value").isNull ||
          col("part_value").cast("long").between(loH, hiH))
          .as("survives"))
  }

  /**
   * `month` range pruning on a timestamp source: tuple values are the
   * spec's months-since-epoch int (`(year-1970)*12 + month-1`).
   * Accepts `month`/`months` spellings. One row per live data file:
   * `(data_path, part_month, survives)` with the month surfaced as
   * the range's first day.
   */
  def monthsPrune(
      spark: SparkSession, table: String, column: String,
      lo: String, hi: String): DataFrame = {
    val (field, _, _) = transformField(
      spark, table, column, """^months?$""".r,
      Set("timestamp", "timestamptz", "date"), "month")
    def monthsOf(iso: String): Long = {
      val d = java.time.LocalDate.parse(iso)
      (d.getYear - 1970).toLong * 12 + (d.getMonthValue - 1)
    }
    val (loM, hiM) = (monthsOf(lo), monthsOf(hi))
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        to_date(concat(
          (floor(col("part_value").cast("long") / 12) + 1970)
            .cast("int").cast("string"), lit("-"),
          lpad((pmod(col("part_value").cast("long"), lit(12L)) + 1)
            .cast("string"), 2, "0"), lit("-01"))).as("part_month"),
        (col("part_value").isNull ||
          col("part_value").cast("long").between(loM, hiM))
          .as("survives"))
  }

  /**
   * `year` range pruning on a timestamp/date source: tuple values are
   * the spec's years-since-epoch int. Accepts `year`/`years`. One row
   * per live data file: `(data_path, part_year, survives)` with the
   * tuple surfaced as the calendar year.
   */
  def yearsPrune(
      spark: SparkSession, table: String, column: String,
      loYear: Int, hiYear: Int): DataFrame = {
    val (field, _, _) = transformField(
      spark, table, column, """^years?$""".r,
      Set("timestamp", "timestamptz", "date"), "year")
    partitionValueByFile(spark, table, field)
      .select(col("data_path"),
        (col("part_value").cast("long") + 1970).cast("int").as("part_year"),
        (col("part_value").isNull ||
          col("part_value").cast("long")
            .between(loYear - 1970L, hiYear - 1970L)).as("survives"))
  }

  /**
   * The EXECUTABLE form of [[bucketPrune]]: plan the survivors from
   * manifests, scan ONLY them, and let Catalyst push the residual
   * equality into their row groups — the answer must equal a
   * full-scan filter. The surviving-path collect is the same bounded
   * driver boundary as [[readBoundsPruned]] (path-list-sized).
   */
  def readBucketPruned(
      spark: SparkSession, table: String, column: String,
      value: Any): DataFrame = {
    val plan = bucketPrune(spark, table, column, value)
      .select(col("data_path"), col("survives")).collect()
    val surviving = plan.filter(_.getBoolean(1)).map(_.getString(0)).toSeq
    if (surviving.nonEmpty) {
      spark.read.parquet(surviving: _*)
    } else {
      val all = plan.map(_.getString(0)).toSeq
      if (all.isEmpty) {
        throw new IllegalArgumentException(
          s"$table: no live data files — nothing to read, and no " +
            "schema to preserve an empty result with")
      }
      spark.read.parquet(all: _*).limit(0)
    }
  }
}
