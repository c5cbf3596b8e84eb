package graft.meta

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * One single-column predicate of a multi-column pruned read
 * ([[MetaPrune.readPrunedWhere]]): the declarative form from which both
 * the per-row-group stats check and (for equalities) the per-file bloom
 * probe are derived.
 */
sealed trait PrunePred { def column: String }
/** `column BETWEEN lo AND hi` over an INT32/INT64 column. */
case class LongRangePred(column: String, lo: Long, hi: Long) extends PrunePred
/** `column BETWEEN lo AND hi` over a DATE column (INT32 epoch days). */
case class DateRangePred(column: String,
    lo: java.time.LocalDate, hi: java.time.LocalDate) extends PrunePred
/** `column BETWEEN lo AND hi` over a FLOAT/DOUBLE column (NaN-safe). */
case class DoubleRangePred(column: String, lo: Double, hi: Double) extends PrunePred
/** `column = value` over an INT64 column (stats range + bloom probe). */
case class EqLongPred(column: String, value: Long) extends PrunePred
/** `column = value` over an INT32 column (4-byte plain bloom hashing). */
case class EqIntPred(column: String, value: Int) extends PrunePred
/** `column = value` over a DOUBLE column (±0.0-aware bloom probe). */
case class EqDoublePred(column: String, value: Double) extends PrunePred
/** `column = value` over a UTF8 column (stats byte range + bloom probe). */
case class EqStringPred(column: String, value: String) extends PrunePred

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
   * Shared survivor pass: evaluate `chunkAdmits` (a boolean expression
   * over the column-level metadata row — `statistics.*`, `type`) on every
   * chunk of `column` EXECUTOR-side, collapse to one boolean per file with
   * a map-side-combined max, and keep a file when any chunk admits, when
   * the column is absent, or when the schema declares unsigned integers.
   * The driver receives surviving file paths only — never chunk stat bytes
   * or schema strings, which at a million-file table would be GBs of
   * driver heap.
   */
  private def survivingFiles(
      spark: SparkSession, path: String, column: String,
      chunkAdmits: Column): Seq[String] = {
    val perFile = spark.read.format("metadata").option("level", "column")
      .load(path)
      .filter(col("path") === column)
      .select(col("filepath"), chunkAdmits.as("adm"))
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
      .join(perFile, Seq("filepath"), "left")
      .filter(col("risk") || col("adm").isNull || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /**
   * Data-file paths under `path` whose chunk statistics for `column` admit
   * values in `[lo, hi]` (plus files where that cannot be ruled out:
   * missing stats, absent column, or an unsigned schema).
   */
  def filesInRange(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): Seq[String] = {
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    // missing/undecodable stats: cannot rule the chunk out
    survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || (mx >= lo && mn <= hi))
  }

  /**
   * [[filesInRange]] for a DATE column: parquet stores DATE as INT32
   * days-since-epoch (format spec `logical_types.md`), and the epoch-day
   * mapping is monotone, so date bounds prune through exactly the signed
   * integer machinery — the first predicate a real user writes, at zero
   * extra decode cost.
   */
  def filesInDateRange(
      spark: SparkSession, path: String, column: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate): Seq[String] =
    filesInRange(spark, path, column, lo.toEpochDay, hi.toEpochDay)

  /**
   * [[filesInRange]] for a DECIMAL column, bounds given as UNSCALED values
   * at the column's declared scale (e.g. scale 2: 12.34 -> 1234): decimals
   * ride INT32/INT64 little-endian or FIXED_LEN_BYTE_ARRAY/BINARY
   * big-endian two's complement depending on precision, and
   * [[graft.functions.PlainStatUnscaled]] decodes all four; a value too
   * wide for a long decodes null and keeps the file (sound).
   */
  def filesInUnscaledRange(
      spark: SparkSession, path: String, column: String,
      loUnscaled: Long, hiUnscaled: Long): Seq[String] = {
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatUnscaled(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || (mx >= loUnscaled && mn <= hiUnscaled))
  }

  /**
   * [[filesInRange]] for a FLOAT/DOUBLE column. Floating-point stats need
   * two extra soundness guards integer stats do not: a NaN bound keeps the
   * file (NaN compares false against everything, which would otherwise
   * silently drop it), and ±0.0 needs no care — Spark's comparisons treat
   * them as equal, matching the format spec's advice that writers widen
   * zero bounds to both signs.
   */
  def filesInDoubleRange(
      spark: SparkSession, path: String, column: String,
      lo: Double, hi: Double): Seq[String] = {
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatDouble(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || isnan(mn) || isnan(mx) ||
        (mx >= lo && mn <= hi))
  }

  /**
   * Data-file paths whose chunk statistics for a string/binary `column`
   * admit a value in `[lo, hiExclusive)` under unsigned lexicographic byte
   * order — the order parquet's typed `min_value`/`max_value` use for
   * UTF8/BINARY columns, and the order Spark's own BinaryType comparison
   * implements, so the whole check is built-in codegen comparisons on the
   * raw stat bytes: no decode expression at all. `hiExclusive = None`
   * means unbounded above. Chunks whose physical type is not BYTE_ARRAY
   * (the Thrift enum rendering the column level pins) are kept (a string
   * predicate against a non-string column is evidence of nothing);
   * writer-truncated stats stay sound because truncation only ever widens
   * the [min, max] the writer publishes.
   */
  def filesInStringRange(
      spark: SparkSession, path: String, column: String,
      lo: Array[Byte], hiExclusive: Option[Array[Byte]]): Seq[String] = {
    val mn = col("statistics.min_value")
    val mx = col("statistics.max_value")
    val upper = hiExclusive.map(h => mn < lit(h)).getOrElse(lit(true))
    survivingFiles(spark, path, column,
      col("type") =!= "BYTE_ARRAY" || mn.isNull || mx.isNull ||
        (mx >= lit(lo) && upper))
  }

  /** The least byte string strictly greater than every string with prefix
    * `p`: strip trailing 0xFF bytes, increment the last remaining one;
    * all-0xFF prefixes have no upper bound. */
  private[meta] def nextPrefix(p: Array[Byte]): Option[Array[Byte]] = {
    var n = p.length
    while (n > 0 && p(n - 1) == 0xFF.toByte) n -= 1
    if (n == 0) None
    else {
      val out = java.util.Arrays.copyOf(p, n)
      out(n - 1) = (out(n - 1) + 1).toByte
      Some(out)
    }
  }

  /** Data-file paths that may hold a string starting with `prefix` —
    * the byte range `[prefix, nextPrefix(prefix))`. */
  def filesWithPrefix(
      spark: SparkSession, path: String, column: String,
      prefix: String): Seq[String] = {
    val p = prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    filesInStringRange(spark, path, column, p, nextPrefix(p))
  }

  /**
   * Data-file paths whose BLOOM FILTERS for `column` may contain the
   * probe value hashed as `hash` — certain absence (the split-block
   * filter's no-false-negative guarantee) drops the file; everything
   * else keeps it. Soundness guards, each of which KEEPS a file:
   * a chunk whose physical type differs from `physType` (the hash is an
   * encoding of a typed plain value — a mismatched type is evidence of
   * nothing), a non-BLOCK/non-XXHASH/compressed filter (unprobeable), a
   * row group without a filter (writers default them off and skip fully
   * dictionary-encoded chunks), an absent column, and a file with no
   * filters at all. Probes run EXECUTOR-side via the codegen
   * [[graft.functions.SbbfMightContain]] over the `bloomfilter`
   * metadata level; like the stat pruning, the driver sees surviving
   * paths only — never bitsets.
   */
  private def filesMayContainHash(
      spark: SparkSession, path: String, column: String,
      hash: Long, physType: String): Seq[String] = {
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).load(path)
    val probe = ColumnBridge.column(graft.functions.SbbfMightContain(
      ColumnBridge.expression(col("bitset")), ColumnBridge.expression(lit(hash))))
    val bloomAdmits = meta("bloomfilter")
      .filter(col("path") === column)
      .select(col("filepath"),
        (col("type").isNull || col("type") =!= physType ||
          col("algorithm") =!= "BLOCK" || col("hash") =!= "XXHASH" ||
          col("compression") =!= "UNCOMPRESSED" ||
          col("bitset").isNull || probe).as("adm"))
      .groupBy(col("filepath"))
      .agg(max(col("adm")).as("adm"), count(lit(1)).as("n_bloom"))
    // chunk count per file: a row group missing its filter (n_bloom <
    // n_chunks) is unjudgeable, so the file stays
    val chunkCounts = meta("column")
      .filter(col("path") === column)
      .groupBy(col("filepath")).agg(count(lit(1)).as("n_chunks"))
    meta("file").select(col("filepath"))
      .join(chunkCounts, Seq("filepath"), "left")
      .join(bloomAdmits, Seq("filepath"), "left")
      .filter(col("n_chunks").isNull || col("n_bloom").isNull ||
        col("n_bloom") < col("n_chunks") || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** [[filesMayContainHash]] for an INT64 probe value. */
  def filesMayContainLong(
      spark: SparkSession, path: String, column: String, value: Long): Seq[String] =
    filesMayContainHash(spark, path, column, Sbbf.hashLong(value), "INT64")

  /** [[filesMayContainHash]] for an INT32 probe value (parquet hashes
    * the 4-byte little-endian plain encoding — a different hash than the
    * same value as INT64, which is why the physical-type guard exists). */
  def filesMayContainInt(
      spark: SparkSession, path: String, column: String, value: Int): Seq[String] =
    filesMayContainHash(spark, path, column, Sbbf.hashInt(value), "INT32")

  /** [[filesMayContainHash]] for a DOUBLE probe value. SQL equality treats
    * +0.0 and -0.0 as the same value but their plain encodings hash
    * differently, so a zero probe checks BOTH bit patterns — a file whose
    * writer saw only -0.0 must survive a `= 0.0` lookup. A NaN probe keeps
    * every file (NaN = NaN is not an equality any bloom can witness). */
  def filesMayContainDouble(
      spark: SparkSession, path: String, column: String, value: Double): Seq[String] =
    if (value.isNaN) {
      spark.read.format("metadata").option("level", "file").load(path)
        .select(col("filepath")).collect().map(_.getString(0)).toSeq.sorted
    } else if (value == 0.0d) {
      filesMayContainAnyHash(spark, path, column,
        Seq(Sbbf.hashDouble(0.0d), Sbbf.hashDouble(-0.0d)), "DOUBLE")
    } else {
      filesMayContainHash(spark, path, column, Sbbf.hashDouble(value), "DOUBLE")
    }

  /** [[filesMayContainHash]] for a DECIMAL stored as
    * FIXED_LEN_BYTE_ARRAY (precision > 18): probes the unscaled value's
    * `typeLen` big-endian bytes, the exact fixed-width encoding the
    * writer hashed. Same soundness guards as the other types — wrong
    * physical type, missing filter, or unknown algorithm keeps the
    * file. */
  def filesMayContainDecimal(
      spark: SparkSession, path: String, column: String,
      unscaled: Long, typeLen: Int): Seq[String] =
    filesMayContainHash(spark, path, column,
      Sbbf.hashUnscaled(unscaled, typeLen), "FIXED_LEN_BYTE_ARRAY")

  /** [[filesMayContainDouble]] for a FLOAT column (4-byte plain hashing —
    * a different hash than the same value as DOUBLE). */
  def filesMayContainFloat(
      spark: SparkSession, path: String, column: String, value: Float): Seq[String] =
    if (value.isNaN) {
      spark.read.format("metadata").option("level", "file").load(path)
        .select(col("filepath")).collect().map(_.getString(0)).toSeq.sorted
    } else if (value == 0.0f) {
      filesMayContainAnyHash(spark, path, column,
        Seq(Sbbf.hashFloat(0.0f), Sbbf.hashFloat(-0.0f)), "FLOAT")
    } else {
      filesMayContainHash(spark, path, column, Sbbf.hashFloat(value), "FLOAT")
    }

  /** [[filesMayContainHash]] for a UTF8 string probe value. */
  def filesMayContainString(
      spark: SparkSession, path: String, column: String, value: String): Seq[String] =
    filesMayContainHash(spark, path, column,
      Sbbf.hashBytes(value.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      "BYTE_ARRAY")

  /**
   * Data-file paths whose bloom filters may contain ANY of `values` —
   * the batch point-lookup shape (fetch these N keys). ONE metadata
   * pass whatever N is: the probe hashes ride along as an array literal
   * and the per-chunk check is the builtin higher-order EXISTS over the
   * codegen single-hash probe, so per chunk it is N 8-word probes, no
   * join, no second scan. Same soundness guards as the single-value
   * form ([[filesMayContainHash]]).
   */
  def filesMayContainAnyLong(
      spark: SparkSession, path: String, column: String,
      values: Seq[Long]): Seq[String] =
    filesMayContainAnyHash(spark, path, column, values.map(Sbbf.hashLong), "INT64")

  /** [[filesMayContainAnyLong]] for INT32 probe values (4-byte plain
    * hashing — a different hash than the same values as INT64). */
  def filesMayContainAnyInt(
      spark: SparkSession, path: String, column: String,
      values: Seq[Int]): Seq[String] =
    filesMayContainAnyHash(spark, path, column, values.map(Sbbf.hashInt), "INT32")

  /** [[filesMayContainAnyLong]] for DOUBLE probe values; a zero probe
    * expands to both ±0.0 bit patterns, NaN probes keep every file
    * (see [[filesMayContainDouble]]). */
  def filesMayContainAnyDouble(
      spark: SparkSession, path: String, column: String,
      values: Seq[Double]): Seq[String] =
    if (values.exists(_.isNaN)) {
      spark.read.format("metadata").option("level", "file").load(path)
        .select(col("filepath")).collect().map(_.getString(0)).toSeq.sorted
    } else {
      val hashes = values.flatMap { v =>
        if (v == 0.0d) Seq(Sbbf.hashDouble(0.0d), Sbbf.hashDouble(-0.0d))
        else Seq(Sbbf.hashDouble(v))
      }
      filesMayContainAnyHash(spark, path, column, hashes, "DOUBLE")
    }

  /** [[filesMayContainAnyLong]] for UTF8 string probe values. */
  def filesMayContainAnyString(
      spark: SparkSession, path: String, column: String,
      values: Seq[String]): Seq[String] =
    filesMayContainAnyHash(spark, path, column,
      values.map(v => Sbbf.hashBytes(
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8))), "BYTE_ARRAY")

  private def filesMayContainAnyHash(
      spark: SparkSession, path: String, column: String,
      hashSeq: Seq[Long], physType: String): Seq[String] = {
    require(hashSeq.nonEmpty, "empty probe set: nothing can match")
    val hashes = typedLit(hashSeq)
    val probeAny = exists(hashes, h => ColumnBridge.column(
      graft.functions.SbbfMightContain(
        ColumnBridge.expression(col("bitset")), ColumnBridge.expression(h))))
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).load(path)
    val bloomAdmits = meta("bloomfilter")
      .filter(col("path") === column)
      .select(col("filepath"),
        (col("type").isNull || col("type") =!= physType ||
          col("algorithm") =!= "BLOCK" || col("hash") =!= "XXHASH" ||
          col("compression") =!= "UNCOMPRESSED" ||
          col("bitset").isNull || probeAny).as("adm"))
      .groupBy(col("filepath"))
      .agg(max(col("adm")).as("adm"), count(lit(1)).as("n_bloom"))
    val chunkCounts = meta("column")
      .filter(col("path") === column)
      .groupBy(col("filepath")).agg(count(lit(1)).as("n_chunks"))
    meta("file").select(col("filepath"))
      .join(chunkCounts, Seq("filepath"), "left")
      .join(bloomAdmits, Seq("filepath"), "left")
      .filter(col("n_chunks").isNull || col("n_bloom").isNull ||
        col("n_bloom") < col("n_chunks") || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /**
   * Read only the files an IN-list lookup `column IN (values)` can touch:
   * stats admit a file when ANY probe value falls inside a chunk's
   * [min, max] (one metadata pass, EXISTS over the value array), blooms
   * when any probe hash may be present — the two sound lists intersect.
   */
  def readPrunedInLong(
      spark: SparkSession, path: String, column: String,
      values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "empty probe set: nothing can match")
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    val anyInRange = exists(typedLit(values), v => mx >= v && mn <= v)
    val byStats = survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || anyInRange).toSet
    val byBloom = filesMayContainAnyLong(spark, path, column, values).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[filesMayContainAnyLong]] for DECIMAL/FLBA unscaled probes (see
    * [[filesMayContainDecimal]] for the encoding contract). */
  def filesMayContainAnyDecimal(
      spark: SparkSession, path: String, column: String,
      values: Seq[Long], typeLen: Int): Seq[String] =
    filesMayContainAnyHash(spark, path, column,
      values.map(Sbbf.hashUnscaled(_, typeLen)), "FIXED_LEN_BYTE_ARRAY")

  /** [[readPrunedInLong]] for a DECIMAL column stored as
    * FIXED_LEN_BYTE_ARRAY: stats decode through the big-endian unscaled
    * window ([[graft.functions.PlainStatUnscaled]] — null for >64-bit
    * values, which soundly keeps the file), blooms hash the fixed-width
    * encoding. Hash-scattered decimal-id layouts — where every file's
    * [min, max] spans every probe — prune on the bloom side, the
    * finance-shaped selective-lookup case. */
  def readPrunedInDecimal(
      spark: SparkSession, path: String, column: String,
      unscaled: Seq[Long], typeLen: Int): DataFrame = {
    require(unscaled.nonEmpty, "empty probe set: nothing can match")
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatUnscaled(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    val anyInRange = exists(typedLit(unscaled), v => mx >= v && mn <= v)
    val byStats = survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || anyInRange).toSet
    val byBloom =
      filesMayContainAnyDecimal(spark, path, column, unscaled, typeLen).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedInLong]] for string values: stats compare the probe
    * bytes against the raw BYTE_ARRAY min/max under the same unsigned
    * lexicographic order as [[filesInStringRange]] (no decode
    * expression), blooms probe the UTF8 hashes — one metadata pass each,
    * EXISTS over the value/hash array. */
  def readPrunedInString(
      spark: SparkSession, path: String, column: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "empty probe set: nothing can match")
    val bytes = values.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mn = col("statistics.min_value")
    val mx = col("statistics.max_value")
    val anyInRange = exists(typedLit(bytes), v => mx >= v && mn <= v)
    val byStats = survivingFiles(spark, path, column,
      col("type") =!= "BYTE_ARRAY" || mn.isNull || mx.isNull || anyInRange).toSet
    val byBloom = filesMayContainAnyString(spark, path, column, values).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /**
   * Read only the files a point-lookup `column = value` can touch, pruned
   * by BOTH footer min/max statistics and bloom filters — each list is
   * independently sound, so their intersection is. The complementary
   * strengths: range-clustered layouts prune on stats, hash-scattered
   * layouts (where every file's [min, max] spans the probe) prune on
   * blooms — the case selective point reads at 100 TB actually hit.
   */
  def readPrunedEqLong(
      spark: SparkSession, path: String, column: String, value: Long): DataFrame = {
    val byStats = filesInRange(spark, path, column, value, value).toSet
    val byBloom = filesMayContainLong(spark, path, column, value).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedEqLong]] for an INT32 column: the stats side reuses the
    * signed-integer decode (INT32 stats are 4-byte little-endian, already
    * handled), the bloom side hashes the 4-byte plain encoding. */
  def readPrunedEqInt(
      spark: SparkSession, path: String, column: String, value: Int): DataFrame = {
    val byStats = filesInRange(spark, path, column, value.toLong, value.toLong).toSet
    val byBloom = filesMayContainInt(spark, path, column, value).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedInLong]] for INT32 probe values. */
  def readPrunedInInt(
      spark: SparkSession, path: String, column: String,
      values: Seq[Int]): DataFrame = {
    require(values.nonEmpty, "empty probe set: nothing can match")
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    val anyInRange = exists(typedLit(values.map(_.toLong)), v => mx >= v && mn <= v)
    val byStats = survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || anyInRange).toSet
    val byBloom = filesMayContainAnyInt(spark, path, column, values).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedEqLong]] for a DOUBLE column: FP stats pruning with the
    * NaN guard ([[filesInDoubleRange]]) intersected with the ±0.0-aware
    * bloom probe ([[filesMayContainDouble]]). A NaN probe value degrades
    * to the full listing (no filter can witness `= NaN`, which SQL
    * equality never satisfies anyway). */
  def readPrunedEqDouble(
      spark: SparkSession, path: String, column: String, value: Double): DataFrame = {
    val byStats =
      if (value.isNaN) filesMayContainDouble(spark, path, column, value).toSet
      else filesInDoubleRange(spark, path, column, value, value).toSet
    val byBloom = filesMayContainDouble(spark, path, column, value).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedInLong]] for DOUBLE probe values. */
  def readPrunedInDouble(
      spark: SparkSession, path: String, column: String,
      values: Seq[Double]): DataFrame = {
    require(values.nonEmpty, "empty probe set: nothing can match")
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatDouble(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("statistics.min_value"))
    val mx = decode(col("statistics.max_value"))
    val anyInRange = exists(typedLit(values), v => mx >= v && mn <= v)
    val byStats = survivingFiles(spark, path, column,
      mn.isNull || mx.isNull || isnan(mn) || isnan(mx) || anyInRange).toSet
    val byBloom = filesMayContainAnyDouble(spark, path, column, values).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** [[readPrunedEqLong]] for a string probe: stats prune on the closed
    * byte range `[v, v + 0x00)` (the smallest byte string above `v`),
    * blooms on the UTF8 hash. */
  def readPrunedEqString(
      spark: SparkSession, path: String, column: String, value: String): DataFrame = {
    val v = value.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val byStats = filesInStringRange(spark, path, column, v, Some(v :+ 0.toByte)).toSet
    val byBloom = filesMayContainString(spark, path, column, value).toSet
    readFiles(spark, path, byStats.intersect(byBloom).toSeq.sorted)
  }

  /** The per-chunk admit expression (over a column-level metadata row) a
    * predicate induces — missing/undecodable stats always admit. */
  private def chunkAdmit(p: PrunePred): Column = {
    val decodeL = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val decodeD = (c: Column) => ColumnBridge.column(graft.functions.PlainStatDouble(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mnB = col("statistics.min_value")
    val mxB = col("statistics.max_value")
    p match {
      case LongRangePred(_, lo, hi) =>
        val (mn, mx) = (decodeL(mnB), decodeL(mxB))
        mn.isNull || mx.isNull || (mx >= lo && mn <= hi)
      case DateRangePred(_, lo, hi) =>
        val (mn, mx) = (decodeL(mnB), decodeL(mxB))
        mn.isNull || mx.isNull || (mx >= lo.toEpochDay && mn <= hi.toEpochDay)
      case DoubleRangePred(_, lo, hi) =>
        val (mn, mx) = (decodeD(mnB), decodeD(mxB))
        mn.isNull || mx.isNull || isnan(mn) || isnan(mx) ||
          (mx >= lo && mn <= hi)
      case EqLongPred(_, v) =>
        val (mn, mx) = (decodeL(mnB), decodeL(mxB))
        mn.isNull || mx.isNull || (mx >= v && mn <= v)
      case EqIntPred(_, v) =>
        val (mn, mx) = (decodeL(mnB), decodeL(mxB))
        mn.isNull || mx.isNull || (mx >= v.toLong && mn <= v.toLong)
      case EqDoublePred(_, v) =>
        val (mn, mx) = (decodeD(mnB), decodeD(mxB))
        if (v.isNaN) lit(true) // no stat can witness a NaN equality
        else mn.isNull || mx.isNull || isnan(mn) || isnan(mx) ||
          (mx >= v && mn <= v)
      case EqStringPred(_, v) =>
        val vb = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        col("type") =!= "BYTE_ARRAY" || mnB.isNull || mxB.isNull ||
          (mxB >= lit(vb) && mnB < lit(vb :+ 0.toByte))
    }
  }

  /**
   * Read only the files the CONJUNCTION of `preds` can touch — the
   * multi-column lookup (`date BETWEEN ... AND id = ...`) a real selective
   * read is. The conjunction is evaluated per ROW GROUP, which is strictly
   * stronger than intersecting per-column FILE sets: a file whose row
   * group 0 matches the date range and row group 1 matches the id range —
   * but no single row group matches both — survives every single-column
   * prune yet is dropped here. Equality predicates additionally intersect
   * their (independently sound) per-file bloom survivor sets.
   *
   * Soundness composes: each per-row-group admit is conservative (missing
   * stats or an undecodable value admits), a file missing ANY predicate
   * column drops out of the row-group join and is kept via the left-join
   * null, and an unsigned-integer schema keeps the file exactly as in
   * [[filesInRange]]. One metadata pass per predicate over footers the
   * first pass already cached — at a million files the driver still only
   * ever sees surviving paths.
   */
  def readPrunedWhere(
      spark: SparkSession, path: String, preds: Seq[PrunePred]): DataFrame = {
    require(preds.nonEmpty, "empty predicate list: nothing to prune on")
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).load(path)
    val admits = preds.zipWithIndex.map { case (p, i) =>
      meta("column").filter(col("path") === p.column)
        .groupBy(col("filepath"), col("row_group_id"))
        .agg(max(chunkAdmit(p)).as(s"adm_$i"))
    }
    val joined = admits.reduce((a, b) => a.join(b, Seq("filepath", "row_group_id")))
    val conj = preds.indices.map(i => col(s"adm_$i")).reduce(_ && _)
    val perFile = joined.groupBy(col("filepath")).agg(max(conj).as("adm"))
    val unsignedRisk = col("schema").isNull ||
      col("schema").contains(UnsignedSubstring) ||
      col("schema").rlike(UnsignedRegex)
    val byStats = meta("file")
      .select(col("filepath"), unsignedRisk.as("risk"))
      .join(perFile, Seq("filepath"), "left")
      .filter(col("risk") || col("adm").isNull || col("adm"))
      .select(col("filepath"))
      .collect().map(_.getString(0)).toSet
    val withBloom = preds.foldLeft(byStats) {
      case (acc, EqLongPred(c, v)) =>
        acc.intersect(filesMayContainLong(spark, path, c, v).toSet)
      case (acc, EqIntPred(c, v)) =>
        acc.intersect(filesMayContainInt(spark, path, c, v).toSet)
      case (acc, EqDoublePred(c, v)) =>
        acc.intersect(filesMayContainDouble(spark, path, c, v).toSet)
      case (acc, EqStringPred(c, v)) =>
        acc.intersect(filesMayContainString(spark, path, c, v).toSet)
      case (acc, _) => acc
    }
    readFiles(spark, path, withBloom.toSeq.sorted)
  }

  /**
   * PAGE-granular skip report for a range predicate on an INT32/INT64
   * `column`: from the decoded ColumnIndex (per-page min/max) and
   * OffsetIndex (per-page row spans), how many pages — and how many rows —
   * a page-index-aware reader would actually touch for `[lo, hi]`. Pure
   * metadata: no data page is ever read, and all decoding runs
   * executor-side over the index levels; per-chunk page counts are
   * thousands at most, so the per-chunk window is bounded.
   *
   * Skip decisions are sound the same way file pruning is: a page is
   * skippable only on POSITIVE evidence — a null page (no values can
   * match a value range) or decoded stats that exclude the range;
   * missing/undecodable stats keep the page. One row per
   * (file, row group): total pages, needed pages, total rows, rows
   * covered by needed pages — the row-level I/O bound a 100 TB selective
   * scan cares about.
   */
  /** Per-page spans with their range-predicate admit flag for one column:
    * `(filepath, row_group_id, page_id, needed, first_row_index,
    * page_rows)` — the shared body of the single- and multi-column page
    * skip reports. Skips stay sound: a page is skippable only on POSITIVE
    * evidence (a null page, or decoded stats excluding the range). */
  private def neededPageSpans(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).load(path)
    val key = Seq("filepath", "row_group_id", "column_id")
    val colIds = meta("column").filter(col("path") === column)
      .select(col("filepath"), col("row_group_id"), col("column_id"), col("type"))
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val mn = decode(col("min_value"))
    val mx = decode(col("max_value"))
    val needed = when(col("null_page"), lit(false))
      .otherwise(mn.isNull || mx.isNull || (mx >= lo && mn <= hi))
    val ci = meta("columnindex")
      .join(colIds, key)
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("page_id"), needed.as("needed"))
    // per-page row span: next page's first row (or the row group's row
    // count for the last page) minus this page's first row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*).orderBy(col("page_id"))
    val spans = meta("offsetindex")
      .select(col("filepath"), col("row_group_id"), col("column_id"),
        col("page_id"), col("first_row_index"))
      .join(meta("rowgroup").select(col("filepath"), col("row_group_id"),
        col("num_rows")), Seq("filepath", "row_group_id"))
      .withColumn("page_rows",
        coalesce(lead(col("first_row_index"), 1).over(w), col("num_rows")) -
          col("first_row_index"))
    ci.join(spans, key :+ "page_id", "left")
      .select(col("filepath"), col("row_group_id"), col("page_id"),
        col("needed"), col("first_row_index"), col("page_rows"))
  }

  def pageSkipReport(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame = {
    neededPageSpans(spark, path, column, lo, hi)
      .groupBy(col("filepath"), col("row_group_id"))
      .agg(count(lit(1)).as("n_pages_total"),
        sum(when(col("needed"), 1L).otherwise(0L)).as("n_pages_needed"),
        sum(col("page_rows")).as("rows_total"),
        sum(when(col("needed"), col("page_rows")).otherwise(0L)).as("rows_covered"))
  }

  /**
   * MULTI-column page-skip report: the row-range INTERSECTION semantics a
   * page-index-aware reader (parquet-mr's ColumnIndexFilter) applies to a
   * conjunction `colA in [..] AND colB in [..]`. Pages of different
   * columns do not align, so the conjunction happens at ROW granularity:
   * per predicate, the needed pages induce a union of row ranges; a row
   * must fall in EVERY predicate's union to need reading — computed with
   * an event sweep (+1 at each needed page's first row, -1 past it, net
   * deltas per position, segments where the running count equals the
   * predicate count are covered). One row per (file, row group):
   * `rows_total`, `rows_covered` — the row-level I/O bound of the
   * conjunctive read. Soundness: a predicate column with NO page index in
   * a row group contributes its full row span (missing evidence cannot
   * shrink the estimate); per-page skips need positive evidence as in
   * [[pageSkipReport]].
   */
  def pageSkipReportMulti(
      spark: SparkSession, path: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    require(preds.nonEmpty, "empty predicate list")
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).load(path)
    val rgs = meta("rowgroup")
      .select(col("filepath"), col("row_group_id"), col("num_rows"))
    val perPred = preds.zipWithIndex.map { case ((c, lo, hi), i) =>
      // One index walk per predicate: the spans frame feeds THREE views
      // (ranges, the unspanned-page widening, row-group presence), and
      // each unmaterialized reference would re-run the whole
      // columnindex ⋈ column ⋈ offsetindex ⋈ rowgroup subtree — measured
      // at 3 subtree executions per predicate (78-Exchange plan on the
      // two-predicate query). localCheckpoint (same MEMORY_AND_DISK
      // blocks) rather than persist(): a persisted frame is pinned by the
      // session's CacheManager with nobody positioned to unpersist it (the
      // result leaves this function lazily), so one cached frame per
      // predicate per invocation would accumulate for the JVM lifetime of
      // a long Bench/Verify session; localCheckpoint blocks are owned by
      // the RDD and reclaimed by the ContextCleaner once unreferenced.
      // The frame is page-index-sized (pages per touched chunk), never
      // data-sized.
      val spans = neededPageSpans(spark, path, c, lo, hi).localCheckpoint()
      // a needed page WITHOUT an offset-index span (column index present,
      // offset index absent — spec-legal) must widen this predicate's
      // contribution for its row group to the FULL span: a null range
      // would net to zero coverage and silently SHRINK the estimate, the
      // one direction a sound report cannot err. The substitution is one
      // full range per affected row group (distinct), preserving the
      // per-predicate disjointness the event sweep relies on.
      val needed = spans.filter(col("needed"))
      val unspanned = needed.filter(col("first_row_index").isNull)
        .select(col("filepath"), col("row_group_id")).distinct()
        .withColumn("full_span", lit(true))
      val ranges = needed
        .join(unspanned, Seq("filepath", "row_group_id"), "left")
        .join(rgs, Seq("filepath", "row_group_id"))
        .select(col("filepath"), col("row_group_id"),
          when(col("full_span"), lit(0L))
            .otherwise(col("first_row_index")).as("lo"),
          when(col("full_span"), col("num_rows"))
            .otherwise(col("first_row_index") + col("page_rows")).as("hi"))
        .distinct()
      // a row group this predicate has NO index rows for: full span
      // (missing evidence keeps every row needed — sound)
      val present = spans
        .select(col("filepath"), col("row_group_id")).distinct()
      val absent = rgs.join(present, Seq("filepath", "row_group_id"), "left_anti")
        .select(col("filepath"), col("row_group_id"),
          lit(0L).as("lo"), col("num_rows").as("hi"))
      ranges.unionByName(absent).withColumn("pred", lit(i))
    }
    val events = perPred.reduce(_ unionByName _)
      .select(col("filepath"), col("row_group_id"),
        explode(array(
          struct(col("lo").as("pos"), lit(1L).as("delta")),
          struct(col("hi").as("pos"), lit(-1L).as("delta")))).as("e"))
      .select(col("filepath"), col("row_group_id"),
        col("e.pos").as("pos"), col("e.delta").as("delta"))
      // net out same-position deltas so adjacent pages do not dip coverage
      .groupBy(col("filepath"), col("row_group_id"), col("pos"))
      .agg(sum(col("delta")).as("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("filepath"), col("row_group_id")).orderBy(col("pos"))
    val covered = events
      .withColumn("running", sum(col("d")).over(w))
      .withColumn("seg", coalesce(lead(col("pos"), 1).over(w), col("pos")) - col("pos"))
      .filter(col("running") === preds.length)
      .groupBy(col("filepath"), col("row_group_id"))
      .agg(sum(col("seg")).as("rows_covered"))
    rgs.join(covered, Seq("filepath", "row_group_id"), "left")
      .select(col("filepath"), col("row_group_id"),
        col("num_rows").as("rows_total"),
        coalesce(col("rows_covered"), lit(0L)).as("rows_covered"))
  }

  /**
   * Sortedness AUDIT for `column`: one row per (file, row group, declared
   * sorting column) pairing the writer's `sorting_columns` declaration
   * (surfaced by the rowgroup level; see [[FooterEdit]] for declaring it
   * post-write) with the row group's independent min/max statistics and a
   * stats-derived `monotone` verdict. The layout question a Z-order/prune
   * claim rests on — "is this table actually sorted the way its metadata
   * says?" — answered at footer-read cost. Row groups without a
   * declaration contribute no rows; callers comparing against the full
   * rowgroup count detect undeclared files.
   *
   * `monotone` is three-state: TRUE when the group's bounds are
   * consistent with the declared order relative to the previous group
   * (direction taken from the declaration's `descending` flag; the
   * comparison is non-strict, so duplicate keys spanning a row-group
   * boundary still audit as sorted), FALSE when the bounds contradict it,
   * and NULL when either side of the comparison failed to decode —
   * missing or undecodable statistics are "no evidence", never silently
   * reported as sorted. The first row group of a file is vacuously TRUE
   * (when its own bounds decode).
   */
  /**
   * CLUSTERING-quality report — the "should I re-cluster / Z-order?"
   * question at footer cost: per INT64 column, the chunk-stat value
   * spans summed against the global span. `span_sum / global_span` is
   * EXACTLY the average number of chunks a uniformly random point of
   * the key range lands in (the overlap depth a stats-pruned scan
   * pays): ~1 = perfectly clustered (disjoint chunk ranges, pruning
   * skips all but one chunk), ~n_chunks = unclustered (every chunk
   * spans the whole range, pruning skips nothing). Outputs stay
   * integer-exact (the caller divides); chunks with missing stats are
   * counted in `n_unbounded` — no evidence, never assumed clustered.
   * One aggregate over footer stats, no joins, no data I/O.
   */
  def clusteringReport(
      spark: SparkSession, path: String, columns: Seq[String]): DataFrame = {
    val meta = spark.read.format("metadata")
      .option("level", "column").option("footercache", "false").load(path)
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    meta.filter(col("path").isin(columns: _*))
      .select(col("path").as("col_name"),
        decode(col("statistics.min_value")).as("mn"),
        decode(col("statistics.max_value")).as("mx"))
      .groupBy(col("col_name"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("mn").isNull || col("mx").isNull, 1L).otherwise(0L))
          .cast("long").as("n_unbounded"),
        min(col("mn")).as("global_min"),
        max(col("mx")).as("global_max"),
        sum(col("mx") - col("mn")).cast("long").as("span_sum"))
      .withColumn("global_span", col("global_max") - col("global_min"))
  }

  def sortAudit(
      spark: SparkSession, path: String, column: String): DataFrame = {
    val meta = (level: String) => spark.read.format("metadata")
      .option("level", level).option("footercache", "false").load(path)
    val rg = meta("rowgroup")
      .select(col("filepath"), col("row_group_id"),
        explode(col("sorting_columns")).as("sc"))
    val decode = (c: Column) => ColumnBridge.column(graft.functions.PlainStatLong(
      ColumnBridge.expression(c), ColumnBridge.expression(col("type"))))
    val stats = meta("column")
      .filter(col("path") === column)
      .select(col("filepath"), col("row_group_id"),
        decode(col("statistics.min_value")).as("rg_min"),
        decode(col("statistics.max_value")).as("rg_max"))
    // partition the neighbour comparison by declared sorting column too:
    // a multi-column declaration explodes to several rows per row group,
    // and a window keyed on filepath alone would lag across those ties
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("filepath"), col("sc.column_idx"))
      .orderBy(col("row_group_id"))
    rg.join(stats, Seq("filepath", "row_group_id"))
      .withColumn("prev_min", lag(col("rg_min"), 1).over(w))
      .withColumn("prev_max", lag(col("rg_max"), 1).over(w))
      .withColumn("has_prev",
        lag(col("row_group_id"), 1).over(w).isNotNull)
      .withColumn("monotone",
        when(col("rg_min").isNull || col("rg_max").isNull,
          lit(null).cast("boolean"))
          .when(!col("has_prev"), lit(true))
          .when(col("sc.descending"),
            when(col("prev_min").isNull, lit(null).cast("boolean"))
              .otherwise(col("rg_max") <= col("prev_min")))
          .otherwise(
            when(col("prev_max").isNull, lit(null).cast("boolean"))
              .otherwise(col("rg_min") >= col("prev_max"))))
      .select(col("filepath"), col("row_group_id"),
        col("sc.column_idx").as("sc_idx"),
        col("sc.descending").as("sc_desc"),
        col("sc.nulls_first").as("sc_nulls_first"),
        col("rg_min"), col("rg_max"), col("monotone"))
  }

  /** Read only the files a range predicate on `column` can touch. The
    * predicate itself is NOT applied — callers compose it, and Catalyst
    * additionally pushes it into the surviving files' row groups. */
  def readPruned(
      spark: SparkSession, path: String, column: String,
      lo: Long, hi: Long): DataFrame =
    readFiles(spark, path, filesInRange(spark, path, column, lo, hi))

  /** [[readPruned]] for a DATE column (epoch-day INT32 stats). */
  def readPrunedDate(
      spark: SparkSession, path: String, column: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate): DataFrame =
    readFiles(spark, path, filesInDateRange(spark, path, column, lo, hi))

  /** [[readPruned]] for a DECIMAL column, bounds unscaled at the column's
    * declared scale. */
  def readPrunedUnscaled(
      spark: SparkSession, path: String, column: String,
      loUnscaled: Long, hiUnscaled: Long): DataFrame =
    readFiles(spark, path,
      filesInUnscaledRange(spark, path, column, loUnscaled, hiUnscaled))

  /** [[readPruned]] for a string prefix predicate on a UTF8/BINARY column. */
  def readPrunedPrefix(
      spark: SparkSession, path: String, column: String,
      prefix: String): DataFrame =
    readFiles(spark, path, filesWithPrefix(spark, path, column, prefix))

  private def readFiles(
      spark: SparkSession, path: String, files: Seq[String]): DataFrame = {
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
