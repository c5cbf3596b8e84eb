package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One opaque media payload: the storage model for image/audio/video columns
  * is a `binary` column plus typed metadata, exactly as a 100 TB multimodal
  * lake would store it (content-addressed bytes + queryable sidecar). */
case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

/** Typed features extracted from one payload. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    byte_size: Int,
    width: Int,
    height: Int,
    checksum: Long)

/**
 * Multimodal-column plumbing: schema, partition-friendly batch decode, and
 * feature extraction over opaque `binary` payloads.
 *
 * The *decode kernel* is a STUB — a deterministic fake standing in for a real
 * image/audio decoder (the codec libraries are not available in this
 * environment). Everything around it is the real Spark shape a production
 * pipeline needs: a typed `Dataset[MediaRecord]`, `mapPartitions` batch
 * execution (one decoder init per partition, not per row — the same batching
 * contract a Pandas-UDF / `mapInPandas` decoder relies on), and narrow
 * per-row output so no shuffle is introduced.
 */
object Multimodal {

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /**
   * STUB DECODER: deterministic fake feature extraction. A real
   * implementation would hand `bytes` to an image/audio codec here; this
   * fake derives "dimensions" from the byte size and a checksum from the
   * codepoints of the first 64 characters of the UTF-8 decode, so the
   * typed path, the SQL-column path, and the DuckDB oracle all compute the
   * identical value for any valid-UTF-8 payload (including multibyte).
   */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length
    // truncate by CODEPOINTS (matching SQL substring semantics), not UTF-16
    // units — .take(64) would split surrogate pairs on non-BMP payloads
    val decoded = new String(r.bytes, java.nio.charset.StandardCharsets.UTF_8)
    var crc = 0L
    decoded.codePoints().limit(64).forEach(c => crc = (crc * 31 + c) % 1000000007L)
    MediaFeatures(r.media_id, r.kind, n, 64 + n % 576, 64 + n % 416, crc)
  }

  /**
   * Batch feature extraction: `mapPartitions` so a real decoder would be
   * initialised once per partition and fed a streaming batch of payloads.
   */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions { batch =>
      // (real pipeline: initialise codec/session here, once per partition)
      batch.map(decodeStub)
    }

  /**
   * Pure-column variant of the same fake feature math over a DataFrame with
   * (media_id, kind, bytes) — used by the oracle-checked query since it is
   * SQL-expressible. Checksum covers the first 64 bytes, matching
   * [[decodeStub]].
   */
  def extractFeaturesSql(df: DataFrame): DataFrame = {
    val n = length(col("bytes"))
    // decode FIRST, then take 64 characters — slicing raw bytes could split
    // a multibyte codepoint and diverge from decodeStub
    val prefix = substring(col("bytes").cast("string"), 1, 64)
    val crc = aggregate(
      transform(filter(split(prefix, ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))
    df.select(
      col("media_id"),
      col("kind"),
      n.cast("int").as("byte_size"),
      (lit(64) + pmod(n, lit(576))).cast("int").as("width"),
      (lit(64) + pmod(n, lit(416))).cast("int").as("height"),
      crc.as("checksum"))
  }

  /** Sample every `stride`-th frame (media rows) — the frame-sampling shape
    * for video pipelines, as a filter on a deterministic row index. */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(stride)) === 0)
}
