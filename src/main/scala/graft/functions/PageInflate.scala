package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Decompress a parquet page payload (`page_content`) by its chunk's codec
 * name — the Thrift enum rendering the column level exposes
 * (`UNCOMPRESSED`, `SNAPPY`, `ZSTD`, `GZIP`, `LZ4_RAW`; `BROTLI` when a
 * decoder is on the classpath — see `brotliAvailable`). In a v1 data
 * page the whole payload (levels + values) is one compressed block, so
 * `page_inflate(content, codec, uncompressed_size)` is exactly the bytes
 * [[DictIndexes]] / [[PlainDictStrings]] / [[PlainInt64Sum]] decode — the
 * missing composition step that makes page-value reconstruction work on
 * the layout Spark writes BY DEFAULT (snappy + dictionary), not just on
 * `compression=none` fixtures.
 *
 * The declared `uncompressedSize` (from the page header) is both the
 * allocation bound and a validity check: a result of a different length —
 * or any codec error, unknown codec, or size over the 256 MB page sanity
 * cap — yields null, never garbage bytes.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, codec, uncompressed_size) - decompressed page payload, NULL if malformed.")
case class PageInflate(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "page_inflate"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, codec: Any, size: Any): Any =
    PageInflate.compute(bytes, codec.asInstanceOf[UTF8String], size.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("inflated")
    nullSafeCodeGen(ctx, ev, (b, c, n) => s"""
      byte[] $tmp = graft.functions.PageInflate.compute($b, $c, (int) $n);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PageInflate =
    copy(first = f, second = s, third = t)
}

/**
 * Extract a v2 data page's VALUES region: `DataPageHeaderV2` stores the
 * repetition+definition levels UNCOMPRESSED at the front of the payload
 * (their byte lengths are header fields) and compresses only what
 * follows — so the decodable values bytes are
 * `inflate(content[levelBytes..], codec, uncompressed_size - levelBytes)`.
 * Pass `codec = 'UNCOMPRESSED'` when the header's `is_compressed` flag is
 * false. Composes with [[DeltaInt64Sum]] (v2 integer pages) and
 * [[DictIndexes]] with `max_def = 0` and `num_values - num_nulls` (v2
 * dictionary-indexed pages: the index run carries no level prefix).
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, level_bytes, codec, values_size) - v2 page values region, NULL if malformed.")
case class PageValuesV2(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "page_values_v2"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, string, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, levelBytes: Any, codec: Any, size: Any): Any =
    PageValuesV2.compute(bytes, levelBytes.asInstanceOf[Int],
      codec.asInstanceOf[UTF8String], size.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("region")
    nullSafeCodeGen(ctx, ev, (b, l, c, s) => s"""
      byte[] $tmp = graft.functions.PageValuesV2.compute($b, (int) $l, $c, (int) $s);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PageValuesV2 =
    copy(first = f, second = s, third = t, fourth = q)
}

object PageValuesV2 {
  def compute(v: Any, levelBytes: Int, codec: UTF8String, size: Int): Array[Byte] = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || levelBytes < 0 || levelBytes > bytes.length) return null
    val region = java.util.Arrays.copyOfRange(bytes, levelBytes, bytes.length)
    PageInflate.compute(region, codec, size)
  }
}

object PageInflate {
  // sanity bound: parquet pages are ~1 MB by configuration; 256 MB is far
  // past any real page and still far below an executor heap
  private val MAX_PAGE = 256 << 20

  private val UNCOMPRESSED = UTF8String.fromString("UNCOMPRESSED")
  private val SNAPPY = UTF8String.fromString("SNAPPY")
  private val ZSTD = UTF8String.fromString("ZSTD")
  private val GZIP = UTF8String.fromString("GZIP")
  private val LZ4_RAW = UTF8String.fromString("LZ4_RAW")
  private val BROTLI = UTF8String.fromString("BROTLI")

  /** Whether a Brotli decoder is actually on the classpath:
    * commons-compress's route needs `org.brotli:dec`, which Spark does
    * not ship — deployments that add it get real decode; elsewhere the
    * route stays a clean null ("no evidence"), never a link error. */
  lazy val brotliAvailable: Boolean =
    try { Class.forName("org.brotli.dec.BrotliInputStream"); true }
    catch { case _: Throwable => false }

  def compute(v: Any, codec: UTF8String, size: Int): Array[Byte] = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || codec == null || size < 0 || size > MAX_PAGE) return null
    try {
      val out =
        if (codec.equals(UNCOMPRESSED)) bytes
        else if (codec.equals(SNAPPY)) {
          // check the stream's declared length BEFORE uncompress: the
          // codec allocates it, and a crafted varint claiming gigabytes
          // would otherwise defeat the page cap (and OOM past the
          // Exception handler) — the other codecs are bounded by `size`
          if (org.xerial.snappy.Snappy.uncompressedLength(bytes) != size) return null
          org.xerial.snappy.Snappy.uncompress(bytes)
        }
        else if (codec.equals(ZSTD)) com.github.luben.zstd.Zstd.decompress(bytes, size)
        else if (codec.equals(GZIP)) {
          // bound the inflate loop by the DECLARED size, not MAX_PAGE: a
          // gzip bomb with a small declared size must stop buffering the
          // moment it exceeds its contract (one chunk past `size` at
          // most), not after wasting up to 256 MB on data the final
          // length check would reject anyway
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val buf = new java.io.ByteArrayOutputStream(size)
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            var total = 0
            while (n > 0 && total <= size) {
              buf.write(chunk, 0, n); total += n; n = in.read(chunk)
            }
            buf.toByteArray
          } finally {
            in.close()
          }
        } else if (codec.equals(LZ4_RAW)) {
          net.jpountz.lz4.LZ4Factory.fastestInstance()
            .safeDecompressor().decompress(bytes, size)
        } else if (codec.equals(BROTLI)) {
          if (!brotliAvailable) return null
          // same size-bounded read discipline as GZIP: stop one chunk
          // past the declared size at most, let the final length check
          // reject the lie
          val in = new org.apache.commons.compress.compressors.brotli.BrotliCompressorInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val buf = new java.io.ByteArrayOutputStream(size)
            val chunk = new Array[Byte](8192)
            var n = in.read(chunk)
            var total = 0
            while (n > 0 && total <= size) {
              buf.write(chunk, 0, n); total += n; n = in.read(chunk)
            }
            buf.toByteArray
          } finally {
            in.close()
          }
        } else return null
      // the header's uncompressed size is a contract, not a hint
      if (out.length != size) null else out
    } catch {
      case _: Exception => null
    }
  }
}
