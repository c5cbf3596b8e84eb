package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, LongType}

/**
 * DELTA_BINARY_PACKED decoder (format spec `Encodings.md`, "Delta
 * Encoding") — the v2 writer's DEFAULT encoding for INT32/INT64 columns:
 *
 *   header: <block size> <miniblocks per block> <total count>
 *           <first value: zigzag varlong>
 *   block:  <min delta: zigzag varlong> <bit width per miniblock: 1 byte
 *           each> <miniblocks: LSB-first bit-packed (delta - min delta)>
 *
 * Arithmetic is MODULAR 64-bit by specification (deltas may overflow),
 * so plain wrapping Long addition is the correct reconstruction. INT32
 * streams use the same format with 32-bit zigzag headers that widen
 * losslessly — one decoder serves both physical types.
 */
object DeltaBp {

  /** Decode a full DELTA_BINARY_PACKED stream to its values; null on any
    * malformation (truncated varint, bad widths, short miniblocks).
    * `wrap32 = true` for INT32 physical columns: their modular arithmetic
    * is 32-BIT (the writer wraps deltas at int width), so each
    * reconstructed value truncates to int before the next step —
    * accumulating in 64-bit would silently drift after the first wrap. */
  def decodeLongs(bytes: Array[Byte], wrap32: Boolean = false): Array[Long] =
    decodeLongsFrom(bytes, 0, wrap32) match {
      case null => null
      case (vals, _) => vals
    }

  /**
   * [[decodeLongs]] from an offset, also returning the position PAST the
   * delta stream — the composition hook for DELTA_LENGTH_BYTE_ARRAY /
   * DELTA_BYTE_ARRAY, whose payloads embed delta streams as prefixes.
   */
  def decodeLongsFrom(
      bytes: Array[Byte], start: Int, wrap32: Boolean): (Array[Long], Int) = {
    if (bytes == null || start < 0 || start > bytes.length) return null
    var pos = start
    var failed = false
    def varULong(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more && !failed) {
        if (pos >= bytes.length || shift > 63) { failed = true; return 0L }
        val b = bytes(pos)
        pos += 1
        v |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def zigzag(): Long = {
      val u = varULong()
      (u >>> 1) ^ -(u & 1L)
    }
    val blockSize = varULong()
    val numMiniblocks = varULong()
    val totalCount = varULong()
    val firstValue = zigzag()
    // totalCount is untrusted header data and sizes the output allocation
    // up front — cap it at the same plausibility bound as RleBp.MaxDecoded
    // (here 2^25 values = a 256 MB long array) so a crafted stream cannot
    // force a multi-GB allocation before payload validation
    if (failed || blockSize <= 0 || numMiniblocks <= 0 ||
        blockSize % numMiniblocks != 0 || totalCount < 0 ||
        totalCount > (1L << 25) || blockSize > (1 << 24)) return null
    val perMini = (blockSize / numMiniblocks).toInt
    if (perMini % 8 != 0) return null // spec: miniblock size is a multiple of 8
    val n = totalCount.toInt
    val out = new Array[Long](n)
    if (n == 0) return (out, pos)
    var prev = if (wrap32) firstValue.toInt.toLong else firstValue
    out(0) = prev
    var decoded = 1
    while (decoded < n) {
      val minDelta = zigzag()
      if (failed) return null
      val widths = new Array[Int](numMiniblocks.toInt)
      var m = 0
      while (m < widths.length) {
        if (pos >= bytes.length) return null
        widths(m) = bytes(pos) & 0xFF
        pos += 1
        if (widths(m) > 64) return null
        m += 1
      }
      m = 0
      while (m < widths.length && decoded < n) {
        val w = widths(m)
        val miniBytes = perMini * w / 8
        // subtraction form: additive bounds can wrap near Int.MaxValue
        if (miniBytes > bytes.length - pos) return null
        var i = 0
        while (i < perMini && decoded < n) {
          var delta = 0L
          var bit = 0
          val base = i * w
          while (bit < w) {
            val gb = base + bit
            if ((bytes(pos + (gb >> 3)) & (1 << (gb & 7))) != 0) delta |= 1L << bit
            bit += 1
          }
          prev = prev + minDelta + delta // modular by spec
          if (wrap32) prev = prev.toInt.toLong
          out(decoded) = prev
          decoded += 1
          i += 1
        }
        pos += miniBytes
        m += 1
      }
    }
    (out, pos)
  }

  /**
   * DELTA_LENGTH_BYTE_ARRAY: a DELTA_BINARY_PACKED int32 stream of value
   * lengths followed by the concatenated value bytes. Null on
   * malformation (bad delta stream, negative length, payload overrun).
   */
  def decodeDeltaLengthByteArray(bytes: Array[Byte]): Array[Array[Byte]] = {
    decodeLongsFrom(bytes, 0, wrap32 = true) match {
      case null => null
      case (lengths, pos) =>
        val out = new Array[Array[Byte]](lengths.length)
        var p = pos
        var i = 0
        while (i < lengths.length) {
          val len = lengths(i)
          if (len < 0 || len > bytes.length - p) return null
          out(i) = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
          p += len.toInt
          i += 1
        }
        out
    }
  }

  /**
   * DELTA_BYTE_ARRAY (incremental/front-coded strings — the v2 writer's
   * fallback when the dictionary overflows): a DELTA_BINARY_PACKED int32
   * stream of shared-prefix lengths, then a DELTA_LENGTH_BYTE_ARRAY of
   * suffixes; `value[i] = value[i-1][0, prefixLen[i]) ++ suffix[i]`.
   */
  def decodeDeltaByteArray(bytes: Array[Byte]): Array[Array[Byte]] = {
    decodeLongsFrom(bytes, 0, wrap32 = true) match {
      case null => null
      case (prefixLens, pos) =>
        val suffixes = decodeDeltaLengthByteArray(
          java.util.Arrays.copyOfRange(bytes, pos, bytes.length))
        if (suffixes == null || suffixes.length != prefixLens.length) return null
        val out = new Array[Array[Byte]](prefixLens.length)
        var i = 0
        while (i < out.length) {
          val plen = prefixLens(i)
          if (plen < 0) return null
          if (i == 0) {
            if (plen != 0) return null // nothing to share a prefix with
            out(0) = suffixes(0)
          } else {
            if (plen > out(i - 1).length) return null
            val v = new Array[Byte](plen.toInt + suffixes(i).length)
            System.arraycopy(out(i - 1), 0, v, 0, plen.toInt)
            System.arraycopy(suffixes(i), 0, v, plen.toInt, suffixes(i).length)
            out(i) = v
          }
          i += 1
        }
        out
    }
  }
}

/**
 * Decode a v2 byte-array values region to its string list, by encoding:
 * `DELTA_BYTE_ARRAY` (front-coded — the v2 writer's dictionary-overflow
 * fallback) or `DELTA_LENGTH_BYTE_ARRAY` (delta-packed lengths +
 * concatenated bytes). Null on malformation or other encodings — with
 * this, every string layout a v1/v2 parquet-mr writer produces
 * (PLAIN, PLAIN_DICTIONARY, RLE_DICTIONARY, DELTA_*) decodes from
 * `page_content`.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, encoding) - v2 DELTA_(LENGTH_)BYTE_ARRAY values as array<string>.")
case class DeltaStringsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "delta_strings"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), org.apache.spark.sql.types.StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)})")
    }

  override def nullSafeEval(v: Any, enc: Any): Any =
    DeltaStringsExpr.compute(v, enc.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, (v, e) => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        graft.functions.DeltaStringsExpr.compute($v, $e);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeltaStringsExpr =
    copy(left = newLeft, right = newRight)
}

object DeltaStringsExpr {
  private val DBA =
    org.apache.spark.unsafe.types.UTF8String.fromString("DELTA_BYTE_ARRAY")
  private val DLBA =
    org.apache.spark.unsafe.types.UTF8String.fromString("DELTA_LENGTH_BYTE_ARRAY")

  def compute(v: Any,
      enc: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (enc == null) return null
    val bytes = DecodeBytes.of(v)
    val decoded =
      if (enc.equals(DBA)) DeltaBp.decodeDeltaByteArray(bytes)
      else if (enc.equals(DLBA)) DeltaBp.decodeDeltaLengthByteArray(bytes)
      else return null
    if (decoded == null) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      decoded.map(b => org.apache.spark.unsafe.types.UTF8String.fromBytes(b))
        .toArray[Any])
  }
}

/**
 * Sum of a DELTA_BINARY_PACKED values region (wrap-around long addition —
 * the same order-independent modular invariant [[PlainInt64Sum]] uses for
 * PLAIN pages), null if malformed. The second argument is the chunk's
 * physical type string: INT32 streams reconstruct under 32-bit modular
 * arithmetic (the writer wraps deltas at int width), INT64 under 64-bit;
 * other types are null. With [[PageValuesV2]] extracting the region, v2
 * integer pages get the same every-byte-accounted-for-by-value oracle
 * the v1 PLAIN layout has.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, type) - sum of a DELTA_BINARY_PACKED region's values, NULL if malformed.")
case class DeltaIntSum(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "delta_int_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), org.apache.spark.sql.types.StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)})")
    }

  override def nullSafeEval(v: Any, tpe: Any): Any =
    DeltaIntSum.compute(v, tpe.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, (v, t) => s"""
      java.lang.Long $tmp = graft.functions.DeltaIntSum.compute($v, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeltaIntSum =
    copy(left = newLeft, right = newRight)
}

object DeltaIntSum {
  private val INT32 = org.apache.spark.unsafe.types.UTF8String.fromString("INT32")
  private val INT64 = org.apache.spark.unsafe.types.UTF8String.fromString("INT64")

  def compute(v: Any, tpe: org.apache.spark.unsafe.types.UTF8String): java.lang.Long = {
    if (tpe == null) return null
    val wrap32 =
      if (tpe.equals(INT32)) true
      else if (tpe.equals(INT64)) false
      else return null
    val vals = DeltaBp.decodeLongs(DecodeBytes.of(v), wrap32)
    if (vals == null) return null
    var s = 0L
    var i = 0
    while (i < vals.length) { s += vals(i); i += 1 }
    java.lang.Long.valueOf(s)
  }
}
