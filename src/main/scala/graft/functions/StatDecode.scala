package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Decode a parquet plain-encoded signed integer statistic (the raw
 * little-endian `min_value`/`max_value` bytes the metadata source
 * preserves) to a LONG, given the chunk's physical type string. Yields
 * null for non-integer types, short buffers, or null inputs — "cannot
 * decode" must stay distinguishable from a decoded value because pruning
 * treats it as "cannot rule the chunk out".
 *
 * Exists so stats-driven pruning ([[graft.meta.MetaPrune]]) can evaluate
 * chunk ranges EXECUTOR-side and ship one boolean per file to the driver,
 * instead of collecting per-chunk stat bytes: at a million-file table the
 * driver sees file names only, never chunk payloads.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, type) - little-endian INT32/INT64 plain statistic as LONG, else NULL.")
case class PlainStatLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "plain_stat_long"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, tpe: Any): Any =
    PlainStatLong.compute(bytes.asInstanceOf[Array[Byte]], tpe.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, (b, t) => s"""
      java.lang.Long $tmp = graft.functions.PlainStatLong.compute($b, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlainStatLong =
    copy(left = newLeft, right = newRight)
}

object PlainStatLong {
  private val INT32 = UTF8String.fromString("INT32")
  private val INT64 = UTF8String.fromString("INT64")

  def compute(bytes: Array[Byte], tpe: UTF8String): java.lang.Long =
    if (tpe.equals(INT32) && bytes.length >= 4) {
      java.lang.Long.valueOf(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt.toLong)
    } else if (tpe.equals(INT64) && bytes.length >= 8) {
      java.lang.Long.valueOf(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong)
    } else null
}

/**
 * Decode a parquet plain-encoded floating-point statistic (DOUBLE: 8-byte
 * little-endian IEEE 754; FLOAT: 4-byte, widened losslessly) to a DOUBLE.
 * Null for other types, short buffers, or null inputs — same "cannot
 * decode keeps the file" contract as [[PlainStatLong]]. NaN decodes as
 * NaN rather than null so the pruning layer can apply its own explicit
 * NaN guard (a NaN bound is evidence of nothing either way).
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, type) - little-endian FLOAT/DOUBLE plain statistic as DOUBLE, else NULL.")
case class PlainStatDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "plain_stat_double"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, tpe: Any): Any =
    PlainStatDouble.compute(bytes.asInstanceOf[Array[Byte]], tpe.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, (b, t) => s"""
      java.lang.Double $tmp = graft.functions.PlainStatDouble.compute($b, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlainStatDouble =
    copy(left = newLeft, right = newRight)
}

object PlainStatDouble {
  private val FLOAT = UTF8String.fromString("FLOAT")
  private val DOUBLE = UTF8String.fromString("DOUBLE")
  private val FLOAT16 = UTF8String.fromString("FLOAT16")

  def compute(bytes: Array[Byte], tpe: UTF8String): java.lang.Double =
    if (tpe.equals(DOUBLE) && bytes.length >= 8) {
      java.lang.Double.valueOf(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getDouble)
    } else if (tpe.equals(FLOAT) && bytes.length >= 4) {
      java.lang.Double.valueOf(
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat.toDouble)
    } else if (tpe.equals(FLOAT16) && bytes.length >= 2) {
      // the FLOAT16 logical type's fixed(2) statistic, little-endian
      // binary16 (r19) — callers name it by the LOGICAL type (the
      // physical FIXED_LEN_BYTE_ARRAY bytes are ambiguous alone)
      java.lang.Double.valueOf(Fp16.halfToFloat(
        (bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8)).toDouble)
    } else null
}

/**
 * Decode a parquet statistic to a DECIMAL's unscaled value as LONG,
 * covering every physical encoding parquet uses for decimals (format spec
 * `logical_types.md`): INT32/INT64 carry the unscaled value little-endian
 * (same bytes as [[PlainStatLong]]); FIXED_LEN_BYTE_ARRAY and BINARY carry
 * it BIG-endian two's complement. Wide byte arrays still decode when the
 * value itself fits a long (leading bytes are pure sign extension — the
 * overwhelmingly common case for real-world decimal data in a wide
 * physical type); a genuinely >64-bit value yields null, which pruning
 * treats as "cannot rule the chunk out" — sound, never lossy.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, type) - parquet decimal statistic's unscaled value as LONG, else NULL.")
case class PlainStatUnscaled(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "plain_stat_unscaled"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string) arguments, got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, tpe: Any): Any =
    PlainStatUnscaled.compute(
      bytes.asInstanceOf[Array[Byte]], tpe.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, (b, t) => s"""
      java.lang.Long $tmp = graft.functions.PlainStatUnscaled.compute($b, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlainStatUnscaled =
    copy(left = newLeft, right = newRight)
}

object PlainStatUnscaled {
  private val FLBA = UTF8String.fromString("FIXED_LEN_BYTE_ARRAY")
  // the column level renders physical types as the Thrift enum names:
  // variable-length binary is BYTE_ARRAY, not parquet-mr's "BINARY"
  private val BINARY = UTF8String.fromString("BYTE_ARRAY")

  /** Big-endian two's complement to Long; null when empty or the value
    * truly needs more than 64 bits (leading bytes beyond 8 must be sign
    * extension of what follows). */
  private[graft] def bigEndianLong(b: Array[Byte]): java.lang.Long = {
    val n = b.length
    if (n == 0) return null
    val sign: Byte = if ((b(0) & 0x80) != 0) -1 else 0
    var i = 0
    while (i < n - 8) {
      if (b(i) != sign) return null // magnitude exceeds 64 bits
      i += 1
    }
    // when n > 8 the retained window must still open with the sign bit the
    // dropped bytes promised, else the value needs a 65th bit
    if (n > 8 && ((b(n - 8) & 0x80) != 0) != (sign == -1)) return null
    var v: Long = sign // seeds 0... or 1... so short arrays sign-extend
    i = math.max(0, n - 8)
    while (i < n) {
      v = (v << 8) | (b(i) & 0xFFL)
      i += 1
    }
    java.lang.Long.valueOf(v)
  }

  def compute(bytes: Array[Byte], tpe: UTF8String): java.lang.Long =
    if (tpe.equals(FLBA) || tpe.equals(BINARY)) bigEndianLong(bytes)
    else PlainStatLong.compute(bytes, tpe)
}
