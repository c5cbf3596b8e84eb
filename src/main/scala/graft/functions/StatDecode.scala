package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
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
