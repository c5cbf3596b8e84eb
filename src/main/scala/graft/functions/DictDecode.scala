package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Decode a parquet BYTE_ARRAY dictionary page's PLAIN-encoded payload (the
 * raw `page_content` bytes the page level exposes) into its value list:
 * repeated `<u32 little-endian length><bytes>`, each rendered as a UTF8
 * string — the dictionary IS the row group's distinct-value list for a
 * fully dictionary-encoded column, which is what makes the decode
 * oracle-checkable against the data itself.
 *
 * Accepts `binary` or `array<byte>` input (the page level deliberately
 * renders content as `array<byte>` for reference schema fidelity). Yields
 * null on malformed payloads (truncated length, length overrun) —
 * "cannot decode" stays distinguishable from an empty dictionary.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - PLAIN-encoded BYTE_ARRAY dictionary payload as array<string>.")
case class PlainDictStrings(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "plain_dict_strings"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary or array<byte> argument, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = PlainDictStrings.compute(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        graft.functions.PlainDictStrings.compute($v);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PlainDictStrings =
    copy(child = newChild)
}

object PlainDictStrings {
  def compute(v: Any): ArrayData = {
    val bytes: Array[Byte] = v match {
      case b: Array[Byte] => b
      case a: ArrayData => a.toByteArray()
      case _ => return null
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < bytes.length) {
      if (i + 4 > bytes.length) return null // truncated length prefix
      val len =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      i += 4
      if (len < 0 || i + len > bytes.length) return null // length overrun
      out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, i + len))
      i += len
    }
    new GenericArrayData(out.toArray[Any])
  }
}
