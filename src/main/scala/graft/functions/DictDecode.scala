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
    val bytes: Array[Byte] = DecodeBytes.of(v)
    if (bytes == null) return null
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < bytes.length) {
      if (i + 4 > bytes.length) return null // truncated length prefix
      val len =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      i += 4
      // overflow-safe overrun check: `i + len` wraps negative for len
      // near Int.MaxValue, sneaking a ~2 GB copyOfRange allocation past
      // an additive bound (found by DecodeFuzzSpec seed 777023 — OOM
      // "Requested array size exceeds VM limit")
      if (len < 0 || len > bytes.length - i) return null // length overrun
      out += UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, i, i + len))
      i += len
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** Shared input normalization for the page-payload decodes: the page level
  * renders content as `array<byte>` (reference fidelity), tests and other
  * callers hand in plain `binary`. */
private[functions] object DecodeBytes {
  def of(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case a: ArrayData => a.toByteArray()
    case _ => null
  }
}

/**
 * Sum the values of a PLAIN-encoded INT64 page payload (the raw
 * `page_content` bytes of an uncompressed data page for a REQUIRED int64
 * column: no level bytes, just 8-byte little-endian values back to back).
 * A payload whose length is not a multiple of 8 yields null — a truncated
 * or non-PLAIN payload must stay distinguishable from a zero sum.
 *
 * Exists so the page walk's CONTENT can be proven against the data it
 * encodes: summed per page and rolled up, the decoded values must equal
 * the engine-independent aggregate of the column itself (wrap-around
 * long addition on both sides).
 */
/**
 * Decode a PLAIN INT64 payload into its value LIST — the INT64 sibling of
 * [[PlainDictStrings]] for dictionary pages (a fully dictionary-encoded
 * INT64 column's dictionary page is exactly this layout), and the
 * composition hook that reconstructs dict-encoded values:
 * `transform(dict_indexes(...), i -> element_at(plain_int64_longs(dict),
 * i + 1))`. Null if the payload is not a whole number of 8-byte values.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - PLAIN INT64 payload as array<bigint>, NULL if malformed.")
case class PlainInt64Longs(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "plain_int64_longs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary or array<byte> argument, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = PlainInt64Longs.compute(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $tmp =
        graft.functions.PlainInt64Longs.compute($v);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PlainInt64Longs =
    copy(child = newChild)
}

object PlainInt64Longs {
  def compute(v: Any): ArrayData = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || bytes.length % 8 != 0) return null
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < bytes.length) {
      out(i / 8) =
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24) |
        ((bytes(i + 4) & 0xffL) << 32) | ((bytes(i + 5) & 0xffL) << 40) |
        ((bytes(i + 6) & 0xffL) << 48) | ((bytes(i + 7) & 0xffL) << 56)
      i += 8
    }
    new GenericArrayData(out.map(java.lang.Long.valueOf).toArray[Any])
  }
}

@ExpressionDescription(
  usage = "_FUNC_(bytes) - sum of a PLAIN INT64 page payload's values, NULL if malformed.")
case class PlainInt64Sum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "plain_int64_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary or array<byte> argument, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = PlainInt64Sum.compute(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Long $tmp = graft.functions.PlainInt64Sum.compute($v);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PlainInt64Sum =
    copy(child = newChild)
}

object PlainInt64Sum {
  def compute(v: Any): java.lang.Long = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || bytes.length % 8 != 0) return null
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      sum +=
        (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24) |
        ((bytes(i + 4) & 0xffL) << 32) | ((bytes(i + 5) & 0xffL) << 40) |
        ((bytes(i + 6) & 0xffL) << 48) | ((bytes(i + 7) & 0xffL) << 56)
      i += 8
    }
    java.lang.Long.valueOf(sum)
  }
}
