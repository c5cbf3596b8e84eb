package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sliding character n-grams of a string as ONE fused pass: walk the UTF-8
 * byte stream once, record the byte offset of every codepoint start, then
 * emit each n-gram as a byte-range slice. Semantics match the
 * `transform(sequence(...), i -> substr(text, i, n))` formulation exactly
 * (codepoint-counted positions, `length(text) < n` yields an empty array) —
 * but that formulation evaluates an interpreted lambda per position and
 * re-walks the string from its start inside every `substr` call, making it
 * O(chars^2) per row and the dominant cost of the n-gram language-ID
 * pipeline. This expression is O(bytes) per row and participates in
 * whole-stage codegen via a single static helper call.
 */
@ExpressionDescription(
  usage = "_FUNC_(text) - sliding character n-grams of a string.")
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"char n-grams require n > 0, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharNgramsExpr.compute($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgramsExpr =
    copy(child = newChild)
}

object CharNgramsExpr {

  /** Shared by eval and generated code: one O(bytes) pass over the UTF-8
    * encoding. A byte starts a codepoint iff it is not a continuation byte
    * (`10xxxxxx`), which is exactly how UTF8String counts characters.
    * Sized by BYTE length (an upper bound on starts), not `numChars()`:
    * on malformed UTF-8 (parquet does not validate) a truncated multi-byte
    * sequence makes numChars() undercount the continuation-scan's starts,
    * and sizing by it would walk off the array. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // codepoint start offsets, plus a sentinel end offset
    val starts = new Array[Int](total + 1)
    var chars = 0
    var i = 0
    while (i < total) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(chars) = i; chars += 1 }
      i += 1
    }
    starts(chars) = total
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var j = 0
    while (j < out.length) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + n) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
