package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Sliding word n-grams over a token array, space-joined, in one fused
 * pass. The `transform(sequence(...), i -> concat_ws(' ', element_at(toks,
 * i), ..., element_at(toks, i+n-1)))` formulation it replaces runs an
 * interpreted lambda per position whose n `element_at` calls each re-derive
 * the token array expression — for n = 8 shingling that is the difference
 * between O(tokens) and O(tokens * n * cost(tokenize)) per row, and was the
 * dominant cost of corpus-side decontamination.
 *
 * `size < n` yields an empty array (same guard as the replaced form).
 * Null elements are skipped by the join (concat_ws semantics); the token
 * producers in this library cannot emit them.
 */
@ExpressionDescription(
  usage = "_FUNC_(tokens) - sliding space-joined word n-grams of a string array.")
case class WordNgramsF(child: Expression, n: Int)
    extends UnaryExpression {

  require(n > 0, s"word n-grams require n > 0, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordNgramsF.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.WordNgramsF.compute($arr, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsF =
    copy(child = newChild)
}

object WordNgramsF {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    if (total < n) return new GenericArrayData(Array.empty[Any])
    // materialize the token strings once; each participates in n windows
    val toks = new Array[UTF8String](total)
    var i = 0
    while (i < total) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](total - n + 1)
    // concatWs only reads the varargs array, so one window buffer refilled
    // per position avoids an allocation per n-gram on the hot path
    val window = new Array[UTF8String](n)
    var j = 0
    while (j < out.length) {
      System.arraycopy(toks, j, window, 0, n)
      out(j) = UTF8String.concatWs(Space, window: _*)
      j += 1
    }
    new GenericArrayData(out)
  }
}
