package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaccard similarity of two SORTED, DISTINCT string arrays in one fused
 * merge pass — no intermediate intersection/union arrays, unlike the
 * `array_intersect`/`array_union` formulation, and with `doGenCode` so the
 * similarity filter stays inside whole-stage codegen. The caller contract
 * (sorted + distinct, e.g. via `sort_array(array_distinct(...))`) is what
 * the dedup pipelines already produce.
 *
 * Null semantics: null if either input is null. Null ELEMENTS are not
 * supported — the producing expressions (`sort_array(array_distinct(...))`
 * over split/transform output) cannot emit them, and an array containing
 * one fails the merge pass. Empty/empty yields 0.0.
 */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - Jaccard similarity of two sorted distinct string arrays.")
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var inter = 0L
    while (i < n && j < m) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = n.toLong + m.toLong - inter
    if (union == 0L) 0.0d else inter.toDouble / union.toDouble
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      s"""
         |int $n = $x.numElements();
         |int $m = $y.numElements();
         |int $i = 0, $j = 0;
         |long $inter = 0L;
         |while ($i < $n && $j < $m) {
         |  int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |long $union = (long) $n + (long) $m - $inter;
         |${ev.value} = ($union == 0L) ? 0.0 : ((double) $inter) / ((double) $union);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
}
