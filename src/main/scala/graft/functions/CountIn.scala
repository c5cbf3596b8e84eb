package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count of a string array's elements (with multiplicity) that appear in a
 * small CONSTANT set — the language-ID profile-scoring hot loop as one fused
 * codegen pass. The `size(filter(arr, t => t.isin(...)))` formulation it
 * replaces runs as an interpreted higher-order function (HOFs never enter
 * whole-stage codegen) and allocates an intermediate filtered array per row
 * per profile; this expression is a branch-free nested loop over UTF8String
 * bytes with zero allocation.
 *
 * The set is embedded as a sorted `UTF8String[]` reference object; profiles
 * are tiny (<= ~8 entries) so a linear scan beats hashing. Null array
 * elements are skipped (they match nothing), matching the `isin` filter
 * semantics it replaces.
 */
@ExpressionDescription(
  usage = "_FUNC_(arr) - how many elements of arr are in a fixed string set.")
case class CountIn(child: Expression, set: Seq[String])
    extends UnaryExpression {

  require(set.nonEmpty, "CountIn requires a non-empty set")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  @transient private lazy val utf8Set: Array[UTF8String] =
    set.distinct.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val e = arr.getUTF8String(i)
        var j = 0
        var found = false
        while (j < utf8Set.length && !found) {
          if (e.equals(utf8Set(j))) found = true
          j += 1
        }
        if (found) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("set", utf8Set,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $n = $arr.numElements();
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $e = $arr.getUTF8String($i);
         |    for (int $j = 0; $j < $setRef.length; $j++) {
         |      if ($e.equals($setRef[$j])) { $cnt++; break; }
         |    }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountIn =
    copy(child = newChild)
}
