package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Apply an ORDERED list of BPE merges to a token array in one expression:
 * for each merge (left, right), a single greedy left-to-right linear pass
 * replaces every adjacent occurrence with the joined symbol — the
 * sequential semantics BPE training defines, independent of partitioning.
 *
 * One expression for the WHOLE merge list: per row the cost is
 * O(merges x tokens) array-element moves in a tight JVM loop (amortized
 * in-place, no per-step array copies), versus the `aggregate()` HOF fold
 * this replaces, which was O(tokens^2) PER MERGE in interpreted lambdas
 * and nested one HOF tree per merge — unanalyzable past a few hundred
 * merges. The merge table rides along as a constant reference object, so
 * a trained vocabulary of thousands of merges is one flat loop, not an
 * expression tree.
 */
@ExpressionDescription(
  usage = "_FUNC_(toks) - apply the constant ordered BPE merge list to a token array.")
case class ApplyBpeMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  // pre-encoded merge table, shared across rows
  @transient private lazy val table: Array[Array[UTF8String]] =
    ApplyBpeMerges.encode(merges)

  override def nullSafeEval(input: Any): Any =
    ApplyBpeMerges.compute(input.asInstanceOf[ArrayData], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ApplyBpeMerges.compute($v, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): ApplyBpeMerges =
    copy(child = newChild)
}

object ApplyBpeMerges {

  def encode(merges: Seq[(String, String)]): Array[Array[UTF8String]] =
    merges.map { case (l, r) =>
      Array(UTF8String.fromString(l), UTF8String.fromString(r),
        UTF8String.fromString(l + " " + r))
    }.toArray

  /** Apply every merge in order, each as one greedy left-to-right linear
    * pass writing into a reused buffer. Null elements read as empty
    * strings (callers pass non-null token arrays). */
  def compute(toks: ArrayData, table: Array[Array[UTF8String]]): GenericArrayData = {
    var n = toks.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = toks.getUTF8String(i)
      i += 1
    }
    var m = 0
    while (m < table.length) {
      val left = table(m)(0)
      val right = table(m)(1)
      val joined = table(m)(2)
      var w = 0 // write cursor
      var r = 0 // read cursor
      while (r < n) {
        if (w > 0 && r < n && cur(w - 1) == left && cur(r) == right) {
          cur(w - 1) = joined
        } else {
          cur(w) = cur(r)
          w += 1
        }
        r += 1
      }
      n = w
      m += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = cur(i)
      i += 1
    }
    new GenericArrayData(out)
  }
}
