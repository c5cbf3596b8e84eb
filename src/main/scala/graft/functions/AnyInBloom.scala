package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * True iff ANY element of a string array might be in a CONSTANT Bloom
 * filter — the corpus-side prefilter of benchmark decontamination. The
 * filter is built driver-side over the (small) benchmark shingle set and
 * ships to executors as a reference object, so the corpus scan stays a
 * narrow projection: no shuffle, no join, and — by the Bloom guarantee —
 * no false negatives. False positives are someone else's problem by
 * design: callers re-verify candidates exactly against the real shingle
 * set, which only the (tiny) surviving fraction of the corpus reaches.
 *
 * Short-circuits on the first hit. Null elements never match; a null
 * array yields null.
 */
@ExpressionDescription(
  usage = "_FUNC_(arr) - whether any element of arr might be in a fixed Bloom filter.")
case class AnyInBloom(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "any_in_bloom"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    AnyInBloom.anyMightContain(input.asInstanceOf[ArrayData], bloom)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.AnyInBloom.anyMightContain($arr, $ref);")
  }

  // Case-class equality would delegate to BloomFilterImpl.equals — a full
  // bit-array compare on every semanticEquals/canonicalization probe. The
  // filter is a driver-built constant shared by reference within a plan, so
  // identity equality is both cheap and sufficient for CSE; two distinct
  // instances are conservatively unequal (never incorrect, only un-deduped).
  override def equals(other: Any): Boolean = other match {
    case that: AnyInBloom => child == that.child && (bloom eq that.bloom)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + System.identityHashCode(bloom)

  override protected def withNewChildInternal(newChild: Expression): AnyInBloom =
    copy(child = newChild)
}

object AnyInBloom {
  def anyMightContain(arr: ArrayData, bloom: BloomFilter): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
          bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) {
        return true
      }
      i += 1
    }
    false
  }
}
