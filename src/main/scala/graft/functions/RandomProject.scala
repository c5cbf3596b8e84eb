package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/**
 * Deterministic sparse-free random projection (Johnson-Lindenstrauss) of a
 * FLOAT vector to `k` dimensions with a ±1 sign matrix (Achlioptas 2003:
 * Rademacher entries preserve pairwise distances like Gaussian ones):
 * `out_j = sum_i sign(j, i) * v_i`, where `sign(j, i)` derives from an
 * arithmetic hash — `(j*73856093 + i*19349663 + 104729) % 1000003`
 * remixed by `* 2654435761 % 1000003`, parity picks the sign. (The two
 * coordinate multipliers are coprime to the modulus; a `j*1000003`-style
 * term would vanish mod 1000003 and collapse every output row to the
 * same sign pattern.) A pure function of the coordinates, so the matrix
 * is never materialized, never shuffled, and identical on every
 * executor, run, and engine (the same formula is plain SQL for oracle
 * replays).
 *
 * The dimensionality-reduction scale path for embedding search: k=16 of
 * dim-64 floats is a 4x byte cut ON TOP of int8 quantization's 4x, and
 * the projection is a narrow fused loop inside whole-stage codegen — no
 * shuffle, no UDF, no per-row allocation beyond the output array. Cosine
 * ranking in projected space is scale-free, so no 1/sqrt(k) factor is
 * applied. An exact duplicate projects identically (the projection is a
 * pure function of the vector), so planted-copy recall oracles carry
 * over unchanged. Null in, null out; accumulation in double, emitted as
 * float.
 */
@ExpressionDescription(
  usage = "_FUNC_(v, k) - deterministic +-1 random projection of a float vector to k dims.")
case class RandomProject(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0, s"random_project requires a positive target dim, got $k")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "random_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RandomProject.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.RandomProject.compute($v, $k);")

  override protected def withNewChildInternal(
      newChild: Expression): RandomProject = copy(child = newChild)
}

object RandomProject {
  /** +1 / -1 from the arithmetic hash of (row j, input coordinate i). */
  def sign(j: Int, i: Int): Float = {
    val x = (j.toLong * 73856093L + i.toLong * 19349663L + 104729L) % 1000003L
    if (x * 2654435761L % 1000003L % 2L == 0L) 1.0f else -1.0f
  }

  def compute(v: ArrayData, k: Int): GenericArrayData = {
    val d = v.numElements()
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      while (i < d) {
        acc += sign(j, i).toDouble * v.getFloat(i)
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }
}
