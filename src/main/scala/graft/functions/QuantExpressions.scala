package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/**
 * Symmetric fixed-point int8 quantization of a FLOAT vector:
 * `q_i = clamp(floor(x_i * scale), -128, 127)`, emitted as `array<int>`.
 *
 * The memory/bandwidth scale path for embedding search: an int8 corpus is
 * 4x smaller than float32 — 4x more vectors per executor page-cache byte,
 * 4x less scan I/O — and integer dot products replace float multiplies.
 * A FIXED power-of-two scale (not per-vector max-abs) keeps scores across
 * rows directly comparable and the arithmetic engine-portable: floor and
 * clamp are exactly reproducible in plain SQL, so the correctness gate
 * hash-pins quantized scores as integers (no float tolerance needed).
 *
 * Null in, null out; null elements read as 0.0 (callers should pass
 * non-null-element vectors). Non-finite elements clamp deterministically
 * (NaN -> 0, +Inf -> 127, -Inf -> -128) on the JVM, whereas a plain-SQL
 * replay of floor-and-cast errors on them — sanitize non-finite
 * embeddings upstream if oracle parity matters.
 */
@ExpressionDescription(
  usage = "_FUNC_(v, scale) - int8-clamped fixed-point quantization floor(x*scale) of a float vector.")
case class QuantizeFixedPoint(child: Expression, scale: Int)
    extends UnaryExpression {

  require(scale > 0,
    s"quantize_i8 requires a positive scale, got $scale (scale 0 quantizes " +
      "every vector to zeros; negative scales invert scores)")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "quantize_i8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    QuantizeFixedPoint.compute(input.asInstanceOf[ArrayData], scale)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.QuantizeFixedPoint.compute($v, $scale);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeFixedPoint = copy(child = newChild)
}

object QuantizeFixedPoint {
  def compute(v: ArrayData, scale: Int): GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val q = math.floor(v.getFloat(i).toDouble * scale)
      out(i) = math.max(-128L, math.min(127L, q.toLong)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Integer dot product of two INT vectors, accumulated in a long — the
 * scoring kernel paired with [[QuantizeFixedPoint]]. Same fused-loop,
 * whole-stage-codegen shape and null/length semantics as
 * [[DotProductF]]: null if either side is null, lengths truncated to the
 * shorter input. Exact for any realistic embedding dimension
 * (|q_i| <= 128, so overflow needs dims beyond 2^48).
 */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - exact integer dot product of two int vectors, as a long.")
case class DotProductI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isIntArray(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (isIntArray(left.dataType) && isIntArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((long) $x.getInt($i)) * ((long) $y.getInt($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductI =
    copy(left = newLeft, right = newRight)
}
