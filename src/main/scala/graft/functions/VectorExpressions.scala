package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared analysis-time type check: both inputs must be `array<float>`. */
private[functions] trait FloatVectorPair { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    def isFloatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }
}

/**
 * Native Catalyst expression: cosine similarity between two FLOAT vectors,
 * accumulated in double precision in one fused pass (dot product and both
 * norms computed together — no intermediate arrays, unlike the
 * `aggregate(zip_with(...))` formulation). Participates in whole-stage
 * codegen via `doGenCode`, so similarity scans over billions of embedding
 * rows stay inside a single generated loop.
 *
 * Null/empty/zero-norm semantics: null if either input is null; 0.0 if either
 * vector has zero norm. Lengths are truncated to the shorter input (extra
 * trailing elements on the longer side are ignored), and null elements are
 * read as 0.0 — callers should pass equal-length, non-null-element vectors.
 */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two float vectors, in double precision.")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with FloatVectorPair {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $x.getFloat($i);
         |  double $yi = (double) $y.getFloat($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/**
 * L2-normalize a FLOAT vector (unit Euclidean norm), double-precision
 * accumulation, one fused pass. The standard embedding preprocessing step:
 * over normalized vectors, cosine similarity reduces to [[DotProductF]]
 * (one multiply-add per element instead of three), so normalize once at
 * ingest and score with the cheaper kernel forever after. A zero-norm
 * vector normalizes to itself (no NaNs enter the pipeline).
 */
@ExpressionDescription(
  usage = "_FUNC_(a) - the float vector scaled to unit L2 norm.")
case class L2Normalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    L2Normalize.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.L2Normalize.compute($v);")

  override protected def withNewChildInternal(
      newChild: Expression): L2Normalize = copy(child = newChild)
}

object L2Normalize {
  def compute(v: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val out = new Array[Any](n)
    val inv = if (ss == 0.0) 1.0 else 1.0 / math.sqrt(ss)
    i = 0
    while (i < n) {
      out(i) = (v.getFloat(i) * inv).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/**
 * Dot product of two FLOAT vectors in double precision — same fused-loop,
 * codegen-friendly shape and null/length semantics as [[CosineSimilarity]].
 * Useful when norms are precomputed once per vector (normalized embeddings).
 */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - dot product of two float vectors, in double precision.")
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with FloatVectorPair {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}
