package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared type check: the input must be `array<float>`. */
private[functions] trait FloatVectorInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }
}

/**
 * Value-based equality/hash for constant matrices embedded as expression
 * fields. Case-class equality on a raw `Array` field is reference identity,
 * so two structurally identical expressions would never be
 * `semanticEquals`/canonicalized equal — defeating common-subexpression
 * elimination and exchange reuse. Arrays-of-arrays erase to `Object[]`, so
 * `java.util.Arrays.deep*` applies to both `float[][]` and `double[][]`.
 */
private[functions] object ConstMatrix {
  def equal(a: Array[_], b: Array[_]): Boolean =
    java.util.Arrays.deepEquals(
      a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])
  def hash(a: Array[_]): Int =
    java.util.Arrays.deepHashCode(a.asInstanceOf[Array[AnyRef]])
}

/**
 * Index of the nearest centroid (squared L2) among a CONSTANT centroid set
 * embedded in the expression — the IVF coarse-quantizer assignment as a pure
 * narrow projection. The centroid matrix is driver-resident (k x dim floats,
 * trivially small) and ships to executors as a codegen reference object, so
 * cell assignment over the corpus involves NO join, NO shuffle and NO
 * re-computation of quantizer lineage: one generated loop per row.
 *
 * This replaces the crossJoin(broadcast(centroids)) + groupBy(id, vector)
 * argmin formulation, whose aggregation shuffled the whole corpus keyed by
 * the embedding vector — the round-2 scale-killer.
 *
 * Ties break toward the smaller centroid index (strict `<` keeps the first
 * minimum), identically in eval and codegen.
 */
@ExpressionDescription(
  usage = "_FUNC_(vec) - index of the nearest centroid to a float vector.")
case class NearestCell(child: Expression, centroids: Array[Array[Float]])
    extends UnaryExpression with FloatVectorInput {

  require(centroids.nonEmpty, "NearestCell requires at least one centroid")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = -1
    var bestD = Double.PositiveInfinity
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - c(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      s"""
         |int $best = -1;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $j = 0; $j < $cents.length; $j++) {
         |  float[] $c = $cents[$j];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $diff = ((double) $v.getFloat($i)) - ((double) $c[$i]);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override def equals(other: Any): Boolean = other match {
    case that: NearestCell =>
      child == that.child && ConstMatrix.equal(centroids, that.centroids)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + ConstMatrix.hash(centroids)

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/**
 * The `nprobe` nearest centroid indices, ordered by ascending squared L2
 * distance (ties toward the smaller index) — the probe-list side of an IVF
 * search. Evaluated only on the QUERY side (small by construction), so it is
 * a [[CodegenFallback]]: per-row it sorts k distances, trivial at query
 * cardinality, and keeping it interpreted avoids generating a sort.
 */
@ExpressionDescription(
  usage = "_FUNC_(vec) - the nprobe nearest centroid indices for a float vector.")
case class NearestCells(child: Expression, centroids: Array[Array[Float]], nprobe: Int)
    extends UnaryExpression with FloatVectorInput with CodegenFallback {

  require(centroids.nonEmpty, "NearestCells requires at least one centroid")
  require(nprobe > 0, s"NearestCells requires nprobe > 0, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dists = Array.tabulate(centroids.length) { j =>
      val c = centroids(j)
      val n = math.min(v.numElements(), c.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - c(i).toDouble
        d += diff * diff
        i += 1
      }
      (d, j)
    }
    val take = math.min(nprobe, centroids.length)
    val probes = dists
      .sortBy { case (d, j) => (d, j) }
      .take(take)
      .map { case (_, j) => j: Any }
    new GenericArrayData(probes)
  }

  override def equals(other: Any): Boolean = other match {
    case that: NearestCells =>
      child == that.child && nprobe == that.nprobe &&
        ConstMatrix.equal(centroids, that.centroids)
    case _ => false
  }
  override def hashCode(): Int =
    (31 * child.hashCode() + nprobe) * 31 + ConstMatrix.hash(centroids)

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}
