package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Element-wise sum of `array<float>` vectors in double precision — the
 * centroid-mean building block (`mean = vector_sum / count`) as ONE pass
 * over the rows. The `posexplode + groupBy(cell, pos) + avg` formulation it
 * replaces multiplies the row count by the vector dimension (64x here)
 * before aggregating; this aggregate folds each vector into a single
 * per-group `double[dim]` buffer, so a billion-row corpus aggregates a
 * billion rows, not 64 billion. Partial buffers are dim-sized and merge
 * associatively, so map-side combine applies as usual.
 *
 * The buffer adopts the dimension of the first vector seen; longer inputs
 * are truncated and shorter ones padded with zeros (inputs are fixed-dim in
 * practice). Null vectors are skipped. Zero rows yield an empty array.
 */
case class VectorSumF(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_sum_f"

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buffer: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: VecSumBuffer): Any =
    new GenericArrayData(buffer.sums.map(x => x: Any))

  override def serialize(buffer: VecSumBuffer): Array[Byte] = {
    val s = buffer.sums
    val bb = ByteBuffer.allocate(4 + 8 * s.length)
    bb.putInt(s.length)
    s.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt()
    val b = new VecSumBuffer
    b.sums = Array.fill(n)(bb.getDouble())
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumF =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumF =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorSumF =
    copy(child = newChild)
}

/** Mutable element-wise double accumulator; empty until the first vector. */
final class VecSumBuffer {
  var sums: Array[Double] = Array.emptyDoubleArray

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (sums.isEmpty) sums = new Array[Double](n)
    val m = math.min(n, sums.length)
    var i = 0
    while (i < m) {
      if (!v.isNullAt(i)) sums(i) += v.getFloat(i).toDouble
      i += 1
    }
  }

  def mergeFrom(other: VecSumBuffer): Unit = {
    if (sums.isEmpty) {
      sums = other.sums.clone()
    } else {
      val m = math.min(sums.length, other.sums.length)
      var i = 0
      while (i < m) { sums(i) += other.sums(i); i += 1 }
    }
  }
}
