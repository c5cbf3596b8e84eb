package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded top-k by score: a typed imperative aggregate whose buffer is a
 * fixed-capacity binary heap of (score, id) pairs, so the PARTIAL aggregation
 * stage already truncates to k entries per group per mapper. Shuffle volume
 * for a grouped top-k is therefore `mappers x groups x k` rows instead of the
 * full candidate set — the property the window-function formulation
 * (`row_number().over(Window.partitionBy(q).orderBy(score))`) lacks, since a
 * window moves EVERY candidate row of a group to a single reducer and sorts
 * it there. This is the ranking stage that keeps ANN top-k scaling when the
 * corpus grows 100x (per-reducer work is O(k log k), not O(|corpus|)).
 *
 * Ordering: score descending, id ascending on ties — fully deterministic
 * regardless of partial-merge order. Null scores/ids are skipped.
 *
 * Result: `array<struct<score:double, id:bigint>>`, best-first, length <= k.
 *
 * The reference engine delegates top-k to its host's sort-limit operator
 * (reference: src/main/scala/com/github/sadikovi/metadata/DefaultSource.scala
 * exposes plain relations and leaves ranking to the engine); this aggregate
 * is the scale-safe Spark-native equivalent for grouped (per-query) top-k.
 */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, s"top-k requires k > 0, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint) arguments, got " +
          s"${scoreExpr.dataType.simpleString} and ${idExpr.dataType.simpleString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      buffer.insert(s.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, id) =>
      new GenericInternalRow(Array[Any](s, id))
    })
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scoreAt(i))
      bb.putLong(buffer.idAt(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      h.insert(bb.getDouble(), bb.getLong())
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

/**
 * Fixed-capacity binary heap of (score, id) keeping the k BEST entries,
 * where "better" means higher score, then smaller id. The root is the worst
 * kept entry, so an insert into a full heap is a single compare in the common
 * reject case. Parallel primitive arrays — no boxing in the hot loop.
 */
final class TopKHeap(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n
  def scoreAt(i: Int): Double = scores(i)
  def idAt(i: Int): Long = ids(i)

  /** True if (s1, id1) ranks WORSE than (s2, id2). */
  private def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 < s2 || (s1 == s2 && id1 > id2)

  def insert(s: Double, id: Long): Unit = {
    // NaN never ranks: every `worse` comparison against NaN is false, so a
    // NaN admitted under capacity would reach the root and then block all
    // later inserts. A NaN score is "no similarity" — not a candidate.
    if (s.isNaN) return
    if (n < k) {
      scores(n) = s
      ids(n) = id
      n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s
      ids(0) = id
      siftDown(0)
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) {
      insert(other.scoreAt(i), other.idAt(i))
      i += 1
    }
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      // heap property: parent is WORSE-or-equal than children (worst at root)
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        swap(i, p); i = p
      } else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      swap(i, w); i = w
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Kept entries ordered best-first (score desc, id asc), using the SAME
    * comparator as [[worse]] (score equality via `==`, then id) — a
    * TotalOrdering sort would distinguish -0.0 from 0.0 where insert/evict
    * and Spark's double ordering treat them as equal, letting a -0.0/0.0
    * score tie violate the documented determinism. NaN never reaches the
    * heap (rejected at [[insert]]), so `==` comparisons are total here. */
  def sortedBestFirst(): Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    out.sortInPlace()(new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int =
        if (worse(a._1, a._2, b._1, b._2)) 1
        else if (worse(b._1, b._2, a._1, a._2)) -1
        else 0
    })
    out
  }
}
