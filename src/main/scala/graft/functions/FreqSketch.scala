package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries heavy-hitters sketch: a typed imperative aggregate whose
 * buffer holds at most `capacity` (item, count) counters, so finding the
 * frequent items of a column needs CONSTANT executor memory per group no
 * matter how many distinct items exist — the property a plain
 * `groupBy(item).count()` lacks when the vocabulary itself is too large to
 * aggregate (URLs, n-grams, user-ids at 100 TB). Partial buffers are
 * bounded, map-side combined, and merged with the summed-counts +
 * subtract-(c+1)th-largest rule (Agarwal et al., PODS'12 "Mergeable
 * summaries"), which preserves the Misra-Gries guarantee end-to-end:
 *
 *   true_count - err <= count <= true_count,   err <= n / (capacity + 1)
 *
 * where `err` is TRACKED EXACTLY by the buffer (total decrement applied),
 * so the output carries per-sketch certainty: every item whose lower bound
 * exceeds another's upper bound is PROVABLY more frequent.
 *
 * Result: `array<struct<item:string, count_lb:bigint, count_ub:bigint>>`,
 * ordered (count_lb desc, item asc). With `capacity >= distinct(item)` no
 * eviction ever fires, the sketch degrades to exact counts (count_lb ==
 * count_ub, any merge order), and results are engine-reproducible — the
 * correctness gate pins that regime exactly; the eviction regime's error
 * bound is spec-asserted instead (contents there are merge-order
 * dependent, as for any Misra-Gries implementation).
 */
case class FreqSketch(
    itemExpr: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"freq_sketch requires capacity > 0, got $capacity")

  override def child: Expression = itemExpr

  override def checkInputDataTypes(): TypeCheckResult =
    if (itemExpr.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${itemExpr.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lb", LongType, nullable = false),
      StructField("count_ub", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(capacity)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val item = itemExpr.eval(input)
    if (item != null) buffer.add(item.asInstanceOf[UTF8String], 1L)
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    val entries = buffer.sortedEntries()
    new GenericArrayData(entries.map { case (item, lb) =>
      new GenericInternalRow(Array[Any](item, lb, lb + buffer.err))
    })
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    // unordered: deserialization rebuilds a HashMap, so sorting here would
    // be O(capacity log capacity) work discarded on every partial shuffle
    val entries = buffer.entries()
    var bytes = 4 + 8 + 4 // size, err, capacity echo
    entries.foreach { case (item, _) => bytes += 4 + item.numBytes() + 8 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    bb.putLong(buffer.err)
    bb.putInt(capacity)
    entries.foreach { case (item, c) =>
      val b = item.getBytes
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt()
    val err = bb.getLong()
    val cap = bb.getInt()
    val buf = new FreqBuffer(cap)
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(UTF8String.fromBytes(b), bb.getLong())
      i += 1
    }
    buf.err += err
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(itemExpr = newChild)
}

/**
 * Bounded counter map for [[FreqSketch]]. `err` is the exact cumulative
 * decrement this buffer (and everything merged into it) has applied — the
 * certified gap between a kept counter and the item's true count.
 */
final class FreqBuffer(val capacity: Int) {
  private val counts = new java.util.HashMap[UTF8String, java.lang.Long]()
  var err: Long = 0L

  def size: Int = counts.size()

  /** Add `w` occurrences of `item` (Misra-Gries decrement on overflow).
    * The incoming UTF8String may alias reused row memory — cloned before
    * it is stored as a key. */
  def add(item: UTF8String, w: Long): Unit = {
    val cur = counts.get(item)
    if (cur != null) {
      counts.put(item, cur + w)
    } else if (counts.size() < capacity) {
      counts.put(item.clone(), java.lang.Long.valueOf(w))
    } else {
      // decrement-all by min(w, smallest admission cost): classic MG
      // processes one occurrence at a time; with weight w, decrement by
      // d = min(w, min_count + ...) — we apply the simple exact rule:
      // repeatedly decrement by the minimum of (w, smallest counter).
      var remaining = w
      while (remaining > 0) {
        var minC = Long.MaxValue
        val it0 = counts.values().iterator()
        while (it0.hasNext) minC = math.min(minC, it0.next().longValue())
        val d = math.min(remaining, minC)
        err += d
        remaining -= d
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nc = e.getValue.longValue() - d
          if (nc <= 0L) it.remove() else e.setValue(nc)
        }
        if (remaining > 0 && counts.size() < capacity) {
          counts.put(item.clone(), java.lang.Long.valueOf(remaining))
          remaining = 0
        }
      }
    }
  }

  /** Mergeable-summaries rule: sum counters, then if over capacity subtract
    * the (capacity+1)-th largest count from all and drop non-positives. */
  def mergeFrom(other: FreqBuffer): Unit = {
    err += other.err
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != null) counts.put(e.getKey, cur + e.getValue.longValue())
      else counts.put(e.getKey, e.getValue) // other's keys are already owned copies
    }
    if (counts.size() > capacity) {
      val vals = new Array[Long](counts.size())
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      err += cut
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nc = e.getValue.longValue() - cut
        if (nc <= 0L) ei.remove() else e.setValue(nc)
      }
    }
  }

  /** Entries in map order — for serialization, where order is irrelevant. */
  def entries(): Array[(UTF8String, Long)] = {
    val out = new Array[(UTF8String, Long)](counts.size())
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = (e.getKey, e.getValue.longValue())
      i += 1
    }
    out
  }

  /** Entries ordered (count desc, item asc) — deterministic for a given
    * counter state. */
  def sortedEntries(): Array[(UTF8String, Long)] = {
    val out = entries()
    out.sortInPlace()(new Ordering[(UTF8String, Long)] {
      def compare(a: (UTF8String, Long), b: (UTF8String, Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2)
        if (c != 0) c else a._1.compareTo(b._1)
      }
    })
    out
  }
}
