package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Iceberg table spec's `bucket[N]` partition transform as a native
 * codegen expression: `bucket = (murmur3_x86_32(serialize(v)) &
 * Int.MaxValue) % N`, where `serialize` is the spec's Appendix-B hash
 * serialization — int/long/date/timestamp as the 8-byte little-endian
 * LONG value (ints PROMOTE, so `bucket[N](34)` equals
 * `bucket[N](34L)`), strings as their UTF-8 bytes. Lets a pipeline
 * pre-cluster writes to match an Iceberg table's bucket partitioning
 * (rows land in the file their partition tuple demands) and lets the
 * metadata tier recompute a table's own partition values for pruning.
 * NULL in, NULL out (the spec leaves null unbucketed —
 * `contains_null` carries it).
 */
@ExpressionDescription(
  usage = "_FUNC_(v, n) - Iceberg bucket[n] partition transform of v.")
case class IcebergBucketF(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "iceberg_bucket"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (n <= 0) {
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a positive bucket count, got $n")
    }
    child.dataType match {
      case IntegerType | LongType | DateType | TimestampType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName hashes int/long/date/timestamp/string values, " +
          s"got ${t.simpleString(10)}")
    }
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      IcebergTransformHash.bucketUtf8(v.asInstanceOf[UTF8String], n)
    case IntegerType | DateType =>
      IcebergTransformHash.bucketLong(v.asInstanceOf[Int].toLong, n)
    case _ =>
      IcebergTransformHash.bucketLong(v.asInstanceOf[Long], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = child.dataType match {
      case StringType =>
        (v: String) =>
          s"graft.functions.IcebergTransformHash.bucketUtf8($v, $n)"
      case _ =>
        (v: String) =>
          s"graft.functions.IcebergTransformHash.bucketLong((long) $v, $n)"
    }
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ${call(v)};")
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucketF =
    copy(child = newChild)
}

/**
 * The Iceberg spec's 32-bit hash (Appendix B): murmur3_x86_32 with
 * seed 0 over the type's hash serialization. Implemented from the
 * published algorithm (Austin Appleby's MurmurHash3, public domain)
 * and pinned against the spec's own test vectors in
 * `IcebergTransformSpec` (34 → 2017239379, "iceberg" → 1210000089,
 * date 2017-11-16 → -653330422, ...).
 */
object IcebergTransformHash {

  /** murmur3_x86_32(data, seed=0). */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      val b = i * 4
      var k1 = (data(b) & 0xff) | ((data(b + 1) & 0xff) << 8) |
        ((data(b + 2) & 0xff) << 16) | ((data(b + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Long family (int/long/date/timestamp): hash the 8-byte
    * little-endian value — ints promote, so int and long agree. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  /** Strings hash their UTF-8 bytes. */
  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n

  def bucketString(s: String, n: Int): Int =
    (hashString(s) & Int.MaxValue) % n

  def bucketUtf8(s: UTF8String, n: Int): Int =
    (murmur3(s.getBytes) & Int.MaxValue) % n

  /** `truncate[W]` on the long family: floor to a multiple of W
    * (`v - (((v % W) + W) % W)` — exact for negatives too). */
  def truncateLong(v: Long, w: Long): Long = v - (((v % w) + w) % w)

  /** `truncate[W]` on strings: the first W CODEPOINTS (never bytes —
    * a multi-byte character is kept or dropped whole). */
  def truncateString(s: String, w: Int): String = {
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))
  }
}
