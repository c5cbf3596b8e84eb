package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Probe a parquet split-block bloom filter bitset (the raw `bitset` bytes
 * the `bloomfilter` metadata level exposes) with a precomputed xxhash64
 * value: true when the chunk MAY contain the hashed value, false when it
 * certainly does not — the no-false-negative guarantee bloom pruning
 * ([[graft.meta.MetaPrune.filesMayContainLong]]) relies on.
 *
 * The hash side is a literal computed once on the driver
 * ([[graft.meta.Sbbf.hashLong]] / `hashBytes` — parquet's own value
 * hashing), so the executor-side work is the pure 8-word block probe:
 * evaluated per chunk EXECUTOR-side like the stat decodes, shipping one
 * boolean per file to the driver instead of megabytes of bitsets.
 */
@ExpressionDescription(
  usage = "_FUNC_(bitset, hash) - true if the split-block bloom bitset may contain the hash.")
case class SbbfMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "sbbf_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint) arguments, got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def nullSafeEval(bitset: Any, hash: Any): Any =
    graft.meta.Sbbf.mightContain(bitset.asInstanceOf[Array[Byte]], hash.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = graft.meta.Sbbf.mightContain($b, $h);
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SbbfMightContain =
    copy(left = newLeft, right = newRight)
}

/**
 * The parquet bloom-filter hash of a VALUE column: xxhash64 (seed 0, via
 * parquet's own `XxHash`) over the value's plain encoding — UTF8 bytes for
 * strings, raw bytes for binary, 8/4-byte little-endian for longs/ints —
 * byte-identical to what parquet-mr inserted at write time. Pairs with
 * [[SbbfMightContain]] so bulk probes (every value of a data file against
 * that file's decoded bitset) run as one codegen pass, no driver loop.
 */
@ExpressionDescription(
  usage = "_FUNC_(value) - parquet bloom-filter xxhash64 of the plain-encoded value.")
case class SbbfHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sbbf_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | LongType | IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, binary, bigint or int argument, " +
        s"got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => graft.meta.Sbbf.hashBytes(v.asInstanceOf[UTF8String].getBytes)
    case BinaryType => graft.meta.Sbbf.hashBytes(v.asInstanceOf[Array[Byte]])
    case LongType => graft.meta.Sbbf.hashLong(v.asInstanceOf[Long])
    case IntegerType => graft.meta.Sbbf.hashInt(v.asInstanceOf[Int])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val call = child.dataType match {
      case StringType => (v: String) => s"graft.meta.Sbbf.hashBytes($v.getBytes())"
      case BinaryType => (v: String) => s"graft.meta.Sbbf.hashBytes($v)"
      case LongType => (v: String) => s"graft.meta.Sbbf.hashLong($v)"
      case IntegerType => (v: String) => s"graft.meta.Sbbf.hashInt($v)"
    }
    defineCodeGen(ctx, ev, call)
  }

  override protected def withNewChildInternal(newChild: Expression): SbbfHash =
    copy(child = newChild)
}
