package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Fused hash-sketch expressions for the dedup pipelines. Each computes a
 * whole signature in ONE pass that hashes every token exactly once:
 *
 *  - [[MinHashSig]]: the `transform(sequence(0, P-1), p ->
 *    array_min(transform(tokens, t -> xxhash64(p, t))))` formulation it
 *    replaces evaluates interpreted lambdas AND hashes every token string
 *    P times (P = 64 permutations -> 64 full xxhash passes over every
 *    token's bytes). Here each token is xxhash64'd once and the P
 *    per-permutation values derive from that base with a 3-op integer
 *    finalizer — the standard one-hash + P-mixers MinHash construction.
 *
 *  - [[SimHash64F]]: replaces 64 interpreted `aggregate` folds (one per
 *    bit) with one pass accumulating all 64 signed bit-counters per token.
 *
 * Both keep the invariants the pipelines rely on — identical token sets
 * yield identical signatures, near-identical sets yield near-identical
 * ones — while changing the concrete hash family (permitted: the oracle
 * checks verify candidate semantics, not hash values; the specs assert
 * family-agnostic invariants).
 *
 * The reference engine has no sketching; these extend the same
 * host-native-expression philosophy as the rest of `graft.functions`.
 */
object HashSketches {
  /** 64-bit avalanche finalizer (MurmurHash3 fmix64): decorrelates the
    * per-permutation streams derived from one base hash. */
  def fmix64(x: Long): Long = {
    var h = x
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** xxhash64 of a UTF8String's bytes, seed 42 (Spark's default seed). */
  def baseHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** Permutation p's value for a token with base hash `h`. */
  def permHash(h: Long, p: Int): Long =
    fmix64(h ^ (0x9E3779B97F4A7C15L * (p + 1)))

  /** MinHash signature; empty input yields all-null (matching the
    * `array_min(empty) = null` semantics of the formulation it replaces). */
  def minhash(arr: ArrayData, numPerms: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numPerms))
    val mins = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = baseHash(arr.getUTF8String(i))
        var p = 0
        while (p < numPerms) {
          val h = permHash(base, p)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** 64-bit SimHash; empty input yields all sign bits set (each zero
    * counter counts as non-negative), matching the folded formulation. */
  def simhash(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = baseHash(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Fused MinHash signature of a string array: `array<long>` of length
  * `numPerms`; all-null for an empty input. */
@ExpressionDescription(
  usage = "_FUNC_(tokens) - MinHash signature of a string array.")
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  require(numPerms > 0, s"minhash requires numPerms > 0, got $numPerms")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashSketches.minhash(input.asInstanceOf[ArrayData], numPerms)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashSketches.minhash($arr, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Fused 64-bit SimHash of a string array. */
@ExpressionDescription(
  usage = "_FUNC_(tokens) - 64-bit SimHash of a string array.")
case class SimHash64F(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashSketches.simhash(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.HashSketches.simhash($arr);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64F =
    copy(child = newChild)
}

/**
 * Sign-pattern LSH bucket of a float vector against a CONSTANT hyperplane
 * matrix: bit j is the sign of `dot(vec, plane_j)`, all planes in one
 * fused loop. Replaces `numPlanes` interpreted `aggregate` folds, each
 * re-walking the vector under a lambda. Dot products accumulate in doubles
 * in index order — bit-identical to the column-arithmetic formulation.
 */
@ExpressionDescription(
  usage = "_FUNC_(vec) - sign-pattern LSH bucket id of a float vector.")
case class LshBucketF(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with FloatVectorInput {

  require(planes.nonEmpty && planes.length <= 64,
    s"LshBucketF requires 1..64 planes, got ${planes.length}")

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    LshBucketF.compute(v, planes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshBucketF.compute($v, $ref);")
  }

  override def equals(other: Any): Boolean = other match {
    case that: LshBucketF =>
      child == that.child && ConstMatrix.equal(planes, that.planes)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + ConstMatrix.hash(planes)

  override protected def withNewChildInternal(newChild: Expression): LshBucketF =
    copy(child = newChild)
}

object LshBucketF {
  def compute(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val plane = planes(j)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (dot >= 0.0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}
