package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Content-defined chunking (CDC): split a string at positions where the
 * polynomial hash of the trailing `window` codepoints is divisible by
 * `divisor` — so chunk boundaries are a function of local CONTENT, not
 * position. Insert or delete one character and fixed-stride segmentations
 * misalign everywhere downstream; content-defined boundaries re-synchronize
 * at the next unchanged window, which is what makes chunk-hash dedup robust
 * to shifted/patched duplicates (the rsync/LBFS/backup-dedup construction).
 *
 * Boundary rule, exactly: with codepoint values c_1..c_n, cut AFTER
 * position i (i >= window) iff
 *   H(i) = (sum_{j=0..window-1} c_{i-window+1+j} * 31^{window-1-j}) mod 1000003
 * satisfies `H(i) % divisor == 0`. The expected chunk length is ~`divisor`
 * characters (a dial, not a guarantee). Chunks are the substrings between
 * consecutive cuts plus the tail; empty chunks cannot occur (cuts are
 * strictly increasing positions).
 *
 * Evaluated as ONE rolling O(chars) pass inside whole-stage codegen
 * (Horner update + modular removal of the outgoing character). The hash is
 * plain modular integer arithmetic so any engine can replay it exactly —
 * position-parallel (each H(i) from its own window) rather than rolling —
 * which is what the DuckDB oracle for `cdc_dedup` does.
 */
@ExpressionDescription(
  usage = "_FUNC_(text) - content-defined chunks of a string.")
case class CdcChunksExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  require(window >= 2, s"CDC window must be >= 2, got $window")
  require(divisor >= 2, s"CDC divisor must be >= 2, got $divisor")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[UTF8String], window, divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CdcChunksExpr.compute($s, $window, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
}

object CdcChunksExpr {

  private val Mod = 1000003L

  /** Shared by eval and generated code: decode codepoints once, roll the
    * window hash once. Codepoints (not UTF-16 units) so supplementary
    * characters hash as one symbol, matching any engine that indexes
    * strings by character. */
  def compute(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // codepoint values and their UTF-16 start offsets (for slicing)
    val codes = new Array[Long](n)
    val starts = new Array[Int](n + 1)
    var (ci, off) = (0, 0)
    while (off < str.length) {
      val cp = str.codePointAt(off)
      codes(ci) = cp.toLong
      starts(ci) = off
      ci += 1
      off += Character.charCount(cp)
    }
    starts(n) = str.length

    // 31^window mod Mod, for removing the outgoing character
    var powW = 1L
    var k = 0
    while (k < window) { powW = powW * 31L % Mod; k += 1 }

    val chunks = new java.util.ArrayList[Any]()
    var prevCut = 0 // codepoint index after the last cut
    var h = 0L
    var i = 0
    while (i < n) {
      // Horner push; the removal subtracts the outgoing character at
      // weight 31^window (the push just promoted it from 31^(window-1)),
      // keeping the invariant h = H(i) over the last min(i+1, window) chars
      h = (h * 31L + codes(i)) % Mod
      if (i >= window) {
        h = (h - codes(i - window) % Mod * powW) % Mod
        if (h < 0) h += Mod
      }
      if (i >= window - 1 && h % divisor == 0) {
        chunks.add(UTF8String.fromString(str.substring(starts(prevCut), starts(i + 1))))
        prevCut = i + 1
      }
      i += 1
    }
    if (prevCut < n) {
      chunks.add(UTF8String.fromString(str.substring(starts(prevCut), starts(n))))
    }
    new GenericArrayData(chunks.toArray)
  }
}
