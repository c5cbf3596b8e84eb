package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character collision score in exact micro-units: for a string with
 * codepoint counts c_1..c_k over n total codepoints,
 *   `floor(1e6 * sum(c_i^2) / n^2)`
 * — the collision probability of two uniformly drawn characters, i.e. the
 * exponential of the negative Rényi-2 entropy. A natural-language document
 * sits low (many characters, balanced); degenerate content — "aaaa...",
 * single-character padding, repeated separators — drives it toward 1e6.
 * The quality-filter companion to Shannon entropy that needs NO logarithm,
 * so it is exact integer arithmetic end to end and any SQL engine replays
 * it bit-for-bit (log differs in the last ulp across libm implementations;
 * a ratio of integer sums never does).
 *
 * One O(chars) codegen pass: a dense 128-slot ASCII histogram plus a
 * spill map for the rest, then one sum of squares. Null in, null out.
 */
@ExpressionDescription(
  usage = "_FUNC_(text) - char collision probability in micro-units.")
case class CollisionScoreExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_collision_micro"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CollisionScoreExpr.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CollisionScoreExpr.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): CollisionScoreExpr =
    copy(child = newChild)
}

object CollisionScoreExpr {

  /** Empty string scores 0 (no pair to collide — the defined floor). */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Long] = null
    var n = 0L
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (other == null) other = new java.util.HashMap[Integer, Long]()
        other.merge(cp, 1L, (a, b) => a + b)
      }
      n += 1L
      off += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    var sq = 0L
    var i = 0
    while (i < 128) { sq += ascii(i) * ascii(i); i += 1 }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val c = it.next(); sq += c * c }
    }
    // n <= ~2^31 codepoints, sq <= n^2: the 1e6 scaling must go through
    // the division's quotient in two steps to stay in Long range:
    // floor(1e6 * sq / n^2) = (sq / n^2 is < 1) -> compute via BigInt-free
    // split: q = sq / n, r = sq % n; 1e6*sq/n^2 = (1e6*q + 1e6*r/n) / n
    val q = sq / n
    val r = sq % n
    (1000000L * q + 1000000L * r / n) / n
  }
}
