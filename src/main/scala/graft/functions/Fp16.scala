package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/**
 * IEEE 754 binary16 (the parquet FLOAT16 logical type, a 2-byte
 * little-endian FIXED_LEN_BYTE_ARRAY) — both conversion directions
 * plus the PLAIN-page stats core the [[PageDecode]] dispatcher's
 * FLOAT16 arm routes to. The bit layout is the public standard's:
 * 1 sign + 5 exponent (bias 15) + 10 mantissa; subnormals scale by
 * 2^-24, exponent 31 is inf/NaN. (parquet-java's own `Float16` helper
 * is package-private, so the arithmetic is restated here from the
 * standard.)
 */
object Fp16 {

  /** binary16 bits (low 16 of `bits`) → float, exactly. */
  def halfToFloat(bits: Int): Float = {
    val b = bits & 0xffff
    val s = (b & 0x8000) << 16
    val e = (b >>> 10) & 0x1f
    val m = b & 0x3ff
    if (e == 0) {
      if (m == 0) java.lang.Float.intBitsToFloat(s)
      else {
        val v = m * 5.9604645e-8f // m * 2^-24
        if ((b & 0x8000) != 0) -v else v
      }
    } else if (e == 31) {
      if (m == 0) java.lang.Float.intBitsToFloat(s | 0x7f800000)
      else Float.NaN
    } else {
      java.lang.Float.intBitsToFloat(s | ((e + 112) << 23) | (m << 13))
    }
  }

  /** float → binary16 bits, round-to-nearest-even (ties to even). */
  def floatToHalf(f: Float): Short = {
    val fb = java.lang.Float.floatToIntBits(f)
    val s = (fb >>> 16) & 0x8000
    val e = (fb >>> 23) & 0xff
    val m = fb & 0x7fffff
    if (e == 0xff) { // inf / NaN
      (s | 0x7c00 | (if (m != 0) 0x200 else 0)).toShort
    } else {
      val he = e - 112 // float bias 127 -> half bias 15
      if (he >= 31) (s | 0x7c00).toShort // overflow -> inf
      else if (he <= 0) {
        if (he < -10) s.toShort // too small -> signed zero
        else {
          // subnormal: implicit 1 bit joins the mantissa, shift by he
          val full = m | 0x800000
          val shift = 14 - he
          val half = full >>> shift
          val rem = full & ((1 << shift) - 1)
          val tie = 1 << (shift - 1)
          val rounded =
            if (rem > tie || (rem == tie && (half & 1) == 1)) half + 1
            else half
          (s | rounded).toShort
        }
      } else {
        val half = (s | (he << 10) | (m >>> 13))
        val rem = m & 0x1fff
        val rounded =
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1
          else half
        rounded.toShort
      }
    }
  }

  /** PLAIN FLOAT16 values-region stats: `nn` consecutive 2-byte LE
    * halves → (n, min, max) as the FP contract (extrema exact,
    * order-independent; no sum — float addition is order-dependent).
    * Null on a region/count mismatch, never a wrong answer. NaNs
    * count but never place in the extrema (the same rule the PLAIN
    * FP arm applies). */
  def stats(region: Array[Byte], nn: Int): InternalRow = {
    if (nn < 0 || region == null ||
        region.length != nn.toLong * 2) return null
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var seen = false
    var i = 0
    while (i < nn) {
      val bits = (region(2 * i) & 0xff) | ((region(2 * i + 1) & 0xff) << 8)
      val v = halfToFloat(bits)
      if (!java.lang.Float.isNaN(v)) {
        seen = true
        if (v < mn) mn = v
        if (v > mx) mx = v
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nn.toLong,
      if (seen) java.lang.Double.valueOf(mn) else null,
      if (seen) java.lang.Double.valueOf(mx) else null))
  }
}
