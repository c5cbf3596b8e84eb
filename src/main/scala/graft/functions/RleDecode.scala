package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType}

/**
 * The parquet RLE/bit-packed hybrid decoder (format spec `Encodings.md`,
 * "Run Length Encoding / Bit-Packing Hybrid"): a sequence of
 * ULEB128-headed runs — header LSB 0 is an RLE run (count = header >> 1,
 * one fixed-width little-endian value), LSB 1 a bit-packed run
 * (groups = header >> 1, each group eight values packed LSB-first at
 * `bitWidth` bits). This is the encoding parquet uses for definition/
 * repetition levels AND for dictionary indexes in data pages — the layout
 * parquet-mr writes by default.
 */
object RleBp {

  /**
   * Plausibility cap on decoded value counts: counts come from untrusted
   * page headers, and the output array is allocated up front — without a
   * bound a crafted header claiming `Int.MaxValue` values forces a multi-GB
   * allocation before any byte of the payload is validated (the same class
   * of hardening as [[PageInflate]]'s 256 MB page cap and its snappy
   * declared-length pre-check). 2^26 values (a 256 MB int array) is far
   * past any page a real writer produces — parquet-mr's default page is
   * 1 MB and its default page row-count limit is 20 000.
   */
  val MaxDecoded: Int = 1 << 26

  /**
   * Decode up to `maxCount` fixed-width values from `bytes[start, end)`.
   * Returns null on any malformation (truncated varint, run overrunning
   * the region, negative header, count past [[MaxDecoded]]) — callers must
   * keep "cannot decode" distinguishable from decoded zeros. Extra
   * trailing values inside the final bit-packed group (padding up to a
   * multiple of 8) are discarded.
   */
  def decode(
      bytes: Array[Byte], start: Int, end: Int,
      bitWidth: Int, maxCount: Int): Array[Int] = {
    if (bytes == null || start < 0 || end > bytes.length || bitWidth < 0 ||
        bitWidth > 31 || maxCount < 0 || maxCount > MaxDecoded) return null
    val out = new Array[Int](maxCount)
    var n = 0
    var pos = start
    val byteWidth = (bitWidth + 7) / 8
    while (n < maxCount) {
      // ULEB128 varint header
      var header = 0L
      var shift = 0
      var more = true
      while (more) {
        if (pos >= end || shift > 35) return null
        val b = bytes(pos)
        pos += 1
        header |= (b & 0x7FL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      if ((header & 1L) == 0L) {
        // RLE run: one little-endian value repeated (header >> 1) times
        val count = header >>> 1
        if (count < 0 || count > Int.MaxValue) return null
        if (pos + byteWidth > end) return null
        var v = 0
        var k = 0
        while (k < byteWidth) {
          v |= (bytes(pos + k) & 0xFF) << (8 * k)
          k += 1
        }
        pos += byteWidth
        var c = math.min(count, (maxCount - n).toLong).toInt
        while (c > 0) { out(n) = v; n += 1; c -= 1 }
      } else {
        // bit-packed run: (header >> 1) groups of 8 values, LSB-first
        val groups = header >>> 1
        if (groups <= 0 || groups > (Int.MaxValue >> 3)) return null
        val runBytes = groups * bitWidth // groups * 8 * bitWidth / 8
        if (pos + runBytes > end) return null
        val total = groups.toInt * 8
        var i = 0
        while (i < total && n < maxCount) {
          val bitPos = i * bitWidth
          var v = 0
          var bit = 0
          while (bit < bitWidth) {
            val gb = bitPos + bit
            if ((bytes(pos + (gb >> 3)) & (1 << (gb & 7))) != 0) v |= 1 << bit
            bit += 1
          }
          out(n) = v
          n += 1
          i += 1
        }
        pos += runBytes.toInt
      }
    }
    out
  }
}

/**
 * Decode the dictionary INDEXES of a v1 data page whose values are
 * dictionary-encoded (PLAIN_DICTIONARY / RLE_DICTIONARY) — the layout
 * parquet-mr writes by default for low-cardinality columns. The page
 * payload (`page_content`, uncompressed) is, for a flat column:
 *
 *   [if maxDef > 0: u32 LE length + RLE/bit-packed definition levels]
 *   [1 byte index bit-width]
 *   [RLE/bit-packed hybrid dictionary indexes, one per NON-NULL value]
 *
 * Arguments: the payload bytes, the column's max definition level (0 for
 * required, 1 for flat optional — nested columns with repetition levels
 * are not handled and yield null), and the page header's `num_values`
 * (nulls included; the def-level walk determines how many indexes exist).
 * Returns the indexes of the non-null values in order, composable with
 * [[PlainDictStrings]] via `transform(idx, i -> element_at(dict, i + 1))`.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values) - dictionary indexes of a v1 data page as array<int>.")
case class DictIndexes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dict_indexes"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any): Any =
    DictIndexes.compute(bytes, maxDef.asInstanceOf[Int], numValues match {
      case l: Long => if (l < 0 || l > Int.MaxValue) -1 else l.toInt
      case i: Int => i
    })

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("decoded")
    // the LongType num_values form must range-check BEFORE the int cast,
    // exactly as the interpreted path does — a bare (int) cast would
    // silently truncate and diverge from interpreted null
    nullSafeCodeGen(ctx, ev, (b, d, n) => s"""
      if ($n < 0L || $n > ${Int.MaxValue}L) { ${ev.isNull} = true; }
      else {
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.functions.DictIndexes.compute($b, $d, (int) $n);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp; }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DictIndexes =
    copy(first = f, second = s, third = t)
}

object DictIndexes {

  /** Bit width needed for values in [0, maxLevel] — the level width
    * formula the format fixes (ceil(log2(maxLevel + 1))). */
  private def levelWidth(maxLevel: Int): Int =
    32 - Integer.numberOfLeadingZeros(maxLevel)

  /**
   * Walk a v1 payload's definition-level block (u32 LE byte length +
   * hybrid runs) and return `(values region start, non-null count)`, or
   * null on malformation. `maxDef = 0` (required column) is a no-op walk.
   * Shared by every v1 payload decode ([[DictIndexes]],
   * [[BoolTrueCount]], [[PlainFpStats]]).
   */
  private[functions] def v1ValuesRegion(
      bytes: Array[Byte], maxDef: Int, numValues: Int): (Int, Int) = {
    if (bytes == null || maxDef < 0 || maxDef > 1 || numValues < 0) return null
    if (maxDef == 0) return (0, numValues)
    var pos = 0
    if (pos + 4 > bytes.length) return null
    val defLen =
      (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
      ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
    pos += 4
    // subtraction form: `pos + defLen` wraps negative near Int.MaxValue
    if (defLen < 0 || defLen > bytes.length - pos) return null
    val defs = RleBp.decode(bytes, pos, pos + defLen,
      levelWidth(maxDef), numValues)
    if (defs == null) return null
    pos += defLen
    var nonNull = 0
    var i = 0
    while (i < numValues) {
      if (defs(i) == maxDef) nonNull += 1
      i += 1
    }
    (pos, nonNull)
  }

  def compute(v: Any, maxDef: Int, numValues: Int): ArrayData = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || numValues < 0) return null
    if (numValues == 0) return new GenericArrayData(Array.empty[Any])
    val region = v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    var (pos, nonNull) = region
    // index run: 1-byte bit width, hybrid runs to the end of the payload
    if (pos >= bytes.length && nonNull > 0) return null
    if (nonNull == 0) return new GenericArrayData(Array.empty[Any])
    val bw = bytes(pos) & 0xFF
    pos += 1
    if (bw > 31) return null
    val idx = RleBp.decode(bytes, pos, bytes.length, bw, nonNull)
    if (idx == null) return null
    new GenericArrayData(idx.map(Integer.valueOf).toArray[Any])
  }
}
