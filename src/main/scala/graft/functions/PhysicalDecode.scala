package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count the TRUE values of a BOOLEAN data page payload. v1 PLAIN packs
 * booleans one bit per value LSB-first after the definition-level block;
 * the v2 writer encodes them as an RLE region (u32 LE length prefix +
 * the same hybrid runs levels use, bit width 1). Null for malformed
 * payloads or other encodings — with the integer, string, and FP
 * decodes this closes the common physical types' value reconstruction.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values, encoding) - TRUE count of a BOOLEAN page, NULL if malformed.")
case class BoolTrueCount(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bool_true_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, string) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any, enc: Any): Any =
    BoolTrueCount.compute(bytes, maxDef.asInstanceOf[Int],
      numValues.asInstanceOf[Int], enc.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("count")
    nullSafeCodeGen(ctx, ev, (b, d, n, e) => s"""
      java.lang.Long $tmp = graft.functions.BoolTrueCount.compute($b, (int) $d, (int) $n, $e);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BoolTrueCount =
    copy(first = f, second = s, third = t, fourth = q)
}

object BoolTrueCount {
  private val PLAIN = UTF8String.fromString("PLAIN")
  private val RLE = UTF8String.fromString("RLE")

  def compute(v: Any, maxDef: Int, numValues: Int, enc: UTF8String): java.lang.Long = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || enc == null || numValues < 0) return null
    val region = DictIndexes.v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    val (pos, nonNull) = region
    if (nonNull == 0) return java.lang.Long.valueOf(0L)
    if (enc.equals(PLAIN)) {
      // one bit per value, LSB-first; Long arithmetic so an adversarial
      // header count cannot wrap the bound check
      if (pos + (nonNull.toLong + 7L) / 8L > bytes.length) return null
      var c = 0L
      var i = 0
      while (i < nonNull) {
        val gb = i
        if ((bytes(pos + (gb >> 3)) & (1 << (gb & 7))) != 0) c += 1
        i += 1
      }
      java.lang.Long.valueOf(c)
    } else if (enc.equals(RLE)) {
      // u32 LE length prefix + hybrid runs at bit width 1
      if (pos + 4 > bytes.length) return null
      val len =
        (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      // subtraction form: `pos + 4 + len` wraps negative near Int.MaxValue
      if (len < 0 || len > bytes.length - pos - 4) return null
      val vals = RleBp.decode(bytes, pos + 4, pos + 4 + len, 1, nonNull)
      if (vals == null) return null
      var c = 0L
      var i = 0
      while (i < nonNull) { if (vals(i) != 0) c += 1; i += 1 }
      java.lang.Long.valueOf(c)
    } else null
  }
}

/**
 * Order-independent statistics of a PLAIN FLOAT/DOUBLE data page payload:
 * non-null value count, minimum, and maximum (IEEE comparisons with NaN
 * excluded from the extrema, matching SQL aggregate semantics). PLAIN FP
 * is 4/8-byte little-endian values after the definition-level block —
 * count/min/max are the FP invariants an engine-independent oracle can
 * check exactly, where a floating SUM would be order-dependent.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values, type) - (n, min, max) of a PLAIN FP page, NULL if malformed.")
case class PlainFpStats(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mn", DoubleType, nullable = true),
    StructField("mx", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "plain_fp_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, string) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any, tpe: Any): Any =
    PlainFpStats.compute(bytes, maxDef.asInstanceOf[Int],
      numValues.asInstanceOf[Int], tpe.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("stats")
    nullSafeCodeGen(ctx, ev, (b, d, n, t) => s"""
      InternalRow $tmp = graft.functions.PlainFpStats.compute($b, (int) $d, (int) $n, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PlainFpStats =
    copy(first = f, second = s, third = t, fourth = q)
}

object PlainFpStats {
  private[functions] val FLOAT = UTF8String.fromString("FLOAT")
  private[functions] val DOUBLE = UTF8String.fromString("DOUBLE")

  /** Fold (n, min, max) over `nonNull` FP values whose byte `j` of value
    * `i` sits at `byteAt(i, j)` — shared by the contiguous PLAIN layout
    * and BYTE_STREAM_SPLIT's transposed byte planes. */
  private[functions] def fold(
      nonNull: Int, width: Int)(byteAt: (Int, Int) => Int): InternalRow = {
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var seen = false
    var i = 0
    while (i < nonNull) {
      var bits = 0L
      var j = 0
      while (j < width) {
        bits |= (byteAt(i, j) & 0xffL) << (8 * j)
        j += 1
      }
      val d =
        if (width == 8) java.lang.Double.longBitsToDouble(bits)
        else java.lang.Float.intBitsToFloat(bits.toInt).toDouble
      if (!d.isNaN) {
        if (d < mn) mn = d
        if (d > mx) mx = d
        seen = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nonNull.toLong,
      if (seen) mn else null, if (seen) mx else null))
  }

  def compute(v: Any, maxDef: Int, numValues: Int, tpe: UTF8String): InternalRow = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || tpe == null || numValues < 0) return null
    val width =
      if (tpe.equals(DOUBLE)) 8
      else if (tpe.equals(FLOAT)) 4
      else return null
    val region = DictIndexes.v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    val (pos, nonNull) = region
    if (pos + nonNull.toLong * width > bytes.length) return null
    fold(nonNull, width)((i, j) => bytes(pos + i * width + j))
  }
}

/**
 * [[PlainFpStats]] for BYTE_STREAM_SPLIT pages: the encoding stores byte
 * plane `j` of every value contiguously (`payload[j * n + i]` holds byte
 * `j` of value `i`) so similar FP values compress well — the decode is a
 * transposed read of exactly the same bits. Same (n, min, max) contract.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values, type) - (n, min, max) of a BYTE_STREAM_SPLIT FP page, NULL if malformed.")
case class BssFpStats(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mn", DoubleType, nullable = true),
    StructField("mx", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "bss_fp_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, string) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any, tpe: Any): Any =
    BssFpStats.compute(bytes, maxDef.asInstanceOf[Int],
      numValues.asInstanceOf[Int], tpe.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("stats")
    nullSafeCodeGen(ctx, ev, (b, d, n, t) => s"""
      InternalRow $tmp = graft.functions.BssFpStats.compute($b, (int) $d, (int) $n, $t);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): BssFpStats =
    copy(first = f, second = s, third = t, fourth = q)
}

/**
 * Decode a PLAIN FIXED_LEN_BYTE_ARRAY page payload's values as DECIMAL
 * unscaled sums: each value is `type_length` bytes of BIG-endian two's
 * complement (format spec `logical_types.md` — the physical type Spark
 * writes for decimals with precision > 18), summed with the same
 * [[PlainStatUnscaled]] window logic the stats decode uses, so wide
 * physical types still decode while a genuinely >64-bit value nulls the
 * page out ("cannot decode", never a wrong sum). Returns
 * `struct(n, usum)` — non-null value count and unscaled sum. A
 * dictionary page of an FLBA column is the same layout with no level
 * block: pass `max_def = 0`. Closes the physical-type decode matrix's
 * last payload gap (BOOLEAN/INT32/INT64/FLOAT/DOUBLE/BYTE_ARRAY all
 * have decoders; INT96 is stats-recognized separately).
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values, type_length) - (n, usum) of a PLAIN FLBA page, NULL if malformed.")
case class PlainFlbaSum(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("usum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "plain_flba_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any, typeLen: Any): Any =
    PlainFlbaSum.compute(bytes, maxDef.asInstanceOf[Int],
      numValues.asInstanceOf[Int], typeLen.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("flba")
    nullSafeCodeGen(ctx, ev, (b, d, n, w) => s"""
      InternalRow $tmp = graft.functions.PlainFlbaSum.compute($b, (int) $d, (int) $n, (int) $w);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PlainFlbaSum =
    copy(first = f, second = s, third = t, fourth = q)
}

object PlainFlbaSum {
  def compute(v: Any, maxDef: Int, numValues: Int, typeLen: Int): InternalRow = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || numValues < 0 || typeLen <= 0 ||
        typeLen > 64) return null
    val region = DictIndexes.v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    val (pos, nonNull) = region
    if (pos + nonNull.toLong * typeLen > bytes.length) return null
    var sum = 0L
    var i = 0
    while (i < nonNull) {
      val u = PlainStatUnscaled.bigEndianLong(
        java.util.Arrays.copyOfRange(bytes, pos + i * typeLen,
          pos + (i + 1) * typeLen))
      if (u == null) return null // value exceeds 64 bits: refuse, don't lie
      sum += u.longValue()
      i += 1
    }
    new GenericInternalRow(Array[Any](nonNull.toLong, sum))
  }
}

/**
 * Decode a PLAIN INT96 page payload — the LEGACY timestamp layout
 * pre-Spark-3 writers produced (and Spark still emits under
 * `spark.sql.parquet.outputTimestampType=INT96`): each value is 12
 * bytes, a little-endian int64 of nanoseconds-within-day followed by a
 * little-endian int32 Julian day number. Returns `struct(n, mn, mx)`
 * with the extrema as MICROSECONDS since the Unix epoch (Julian day
 * 2440588), the representation both Spark and DuckDB agree on — count
 * and extrema are the exact, order-independent invariants (a sum of
 * timestamps means nothing). INT96 column statistics are deprecated by
 * the format (the byte order makes them unordered) and modern writers
 * omit them, so the payload decode IS the only audit path for legacy
 * lakes.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_def, num_values) - (n, mn, mx) of a PLAIN INT96 page as epoch micros, NULL if malformed.")
case class PlainInt96Stats(
    first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("mn", LongType, nullable = true),
    StructField("mx", LongType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "plain_int96_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, ${c.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxDef: Any, numValues: Any): Any =
    PlainInt96Stats.compute(bytes, maxDef.asInstanceOf[Int],
      numValues.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("i96")
    nullSafeCodeGen(ctx, ev, (b, d, n) => s"""
      InternalRow $tmp = graft.functions.PlainInt96Stats.compute($b, (int) $d, (int) $n);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PlainInt96Stats =
    copy(first = f, second = s, third = t)
}

object PlainInt96Stats {
  /** Julian day number of 1970-01-01. */
  private val JulianEpochDay = 2440588L

  /** One INT96 value at `off` → microseconds since the Unix epoch. */
  private[functions] def epochMicrosAt(bytes: Array[Byte], off: Int): Long = {
    var nanos = 0L
    var i = 0
    while (i < 8) { nanos |= (bytes(off + i) & 0xffL) << (8 * i); i += 1 }
    var jd = 0
    i = 0
    while (i < 4) { jd |= (bytes(off + 8 + i) & 0xff) << (8 * i); i += 1 }
    (jd - JulianEpochDay) * 86400000000L + nanos / 1000L
  }

  def compute(v: Any, maxDef: Int, numValues: Int): InternalRow = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || numValues < 0) return null
    val region = DictIndexes.v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    val (pos, nonNull) = region
    if (pos + nonNull.toLong * 12L > bytes.length) return null
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i < nonNull) {
      val t = epochMicrosAt(bytes, pos + i * 12)
      if (t < mn) mn = t
      if (t > mx) mx = t
      i += 1
    }
    new GenericInternalRow(Array[Any](nonNull.toLong,
      if (nonNull == 0) null else mn, if (nonNull == 0) null else mx))
  }
}

object BssFpStats {
  def compute(v: Any, maxDef: Int, numValues: Int, tpe: UTF8String): InternalRow = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null || tpe == null || numValues < 0) return null
    val width =
      if (tpe.equals(PlainFpStats.DOUBLE)) 8
      else if (tpe.equals(PlainFpStats.FLOAT)) 4
      else return null
    val region = DictIndexes.v1ValuesRegion(bytes, maxDef, numValues)
    if (region == null) return null
    val (pos, nonNull) = region
    if (pos + nonNull.toLong * width > bytes.length) return null
    PlainFpStats.fold(nonNull, width)((i, j) => bytes(pos + j * nonNull + i))
  }
}
