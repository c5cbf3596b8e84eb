package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * THE unified page-decode dispatcher: one expression that routes a page
 * row's already-surfaced header fields — page type, value encoding,
 * codec, sizes, v2 level lengths — plus the column's schema facts
 * (max_rep/max_def, physical type, FLBA type length) to the right decode
 * from the (page type × encoding × physical type) matrix, turning the
 * per-combination `meta_*_values` recipes into a single API.
 *
 *   page_decode(content, page_type, encoding, codec, uncompressed_size,
 *               rep_len, def_len, max_rep, max_def, num_values,
 *               phys_type, type_length)
 *     → struct(kind, n, lsum, lmn, lmx, dmn, dmx)
 *
 * `kind` names the route taken; `n` is the decoded NON-NULL value count;
 * the remaining fields carry the type's order-independent invariants:
 * `lsum` for integer/decimal-unscaled sums and boolean true counts
 * (for string routes: total payload BYTE mass), `lmn`/`lmx` for INT96
 * epoch-micro extrema (for string routes: min/max value byte length),
 * `dmn`/`dmx` for FP extrema
 * (sums of floats are order-dependent; extrema are exact). Dictionary
 * DATA pages decode to their index count (`DICT_IDX`) — reconstruction
 * composes with the same dispatcher's decode of the DICTIONARY_PAGE row.
 * NULL when the combination is undecodable or the payload malformed,
 * never a wrong answer.
 *
 * For v2 pages pass the EFFECTIVE codec: the header's `is_compressed`
 * flag (surfaced as `values_compressed`) decides whether the values
 * region is compressed at all — `'UNCOMPRESSED'` when false. v1 pages
 * compress the whole payload, so the chunk codec is always right.
 *
 * Null argument semantics: `rep_len`/`def_len`/`type_length` default to
 * 0 when null (v1 pages surface null level lengths; `type_length` only
 * matters for FLBA); every other null argument nulls the result.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, page_type, encoding, codec, size, rep_len, def_len, max_rep, max_def, num_values, phys_type, type_len) - unified page decode.")
case class PageDecodeExpr(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = PageDecode.outputType
  override def nullable: Boolean = true
  override def prettyName: String = "page_decode"
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.length != 12 && children.length != 13) {
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 12 arguments (plus an optional logical-" +
          s"type string), got ${children.length}")
    }
    val kinds = children.map(_.dataType)
    val ok =
      (kinds.head match {
        case BinaryType | ArrayType(ByteType, _) => true
        case _ => false
      }) &&
      Seq(1, 2, 3, 10).forall(i => kinds(i) == StringType) &&
      Seq(4, 5, 6, 7, 8, 9, 11).forall(i => kinds(i) == IntegerType) &&
      (children.length == 12 || kinds(12) == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, string, string, string, int, int, " +
        s"int, int, int, int, string, int[, string]) arguments, got " +
        kinds.map(_.simpleString(10)).mkString("(", ", ", ")"))
  }

  override def eval(input: InternalRow): Any = {
    val v = children.map(_.eval(input))
    def s(i: Int) = v(i).asInstanceOf[UTF8String]
    def j(i: Int) = v(i) match {
      case null => null
      case x: Int => java.lang.Integer.valueOf(x)
    }
    PageDecode.compute(v(0), s(1), s(2), s(3), j(4), j(5), j(6), j(7),
      j(8), j(9), s(10), j(11), if (v.length > 12) s(12) else null)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    def obj(i: Int): String = {
      val e = evals(i)
      children(i).dataType match {
        case IntegerType =>
          s"(${e.isNull} ? null : (java.lang.Integer) (int) (${e.value}))"
        case StringType =>
          s"(${e.isNull} ? null : (org.apache.spark.unsafe.types.UTF8String) (${e.value}))"
        case _ => s"(${e.isNull} ? null : (Object) (${e.value}))"
      }
    }
    val tmp = ctx.freshName("pd")
    val javaType = CodeGenerator.javaType(dataType)
    val logicalArg = if (children.length > 12) obj(12) else "null"
    ev.copy(code = code"""
      ${evals.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = true;
      $javaType ${ev.value} = null;
      InternalRow $tmp = graft.functions.PageDecode.compute(
        ${obj(0)}, ${obj(1)}, ${obj(2)}, ${obj(3)}, ${obj(4)}, ${obj(5)},
        ${obj(6)}, ${obj(7)}, ${obj(8)}, ${obj(9)}, ${obj(10)}, ${obj(11)},
        $logicalArg);
      if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PageDecodeExpr =
    copy(children = newChildren)
}

object PageDecode {

  val outputType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("lsum", LongType, nullable = true),
    StructField("lmn", LongType, nullable = true),
    StructField("lmx", LongType, nullable = true),
    StructField("dmn", DoubleType, nullable = true),
    StructField("dmx", DoubleType, nullable = true)))

  private val DATA_PAGE = UTF8String.fromString("DATA_PAGE")
  private val DATA_PAGE_V2 = UTF8String.fromString("DATA_PAGE_V2")
  private val DICTIONARY_PAGE = UTF8String.fromString("DICTIONARY_PAGE")
  private val PLAIN = UTF8String.fromString("PLAIN")
  private val PLAIN_DICTIONARY = UTF8String.fromString("PLAIN_DICTIONARY")
  private val RLE_DICTIONARY = UTF8String.fromString("RLE_DICTIONARY")
  private val DELTA_BINARY_PACKED = UTF8String.fromString("DELTA_BINARY_PACKED")
  private val DELTA_BYTE_ARRAY = UTF8String.fromString("DELTA_BYTE_ARRAY")
  private val DELTA_LENGTH_BYTE_ARRAY = UTF8String.fromString("DELTA_LENGTH_BYTE_ARRAY")
  private val BYTE_STREAM_SPLIT = UTF8String.fromString("BYTE_STREAM_SPLIT")
  private val RLE = UTF8String.fromString("RLE")
  private val BOOLEAN = UTF8String.fromString("BOOLEAN")
  private val INT32 = UTF8String.fromString("INT32")
  private val INT64 = UTF8String.fromString("INT64")
  private val INT96 = UTF8String.fromString("INT96")
  private val FLOAT = UTF8String.fromString("FLOAT")
  private val DOUBLE = UTF8String.fromString("DOUBLE")
  private val BYTE_ARRAY = UTF8String.fromString("BYTE_ARRAY")
  private val FLBA = UTF8String.fromString("FIXED_LEN_BYTE_ARRAY")
  private val UNCOMPRESSED = UTF8String.fromString("UNCOMPRESSED")

  private def row(kind: String, n: Long, lsum: java.lang.Long = null,
      lmn: java.lang.Long = null, lmx: java.lang.Long = null,
      dmn: Any = null, dmx: Any = null): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(kind), n,
      lsum, lmn, lmx, dmn, dmx))

  /** Order-independent invariants over a decoded string array, surfaced
    * through the numeric slots: `lsum` = total payload BYTE mass (the
    * page-level sibling of SizeStatistics' unencoded_byte_array_bytes),
    * `lmn`/`lmx` = min/max value byte length. Value-level extrema stay a
    * composition job (explode the decoder's array) — the struct cannot
    * carry strings. */
  private def stringStats(
      arr: org.apache.spark.sql.catalyst.util.ArrayData, kind: String): InternalRow = {
    val n = arr.numElements()
    var mass = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var i = 0
    while (i < n) {
      val len = arr.getUTF8String(i).numBytes.toLong
      mass += len
      if (len < mn) mn = len
      if (len > mx) mx = len
      i += 1
    }
    row(kind, n.toLong, mass,
      if (n == 0) null else java.lang.Long.valueOf(mn),
      if (n == 0) null else java.lang.Long.valueOf(mx))
  }

  private def i32SumLE(bytes: Array[Byte], off: Int, n: Int): java.lang.Long = {
    if (off + n.toLong * 4 > bytes.length) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val p = off + i * 4
      s += ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)).toLong
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  private val FLOAT16 = UTF8String.fromString("FLOAT16")

  /** Dispatch on a PLAIN/BYTE_STREAM_SPLIT values region (no level
    * block; `nn` non-null values). `logical` refines the FLBA route:
    * a FLOAT16-annotated fixed(2) decodes to FP extrema (r19) instead
    * of the generic byte-mass stats. */
  private def decodeValues(region: Array[Byte], physType: UTF8String,
      nn: Int, typeLen: Int, bss: Boolean, kindPrefix: String,
      logical: UTF8String = null): InternalRow = {
    if (bss) {
      if (physType.equals(FLOAT) || physType.equals(DOUBLE)) {
        val st = BssFpStats.compute(region, 0, nn, physType)
        if (st == null) return null
        return new GenericInternalRow(Array[Any](
          UTF8String.fromString(kindPrefix + "BSS_FP"), st.getLong(0),
          null, null, null,
          if (st.isNullAt(1)) null else st.getDouble(1),
          if (st.isNullAt(2)) null else st.getDouble(2)))
      }
      return null
    }
    if (physType.equals(INT64)) {
      if (region.length != nn.toLong * 8) return null
      val s = PlainInt64Sum.compute(region)
      if (s == null) return null
      row(kindPrefix + "INT64", nn.toLong, s)
    } else if (physType.equals(INT32)) {
      if (region.length != nn.toLong * 4) return null
      val s = i32SumLE(region, 0, nn)
      if (s == null) return null
      row(kindPrefix + "INT32", nn.toLong, s)
    } else if (physType.equals(BOOLEAN)) {
      val c = BoolTrueCount.compute(region, 0, nn, PLAIN)
      if (c == null) return null
      row(kindPrefix + "BOOL", nn.toLong, c)
    } else if (physType.equals(FLOAT) || physType.equals(DOUBLE)) {
      val st = PlainFpStats.compute(region, 0, nn, physType)
      if (st == null) return null
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(kindPrefix + "FP"), st.getLong(0),
        null, null, null,
        if (st.isNullAt(1)) null else st.getDouble(1),
        if (st.isNullAt(2)) null else st.getDouble(2)))
    } else if (physType.equals(INT96)) {
      val st = PlainInt96Stats.compute(region, 0, nn)
      if (st == null) return null
      row(kindPrefix + "INT96", st.getLong(0),
        null,
        if (st.isNullAt(1)) null else java.lang.Long.valueOf(st.getLong(1)),
        if (st.isNullAt(2)) null else java.lang.Long.valueOf(st.getLong(2)))
    } else if (physType.equals(FLBA)) {
      if (logical != null && logical.equals(FLOAT16) && typeLen == 2) {
        val st = Fp16.stats(region, nn)
        if (st == null) return null
        return new GenericInternalRow(Array[Any](
          UTF8String.fromString(kindPrefix + "FP16"), st.getLong(0),
          null, null, null,
          if (st.isNullAt(1)) null else st.getDouble(1),
          if (st.isNullAt(2)) null else st.getDouble(2)))
      }
      val st = PlainFlbaSum.compute(region, 0, nn, typeLen)
      if (st == null) return null
      row(kindPrefix + "FLBA", st.getLong(0), st.getLong(1))
    } else if (physType.equals(BYTE_ARRAY)) {
      val arr = PlainDictStrings.compute(region)
      if (arr == null || arr.numElements() != nn) return null
      stringStats(arr, kindPrefix + "STRINGS")
    } else null
  }

  def compute(content: Any, pageType: UTF8String, encoding: UTF8String,
      codec: UTF8String, usizeB: java.lang.Integer,
      repLenB: java.lang.Integer, defLenB: java.lang.Integer,
      maxRepB: java.lang.Integer, maxDefB: java.lang.Integer,
      numValuesB: java.lang.Integer, physType: UTF8String,
      typeLenB: java.lang.Integer,
      logical: UTF8String = null): InternalRow = {
    val bytes = DecodeBytes.of(content)
    if (bytes == null || pageType == null || encoding == null ||
        codec == null || usizeB == null || maxRepB == null ||
        maxDefB == null || numValuesB == null || physType == null) return null
    val usize = usizeB.intValue()
    val repLen = if (repLenB == null) 0 else repLenB.intValue()
    val defLen = if (defLenB == null) 0 else defLenB.intValue()
    val maxRep = maxRepB.intValue()
    val maxDef = maxDefB.intValue()
    val numValues = numValuesB.intValue()
    val typeLen = if (typeLenB == null) 0 else typeLenB.intValue()

    if (pageType.equals(DICTIONARY_PAGE)) {
      // dictionary payload: PLAIN values, no level block; num_values is
      // the dictionary cardinality
      val infl = PageInflate.compute(bytes, codec, usize)
      if (infl == null) return null
      decodeValues(infl, physType, numValues, typeLen, bss = false, "DICT_", logical)
    } else if (pageType.equals(DATA_PAGE)) {
      val infl = PageInflate.compute(bytes, codec, usize)
      if (infl == null) return null
      val walk = LevelWalk.walkV1(infl, maxRep, maxDef, numValues)
      if (walk == null) return null
      val nn = walk.defCounts(maxDef)
      if (nn > Int.MaxValue) return null
      val region = java.util.Arrays.copyOfRange(infl, walk.valuesOff, infl.length)
      if (encoding.equals(PLAIN_DICTIONARY) || encoding.equals(RLE_DICTIONARY)) {
        val idx = DictIndexes.compute(region, 0, nn.toInt)
        if (idx == null) return null
        row("DICT_IDX", idx.numElements().toLong)
      } else if (encoding.equals(PLAIN)) {
        decodeValues(region, physType, nn.toInt, typeLen, bss = false, "PLAIN_", logical)
      } else if (encoding.equals(BYTE_STREAM_SPLIT)) {
        decodeValues(region, physType, nn.toInt, typeLen, bss = true, "", logical)
      } else if (encoding.equals(RLE) && physType.equals(BOOLEAN)) {
        // RLE-encoded booleans (u32-length-prefixed hybrid runs)
        val c = BoolTrueCount.compute(region, 0, nn.toInt, encoding)
        if (c == null) return null
        row("RLE_BOOL", nn, c)
      } else null
    } else if (pageType.equals(DATA_PAGE_V2)) {
      val walk = LevelWalk.walkV2(bytes, repLen, defLen, maxRep, maxDef, numValues)
      if (walk == null) return null
      val nn = walk.defCounts(maxDef)
      if (nn > Int.MaxValue) return null
      val levelBytes = repLen + defLen
      if (levelBytes > usize) return null
      val region = PageValuesV2.compute(bytes, levelBytes, codec, usize - levelBytes)
      if (region == null) return null
      if (encoding.equals(RLE_DICTIONARY) || encoding.equals(PLAIN_DICTIONARY)) {
        val idx = DictIndexes.compute(region, 0, nn.toInt)
        if (idx == null) return null
        row("DICT_IDX", idx.numElements().toLong)
      } else if (encoding.equals(DELTA_BINARY_PACKED)) {
        val s = DeltaIntSum.compute(region, physType)
        if (s == null) return null
        row("DELTA_INT", nn, s)
      } else if (encoding.equals(DELTA_BYTE_ARRAY) ||
          encoding.equals(DELTA_LENGTH_BYTE_ARRAY)) {
        val arr = DeltaStringsExpr.compute(region, encoding)
        if (arr == null || arr.numElements() != nn) return null
        stringStats(arr, "DELTA_STRINGS")
      } else if (encoding.equals(PLAIN)) {
        decodeValues(region, physType, nn.toInt, typeLen, bss = false, "PLAIN_", logical)
      } else if (encoding.equals(BYTE_STREAM_SPLIT)) {
        decodeValues(region, physType, nn.toInt, typeLen, bss = true, "", logical)
      } else if (encoding.equals(RLE) && physType.equals(BOOLEAN)) {
        // the v2 writer's boolean encoding: u32-length-prefixed hybrid
        // runs in the (extracted) values region
        val c = BoolTrueCount.compute(region, 0, nn.toInt, encoding)
        if (c == null) return null
        row("RLE_BOOL", nn, c)
      } else null
    } else null
  }
}
