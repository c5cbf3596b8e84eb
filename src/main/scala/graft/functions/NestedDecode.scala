package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, GenericInternalRow, QuaternaryExpression, SeptenaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Repetition/definition-level walk for NESTED columns — the decode the
 * flat-only `max_def <= 1` walk in [[DictIndexes.v1ValuesRegion]] cannot
 * do. A nested leaf (list/struct; e.g. Spark's `array<long>`, written as
 * `optional group v (LIST) { repeated group list { optional int64
 * element } }`) stores one (repetition, definition) level pair per ENTRY
 * (the page header's `num_values`), and the page's values region holds
 * only the entries whose definition level equals the column's maximum.
 * The level meanings (format spec `LogicalTypes.md` / Dremel):
 *
 *   - repetition 0 starts a new RECORD; >0 continues the enclosing list,
 *     so `count(rep == 0)` is the page's row count (v1 headers don't
 *     carry one);
 *   - each definition level d < max_def marks a null/empty at nesting
 *     depth d (for the 3-level Spark list above: 0 = null array,
 *     1 = empty array, 2 = null element, 3 = present element).
 *
 * The expressions return the per-level entry counts plus the values
 * region offset, deliberately NOT interpreting which level means
 * "element" — that mapping depends on the schema's optional/repeated
 * nesting, so callers compose it (`def_counts[2] + def_counts[3]` =
 * list slots for the Spark list shape). Composition makes every
 * existing flat decoder nested-capable: `substring(content,
 * values_off + 1)` is the leaf's values region, which feeds
 * `plain_int64_sum`, `dict_indexes(..., 0, def_counts[max_def])`,
 * `plain_fp_stats(..., 0, ...)`, etc. unchanged.
 *
 * Layouts (reference walks pages without decoding levels at all:
 * `/root/reference/src/main/scala/com/github/sadikovi/metadata/MetadataFileFormat.scala:232-320`):
 *   - v1 ([[PageLevels]]): each present level block is a u32 LE byte
 *     length followed by RLE/bit-packed hybrid runs at width
 *     `ceil(log2(max + 1))`; repetition block first, then definition.
 *   - v2 ([[PageLevelsV2]]): the blocks sit UNCOMPRESSED at the front of
 *     the page with no length prefixes — their byte lengths are the
 *     `repetition_levels_byte_length` / `definition_levels_byte_length`
 *     header fields the page level already surfaces.
 */
object LevelWalk {

  private[functions] def levelWidth(maxLevel: Int): Int =
    32 - Integer.numberOfLeadingZeros(maxLevel)

  /** Sane nesting bound: parquet nesting depth in real schemas is single
    * digits; 255 rejects garbage header bytes without refusing any
    * plausible schema. */
  private val MaxLevel = 255

  /** Decoded walk result: values-region offset, records (rep == 0
    * count), and per-definition-level entry counts (size maxDef + 1). */
  private[functions] final case class Levels(
      valuesOff: Int, records: Long, defCounts: Array[Long])

  /** Walk a v1 payload's level blocks from offset 0. Null on any
    * malformation. */
  private[functions] def walkV1(
      bytes: Array[Byte], maxRep: Int, maxDef: Int, numValues: Int): Levels = {
    if (bytes == null || maxRep < 0 || maxRep > MaxLevel ||
        maxDef < 0 || maxDef > MaxLevel || numValues < 0) return null
    var pos = 0
    var records = numValues.toLong
    if (maxRep > 0) {
      val end = blockEnd(bytes, pos)
      if (end < 0) return null
      val reps = RleBp.decode(bytes, pos + 4, end, levelWidth(maxRep), numValues)
      if (reps == null) return null
      records = 0L
      var i = 0
      while (i < numValues) { if (reps(i) == 0) records += 1; i += 1 }
      pos = end
    }
    val defCounts = new Array[Long](maxDef + 1)
    if (maxDef > 0) {
      val end = blockEnd(bytes, pos)
      if (end < 0) return null
      val defs = RleBp.decode(bytes, pos + 4, end, levelWidth(maxDef), numValues)
      if (defs == null) return null
      var i = 0
      while (i < numValues) {
        val d = defs(i)
        if (d < 0 || d > maxDef) return null
        defCounts(d) += 1
        i += 1
      }
      pos = end
    } else {
      defCounts(0) = numValues.toLong
    }
    Levels(pos, records, defCounts)
  }

  /** Walk a v2 page's level blocks: no length prefixes — the byte
    * lengths come from the page header. A flat column must declare a
    * zero-length repetition block (the v2 writer always writes the
    * field). Null on any malformation. */
  private[functions] def walkV2(
      bytes: Array[Byte], repLen: Int, defLen: Int,
      maxRep: Int, maxDef: Int, numValues: Int): Levels = {
    if (bytes == null || maxRep < 0 || maxRep > MaxLevel ||
        maxDef < 0 || maxDef > MaxLevel || numValues < 0 ||
        repLen < 0 || defLen < 0 ||
        repLen.toLong + defLen.toLong > bytes.length) return null
    if ((maxRep == 0) != (repLen == 0)) return null
    if (maxDef == 0 && defLen != 0) return null
    var records = numValues.toLong
    if (maxRep > 0) {
      val reps = RleBp.decode(bytes, 0, repLen, levelWidth(maxRep), numValues)
      if (reps == null) return null
      records = 0L
      var i = 0
      while (i < numValues) { if (reps(i) == 0) records += 1; i += 1 }
    }
    val defCounts = new Array[Long](maxDef + 1)
    if (maxDef > 0) {
      val defs = RleBp.decode(bytes, repLen, repLen + defLen,
        levelWidth(maxDef), numValues)
      if (defs == null) return null
      var i = 0
      while (i < numValues) {
        val d = defs(i)
        if (d < 0 || d > maxDef) return null
        defCounts(d) += 1
        i += 1
      }
    } else {
      defCounts(0) = numValues.toLong
    }
    Levels(repLen + defLen, records, defCounts)
  }

  /** End offset of a u32-LE-length-prefixed block at `pos`, or -1. */
  private def blockEnd(bytes: Array[Byte], pos: Int): Int = {
    if (pos + 4 > bytes.length) return -1
    val len =
      (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
      ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
    // subtraction form: `pos + 4 + len` wraps negative near Int.MaxValue
    if (len < 0 || len > bytes.length - pos - 4) return -1
    pos + 4 + len
  }

  private[functions] val outputType: StructType = StructType(Seq(
    StructField("n_records", LongType, nullable = false),
    StructField("values_off", IntegerType, nullable = false),
    StructField("def_counts", ArrayType(LongType, containsNull = false),
      nullable = false)))

  private[functions] def toRow(l: Levels): InternalRow =
    if (l == null) null
    else new GenericInternalRow(Array[Any](l.records, l.valuesOff,
      new GenericArrayData(l.defCounts.map(java.lang.Long.valueOf).toArray[Any])))

  // static entry points for codegen
  def computeV1(v: Any, maxRep: Int, maxDef: Int, numValues: Int): InternalRow =
    toRow(walkV1(DecodeBytes.of(v), maxRep, maxDef, numValues))

  def computeV2(v: Any, repLen: Int, defLen: Int,
      maxRep: Int, maxDef: Int, numValues: Int): InternalRow =
    toRow(walkV2(DecodeBytes.of(v), repLen, defLen, maxRep, maxDef, numValues))
}

/**
 * Level walk of a v1 data page payload (uncompressed; compose with
 * [[PageInflate]] for compressed pages): `(content, max_rep, max_def,
 * num_values)` → `struct(n_records, values_off, def_counts)`. See
 * [[LevelWalk]] for semantics and the composition contract.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, max_rep, max_def, num_values) - (n_records, values_off, def_counts) of a v1 page.")
case class PageLevels(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = LevelWalk.outputType
  override def nullable: Boolean = true
  override def prettyName: String = "page_levels"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _), IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, int) arguments, got " +
          s"(${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)})")
    }

  override def nullSafeEval(bytes: Any, maxRep: Any, maxDef: Any, numValues: Any): Any =
    LevelWalk.computeV1(bytes, maxRep.asInstanceOf[Int],
      maxDef.asInstanceOf[Int], numValues.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("levels")
    nullSafeCodeGen(ctx, ev, (b, r, d, n) => s"""
      InternalRow $tmp = graft.functions.LevelWalk.computeV1($b, (int) $r, (int) $d, (int) $n);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PageLevels =
    copy(first = f, second = s, third = t, fourth = q)
}

/**
 * [[PageLevels]] for v2 data pages: the level byte lengths come from the
 * page header (`repetition_levels_byte_length` /
 * `definition_levels_byte_length` — both surfaced at the page level)
 * instead of u32 prefixes, and the blocks are never compressed.
 * `(content, rep_len, def_len, max_rep, max_def, num_values)` →
 * `struct(n_records, values_off, def_counts)`; `n_records` cross-checks
 * the v2 header's own `num_rows`.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes, rep_len, def_len, max_rep, max_def, num_values) - (n_records, values_off, def_counts) of a v2 page.")
case class PageLevelsV2(
    first: Expression, second: Expression, third: Expression,
    fourth: Expression, fifth: Expression, sixth: Expression)
    extends SeptenaryExpression {

  override def children: Seq[Expression] =
    Seq(first, second, third, fourth, fifth, sixth)

  override def dataType: DataType = LevelWalk.outputType
  override def nullable: Boolean = true
  override def prettyName: String = "page_levels_v2"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType,
      fourth.dataType, fifth.dataType, sixth.dataType) match {
      case (BinaryType | ArrayType(ByteType, _),
          IntegerType, IntegerType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, int, int, int, int, int) arguments, got " +
          t.productIterator.map {
            case d: DataType => d.simpleString(10)
          }.mkString("(", ", ", ")"))
    }

  override def nullSafeEval(
      bytes: Any, repLen: Any, defLen: Any,
      maxRep: Any, maxDef: Any, numValues: Any, unused: Option[Any]): Any =
    LevelWalk.computeV2(bytes, repLen.asInstanceOf[Int],
      defLen.asInstanceOf[Int], maxRep.asInstanceOf[Int],
      maxDef.asInstanceOf[Int], numValues.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("levels")
    nullSafeCodeGen(ctx, ev, (b, rl, dl, r, d, n, _) => s"""
      InternalRow $tmp = graft.functions.LevelWalk.computeV2(
        $b, (int) $rl, (int) $dl, (int) $r, (int) $d, (int) $n);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp; }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PageLevelsV2 =
    copy(first = newChildren(0), second = newChildren(1),
      third = newChildren(2), fourth = newChildren(3),
      fifth = newChildren(4), sixth = newChildren(5))
}
