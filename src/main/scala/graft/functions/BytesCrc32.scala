package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, LongType}

/**
 * CRC-32 (the zlib polynomial, `java.util.zip.CRC32`) of a byte payload,
 * accepting both `binary` and the page level's `array<byte>` rendering —
 * which is the one thing Spark's builtin `crc32` cannot do, and the only
 * reason this expression exists. Parquet page headers carry an optional
 * `crc` computed over the page's binary data exactly as written (the
 * COMPRESSED bytes, header excluded; format spec `README.md` page CRC
 * section), so `bytes_crc32(page_content) = crc & 0xFFFFFFFF` is a full
 * data-integrity audit at metadata-scan cost.
 */
@ExpressionDescription(
  usage = "_FUNC_(bytes) - CRC-32 of the payload as an unsigned value in a LONG.")
case class BytesCrc32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bytes_crc32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | ArrayType(ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary or array<byte> argument, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(v: Any): Any = BytesCrc32.compute(v)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("crc")
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Long $tmp = graft.functions.BytesCrc32.compute($v);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BytesCrc32 =
    copy(child = newChild)
}

object BytesCrc32 {
  def compute(v: Any): java.lang.Long = {
    val bytes = DecodeBytes.of(v)
    if (bytes == null) return null
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 0, bytes.length)
    java.lang.Long.valueOf(crc.getValue)
  }
}
