package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * FLOAT16 parquet fixture (r19): Spark cannot write the parquet
 * FLOAT16 logical type (a 2-byte little-endian FIXED_LEN_BYTE_ARRAY
 * annotated FLOAT16, parquet-format 2.10), so this writer drops to
 * parquet-java's example API — a real PLAIN-encoded v1 file whose
 * footer carries the annotation, the input to the decode tier's
 * half-float arm and to DuckDB's own FLOAT16 reader (the oracle).
 */
object Fp16Fixture {

  /**
   * Write `dir/fp16.parquet` with `(doc_id: int64, h: fixed(2)
   * FLOAT16 optional)` where `h = doc_id % 512 + 0.5` (exactly
   * representable in binary16) and every `doc_id % 7 == 0` row is
   * null. Deterministic from `docs`; dictionary encoding disabled so
   * the data pages are PLAIN. Returns (rows written, non-null h
   * count).
   */
  def writeFp16Table(
      spark: SparkSession, dir: String, docs: DataFrame): (Long, Long) = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    root.mkdirs()
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("doc_id")
      .optional(PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY).length(2)
      .as(LogicalTypeAnnotation.float16Type()).named("h")
      .named("graft_fp16")
    val ids = docs.select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport
      .setSchema(schema, conf)
    val dst = new org.apache.hadoop.fs.Path(
      new java.io.File(root, "fp16.parquet").getAbsolutePath)
    val writer = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(dst)
      .withConf(conf)
      .withDictionaryEncoding(false)
      .withCompressionCodec(
        org.apache.parquet.hadoop.metadata.CompressionCodecName.UNCOMPRESSED)
      .build()
    val factory =
      new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
    var nonNull = 0L
    try {
      ids.foreach { id =>
        val g = factory.newGroup()
        g.add("doc_id", id)
        if (id % 7 != 0) {
          val bits =
            graft.functions.Fp16.floatToHalf((id % 512).toFloat + 0.5f)
          g.add("h", org.apache.parquet.io.api.Binary.fromConstantByteArray(
            Array[Byte]((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte)))
          nonNull += 1
        }
        writer.write(g)
      }
    } finally {
      writer.close()
    }
    (ids.length.toLong, nonNull)
  }
}
