package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{Fp16Fixture, MetaValues}

/** Parquet FLOAT16 + VARIANT (r19): the half-float conversions, the
  * dispatcher's FP16 arm over a real FLOAT16 parquet file, and
  * shredded VARIANT columns classifying (not crashing) through the
  * zero-knowledge decode path. */
class Fp16Spec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  test("half<->float roundtrip: every finite binary16 bit pattern " +
      "survives float and back; specials classify") {
    var bits = 0
    while (bits < 0x10000) {
      val f = Fp16.halfToFloat(bits)
      val e = (bits >>> 10) & 0x1f
      if (e == 31) {
        if ((bits & 0x3ff) == 0) assert(f.isInfinite)
        else assert(f.isNaN)
      } else {
        // finite values are exactly representable in float — the
        // round trip is the identity on bits
        assert(Fp16.floatToHalf(f) === bits.toShort,
          s"bits=0x${bits.toHexString} f=$f")
      }
      bits += 1
    }
    // float values between halves round to nearest-even
    assert(Fp16.floatToHalf(1.0f) === 0x3c00.toShort)
    assert(Fp16.floatToHalf(65504f) === 0x7bff.toShort) // half max
    assert(Fp16.floatToHalf(1e9f) === 0x7c00.toShort)   // overflow -> inf
    assert(Fp16.halfToFloat(0x3c00) === 1.0f)
    assert(Fp16.halfToFloat(0x8000) === -0.0f)
  }

  test("the dispatcher's FP16 arm decodes a real FLOAT16 parquet " +
      "file: counts and extrema exact, kind PLAIN_FP16") {
    val d = Files.createTempDirectory("graft_fp16").toString + "/t"
    val (_, nonNull) = Fp16Fixture.writeFp16Table(spark, d, docs)
    val pages = MetaValues.decodePages(spark, d)
      .filter(col("path") === "h" &&
        col("page_type").startsWith("DATA_PAGE"))
    val rows = pages.select(col("decoded.kind"), col("decoded.n"),
      col("decoded.dmn"), col("decoded.dmx")).collect()
    assert(rows.nonEmpty && rows.forall(!_.isNullAt(0)))
    assert(rows.forall(_.getString(0) === "PLAIN_FP16"))
    assert(rows.map(_.getLong(1)).sum === nonNull)
    val expected = docs.select(col("doc_id")).collect().map(_.getLong(0))
      .filter(_ % 7 != 0).map(id => (id % 512).toFloat + 0.5f)
    assert(rows.map(_.getDouble(2)).min === expected.min.toDouble)
    assert(rows.map(_.getDouble(3)).max === expected.max.toDouble)
  }

  test("a shredded VARIANT column classifies through the decode path " +
      "— binary leaves decode, nothing crashes, the schema string " +
      "keeps the annotation") {
    val d = Files.createTempDirectory("graft_variant").toString + "/t"
    docs.limit(200).select(col("doc_id"),
        parse_json(concat(lit("{\"n\":"),
          col("n_chars").cast("string"), lit("}"))).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    // schema-string fidelity: the file level surfaces the annotation
    val schema = spark.read.format("metadata")
      .option("level", "file").option("source", "parquet").load(d)
      .select(col("schema")).collect()(0).getString(0)
    assert(schema.contains("VARIANT"), schema)
    // facts resolve the variant group's binary leaves
    val facts = MetaValues.schemaFactsDf(spark, d)
      .select(col("path")).collect().map(_.getString(0)).toSet
    assert(facts.exists(_.startsWith("v.")), facts.toString)
    // and the zero-knowledge decode classifies every page without
    // crashing (binary leaves take the string/bytes routes; anything
    // unroutable is null, never an error)
    val decoded = MetaValues.decodePages(spark, d)
    assert(decoded.count() > 0)
    assert(decoded.filter(col("path") === "v.metadata" &&
      col("decoded").isNotNull).count() > 0)
  }
}
