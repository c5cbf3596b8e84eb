package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The variant shred census (r19): footer-only accounting of how a
  * shredded VARIANT writer routed rows — typed vs residual vs
  * missing per direct field, nested subtrees flagged, variant-less
  * directories empty. */
class VariantShredSpec extends SparkSpec {

  private def censusMap(d: String) =
    MetaValues.variantShredCensus(spark, d).collect()
      .map { r =>
        def l(i: Int) =
          if (r.isNullAt(i)) null else java.lang.Long.valueOf(r.getLong(i))
        (r.getString(1), r.getString(2)) ->
          ((r.getString(3), l(4), l(5), l(6), l(7)))
      }.toMap

  test("typed, residual (mixed-type), missing and nested fields all " +
      "classify from footers alone") {
    val d = Files.createTempDirectory("graft_varshred").toString + "/t"
    // n: always number; m: mixed number/string, missing on %5==0;
    // o: a NESTED object {x: number}
    val js = when(col("id") % 5 === 0,
        concat(lit("{\"n\":"), col("id").cast("string"),
          lit(",\"o\":{\"x\":1}}")))
      .otherwise(when(col("id") % 3 === 0,
        concat(lit("{\"n\":"), col("id").cast("string"),
          lit(",\"m\":"), col("id").cast("string"),
          lit(",\"o\":{\"x\":1}}")))
      .otherwise(concat(lit("{\"n\":"), col("id").cast("string"),
        lit(",\"m\":\"s\",\"o\":{\"x\":1}}"))))
    spark.range(60).select(col("id"), parse_json(js).as("v"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    val got = censusMap(d)
    def L(v: Long) = java.lang.Long.valueOf(v)
    val missing = (0 until 60).count(_ % 5 == 0).toLong
    assert(got(("v", "")) === (("root", L(60L), null, L(0L), null)))
    assert(got(("v", "n")) === (("scalar", L(60L), L(60L), L(0L), L(0L))))
    assert(got(("v", "m")) ===
      (("scalar", L(60L), null, L(60L - missing), L(missing))))
    // the nested object's accounting lives a level down — flagged,
    // never guessed
    assert(got(("v", "o"))._1 === "nested")
    assert(got(("v", "o"))._3 == null && got(("v", "o"))._5 == null)
    assert(got.size === 4)
  }

  test("a variant-less directory yields an empty census, not an error") {
    val d = Files.createTempDirectory("graft_varshred0").toString + "/t"
    spark.range(10).coalesce(1).write.mode("overwrite").parquet(d)
    assert(MetaValues.variantShredCensus(spark, d).count() === 0L)
  }
}
