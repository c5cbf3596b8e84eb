package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** The unified page_decode dispatcher: route selection, null-argument
  * semantics, malformed refusal, and interpreted/codegen agreement. */
class PageDecodeSpec extends SparkSpec {

  private def u = UTF8String.fromString _
  private def i(n: Int) = java.lang.Integer.valueOf(n)

  test("dispatch routes and null semantics at the compute level") {
    // required PLAIN INT64 v1 page: 3 values, no level block
    val vals = Seq(5L, -1L, 100L).flatMap(v =>
      (0 until 8).map(k => (v >> (8 * k)).toByte)).toArray
    val got = PageDecode.compute(vals, u("DATA_PAGE"), u("PLAIN"),
      u("UNCOMPRESSED"), i(vals.length), null, null, i(0), i(0), i(3),
      u("INT64"), null)
    assert(got != null)
    assert(got.getUTF8String(0).toString === "PLAIN_INT64")
    assert(got.getLong(1) === 3L && got.getLong(2) === 104L)
    // wrong physical type claim: region length mismatch refuses
    assert(PageDecode.compute(vals, u("DATA_PAGE"), u("PLAIN"),
      u("UNCOMPRESSED"), i(vals.length), null, null, i(0), i(0), i(3),
      u("INT32"), null) == null)
    // unknown page type / encoding refuse rather than guess
    assert(PageDecode.compute(vals, u("INDEX_PAGE"), u("PLAIN"),
      u("UNCOMPRESSED"), i(vals.length), null, null, i(0), i(0), i(3),
      u("INT64"), null) == null)
    assert(PageDecode.compute(vals, u("DATA_PAGE"), u("RLE"),
      u("UNCOMPRESSED"), i(vals.length), null, null, i(0), i(0), i(3),
      u("INT64"), null) == null)
    // required (non-null) string args null the result
    assert(PageDecode.compute(vals, null, u("PLAIN"), u("UNCOMPRESSED"),
      i(vals.length), null, null, i(0), i(0), i(3), u("INT64"), null) == null)
    // size lie fails the inflate contract
    assert(PageDecode.compute(vals, u("DATA_PAGE"), u("PLAIN"),
      u("UNCOMPRESSED"), i(vals.length + 1), null, null, i(0), i(0), i(3),
      u("INT64"), null) == null)
  }

  test("INT32 and v2 RLE-boolean routes decode through the dispatcher") {
    // PLAIN INT32, required column: 4-byte LE values, signed sum
    val i32 = Seq(7, -3, 1000).flatMap(v =>
      (0 until 4).map(k => (v >> (8 * k)).toByte)).toArray
    val got = PageDecode.compute(i32, u("DATA_PAGE"), u("PLAIN"),
      u("UNCOMPRESSED"), i(i32.length), null, null, i(0), i(0), i(3),
      u("INT32"), null)
    assert(got != null && got.getUTF8String(0).toString === "PLAIN_INT32")
    assert(got.getLong(1) === 3L && got.getLong(2) === 1004L)

    // real v2 file with a boolean column: the v2 writer RLE-encodes it
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_pd_bool").toString
    spark.range(0, 4000)
      .select(when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") % 3 === 0).as("b"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.writer.version", "PARQUET_2_0")
      .option("compression", "none")
      .parquet(dir)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir).createOrReplaceTempView("pdb")
    val r = spark.sql(
      """SELECT t.pd.kind, t.pd.n, t.pd.lsum
        |FROM (SELECT page_decode(page_content, page_type, encoding,
        |    'UNCOMPRESSED', page_uncompressed_size, rep_levels_byte_length,
        |    def_levels_byte_length, 0, 1, num_values, 'BOOLEAN', 0) AS pd
        |  FROM pdb WHERE page_type = 'DATA_PAGE_V2') t""".stripMargin)
      .collect()
    assert(r.nonEmpty && !r(0).isNullAt(0), "v2 RLE boolean refused")
    assert(r.map(_.getString(0)).toSet === Set("RLE_BOOL"))
    val truth = spark.read.parquet(dir)
      .agg(count(col("b")), sum(when(col("b"), 1L).otherwise(0L)))
      .collect()(0)
    assert(r.map(_.getLong(1)).sum === truth.getLong(0), "non-null count")
    assert(r.map(_.getLong(2)).sum === truth.getLong(1), "TRUE count")
  }

  test("interpreted eval agrees with the codegen path") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_pd_parity").toString
    spark.range(0, 2000)
      .select(when(col("id") % 9 === 0, lit(null))
        .otherwise(col("id")).as("k"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("compression", "none")
      .parquet(d)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(d)
      .filter(col("page_type") === "DATA_PAGE")
    def pdCol = ColumnBridge.column(graft.functions.PageDecodeExpr(Seq(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(col("page_type")),
      ColumnBridge.expression(col("encoding")),
      ColumnBridge.expression(lit("UNCOMPRESSED")),
      ColumnBridge.expression(col("page_uncompressed_size")),
      ColumnBridge.expression(col("rep_levels_byte_length")),
      ColumnBridge.expression(col("def_levels_byte_length")),
      ColumnBridge.expression(lit(0)),
      ColumnBridge.expression(lit(1)),
      ColumnBridge.expression(col("num_values")),
      ColumnBridge.expression(lit("INT64")),
      ColumnBridge.expression(lit(0)))))
    def run(codegen: String): Seq[(String, Long, Long)] = {
      spark.conf.set("spark.sql.codegen.factoryMode", codegen)
      try pages.select(pdCol.as("pd"))
        .select(col("pd.kind"), col("pd.n"), col("pd.lsum"))
        .as[(String, Long, Long)].collect().toSeq.sorted
      finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    val gen = run("CODEGEN_ONLY")
    val interp = run("NO_CODEGEN")
    assert(gen.nonEmpty)
    assert(gen === interp, "codegen and interpreted paths diverged")
    assert(gen.forall(_._1 == "PLAIN_INT64"))
    val truth = spark.read.parquet(d)
      .agg(count(col("k")), sum(col("k"))).collect()(0)
    assert(gen.map(_._2).sum === truth.getLong(0))
    assert(gen.map(_._3).sum === truth.getLong(1))
  }
}
