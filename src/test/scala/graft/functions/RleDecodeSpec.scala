package graft.functions

import org.apache.parquet.bytes.HeapByteBufferAllocator
import org.apache.parquet.column.values.rle.RunLengthBitPackingHybridEncoder

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** RLE/bit-packed hybrid decode: bit-parity against parquet-mr's own
  * encoder, hand-built malformed payloads stay null, and the full
  * dictionary-indexed data-page walk reconstructs a real written file's
  * values — nulls included — from page_content alone. */
class RleDecodeSpec extends SparkSpec {

  private def encodeHybrid(bitWidth: Int, values: Seq[Int]): Array[Byte] = {
    val enc = new RunLengthBitPackingHybridEncoder(
      bitWidth, 64, 1 << 16, new HeapByteBufferAllocator())
    values.foreach(enc.writeInt)
    enc.toBytes.toByteArray
  }

  test("hybrid decode is bit-parity with parquet-mr's encoder") {
    val rnd = new scala.util.Random(7)
    for (bw <- Seq(1, 2, 3, 5, 8, 12, 17)) {
      val max = (1L << bw).toInt - 1
      // long runs (RLE side), alternating values (bit-packed side), mixed
      val cases = Seq(
        Seq.fill(100)(max),
        (0 until 64).map(_ % (max + 1)),
        Seq.fill(30)(1) ++ (0 until 17).map(i => (i * 7) % (max + 1)) ++ Seq.fill(40)(0),
        (0 until 1000).map(_ => rnd.nextInt(max + 1)))
      for (vals <- cases) {
        val bytes = encodeHybrid(bw, vals)
        val got = RleBp.decode(bytes, 0, bytes.length, bw, vals.length)
        assert(got != null, s"bw=$bw decode failed")
        assert(got.toSeq === vals, s"bw=$bw mismatch")
      }
    }
    // bit width 0 (single-value dictionary): parquet encodes RLE runs of
    // zero-byte values
    val z = encodeHybrid(0, Seq.fill(25)(0))
    assert(RleBp.decode(z, 0, z.length, 0, 25).toSeq === Seq.fill(25)(0))
  }

  test("malformed hybrid payloads decode to null, not garbage") {
    // truncated varint (continuation bit set, no next byte)
    assert(RleBp.decode(Array[Byte](-1), 0, 1, 4, 10) == null)
    // RLE run promising a value byte that is not there
    assert(RleBp.decode(Array[Byte](4), 0, 1, 8, 2) == null)
    // bit-packed run overrunning the region
    assert(RleBp.decode(Array[Byte](3, 1), 0, 2, 8, 8) == null)
    // empty region but values expected
    assert(RleBp.decode(Array.emptyByteArray, 0, 0, 1, 1) == null)
  }

  test("dict-indexed data pages reconstruct a real file's values, nulls included") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rle").toString
    // DEFAULT layout: dictionary ON (low-cardinality string), nulls every
    // 7th row (exercises the definition-level walk), uncompressed so
    // page_content is the raw payload
    spark.range(0, 5000)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("v"), col("id") % 11)).as("s"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("compression", "none")
      .option("parquet.page.row.count.limit", "600")
      .parquet(dir)
    val pages = spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
    // the s column is column_id 1 (id is 0); its data pages must be
    // dictionary-encoded
    val sPages = pages.filter(col("column_id") === 1)
    val encodings = sPages.filter(col("page_type").startsWith("DATA_PAGE"))
      .select(col("encoding")).distinct().collect().map(_.getString(0)).toSet
    assert(encodings.subsetOf(Set("PLAIN_DICTIONARY", "RLE_DICTIONARY")),
      s"premise broken: data pages not dictionary-encoded: $encodings")
    val dict = ColumnBridge.column(PlainDictStrings(
      ColumnBridge.expression(col("page_content"))))
    val idx = ColumnBridge.column(DictIndexes(
      ColumnBridge.expression(col("page_content")),
      ColumnBridge.expression(lit(1)),
      ColumnBridge.expression(col("num_values"))))
    // per row group: dictionary from the DICTIONARY_PAGE, indexes from
    // each DATA_PAGE, composed to values
    val dicts = sPages.filter(col("page_type") === "DICTIONARY_PAGE")
      .select(col("row_group_id"), dict.as("dict"))
    val got = sPages.filter(col("page_type").startsWith("DATA_PAGE"))
      .select(col("row_group_id"), idx.as("idx"))
      .join(dicts, "row_group_id")
      .select(explode(expr("transform(idx, i -> element_at(dict, i + 1))")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(dir).filter(col("s").isNotNull)
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
    // null accounting closes the loop: header num_values minus decoded
    // indexes equals the data-side null count
    val decoded = sPages.filter(col("page_type").startsWith("DATA_PAGE"))
      .select(sum(col("num_values")).cast("long").as("total"),
        sum(size(idx)).cast("long").as("nonnull"))
      .collect()(0)
    val nulls = spark.read.parquet(dir).filter(col("s").isNull).count()
    assert(decoded.getLong(0) - decoded.getLong(1) === nulls)
  }

  test("required columns (max_def 0) decode without a level walk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rle_req").toString
    // repartition by a constant-key column keeps cardinality low so the
    // dictionary survives; id % 5 gives a 5-entry dictionary
    spark.range(0, 2000)
      .select((col("id") % 5).cast("string").as("s"))
      .coalesce(1)
      .write.mode("overwrite").option("compression", "none").parquet(dir)
    // Spark writes nullable schemas (max_def 1); prove the max_def=0 path
    // on a hand-built payload instead: no level block, 1-byte width, runs
    val payload = Array[Byte](2) ++ encodeHybrid(2, Seq(0, 1, 2, 3, 2, 1))
    val got = DictIndexes.compute(payload, 0, 6)
    assert(got != null)
    assert(got.toIntArray().toSeq === Seq(0, 1, 2, 3, 2, 1))
    // malformed: truncated def-level length prefix under max_def 1
    assert(DictIndexes.compute(Array[Byte](1, 0), 1, 4) == null)
    // LongType num_values past Int range: the CODEGEN path must null out
    // like the interpreted path, not truncate through an (int) cast
    import spark.implicits._
    val overflowRow = Seq(Tuple1(payload)).toDF("b")
      .select(ColumnBridge.column(DictIndexes(
        ColumnBridge.expression(col("b")),
        ColumnBridge.expression(lit(0)),
        ColumnBridge.expression(lit(4294967296L)))).as("i"))
      .collect()(0)
    assert(overflowRow.isNullAt(0), "codegen truncated a Long num_values")
    // zero values: empty indexes whatever the payload
    assert(DictIndexes.compute(Array.emptyByteArray, 1, 0).numElements() === 0)
  }

  test("counts past the allocation cap are rejected before allocating") {
    // num_values comes from an untrusted page header; a claim of
    // Int.MaxValue values must fail fast instead of allocating a multi-GB
    // array and OOMing the executor
    val tiny = encodeHybrid(1, Seq(0, 1, 0, 1))
    assert(RleBp.decode(tiny, 0, tiny.length, 1, Int.MaxValue) == null)
    assert(RleBp.decode(tiny, 0, tiny.length, 1, RleBp.MaxDecoded + 1) == null)
    // at the cap itself the decode proceeds (and then fails on the short
    // payload, not on the count)
    assert(RleBp.decode(tiny, 0, tiny.length, 1, 4) != null)
    // the cap propagates through the v1 payload walk
    val payload = Array[Byte](2) ++ encodeHybrid(2, Seq(0, 1, 2, 3))
    assert(DictIndexes.compute(payload, 0, Int.MaxValue) == null)
  }
}
