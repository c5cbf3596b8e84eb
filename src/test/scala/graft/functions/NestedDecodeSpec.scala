package graft.functions

import org.apache.parquet.bytes.HeapByteBufferAllocator
import org.apache.parquet.column.values.rle.RunLengthBitPackingHybridEncoder

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Nested (repetition-level) page decode: the level walk is bit-parity
 * with parquet-mr's own hybrid encoder on hand-built payloads, and on
 * REAL Spark-written `array<long>` files — nulls at both levels — the
 * per-page decode totals equal what parquet-mr's reader returns for the
 * same file, for v1 (PLAIN) and v2 (DELTA) writer outputs.
 */
class NestedDecodeSpec extends SparkSpec {

  private def encodeHybrid(bitWidth: Int, values: Seq[Int]): Array[Byte] = {
    val enc = new RunLengthBitPackingHybridEncoder(
      bitWidth, 64, 1 << 16, new HeapByteBufferAllocator())
    values.foreach(enc.writeInt)
    enc.toBytes.toByteArray
  }

  private def u32(n: Int): Array[Byte] =
    Array[Byte](n.toByte, (n >> 8).toByte, (n >> 16).toByte, (n >> 24).toByte)

  private def longsLE(vals: Seq[Long]): Array[Byte] =
    vals.flatMap(v => (0 until 8).map(i => (v >> (8 * i)).toByte)).toArray

  test("hand-built v1 nested payload: records, level counts, value region") {
    // four records of array<long>: [10, null, 30] / NULL / [] / [7]
    // Spark list shape: max_rep 1, max_def 3
    // entries (rep, def): (0,3)(1,2)(1,3) (0,0) (0,1) (0,3)
    val reps = Seq(0, 1, 1, 0, 0, 0)
    val defs = Seq(3, 2, 3, 0, 1, 3)
    val repB = encodeHybrid(1, reps)
    val defB = encodeHybrid(2, defs)
    val values = longsLE(Seq(10L, 30L, 7L))
    val payload = u32(repB.length) ++ repB ++ u32(defB.length) ++ defB ++ values

    val got = LevelWalk.walkV1(payload, 1, 3, 6)
    assert(got != null)
    assert(got.records === 4L)
    assert(got.defCounts.toSeq === Seq(1L, 1L, 1L, 3L))
    assert(got.valuesOff === 8 + repB.length + defB.length)
    // composition contract: the tail from values_off IS the PLAIN region
    val tail = java.util.Arrays.copyOfRange(payload, got.valuesOff, payload.length)
    assert(PlainInt64Sum.compute(tail) === java.lang.Long.valueOf(47L))

    // the same levels in v2 clothing: no prefixes, lengths from header
    val p2 = repB ++ defB ++ values
    val got2 = LevelWalk.walkV2(p2, repB.length, defB.length, 1, 3, 6)
    assert(got2 != null)
    assert(got2.records === 4L)
    assert(got2.defCounts.toSeq === Seq(1L, 1L, 1L, 3L))
    assert(got2.valuesOff === repB.length + defB.length)

    // flat degenerate cases still hold: max_rep 0 keeps records=entries
    val flat = LevelWalk.walkV1(u32(defB.length) ++ defB, 0, 3, 6)
    assert(flat != null && flat.records === 6L)
    // required flat column: no level blocks at all
    val req = LevelWalk.walkV1(values, 0, 0, 3)
    assert(req != null && req.valuesOff === 0 && req.defCounts.toSeq === Seq(3L))
  }

  test("malformed nested payloads decode to null") {
    val repB = encodeHybrid(1, Seq(0, 1))
    val defB = encodeHybrid(2, Seq(3, 3))
    // truncated length prefix
    assert(LevelWalk.walkV1(Array[Byte](1, 0), 1, 3, 2) == null)
    // rep block length past the payload
    assert(LevelWalk.walkV1(u32(99) ++ repB, 1, 3, 2) == null)
    // a definition level above max_def is a malformation, not a count
    val badDef = encodeHybrid(2, Seq(3, 2))
    val bad = u32(repB.length) ++ repB ++ u32(badDef.length) ++ badDef
    assert(LevelWalk.walkV1(bad, 1, 2, 2) == null) // def 3 > max_def 2
    // v2: a flat column claiming repetition bytes (and vice versa)
    assert(LevelWalk.walkV2(defB, 1, defB.length - 1, 0, 3, 2) == null)
    assert(LevelWalk.walkV2(defB, 0, defB.length, 1, 3, 2) == null)
    // v2 lengths past the payload
    assert(LevelWalk.walkV2(defB, 0, defB.length + 10, 0, 3, 2) == null)
    // absurd nesting depth rejected
    assert(LevelWalk.walkV1(u32(repB.length) ++ repB, 1000, 3, 2) == null)
  }

  test("v1 PLAIN array<long> file: page decode equals parquet-mr's reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nested_v1").toString
    // nulls at BOTH levels: null arrays (id%11==0), empty arrays
    // (id%11==1), null elements ((id+i)%13==0); unique values + disabled
    // dictionary force PLAIN data pages
    val df = spark.range(0, 4000)
      .select(col("id"),
        when(col("id") % 11 === 0, lit(null))
          .when(col("id") % 11 === 1, array().cast("array<long>"))
          .otherwise(transform(sequence(lit(0L), col("id") % 7),
            i => when((col("id") + i) % 13 === 0, lit(null))
              .otherwise(col("id") * 1000003L + i))).as("vals"))
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.page.row.count.limit", "500")
      .option("compression", "none")
      .parquet(dir)

    // ground truth through parquet-mr's own reader
    val truth = spark.read.parquet(dir)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(size(col("vals"))), lit(0L)).as("n_slots"),
        coalesce(sum(size(filter(col("vals"), _.isNotNull))), lit(0L)).as("n_elems"),
        coalesce(sum(aggregate(filter(col("vals"), _.isNotNull),
          lit(0L), _ + _)), lit(0L)).as("val_sum"))
      .collect()(0)

    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
      .createOrReplaceTempView("nested_pages")
    val got = spark.sql(
      """SELECT sum(lv.n_records) AS n_rows,
        |  sum(lv.def_counts[2] + lv.def_counts[3]) AS n_slots,
        |  sum(lv.def_counts[3]) AS n_elems,
        |  sum(plain_int64_sum(slice(
        |    page_content, lv.values_off + 1,
        |    size(page_content) - lv.values_off))) AS val_sum
        |FROM (SELECT page_content,
        |    page_levels(page_content, 1, 3, num_values) AS lv
        |  FROM nested_pages
        |  WHERE column_id = 1 AND page_type = 'DATA_PAGE')""".stripMargin)
      .collect()(0)
    assert(!got.isNullAt(0), "level walk failed on a real page")
    assert(got.getLong(0) === truth.getLong(0), "row count")
    assert(got.getLong(1) === truth.getLong(1), "list slots")
    assert(got.getLong(2) === truth.getLong(2), "non-null elements")
    assert(got.getLong(3) === truth.getLong(3), "element sum")
    // multiple pages so per-page decode is actually exercised
    val nPages = spark.sql(
      "SELECT count(*) FROM nested_pages WHERE column_id = 1 AND page_type = 'DATA_PAGE'")
      .collect()(0).getLong(0)
    assert(nPages > 1, s"fixture must span multiple pages, got $nPages")
  }

  test("v2 DELTA array<long> file: page decode equals parquet-mr's reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nested_v2").toString
    val df = spark.range(0, 3000)
      .select(col("id"),
        when(col("id") % 7 === 0, lit(null))
          .otherwise(transform(sequence(lit(0L), col("id") % 5),
            i => when((col("id") + i) % 13 === 0, lit(null))
              .otherwise(col("id") * 37L + i))).as("vals"))
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.writer.version", "PARQUET_2_0")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.page.row.count.limit", "400")
      .option("compression", "none")
      .parquet(dir)

    val truth = spark.read.parquet(dir)
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(aggregate(filter(col("vals"), _.isNotNull),
          lit(0L), _ + _)), lit(0L)).as("val_sum"))
      .collect()(0)

    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
      .createOrReplaceTempView("nested_pages_v2")
    // v2: level lengths are header fields; the values region (extracted
    // by page_values_v2) is a DELTA_BINARY_PACKED stream of the non-null
    // elements
    val got = spark.sql(
      """SELECT sum(lv.n_records) AS n_rows,
        |  sum(delta_int_sum(page_values_v2(
        |    page_content, rep_levels_byte_length + def_levels_byte_length,
        |    'UNCOMPRESSED',
        |    page_uncompressed_size
        |      - rep_levels_byte_length - def_levels_byte_length),
        |    'INT64')) AS val_sum
        |FROM (SELECT page_content, page_uncompressed_size,
        |    rep_levels_byte_length, def_levels_byte_length,
        |    page_levels_v2(page_content, rep_levels_byte_length,
        |      def_levels_byte_length, 1, 3, num_values) AS lv
        |  FROM nested_pages_v2
        |  WHERE column_id = 1 AND page_type = 'DATA_PAGE_V2')""".stripMargin)
      .collect()(0)
    assert(!got.isNullAt(0), "v2 level walk failed on a real page")
    assert(got.getLong(0) === truth.getLong(0), "row count")
    assert(got.getLong(1) === truth.getLong(1), "element sum")
  }

  test("nested dict pages: composition with dict_indexes reconstructs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nested_dict").toString
    // low-cardinality elements keep the dictionary alive
    val df = spark.range(0, 3000)
      .select(col("id"),
        when(col("id") % 10 === 0, lit(null))
          .otherwise(transform(sequence(lit(0L), col("id") % 4),
            i => (col("id") + i) % 23)).as("vals"))
    df.coalesce(1).write.mode("overwrite")
      .option("compression", "none")
      .parquet(dir)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(dir)
      .createOrReplaceTempView("nested_dict_pages")
    // per page: the dict-index run after the level blocks decodes via
    // dict_indexes(<tail>, max_def = 0, <def_counts[3]>); the dictionary
    // page itself is PLAIN INT64 — element_at closes the loop
    val got = spark.sql(
      """WITH dict AS (SELECT plain_int64_longs(page_content) AS d
        |  FROM nested_dict_pages
        |  WHERE column_id = 1 AND page_type = 'DICTIONARY_PAGE'),
        |pages AS (SELECT page_content,
        |    page_levels(page_content, 1, 3, num_values) AS lv
        |  FROM nested_dict_pages
        |  WHERE column_id = 1 AND page_type = 'DATA_PAGE')
        |SELECT sum(agg.s) AS total FROM (
        |  SELECT aggregate(transform(
        |      dict_indexes(slice(page_content, lv.values_off + 1,
        |        size(page_content) - lv.values_off),
        |        0, cast(lv.def_counts[3] AS INT)),
        |      i -> element_at(d.d, i + 1)), 0L, (a, x) -> a + x) AS s
        |  FROM pages CROSS JOIN dict d) agg""".stripMargin)
    val truth = spark.read.parquet(dir)
      .agg(coalesce(sum(aggregate(col("vals"), lit(0L), _ + _)), lit(0L)))
      .collect()(0).getLong(0)
    assert(got.collect()(0).getLong(0) === truth, "dict-composed element sum")
  }
}
