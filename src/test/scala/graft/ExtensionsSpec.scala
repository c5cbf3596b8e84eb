package graft

import org.apache.spark.sql.AnalysisException

/** SQL surface registered by [[GraftExtensions]]. */
class ExtensionsSpec extends SparkSpec {

  test("vector and sketch functions are callable from SQL") {
    val row = spark.sql("""
      SELECT
        cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
        dot_f(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d,
        jaccard_sorted(array('a', 'b'), array('b', 'c')) AS j,
        size(char_ngrams('abcd', 3)) AS ncg,
        size(minhash_sig(array('x', 'y'), 64)) AS nmh,
        simhash64(array('x', 'y')) AS sh,
        dot_f(l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))),
              l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))) AS unit
    """).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getDouble(1) === 6.0)
    assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-12)
    assert(row.getInt(3) === 2)
    assert(row.getInt(4) === 64)
    // any 64-bit value is fine; the point is it resolves and evaluates
    row.getLong(5)
    assert(math.abs(row.getDouble(6) - 1.0) < 1e-6)
  }

  test("quantization and heavy-hitter functions are callable from SQL") {
    val row = spark.sql("""
      SELECT
        quantize_i8(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT), CAST(9.0 AS FLOAT)), 64) AS q,
        dot_i(array(1, 2, 3), array(4, 5, 6)) AS d
    """).collect().head
    assert(row.getSeq[Int](0) === Seq(32, -16, 127))
    assert(row.getLong(1) === 32L)
    val hh = spark.sql("""
      SELECT freq_sketch(item, 8) AS sk FROM VALUES ('a'), ('a'), ('b') AS t(item)
    """).collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 2L), ("b", 1L)))
  }

  test("bloom probe and dictionary decode functions are callable from SQL") {
    // an all-zero bitset certainly contains nothing; hashes must agree
    // with the driver-side Sbbf implementations
    val row = spark.sql("""
      SELECT
        sbbf_hash(CAST(42 AS BIGINT)) AS hl,
        sbbf_hash('tag17') AS hs,
        sbbf_might_contain(CAST(repeat(CHAR(0), 32) AS BINARY),
                           sbbf_hash(CAST(42 AS BIGINT))) AS zero_hit,
        plain_dict_strings(CAST(CONCAT(CHAR(1), CHAR(0), CHAR(0), CHAR(0), 'a')
                           AS BINARY)) AS dict,
        plain_int64_sum(CAST(CONCAT(CHAR(7), repeat(CHAR(0), 7)) AS BINARY)) AS psum
    """).collect().head
    assert(row.getLong(0) === graft.meta.Sbbf.hashLong(42L))
    assert(row.getLong(1) === graft.meta.Sbbf.hashBytes("tag17".getBytes("UTF-8")))
    assert(!row.getBoolean(2))
    assert(row.getSeq[String](3) === Seq("a"))
    assert(row.getLong(4) === 7L)
  }

  test("metadata source is usable from pure SQL via CREATE TABLE ... USING") {
    spark.sql("DROP TABLE IF EXISTS meta_rg_ddl")
    spark.sql(s"""
      CREATE TABLE meta_rg_ddl USING metadata
      OPTIONS (path '${sf("0.001")}/lineitem.parquet', level 'rowgroup')""")
    try {
      val rows = spark.sql("SELECT sum(num_rows) FROM meta_rg_ddl").collect()
      val expected = spark.read.parquet(sf("0.001") + "/lineitem.parquet").count()
      assert(rows.head.getLong(0) === expected)
    } finally {
      spark.sql("DROP TABLE meta_rg_ddl")
    }
  }

  test("cdc_chunks and char_collision_micro are callable from SQL") {
    val row = spark.sql("""
      SELECT
        char_collision_micro('aaaa') AS degenerate,
        char_collision_micro('abcd') AS uniform,
        cdc_chunks('short', 16, 32) AS whole
      """).collect()(0)
    assert(row.getLong(0) === 1000000L)
    assert(row.getLong(1) === 250000L)
    assert(row.getSeq[String](2) === Seq("short")) // no full window -> one chunk
    // non-literal window is rejected at resolution
    intercept[Exception](
      spark.sql("SELECT cdc_chunks('ab', CAST(rand() * 3 AS INT), 32)").collect())
  }

  test("sql functions validate arity and literal arguments") {
    intercept[Exception](spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))").collect())
    // non-literal n for char_ngrams is rejected at resolution
    intercept[Exception](
      spark.sql("SELECT char_ngrams('ab', CAST(rand() * 3 AS INT))").collect())
    // wrong input type fails analysis
    intercept[AnalysisException](
      spark.sql("SELECT simhash64('not an array')").collect())
  }

  test("word_ngrams and the top-k aggregate work from SQL") {
    val ng = spark.sql("SELECT word_ngrams(array('a','b','c'), 2) AS ng")
      .collect().head.getSeq[String](0)
    assert(ng === Seq("a b", "b c"))
    // grouped top-k straight from SQL: best 2 per group, score desc, id asc
    val rows = spark.sql("""
      SELECT g, top_k_by_score(CAST(id % 5 AS DOUBLE), id, 2) AS top
      FROM (SELECT id, id % 3 AS g FROM range(0, 30))
      GROUP BY g ORDER BY g""").collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val top = r.getSeq[org.apache.spark.sql.Row](1)
      assert(top.length === 2)
      assert(top.head.getDouble(0) >= top.last.getDouble(0))
    }
    intercept[Exception](
      spark.sql("SELECT top_k_by_score(CAST(1.0 AS DOUBLE), 1L)").collect())
  }

  test("page_decode and the level walks are callable from SQL") {
    import org.apache.spark.sql.functions._
    // one v1 file, two differently-encoded columns, decoded through the
    // ONE dispatcher in pure SQL — kind strings prove the routing
    val d = java.nio.file.Files.createTempDirectory("graft_pd_sql").toString
    spark.range(0, 3000)
      .select(col("id").as("k"), (col("id") % 7).cast("string").as("s"))
      .coalesce(1).write.mode("overwrite")
      .option("parquet.enable.dictionary#k", "false")
      .option("compression", "none")
      .parquet(d)
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").load(d).createOrReplaceTempView("pd_pages")
    spark.read.format("metadata").option("level", "column").load(d)
      .createOrReplaceTempView("pd_cols")
    // k comes from a non-null range → REQUIRED (max_def 0); the derived
    // string is optional (max_def 1) — the caller supplies schema facts
    val rows = spark.sql(
      """SELECT t.path, t.page_type, t.pd.kind, t.pd.n, t.pd.lsum
        |FROM (SELECT path, page_type, page_decode(page_content, page_type,
        |    encoding, 'UNCOMPRESSED', page_uncompressed_size,
        |    rep_levels_byte_length, def_levels_byte_length, 0,
        |    CASE WHEN path = 'k' THEN 0 ELSE 1 END,
        |    num_values, type, 0) AS pd
        |  FROM pd_pages JOIN (SELECT filepath, row_group_id, column_id,
        |      path, type FROM pd_cols) c
        |    USING (filepath, row_group_id, column_id)) t
        |""".stripMargin).collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(2))
    assert(byKind.contains("PLAIN_INT64"), s"kinds: ${byKind.keys}")
    assert(byKind.contains("DICT_IDX"))
    assert(byKind.contains("DICT_STRINGS"))
    // the PLAIN int column's page sums reconstruct the data exactly
    val kSum = rows.filter(_.getString(2) == "PLAIN_INT64")
      .map(_.getLong(4)).sum
    assert(kSum === (0L until 3000L).sum)
    // arity is validated
    intercept[Exception](spark.sql("SELECT page_decode(X'00')").collect())
    // page_levels / page_levels_v2 are SQL-registered too
    intercept[Exception](spark.sql("SELECT page_levels(X'00')").collect())
    intercept[Exception](spark.sql("SELECT page_levels_v2(X'00')").collect())
  }

  test("zvalue2 and hamming64 composed trees work from SQL") {
    val r = spark.sql(
      "SELECT zvalue2(3L, 5L) AS z, hamming64(0L, 7L) AS h, hamming64(-1L, 0L) AS h2")
      .collect()(0)
    assert(r.getLong(0) === 39L) // interleave(0b11, 0b101) = 0b100111
    assert(r.getInt(1) === 3)
    assert(r.getInt(2) === 64)
    intercept[Exception](spark.sql("SELECT zvalue2(1L)").collect())
  }
}
