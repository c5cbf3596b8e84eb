package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Footer editing + the new rowgroup/column footer fields: declaring
  * sorting_columns post-write surfaces through the rowgroup level, leaves
  * every data byte untouched, and encoding_stats audit dictionary usage. */
class FooterEditSpec extends SparkSpec {

  test("declared sorting columns surface; data bytes and content survive") {
    val d = Files.createTempDirectory("graft_fedit").toString
    spark.range(0, 10000)
      .select(col("id").as("k"), (col("id") % 97).as("payload"))
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(d)
    // before: Spark/parquet-mr cannot declare sort metadata at all
    val before = spark.read.format("metadata").option("level", "rowgroup")
      .option("footercache", "false").load(d)
      .select(col("sorting_columns")).collect()
    assert(before.forall(_.isNullAt(0)), "fresh file already had sorting_columns")
    val file = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val dataBytesBefore = {
      val all = java.nio.file.Files.readAllBytes(file.toPath)
      all.take(all.length - 8 - 1000) // generous footer margin; data prefix
    }

    FooterEdit.declareSortingColumnsDir(d,
      Seq(SortingColumnInfo(columnIdx = 0, descending = false, nullsFirst = false)))

    // declaration surfaces through the rowgroup level
    val after = spark.read.format("metadata").option("level", "rowgroup")
      .option("footercache", "false").load(d)
      .select(explode(col("sorting_columns")).as("sc"))
      .select(col("sc.column_idx"), col("sc.descending"), col("sc.nulls_first"))
      .collect()
    assert(after.nonEmpty)
    after.foreach { r =>
      assert(r.getInt(0) === 0 && !r.getBoolean(1) && !r.getBoolean(2))
    }
    // data prefix byte-identical, content identical, checksummed read OK
    val allAfter = java.nio.file.Files.readAllBytes(file.toPath)
    assert(allAfter.take(dataBytesBefore.length).toSeq === dataBytesBefore.toSeq,
      "footer rewrite touched data bytes")
    val back = spark.read.parquet(d)
    assert(back.count() === 10000L)
    assert(back.agg(sum(col("k"))).collect()(0).getLong(0) ===
      (0L until 10000L).sum)
    // and the declaration is TRUE of the data: row group stats are monotone
    val stats = spark.read.format("metadata").option("level", "column")
      .option("footercache", "false").load(d)
      .filter(col("path") === "k")
      .select(col("statistics.min_value"), col("statistics.max_value"))
      .collect()
    assert(stats.nonEmpty)
  }

  test("sortAudit: direction-aware, duplicate-tolerant, null on no evidence") {
    def monotone(r: org.apache.spark.sql.Row): Option[Boolean] = {
      val i = r.fieldIndex("monotone")
      if (r.isNullAt(i)) None else Some(r.getBoolean(i))
    }
    // DESCENDING data over several row groups, declared descending
    val d = Files.createTempDirectory("graft_audit_desc").toString
    spark.range(0, 60000)
      .select((lit(60000L) - col("id")).as("k"),
        (col("id") % 97).cast("string").as("s"))
      .repartition(1).sortWithinPartitions(col("k").desc)
      .write.mode("overwrite").option("parquet.block.size", "65536").parquet(d)
    FooterEdit.declareSortingColumnsDir(d,
      Seq(SortingColumnInfo(0, descending = true, nullsFirst = false)))
    val desc = MetaPrune.sortAudit(spark, d, "k").collect()
    assert(desc.length > 1, "fixture must span multiple row groups")
    assert(desc.forall(monotone(_) === Some(true)),
      "descending declaration over descending data must audit true")
    // the SAME data re-declared ascending: every non-first group is a
    // contradiction the audit must report as FALSE (direction matters)
    FooterEdit.declareSortingColumnsDir(d,
      Seq(SortingColumnInfo(0, descending = false, nullsFirst = false)))
    val wrong = MetaPrune.sortAudit(spark, d, "k").collect()
      .sortBy(_.getInt(1))
    assert(monotone(wrong.head) === Some(true), "first group is vacuous")
    assert(wrong.tail.forall(monotone(_) === Some(false)))
    // a STRING column's stats don't decode through the INT64 stat walk:
    // the verdict is NULL ("no evidence"), never a silent TRUE
    val noEv = MetaPrune.sortAudit(spark, d, "s").collect()
    assert(noEv.nonEmpty)
    assert(noEv.forall(monotone(_).isEmpty),
      "undecodable stats must yield a NULL verdict")
    // duplicate keys spanning row-group boundaries: non-strict compare
    // keeps a genuinely sorted constant column auditing TRUE
    val d2 = Files.createTempDirectory("graft_audit_dup").toString
    spark.range(0, 60000)
      .select(lit(7L).as("k"), col("id").as("p"))
      .repartition(1)
      .write.mode("overwrite").option("parquet.block.size", "65536").parquet(d2)
    FooterEdit.declareSortingColumnsDir(d2,
      Seq(SortingColumnInfo(0, descending = false, nullsFirst = false)))
    val dup = MetaPrune.sortAudit(spark, d2, "k").collect()
    assert(dup.length > 1, "fixture must span multiple row groups")
    assert(dup.forall(monotone(_) === Some(true)),
      "boundary-spanning duplicates are still sorted")
  }

  test("out-of-range column index and non-parquet files are rejected") {
    val d = Files.createTempDirectory("graft_fedit_bad").toString
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(d)
    val file = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    intercept[IllegalArgumentException] {
      FooterEdit.declareSortingColumns(file, Seq(SortingColumnInfo(99, false, false)))
    }
    intercept[IllegalArgumentException] {
      FooterEdit.declareSortingColumns(file, Seq.empty)
    }
    val junk = new java.io.File(d, "junk.parquet")
    java.nio.file.Files.write(junk.toPath, "not parquet at all".getBytes)
    intercept[IllegalArgumentException] {
      FooterEdit.declareSortingColumns(junk, Seq(SortingColumnInfo(0, false, false)))
    }
  }

  test("key-value stamping merges entries and preserves data + prior keys") {
    val d = Files.createTempDirectory("graft_fedit_kv").toString
    spark.range(0, 500).coalesce(1).write.mode("overwrite").parquet(d)
    val before = spark.read.format("metadata").option("level", "file")
      .option("footercache", "false").load(d)
      .select(col("key_value_metadata")).collect()(0)
      .getMap[String, String](0)
    assert(before.nonEmpty, "Spark should have written its schema key")

    FooterEdit.setKeyValueDir(d, Map(
      "graft.pipeline" -> "r9", "graft.snapshot" -> "2026-08-14"))
    val after = spark.read.format("metadata").option("level", "file")
      .option("footercache", "false").load(d)
      .select(col("key_value_metadata")).collect()(0)
      .getMap[String, String](0)
    assert(after.get("graft.pipeline").contains("r9"))
    assert(after.get("graft.snapshot").contains("2026-08-14"))
    // prior keys preserved
    before.keys.foreach(k => assert(after.contains(k), s"lost prior key $k"))
    // data intact through the checksummed read path
    assert(spark.read.parquet(d).count() === 500L)
    // overwrite semantics: re-stamp replaces, does not duplicate
    FooterEdit.setKeyValueDir(d, Map("graft.pipeline" -> "r9b"))
    val again = spark.read.format("metadata").option("level", "file")
      .option("footercache", "false").load(d)
      .select(col("key_value_metadata")).collect()(0)
      .getMap[String, String](0)
    assert(again.get("graft.pipeline").contains("r9b"))
    assert(again.get("graft.snapshot").contains("2026-08-14"))
  }

  test("encoding_stats audit dictionary usage per chunk") {
    val d = Files.createTempDirectory("graft_encstats").toString
    spark.range(0, 5000)
      .select((col("id") % 13).cast("string").as("dict_col"), col("id").as("plain_col"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "1000")
      .parquet(d)
    val es = spark.read.format("metadata").option("level", "column").load(d)
      .select(col("path"), explode(col("encoding_stats")).as("es"))
      .select(col("path"), col("es.page_type"), col("es.encoding"), col("es.count"))
      .collect()
      .groupBy(_.getString(0))
    // the low-cardinality string column is dictionary-encoded...
    val dictStats = es("dict_col").map(r =>
      (r.getString(1), r.getString(2), r.getInt(3)))
    assert(dictStats.exists { case (pt, enc, _) =>
      pt == "DICTIONARY_PAGE" && enc.contains("PLAIN") })
    assert(dictStats.exists { case (pt, enc, _) =>
      pt == "DATA_PAGE" && enc.contains("DICTIONARY") })
    // ...and its per-type counts agree with the physical page walk
    val pageCounts = spark.read.format("metadata").option("level", "page").load(d)
      .filter(col("column_id") === 0)
      .groupBy(col("page_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val statCounts = dictStats.groupBy(_._1)
      .map { case (pt, rs) => pt -> rs.map(_._3.toLong).sum }
    assert(statCounts === pageCounts,
      s"footer encoding_stats disagree with the page walk: $statCounts vs $pageCounts")
  }
}
