package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Wide-range changelog stress (r18): 52 snapshots with a transient
  * file compacted mid-range and the compacted output re-deleted at the
  * end — the vanished-add recovery must emit the pair exactly once
  * across 50 intermediate per-snapshot-complete lists, append-only
  * subranges must skip the recovery walk entirely (the r17-ADVICE
  * gate), and a replace-crossing subrange must emit no phantom rows. */
class IcebergWideChangelogSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val nAppends = 24

  private def fresh(): (String, Map[String, Long], Long) = {
    val d = Files.createTempDirectory("graft_ice_wide").toString + "/tbl"
    val (counts, last) =
      IcebergMeta.writeWideTransientFixtureTable(spark, d, docs, nAppends)
    (d, counts, last)
  }

  test("52-snapshot full range: the transient pair emits exactly once, " +
      "appends ride, nothing double-counts") {
    val (d, counts, last) = fresh()
    assert(last === 2L + 2 * nAppends + 2)
    val t0 = System.nanoTime()
    val cl = IcebergMeta.changelogScan(spark, d, 1L, last)
      .select(col("doc_id"), col("_change_type")).collect()
    val elapsedS = (System.nanoTime() - t0) / 1e9
    info(f"changelogScan over ${last - 1} snapshots: $elapsedS%.1f s")
    val inserts = cl.filter(_.getString(1) == "insert")
    val deletes = cl.filter(_.getString(1) == "delete")
    // inserts: 48 appended copies + the recovered transient fT
    assert(inserts.length ===
      counts("appends").toInt + counts("fT.parquet").toInt)
    // deletes: exactly the compacted output's whole-file removal
    assert(deletes.length === counts("fC.parquet").toInt)
    // the PAIR: fT's doc_ids (the last-5 slice, disjoint from the
    // appends' first-5 slice) appear exactly once on each side
    val bIds = docs.orderBy(col("doc_id").desc).limit(5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(inserts.count(r => bIds.contains(r.getLong(0))) === bIds.size)
    assert(deletes.map(_.getLong(0)).toSet === bIds)
  }

  test("append-only wide subrange skips recovery: pure inserts") {
    val (d, counts, _) = fresh()
    val replaceSnap = 2L + nAppends + 1
    val cl = IcebergMeta.changelogScan(spark, d, 2L, replaceSnap - 1)
      .groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cl === Map("insert" -> nAppends * counts("f0.parquet")))
  }

  test("a replace-crossing subrange emits no phantom rows: compaction " +
      "changed nothing logical") {
    val (d, counts, _) = fresh()
    val replaceSnap = 2L + nAppends + 1
    // (2, replaceSnap]: fT was added AT the from bound (not in range)
    // and removed by the replace (skipped) — only the appends emit
    val cl = IcebergMeta.changelogScan(spark, d, 2L, replaceSnap)
      .groupBy(col("_change_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cl === Map("insert" -> nAppends * counts("f0.parquet")))
  }
}
