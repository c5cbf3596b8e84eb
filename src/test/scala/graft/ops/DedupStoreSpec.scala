package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Incremental dedup against a persisted bucketed band store: same
 * candidates as the direct cross-corpus join, with the store side reading
 * its bucket layout instead of shuffling — the "scrub today's crawl
 * against everything already ingested" plan at 100 TB.
 */
class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def corpusA = spark.read.parquet(sf("0.001") + "/documents.parquet")
    .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))

  // increment: 20 exact copies of A docs (shifted ids) + 10 unique docs
  private def corpusB = {
    val d = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    d.filter(col("doc_id") < 20)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
      .union(d.filter(col("doc_id") >= 20 && col("doc_id") < 30)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" storeuniq"), col("doc_id").cast("string")).as("text")))
      .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
  }

  test("store scrub equals the direct cross-corpus join; store side does not shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Dedup.writeBandStore(corpusA, col("doc_id"), col("ws"),
        "graft_band_store", buckets = 8)
      val scrub = Dedup.scrubAgainstBandStore(spark, "graft_band_store",
        corpusB, col("doc_id"), col("ws"))
      val direct = Dedup.crossCandidatePairs(
        Dedup.lshBands(Dedup.minhashSignatures(corpusA, col("doc_id"), col("ws")), 16, 4),
        Dedup.lshBands(Dedup.minhashSignatures(corpusB, col("doc_id"), col("ws")), 16, 4))
        .as[(Long, Long)].collect().toSet
      val got = scrub.as[(Long, Long)].collect().toSet
      assert(got === direct)
      // every planted exact copy is a candidate (J=1 guaranteed recall)
      val planted = (0L until 20L).map(i => (i, i + 500000L)).toSet
      assert(planted.subsetOf(got))

      // plan: the increment's bands shuffle and the final pair-distinct
      // aggregates (tiny candidate set) — the STORE side must read its
      // bucket layout with no exchange of its own
      val plan = scrub.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges === 2,
        s"expected increment-band + distinct exchanges only, got $exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"store scan should use its bucket layout:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(band_hash_l"),
        s"store side must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_band_store")
    }
  }

  test("absorbed increments are scrubbed against without breaking the bucket layout") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // drop any orphaned location from a prior JVM before writing
      spark.sql("DROP TABLE IF EXISTS graft_band_store_app")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "graft_band_store_app")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)

      Dedup.writeBandStore(corpusA, col("doc_id"), col("ws"),
        "graft_band_store_app", buckets = 8)
      Dedup.appendToBandStore(corpusB, col("doc_id"), col("ws"),
        "graft_band_store_app", buckets = 8)
      // a third increment duplicating one ORIGINAL doc and one ABSORBED doc
      val inc = corpusA.filter(col("doc_id") === 5)
        .select(lit(900005L).as("doc_id"), col("ws"))
        .union(corpusB.filter(col("doc_id") === 500010L)
          .select(lit(910010L).as("doc_id"), col("ws")))
      val scrub = Dedup.scrubAgainstBandStore(spark, "graft_band_store_app",
        inc, col("doc_id"), col("ws"))
      val got = scrub.as[(Long, Long)].collect().toSet
      assert(got.contains((5L, 900005L)), s"original store rows must match: $got")
      assert(got.contains((500010L, 910010L)), s"appended rows must match: $got")
      // FULL equality with a direct recompute over A union B: an append
      // that banded with drifted geometry or corrupted hashes would add
      // or lose candidates that the planted contains() checks miss
      val grown = corpusA.unionByName(corpusB)
      val direct = Dedup.crossCandidatePairs(
        Dedup.lshBands(Dedup.minhashSignatures(grown, col("doc_id"), col("ws")), 16, 4),
        Dedup.lshBands(Dedup.minhashSignatures(inc, col("doc_id"), col("ws")), 16, 4))
        .as[(Long, Long)].collect().toSet
      assert(got === direct)
      // the grown store still reads its bucket layout, no store-side shuffle
      val plan = scrub.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"bucketed scan lost:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(band_hash_l"),
        s"store side must not shuffle after append:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_band_store_app")
    }
  }
}
