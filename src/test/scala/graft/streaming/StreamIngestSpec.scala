package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, TextOps}

/**
 * Streaming scrub-and-absorb ingest over the persisted dedup store pair:
 * micro-batches dedup against everything ingested before them, the final
 * store state is independent of micro-batch boundaries (on a pre-deduped
 * increment), and the committed-batch log makes foreachBatch replays
 * no-ops.
 */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def writePair(band: String, doc: String): Unit = {
    val ref = docs.filter(col("doc_id") >= 40)
    Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
      band, buckets = 4)
    Dedup.writeDocStore(ref, col("doc_id"), TextOps.tokenSet(col("text")), doc)
  }

  /** Increment with planted store duplicates (40..54 relabeled) and novel
    * docs (<40, unique suffix), pre-deduped on token set. */
  private def increment = docs.filter(col("doc_id") < 55)
    .select((col("doc_id") + 800000L).as("doc_id"),
      when(col("doc_id") < 40,
          concat(col("text"), lit(" ingestuniq"), col("doc_id").cast("string")))
        .otherwise(col("text")).as("text"))
    .select(col("doc_id"), col("text"),
      TextOps.tokenSet(col("text")).as("ws"))
    .groupBy(col("ws"))
    .agg(min(col("doc_id")).as("doc_id"),
      min_by(col("text"), col("doc_id")).as("text"))
    .select(col("doc_id"), col("text"))

  private def runIngest(band: String, doc: String, log: String,
      staging: String, oneFilePerTrigger: Boolean): Unit = {
    val r = spark.readStream.schema(spark.read.parquet(staging).schema)
    val src = (if (oneFilePerTrigger) r.option("maxFilesPerTrigger", "1") else r)
      .parquet(staging)
    val ckpt = Files.createTempDirectory("graft_si_ckpt").toString
    StreamOps.ingestIncrements(src, col("doc_id"),
      TextOps.tokenSet(col("text")), band, doc, log,
      buckets = 4, ckpt).awaitTermination()
  }

  test("final store state is split-invariant and matches the batch fixpoint") {
    val staging = Files.createTempDirectory("graft_si_stage").toString
    increment.repartition(4).write.mode("overwrite").parquet(staging)
    val names @ Seq(b1, d1, l1, b2, d2, l2) = Seq(
      "graft_si_band1", "graft_si_docs1", "graft_si_log1",
      "graft_si_band2", "graft_si_docs2", "graft_si_log2").map(freshTable)
    try {
      writePair(b1, d1); writePair(b2, d2)
      runIngest(b1, d1, l1, staging, oneFilePerTrigger = true)
      runIngest(b2, d2, l2, staging, oneFilePerTrigger = false)

      val multi = spark.table(d1).select("doc_id").as[Long].collect().toSet
      val single = spark.table(d2).select("doc_id").as[Long].collect().toSet
      assert(multi === single)
      assert(spark.table(b1).count() === spark.table(b2).count())
      // multiple micro-batches actually ran down the multi path
      assert(spark.table(l1).count() > 1,
        "maxFilesPerTrigger=1 should produce multiple batches")

      // batch fixpoint: survivors = increment docs whose token set is
      // absent from the reference (pre-deduped increment => absorbing a
      // survivor can never create a later duplicate)
      val refWs = docs.filter(col("doc_id") >= 40)
        .select(TextOps.tokenSet(col("text")).as("ws"))
      val expected = increment
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
        .join(refWs, Seq("ws"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      val survived = multi.filter(_ >= 800000L)
      assert(survived === expected)
      // planted literal copies (40..54) were all dropped
      assert((800040L to 800054L).forall(id => !multi.contains(id)))
      // the absorbed store still reads its bucket layout on a scrub
      val plan = Dedup.scrubAgainstBandStore(spark, b1,
        increment.limit(1), col("doc_id"), TextOps.tokenSet(col("text")))
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"bucketed scan lost:\n$plan")
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
  }

  test("committed-batch log makes a replayed batch a no-op; cross-batch dups caught") {
    val names @ Seq(band, doc, log) =
      Seq("graft_si_band3", "graft_si_docs3", "graft_si_log3").map(freshTable)
    try {
      writePair(band, doc)
      val a = docs.filter(col("doc_id") === 3)
        .select(lit(820003L).as("doc_id"),
          concat(col("text"), lit(" replaybatch")).as("text"))
      StreamOps.ingestBatch(a, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 0L)
      val afterFirst = spark.table(doc).count()
      val bandAfterFirst = spark.table(band).count()
      assert(spark.table(doc).filter(col("doc_id") === 820003L).count() === 1)

      // replay of the SAME batch id: skipped wholesale, no double absorb
      StreamOps.ingestBatch(a, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 0L)
      assert(spark.table(doc).count() === afterFirst)
      assert(spark.table(band).count() === bandAfterFirst)

      // a LATER batch duplicating the batch-0 survivor is caught by the
      // absorbed bands (dedup against everything ingested before it)
      val copy = a.select(lit(830003L).as("doc_id"), col("text"))
      StreamOps.ingestBatch(copy, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 1L)
      assert(spark.table(doc).filter(col("doc_id") === 830003L).count() === 0)
      assert(spark.table(doc).count() === afterFirst)
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
  }

  test("run-scoped committed mirror: replay no-op in-run and after reload") {
    val names @ Seq(band, doc, log) =
      Seq("graft_si_band4", "graft_si_docs4", "graft_si_log4").map(freshTable)
    try {
      writePair(band, doc)
      val a = docs.filter(col("doc_id") === 3)
        .select(lit(840003L).as("doc_id"),
          concat(col("text"), lit(" mirrorbatch")).as("text"))
      val committed = scala.collection.mutable.Set.empty[Long]
      StreamOps.ingestBatch(a, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 0L, committed = Some(committed))
      assert(committed === Set(0L))
      // the log TABLE was still written (the durable truth)
      assert(spark.table(log).as[Long].collect().toSet === Set(0L))
      val afterFirst = spark.table(doc).count()
      // in-run replay: skipped via the mirror
      StreamOps.ingestBatch(a, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 0L, committed = Some(committed))
      assert(spark.table(doc).count() === afterFirst)
      // restart shape: a mirror RELOADED from the log table also skips
      val reloaded = scala.collection.mutable.Set(
        spark.table(log).as[Long].collect().toSeq: _*)
      StreamOps.ingestBatch(a, col("doc_id"), TextOps.tokenSet(col("text")),
        band, doc, log, buckets = 4, batchId = 0L, committed = Some(reloaded))
      assert(spark.table(doc).count() === afterFirst)
    } finally names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
  }
}
