package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Sampling

/**
 * Streaming budget gate: per-source absolute budgets fill across
 * micro-batches (arrival-order priority), each batch is carved with the
 * deterministic prefix of its remaining budget, a filled gate stays
 * closed, and the committed-batch log makes replays no-ops.
 */
class StreamBudgetGateSpec extends SparkSpec {
  import spark.implicits._

  // three deterministic increments over two sources; costs 1..23
  private def inc(b: Int) = spark.range(b * 100, b * 100 + 100)
    .select(col("id"),
      when(pmod(col("id"), lit(2)) === 0, "web").otherwise("code").as("src"),
      (pmod(col("id") * 13, lit(23)) + 1).as("cost"))

  private val budgets = Map("web" -> 1200L, "code" -> 700L)

  /** Driver-side reference: batch-by-batch carve with carried remainders. */
  private def reference(batches: Seq[Int],
      initial: Map[String, Long] = budgets): Set[Long] = {
    var rem = initial
    val kept = Seq.newBuilder[Long]
    for (b <- batches) {
      val k = Sampling.budgetCarvePerGroup(
        inc(b), col("src"), col("id"), col("cost"), rem)
        .select(col("id"), col("src"), col("cost"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      kept ++= k.map(_._1)
      val drank = k.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      rem = rem.map { case (g, r) =>
        g -> math.max(0L, r - drank.getOrElse(g, 0L))
      }
    }
    kept.result().toSet
  }

  test("batch body: budgets fill across batches, match the sequential reference") {
    val (out, state, log) =
      (freshTable("bg_out_a"), freshTable("bg_state_a"), freshTable("bg_log_a"))
    for (b <- 0 until 3)
      StreamOps.budgetGateBatch(inc(b), col("src"), col("id"), col("cost"),
        budgets, out, state, log, b.toLong)
    val got = spark.table(out).select("id").as[Long].collect().toSet
    assert(got === reference(Seq(0, 1, 2)))
    // every group within budget; code (tight budget) nearly full
    val spent = spark.table(out).groupBy("src").agg(sum("cost").as("c"))
      .as[(String, Long)].collect().toMap
    assert(spent.forall { case (g, c) => c <= budgets(g) })
    assert(spent("code") > budgets("code") - 23) // crossing cut, not starved
    // state table carries exactly what was drunk
    val st = spark.table(state).as[(String, Long)].collect().toMap
    assert(st === spent)
    // out rows carry their batch id (the crash-repair handle)
    assert(spark.table(out).select("batch_id").distinct()
      .as[Long].collect().toSet === Set(0L, 1L, 2L))
  }

  test("filled gate stays closed; replayed batch is a no-op") {
    val (out, state, log) =
      (freshTable("bg_out_b"), freshTable("bg_state_b"), freshTable("bg_log_b"))
    // batch 0 alone exceeds code's budget; batch 1 must add no code rows
    val tight = Map("code" -> 300L)
    StreamOps.budgetGateBatch(inc(0), col("src"), col("id"), col("cost"),
      tight, out, state, log, 0L)
    val after0 = spark.table(out).select("id").as[Long].collect().toSet
    StreamOps.budgetGateBatch(inc(1), col("src"), col("id"), col("cost"),
      tight, out, state, log, 1L)
    val after1 = spark.table(out).select("id").as[Long].collect().toSet
    assert(after0.nonEmpty)
    assert(after0 === reference(Seq(0), tight))
    assert(after1 === reference(Seq(0, 1), tight))
    // web has no budget: never admitted; code stays within its budget
    val spent = spark.table(out).groupBy("src").agg(sum("cost").as("c"))
      .as[(String, Long)].collect().toMap
    assert(!spent.contains("web") && spent("code") <= 300L)
    // replaying batch 0 with the same id changes nothing
    StreamOps.budgetGateBatch(inc(0), col("src"), col("id"), col("cost"),
      tight, out, state, log, 0L)
    assert(spark.table(out).select("id").as[Long].collect().toSet === after1)
  }

  test("run-state mirror path equals the per-batch table-read path") {
    val (out1, state1, log1) =
      (freshTable("bg_out_m1"), freshTable("bg_state_m1"), freshTable("bg_log_m1"))
    val (out2, state2, log2) =
      (freshTable("bg_out_m2"), freshTable("bg_state_m2"), freshTable("bg_log_m2"))
    for (b <- 0 until 3)
      StreamOps.budgetGateBatch(inc(b), col("src"), col("id"), col("cost"),
        budgets, out1, state1, log1, b.toLong)
    val run = StreamOps.loadBudgetGateRun(spark, log2, state2)
    for (b <- 0 until 3)
      StreamOps.budgetGateBatch(inc(b), col("src"), col("id"), col("cost"),
        budgets, out2, state2, log2, b.toLong, Some(run))
    assert(spark.table(out2).select("id").as[Long].collect().toSet ===
      spark.table(out1).select("id").as[Long].collect().toSet)
    assert(spark.table(state2).as[(String, Long)].collect().toMap ===
      spark.table(state1).as[(String, Long)].collect().toMap)
    // mirror replay: a re-fed batch id is a no-op
    val before = spark.table(out2).count()
    StreamOps.budgetGateBatch(inc(1), col("src"), col("id"), col("cost"),
      budgets, out2, state2, log2, 1L, Some(run))
    assert(spark.table(out2).count() === before)
  }

  test("readStream end-to-end equals the direct batch loop") {
    val (out, state, log) =
      (freshTable("bg_out_c"), freshTable("bg_state_c"), freshTable("bg_log_c"))
    val staging = Files.createTempDirectory("graft_bg_staging").toFile
    val ckpt = Files.createTempDirectory("graft_bg_ckpt").toFile
    try {
      // one file per increment; a single AvailableNow run consumes all of
      // them (batch split across files need not match the reference split
      // — totals are split-bounded, per-group spend is budget-bounded)
      for (b <- 0 until 3)
        inc(b).coalesce(1).write.mode("append").parquet(staging.toString)
      StreamOps.budgetGate(
        spark.readStream.schema(inc(0).schema)
          .option("maxFilesPerTrigger", "1").parquet(staging.toString),
        col("src"), col("id"), col("cost"), budgets,
        out, state, log, ckpt.toString).awaitTermination()
      val spent = spark.table(out).groupBy("src").agg(sum("cost").as("c"))
        .as[(String, Long)].collect().toMap
      assert(spent.forall { case (g, c) => c <= budgets(g) })
      assert(spent("code") > budgets("code") - 23)
      assert(spent("web") > budgets("web") - 23)
      // a second AvailableNow run over the same files ingests nothing new
      val before = spark.table(out).count()
      StreamOps.budgetGate(
        spark.readStream.schema(inc(0).schema)
          .option("maxFilesPerTrigger", "1").parquet(staging.toString),
        col("src"), col("id"), col("cost"), budgets,
        out, state, log, ckpt.toString).awaitTermination()
      assert(spark.table(out).count() === before)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(staging)
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt)
    }
  }
}
