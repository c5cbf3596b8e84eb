package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-sequence packing: concatenate documents in a deterministic
 * order and cut every `budget` tokens — the concat-and-chunk construction
 * LLM pretraining pipelines use to build fixed-length sequences. A
 * document's sequence id is `floor(tokens_before_it / budget)`, where
 * `tokens_before_it` is the running token count of all earlier documents
 * in its shard.
 *
 * Plan shape: one window cumsum partitioned by the shard column and
 * ordered by the document key — a single shuffle on the shard key with an
 * in-partition sort. Parallelism equals the shard count, which is exactly
 * how production packing runs (each output shard is packed independently);
 * at 100 TB the shard column is the dataset's write-partition key, so the
 * shuffle is the one the sink needs anyway.
 */
object Packing {

  /**
   * Assign each row a `seq_id` within its shard. Deterministic: the order
   * column must be a unique key (ties would make the cumsum
   * partition-order-dependent).
   */
  def packSequences(
      df: DataFrame,
      shard: Column,
      order: Column,
      tokens: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"sequence token budget must be positive, got $budget")
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    // exact long division (`div`), not floor over a double cast: a shard
    // whose running token count passes 2^53 would round in double and can
    // misassign a boundary document by one sequence
    df.withColumn("__cum_before", coalesce(sum(tokens).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum_before div ${budget}L"))
      .drop("__cum_before")
  }

  /** Per-(shard, sequence) statistics: document and token counts. */
  def sequenceStats(
      df: DataFrame,
      shard: Column,
      order: Column,
      tokens: Column,
      budget: Long): DataFrame =
    packSequences(df.withColumn("__tok", tokens), shard, order, col("__tok"), budget)
      .groupBy(shard, col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))

  /**
   * Deterministic global shuffle for training export: each row gets a
   * `(shard, shuffle_pos)` — shard = `hash % nShards`, position = rank of
   * `(hash, id)` within the shard. A data loader reading shards in
   * position order sees a reproducible pseudo-random document order;
   * re-running, repartitioning, or backfilling yields the SAME layout
   * because position is a pure function of the key set (no RNG, no
   * zipWithIndex, no driver state).
   *
   * Scale shape: one shuffle keyed by shard plus an in-shard sort — an
   * exporter sizes `nShards` in the thousands, so parallelism equals shard
   * count and no global single-reducer sort exists anywhere (a global
   * `row_number` over an unpartitioned window would be exactly that).
   */
  def shardAndOrder(
      df: DataFrame,
      id: Column,
      hash: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("__h", hash)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("shuffle_pos",
        (row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("__h"), id)) - 1).cast("long"))
      .drop("__h")
  }
}
