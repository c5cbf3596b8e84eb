package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values) distinct-count sketch — the classic mergeable
 * cardinality estimator: keep the k smallest distinct hash values of a
 * key; if the k-th smallest normalized hash is t, the key space holds
 * roughly (k-1)/t distinct values. Bottom-k sketches of two partitions
 * merge by union + re-truncate, which is exactly what a map-side-combined
 * bounded-heap aggregate does — so the plan shuffles `mappers x groups x k`
 * rows, never the distinct key sets themselves (the `collect_set`
 * formulation this replaces holds whole key sets in executor memory).
 *
 * Determinism: with [[Sampling.arithHash]] the sketch CONTENTS (not just
 * the estimate) are a pure function of the key set, reproducible in plain
 * SQL by any engine — the correctness gate pins the k minimum hashes, the
 * k-th value, and the integer-exact estimate, not a tolerance band.
 */
object Sketches {

  /** Hash modulus of [[Sampling.arithHash]] — the sketch's value space. */
  val ArithHashModulus = 1000003L

  /**
   * Per-group KMV sketch of a pre-hashed key column: `(g, kmv array<long>)`
   * with the k smallest DISTINCT hash values ascending. One (group, hash)
   * dedupe aggregate, then one bounded-heap top-k (score = -hash) — both
   * map-side combinable.
   */
  def kmvSketch(df: DataFrame, group: Column, hashed: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(group.as("g"), hashed.as("h"))
      .distinct()
      .groupBy(col("g"))
      .agg(Similarity.topKAgg((col("h") * lit(-1L)).cast("double"), col("h"), k).as("topk"))
      .select(col("g"), transform(col("topk"), x => x.getField("id")).as("kmv"))
  }

  /**
   * Distinct-count estimate in micro-units from a KMV sketch over
   * [[Sampling.arithHash]] values: exact `n * 1e6` when the sketch is not
   * full (every distinct value is present), else the bottom-k estimator
   * `(k-1) * modulus * 1e6 div kth_min` — all integer arithmetic, so any
   * engine reproduces the same number bit-for-bit.
   */
  def kmvEstimateMicro(df: DataFrame, k: Int): DataFrame =
    df.select(col("g"),
        size(col("kmv")).cast("long").as("n_sketch"),
        when(size(col("kmv")) >= k, element_at(col("kmv"), k))
          .otherwise(lit(0L)).as("kth_min"))
      .withColumn("est_micro",
        when(col("n_sketch") < k, col("n_sketch") * lit(1000000L))
          .otherwise(expr(s"${(k - 1).toLong * ArithHashModulus * 1000000L}L div kth_min")))
}
