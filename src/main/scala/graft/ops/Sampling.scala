package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic hash-based sampling — the sampling discipline that
 * actually works at 100 TB. `df.sample()` draws from a per-partition RNG,
 * so the selected set changes with partitioning, retries, and cluster
 * size; a hash sample is a pure function of the row KEY: reproducible
 * across runs, stable under repartitioning, consistent between a pipeline
 * and its backfill, and composable (disjoint rate bands never overlap).
 *
 * A row is kept iff `xxhash64(seed, key) mod 2^20` falls below
 * `fraction * 2^20` — a narrow codegen'd projection, no shuffle, no RNG
 * state. Different seeds give independent samples; `[lo, hi)` bands of
 * the same seed partition the data exactly.
 */
object Sampling {

  private val Buckets = 1L << 20

  /** The row's sample bucket in [0, 2^20): pure function of (seed, key). */
  def bucket(key: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets))

  /** Keep approximately `fraction` of rows, deterministically by key —
    * exactly the `[0, fraction)` band, so a sample and the bands of the
    * same seed compose without overlap by construction. */
  def hashSample(df: DataFrame, key: Column, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1], got $fraction")
    hashBand(df, key, 0.0, fraction, seed)
  }

  /** Keep rows whose bucket falls in `[lo, hi)` of the unit interval —
    * bands of one seed are exactly disjoint and exactly exhaustive, the
    * right way to carve held-out/eval/train splits of a corpus. */
  def hashBand(df: DataFrame, key: Column, lo: Double, hi: Double,
      seed: Long = 42L): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo <= hi, s"band [$lo, $hi) out of range")
    val b = bucket(key, seed)
    df.filter(b >= (lo * Buckets).toLong && b < (hi * Buckets).toLong)
  }
}
