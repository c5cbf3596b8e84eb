package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
 * joins at runtime; explicit salting remains the tool of choice when a few
 * hot keys dominate a shuffle (the classic power-law key problem at
 * 100 TB) and the small side is too large to broadcast.
 */
object Skew {

  /**
   * Salted inner equi-join: the big (skewed) side scatters each row into
   * one of `salts` sub-keys; the other side is replicated across all salt
   * values. Shuffle load for a hot key spreads over `salts` reducers at the
   * cost of replicating the right side `salts` times — choose
   * `salts ~ hottest-key-rows / average-key-rows`.
   *
   * The salt is a deterministic hash of the big side's full row (xxhash64
   * over all columns), not a positional counter: task retries and
   * fetch-failure recomputes land every row on the same salt value, so the
   * shuffle layout — not just the result set — is stable across replays.
   *
   * Entropy contract: spreading relies on the hot key's rows DIFFERING in
   * some non-key column (the usual case — events carry timestamps, ids,
   * payloads). A big side consisting of exact duplicate rows hashes every
   * copy to one salt; deduplicate-with-count first (`groupBy(all).count`),
   * which is the better plan for duplicate-heavy data anyway. Column types
   * must be hashable (xxhash64 rejects MapType — project maps away or
   * hash `map_entries` yourself before salting).
   */
  def saltedJoin(big: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)))
    val replicated = right.withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
