package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Distributed BPE (byte-pair-encoding) merge training — tokenizer
 * induction over a corpus, the step that turns raw text statistics into a
 * vocabulary. Classic BPE (Sennrich et al., ACL'16 "Neural machine
 * translation of rare words with subword units") greedily merges the most
 * frequent adjacent symbol pair; here each round is:
 *
 *  1. ONE corpus-wide adjacent-pair count ([[pairCounts]]): a narrow
 *     zip-of-shifted-slices projection + a map-side-combined hash
 *     aggregate — shuffle volume is the distinct-pair vocabulary, never
 *     the corpus;
 *  2. a driver-side argmax over that (tiny) pair table, deterministic
 *     tie-break (count desc, then pair lexicographically);
 *  3. a narrow re-tokenization ([[mergePair]]): the merge rides in the
 *     codegen expression as a constant, applied greedily left-to-right
 *     per row in one linear pass — exactly the reference semantics of
 *     sequential BPE, so partitioning cannot change results.
 *
 * N merges = N linear passes, the same asymptotics as a single-node BPE
 * trainer per merge, but each pass is the full cluster scanning in place.
 * The merged symbol uses a space joiner ("a b" merging to "a b" as ONE
 * symbol is fine — symbols are array elements, not split on spaces).
 */
object Bpe {

  /** Adjacent-pair counts over a token-array column: `(left, right, cnt)`.
    * The pair stream is `zip(toks[0..n-2], toks[1..n-1])` — a narrow
    * projection; counting is one map-side-combined aggregate. */
  def pairCounts(df: DataFrame, toks: Column): DataFrame =
    df.select(toks.as("t"))
      .select(explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("p"))
      .select(col("p").getField("0").as("left"), col("p").getField("1").as("right"))
      .groupBy(col("left"), col("right"))
      .agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right merge of every adjacent (left, right) occurrence
    * into a single `left + " " + right` symbol: one linear codegen pass
    * ([[graft.functions.ApplyBpeMerges]]), so "a a a" under merge (a,a)
    * becomes ["a a", "a"] exactly as sequential BPE does, independent of
    * partitioning. */
  def mergePair(toks: Column, left: String, right: String): Column =
    applyMerges(toks, Seq((left, right)))

  /**
   * Train `nMerges` BPE merges: returns the ordered merge list. Each round
   * re-counts pairs over the corpus with all previous merges applied —
   * the intermediate corpus is materialized per round (eager
   * localCheckpoint, previous round's blocks freed through the RDD:
   * `Dataset.unpersist` is a silent no-op for checkpoints) so round k
   * does not re-run rounds 1..k-1's transforms and retains exactly one
   * corpus copy at a time.
   */
  def train(df: DataFrame, toks: Column, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    var cur = df.select(toks.as("t")).localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = pairCounts(cur, col("t"))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) {
        exhausted = true // no adjacent pairs remain anywhere
      } else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        val next = cur.select(mergePair(col("t"), l, r).as("t")).localCheckpoint(true)
        ColumnBridge.freeLocalCheckpoint(cur)
        cur = next
      }
      i += 1
    }
    ColumnBridge.freeLocalCheckpoint(cur)
    merges.result()
  }

  /** Apply an ordered merge list to a token-array column (the "tokenize
    * with a trained vocabulary" path): the WHOLE list rides in ONE codegen
    * expression as a constant table — per row O(merges x tokens) in a flat
    * JVM loop, no per-merge expression nesting, so a trained vocabulary of
    * thousands of merges stays analyzable and fast. */
  def applyMerges(toks: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(graft.functions.ApplyBpeMerges(
      ColumnBridge.expression(toks), merges))
}
