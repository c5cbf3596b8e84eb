package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Distributed BPE (byte-pair-encoding) merge training — tokenizer
 * induction over a corpus, the step that turns raw text statistics into a
 * vocabulary. Classic BPE (Sennrich et al., ACL'16 "Neural machine
 * translation of rare words with subword units") greedily merges the most
 * frequent adjacent symbol pair.
 *
 * Scale design — the word-frequency formulation. Pair statistics are a
 * function of the MULTISET of symbol sequences, not of the corpus rows
 * carrying them, so training aggregates the corpus ONCE to a weighted
 * distinct table `(t, w)` and every merge round runs over that table:
 *
 *  1. one up-front `groupBy(t).count` — the only corpus-wide pass and the
 *     only corpus-sized shuffle in the whole training run;
 *  2. per round: a weighted adjacent-pair count over the distinct table
 *     (shuffle = distinct-pair vocabulary), a driver argmax with a
 *     deterministic tie-break (count desc, then pair lexicographically),
 *     and a narrow re-tokenization + re-collapse of the distinct table
 *     (which only ever shrinks: merging can make sequences collide).
 *
 * Feed word-shaped rows (one pre-tokenized word per row — what
 * [[trainOnWords]] does for you) and the per-round table is
 * vocabulary-sized by Heaps' law: ~10^5 rows against a 10^11-row corpus,
 * i.e. each of the N merge rounds costs ~1/10^6 of a corpus pass. The
 * merge loop itself is pinned against a sequential reference
 * implementation in `BpeSpec`, and the weighted refactor is exactly
 * count-preserving, so the merge sequence is unchanged from the
 * row-at-a-time formulation.
 */
object Bpe {

  /** Adjacent-pair counts over a token-array column: `(left, right, cnt)`.
    * The pair stream is `zip(toks[0..n-2], toks[1..n-1])` — a narrow
    * projection; counting is one map-side-combined aggregate — shuffle
    * volume is the distinct-pair vocabulary, never the corpus. */
  def pairCounts(df: DataFrame, toks: Column): DataFrame =
    weightedPairCounts(df.select(toks.as("t"), lit(1L).as("w")))

  /** [[pairCounts]] over an already-aggregated weighted table `(t, w)` —
    * each sequence's pairs count `w` times, so the result is identical to
    * counting over the expanded corpus. */
  private def weightedPairCounts(tw: DataFrame): DataFrame =
    tw.select(col("w"), explode(arrays_zip(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))))).as("p"))
      .select(col("p").getField("0").as("left"), col("p").getField("1").as("right"), col("w"))
      .groupBy(col("left"), col("right"))
      .agg(sum(col("w")).as("cnt"))

  /** Greedy left-to-right merge of every adjacent (left, right) occurrence
    * into a single `left + " " + right` symbol: one linear codegen pass
    * ([[graft.functions.ApplyBpeMerges]]), so "a a a" under merge (a,a)
    * becomes ["a a", "a"] exactly as sequential BPE does, independent of
    * partitioning. */
  def mergePair(toks: Column, left: String, right: String): Column =
    applyMerges(toks, Seq((left, right)))

  /**
   * Train `nMerges` BPE merges: returns the ordered merge list. The corpus
   * is aggregated ONCE to the weighted distinct table; each round re-counts
   * pairs over that table with all previous merges applied. The
   * intermediate table is materialized per round (eager localCheckpoint,
   * previous round's blocks freed through the RDD: `Dataset.unpersist` is
   * a silent no-op for checkpoints) so round k does not re-run rounds
   * 1..k-1's transforms and retains exactly one table copy at a time.
   *
   * For a real tokenizer vocabulary (thousands of merges) prefer
   * [[trainOnWords]], which collapses the per-round Spark job into a
   * driver-side loop over the collected word-frequency table.
   */
  def train(df: DataFrame, toks: Column, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    var cur = df.select(toks.as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = weightedPairCounts(cur)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty) {
        exhausted = true // no adjacent pairs remain anywhere
      } else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r))
        val next = cur.select(mergePair(col("t"), l, r).as("t"), col("w"))
          .groupBy(col("t")).agg(sum(col("w")).as("w"))
          .localCheckpoint(true)
        ColumnBridge.freeLocalCheckpoint(cur)
        cur = next
      }
      i += 1
    }
    ColumnBridge.freeLocalCheckpoint(cur)
    merges.result()
  }

  /** Corpus word frequencies for [[trainOnWords]]: whitespace words of
    * `text` (the same [[TextOps.tokens]] tokenizer every other corpus
    * operator and oracle replays — one definition to keep in sync), one
    * `(word, w)` row per distinct word — vocabulary-sized. */
  def wordCounts(df: DataFrame, text: Column): DataFrame =
    df.select(explode(TextOps.tokens(text)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("w"))

  /** A word as code-point symbols (NOT UTF-16 code units: a char-level
    * split would halve supplementary characters — emoji, CJK extension
    * planes — into unpaired surrogates, and merges would then learn and
    * emit malformed strings). */
  private[ops] def codePointSymbols(word: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /**
   * Full-scale tokenizer induction: ONE distributed pass aggregates the
   * corpus to `(word, count)` (vocabulary-sized by Heaps' law — megabytes
   * against a 100 TB corpus), then the merge loop runs driver-side over
   * that weighted table with incrementally-maintained pair statistics —
   * zero additional Spark jobs regardless of `nMerges`, which is what a
   * 32k-merge production vocabulary needs. Words are split into
   * code-point symbols (pairs never cross word boundaries —
   * standard BPE pre-tokenization), so the result equals sequential BPE
   * over one row per word occurrence.
   *
   * `maxVocab` guards the driver collect: training fails fast rather than
   * OOM if the distinct-word count exceeds it.
   *
   * `minCount` bounds the collect by the USED vocabulary instead of the
   * raw distinct-word count — the web-scale lever. At 100 TB the raw
   * distinct-"word" count (typos, URLs, code identifiers) blows through
   * any driver cap, but its tail is overwhelmingly hapax/near-hapax:
   * dropping words with corpus count < minCount before collecting is the
   * standard rare-word prefilter (Sennrich's own `learn_bpe` exposes the
   * same threshold as `--min-frequency`; SentencePiece prunes identically).
   * Approximation contract: a pair's count computed on the filtered table
   * underestimates its true count by at most (minCount - 1) x (distinct
   * dropped words containing the pair) x (occurrences within the word), so
   * a merge decision can only flip where the winning margin is below the
   * dropped mass — for Zipf-shaped corpora the head pairs that BPE
   * actually selects carry counts orders of magnitude above it. With the
   * default minCount = 1 nothing is dropped and the result is exactly
   * sequential BPE.
   */
  def trainOnWords(df: DataFrame, text: Column, nMerges: Int,
      maxVocab: Int = 4 << 20, minCount: Long = 1L): Seq[(String, String)] = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val vocab = wordCounts(df, text)
      .filter(col("w") >= minCount)
      .limit(maxVocab + 1).collect()
    require(vocab.length <= maxVocab,
      s"distinct-word vocabulary (count >= $minCount) exceeds " +
        s"maxVocab=$maxVocab; raise minCount or the cap")
    trainWeighted(
      vocab.iterator.map(r =>
        (codePointSymbols(r.getString(0)), r.getLong(1))).toSeq,
      nMerges)
  }

  /**
   * Driver-side weighted BPE over a `(symbols, weight)` vocabulary —
   * the Sennrich `learn_bpe` loop. Pair counts and a pair→words inverted
   * index are maintained incrementally: each merge touches only the words
   * that actually contain the merged pair, so cost per merge is
   * O(affected words × their length) plus one argmax over the live pair
   * table — no corpus data structure is ever rescanned. Deterministic
   * independent of vocabulary ordering: the argmax tie-break is
   * (count desc, left asc, right asc) over value space.
   */
  def trainWeighted(vocab: Seq[(IndexedSeq[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be non-negative, got $nMerges")
    val words = vocab.map(_._1.toArray).toArray
    val weights = vocab.map(_._2).toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * weights(i)
        if (c == 0L) { counts.remove(p); where.remove(p) }
        else {
          counts(p) = c
          if (sign > 0) where.getOrElseUpdate(p, mutable.Set.empty) += i
        }
        j += 1
      }
      if (sign < 0) {
        // membership is rebuilt by the re-add; drop stale entries here
        j = 0
        while (j < s.length - 1) {
          where.get((s(j), s(j + 1))).foreach(_ -= i)
          j += 1
        }
      }
    }
    words.indices.foreach(addWord(_, 1L))

    def mergeWord(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (out.nonEmpty && out.last == l && s(j) == r) {
          out(out.length - 1) = l + " " + r
        } else out += s(j)
        j += 1
      }
      out.toArray
    }

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < nMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bestCnt = Long.MinValue
      counts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      merges += best
      val affected = where.getOrElse(best, mutable.Set.empty).toArray
      affected.foreach { w =>
        addWord(w, -1L)
        words(w) = mergeWord(words(w), best._1, best._2)
        addWord(w, 1L)
      }
      counts.remove(best); where.remove(best)
      i += 1
    }
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
