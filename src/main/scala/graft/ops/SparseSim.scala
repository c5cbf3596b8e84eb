package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sparse all-pairs similarity via an inverted-index posting join — the
 * text-side counterpart of [[Similarity]]'s dense-vector ANN: find every
 * document pair that shares rare terms and score the pair by the exact
 * integer inner product of their term-frequency vectors. This is the
 * workhorse for corpus-level redundancy maps, template detection, and
 * "what else looks like this slice" expansion where no embedding exists.
 *
 * The reference engine has no similarity operator at all (it is a metadata
 * explorer; reference: src/main/scala/com/github/sadikovi/metadata/README.md
 * scope) — this is an extension in the same composed-DataFrame style as
 * [[Dedup]] and [[Relevance]].
 *
 * Scale shape (the Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
 * Search" pruning, re-expressed relationally):
 *  - brute-force all-pairs is O(n^2) in documents and unrunnable at corpus
 *    scale; the inverted index only ever pairs documents that SHARE a term,
 *    and the document-frequency cap `maxDf` removes the frequent terms
 *    whose posting lists would dominate: per-term join fanout is bounded by
 *    `maxDf^2`, total pair partials by `maxDf * |kept postings|` — linear
 *    in the corpus for a fixed cap, never quadratic.
 *  - one shuffle partitions postings by term (the window that counts df
 *    reuses it: the self-join's both sides hash-partition on `term`, and
 *    the identical subplans collapse to one ReusedExchange); the only other
 *    shuffle carries (doc_a, doc_b) pair partials, already bounded above.
 *  - the df-cap is an explicit, audited dial, not a silent truncation:
 *    [[capAudit]] reports exactly how many terms/postings the cap dropped.
 *
 * Frequent terms carry negligible similarity signal (their idf is ~0) but
 * quadratic join cost — dropping them is the standard, principled trade
 * (same reasoning as [[Decontam]]'s shingle choice). Pick the term unit at
 * the call site: raw tokens for short fields, word n-grams
 * ([[TextOps.wordNgrams]]) for prose, shingle hashes for byte-exact scale.
 */
object SparseSim {

  /** Posting table `(term, doc, tf)` — one row per distinct (term, doc).
    * Map-side partial aggregation collapses each document's repeats before
    * the term shuffle (a document's terms are contiguous in its partition). */
  def postings(docs: DataFrame, id: Column, terms: Column): DataFrame =
    docs.select(id.as("doc"), explode(terms).as("term"))
      .groupBy(col("term"), col("doc"))
      .agg(count(lit(1)).as("tf"))

  /** Postings restricted to terms with document frequency <= `maxDf`,
    * with the df carried: `(term, doc, tf, df)`. The df comes from a
    * term-keyed window over the posting table — same partitioning the
    * pair join needs, so no extra shuffle. */
  def cappedPostings(docs: DataFrame, id: Column, terms: Column,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    postings(docs, id, terms)
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .filter(col("df") <= maxDf)
  }

  /**
   * All document pairs sharing at least one kept term:
   * `(doc_a, doc_b, dot, shared_terms)` with `doc_a < doc_b`, `dot` the
   * exact integer inner product of tf vectors over kept terms and
   * `shared_terms` the count of distinct shared terms. Self-join of the
   * capped posting table on `term` (both sides are the same subplan —
   * one exchange, reused), then one bounded aggregate over pair keys.
   */
  def pairs(docs: DataFrame, id: Column, terms: Column,
      maxDf: Long): DataFrame = {
    val p = cappedPostings(docs, id, terms, maxDf)
    val a = p.select(col("term"), col("doc").as("doc_a"), col("tf").as("tf_a"))
    val b = p.select(col("term"), col("doc").as("doc_b"), col("tf").as("tf_b"))
    a.join(b, "term")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"),
        count(lit(1)).as("shared_terms"))
  }

  /** Top-k pairs by (dot desc, doc_a, doc_b) — a total order, so the cut
    * is deterministic; physically TakeOrderedAndProject (per-partition
    * heaps merged on the driver), never a global sort. */
  def topPairs(docs: DataFrame, id: Column, terms: Column,
      maxDf: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    pairs(docs, id, terms, maxDf)
      .orderBy(col("dot").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** What the df-cap dropped — one row: `(kept_terms, dropped_terms,
    * kept_postings, dropped_postings)`. Counter-scale output; run it
    * alongside [[pairs]] whenever the cap choice needs evidence. */
  def capAudit(docs: DataFrame, id: Column, terms: Column,
      maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    postings(docs, id, terms)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .agg( // coalesce: an empty vocabulary audits as zeros, not nulls
        coalesce(sum(when(col("df") <= maxDf, 1L).otherwise(0L)), lit(0L))
          .as("kept_terms"),
        coalesce(sum(when(col("df") > maxDf, 1L).otherwise(0L)), lit(0L))
          .as("dropped_terms"),
        coalesce(sum(when(col("df") <= maxDf, col("df")).otherwise(0L)), lit(0L))
          .as("kept_postings"),
        coalesce(sum(when(col("df") > maxDf, col("df")).otherwise(0L)), lit(0L))
          .as("dropped_postings"))
  }
}
