package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Substring retrieval over a corpus via a character q-gram inverted index
 * — "which documents contain this literal string" without a full-corpus
 * scan per lookup. The classic q-gram filter (every window of `q`
 * consecutive characters of a match must itself match): a document can
 * contain `pattern` only if it contains EVERY q-gram of the pattern, so
 * the index prunes to candidates and an exact `contains` verify removes
 * q-gram coincidences — the same candidates-then-verify contract as
 * [[Decontam]] (Bloom) and [[Dedup]] (LSH bands), with zero false
 * negatives by construction.
 *
 * Scale shape:
 *  - [[writeGramIndex]] pays the corpus scan ONCE into a gram-bucketed
 *    managed table; [[searchIndex]] probes it with a gram IN-list filter
 *    that reaches the parquet scan (PushedFilters, spec-asserted), so
 *    row groups and bucket files without the pattern's grams never load —
 *    the corpus itself is only consulted for candidate rows through a
 *    broadcast semi-join. The gram bucketing also makes posting-table
 *    joins (index-vs-index containment) exchange-free.
 *  - the candidate aggregate moves (candidate doc, hit count) rows —
 *    posting-list scale for the pattern's grams, never corpus scale.
 *  - [[search]] is the index-free form (build + probe in one plan) for
 *    ad-hoc use; repeated lookups should go through the persisted index.
 *
 * The reference engine has no content retrieval at all (metadata only;
 * reference: src/main/scala/com/github/sadikovi/metadata/README.md scope).
 */
object SubstrSearch {

  /** Distinct-gram posting table `(gram, doc)`: one row per (document,
    * distinct q-gram). Distinctness is computed per document INSIDE the
    * narrow projection (array_distinct over the fused
    * [[graft.functions.CharNgramsExpr]] pass), so the explode emits
    * posting rows, not one row per character of the corpus. */
  def gramPostings(docs: DataFrame, id: Column, text: Column, q: Int): DataFrame = {
    require(q >= 2, s"q must be >= 2, got $q")
    docs.select(id.as("doc"),
      explode(array_distinct(TextOps.charNgrams(text, q))).as("gram"))
  }

  /** Persist the posting table as a managed parquet table bucketed by
    * gram: probe filters prune to the pattern's buckets and repeated
    * searches never reshuffle the index. */
  def writeGramIndex(docs: DataFrame, id: Column, text: Column, q: Int,
      table: String, buckets: Int): Unit =
    Bucketing.writeBucketed(gramPostings(docs, id, text, q), "gram", buckets, table)

  /** The pattern's distinct q-grams (driver-side; the pattern is a
    * literal). Windows slide over CODEPOINTS, matching the codepoint-based
    * index grams ([[graft.functions.CharNgramsExpr]]) — UTF-16-unit
    * windows would split surrogate pairs and produce grams that cannot
    * exist in the index (silent false negatives for non-BMP patterns). */
  private def patternGrams(pattern: String, q: Int): Seq[String] = {
    require(q >= 2, s"q must be >= 2, got $q")
    val cps = pattern.codePoints().toArray
    require(cps.length >= q,
      s"pattern must be at least q=$q chars, got ${cps.length}; " +
        "a shorter pattern needs a plain contains() scan")
    (0 to cps.length - q).map(i => new String(cps, i, q)).distinct
  }

  /** Candidate doc ids from a posting table: documents containing EVERY
    * distinct q-gram of the pattern (hit count equals the gram count —
    * postings are distinct per doc, so a plain count suffices). */
  def candidatesFrom(postings: DataFrame, pattern: String, q: Int): DataFrame = {
    val grams = patternGrams(pattern, q)
    postings.filter(col("gram").isin(grams: _*))
      .groupBy(col("doc")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === grams.size)
      .select(col("doc"))
  }

  /** Exact verify: keep corpus rows among `cand` that truly contain the
    * pattern, with the non-overlapping occurrence count (replace-based
    * length delta — exact integer arithmetic, identical in any engine).
    * Output `(doc_id, n_occ)`. */
  private def verified(docs: DataFrame, idCol: String, textCol: String,
      pattern: String, cand: DataFrame): DataFrame =
    docs.join(broadcast(cand), docs(idCol) === cand("doc"), "left_semi")
      .filter(col(textCol).contains(pattern))
      .select(col(idCol),
        // length() counts codepoints, so the divisor must too — the
        // UTF-16 unit count overcounts non-BMP characters
        ((length(col(textCol)) -
          length(replace(col(textCol), lit(pattern), lit("")))) /
          lit(pattern.codePointCount(0, pattern.length))).cast("long").as("n_occ"))

  /** Ad-hoc search: build the posting table and probe it in one plan.
    * Result is EXACTLY the plain `contains` filter (verified), found
    * through the index path. */
  def search(docs: DataFrame, idCol: String, textCol: String,
      pattern: String, q: Int): DataFrame = {
    val cand = candidatesFrom(
      gramPostings(docs, col(idCol), col(textCol), q), pattern, q)
    verified(docs, idCol, textCol, pattern, cand)
  }

  /** Search through a persisted [[writeGramIndex]] table: the probe reads
    * only the pattern's posting lists (gram IN-list reaches the scan);
    * the corpus is consulted only to verify candidates. */
  def searchIndex(spark: SparkSession, indexTable: String, docs: DataFrame,
      idCol: String, textCol: String, pattern: String, q: Int): DataFrame =
    verified(docs, idCol, textCol, pattern,
      candidatesFrom(spark.table(indexTable), pattern, q))
}
