package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{CharNgramsExpr, CountIn, WordNgramsF}

/**
 * Text-analysis operators for large-scale document pipelines, built entirely
 * from codegen'd built-in functions (no UDFs) so they stay inside whole-stage
 * codegen and scale linearly with partition count: every transform here is a
 * narrow per-row projection — zero shuffles introduced.
 *
 * The reference engine delegates all scalar computation to the host engine
 * (reference: src/main/scala/com/github/sadikovi/metadata/MetadataFileFormat.scala
 * produces plain rows and lets Spark evaluate expressions); these operators
 * extend that same philosophy to the text-pipeline domain.
 */
object TextOps {

  /** Prime modulus for the rolling fingerprint (fits products in a Long). */
  val FingerprintMod: Long = 1000000007L

  /** Whitespace tokens with empties removed. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct, sorted token set — the unit for set-based similarity. */
  def tokenSet(text: Column): Column =
    sort_array(array_distinct(tokens(text)))

  /** Number of non-empty whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /**
   * Adjacent word n-grams (n >= 2) joined with single spaces,
   * e.g. n=2 over "a b c" -> ["a b", "b c"]. One fused pass over the
   * tokenized array ([[graft.functions.WordNgramsF]]); the
   * transform+element_at formulation re-derived the token array inside
   * every interpreted lambda position.
   */
  def wordNgrams(text: Column, n: Int): Column = wordNgramsOn(tokens(text), n)

  /** Word n-grams over a PRE-MATERIALIZED token array column. */
  def wordNgramsOn(toks: Column, n: Int): Column =
    ColumnBridge.column(WordNgramsF(ColumnBridge.expression(toks), n))

  /**
   * Overlapping token chunks for context-window pipelines (RAG splitting,
   * long-document training with stride): chunk i starts at token
   * `i*stride` and takes up to `size` tokens; chunking STOPS once a chunk
   * reaches the end of the document (a further chunk would be a strict
   * subset of the previous one — duplicate content for the index/training
   * set). `stride < size` gives overlap, `stride == size` is disjoint.
   * Returns an array of token-array chunks (posexplode at the call site
   * for (chunk_id, chunk) rows) — a narrow projection built from builtin
   * expressions with an exact integer chunk count:
   * `len == 0 -> 0; len <= size -> 1; else ceil((len-size)/stride) + 1`.
   *
   * `toks` should be a PRE-MATERIALIZED column (select the token array
   * first): the transform/filter lambdas here are interpreted and re-derive
   * an embedded tokenizer expression once per chunk.
   */
  def chunkTokens(toks: Column, size: Int, stride: Int): Column = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0, s"chunk stride must be positive, got $stride")
    // exact ceil((len-size)/stride)+1: floor-div in doubles is exact below
    // 2^53 and array sizes are ints; Column `/` on longs would be double
    // division anyway, so make the floor explicit
    val sz = org.apache.spark.sql.functions.size(toks).cast("long")
    val n = when(sz === 0L, lit(0L))
      .when(sz <= lit(size.toLong), lit(1L))
      .otherwise(floor(
        (sz - lit(size.toLong) + lit(stride - 1L)).cast("double") / lit(stride.toDouble))
        .cast("long") + lit(1L))
    // sequence(0, -1) COUNTS DOWN instead of returning empty, so clamp the
    // end and filter the phantom chunk back out for empty inputs (the
    // filter keeps the element type generic, unlike a cast)
    val chunks = transform(
      sequence(lit(0L), greatest(n - lit(1L), lit(0L))),
      i => slice(toks, (i * lit(stride.toLong) + lit(1L)).cast("int"), lit(size)))
    filter(chunks, _ => n > 0L)
  }

  /**
   * Deterministic rolling document fingerprint: polynomial hash of the
   * character codepoints, `acc = (acc * 31 + code) mod 1e9+7`. Pure
   * arithmetic so any engine (and the DuckDB oracle) reproduces it exactly.
   */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(filter(split(text, ""), c => c =!= ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(FingerprintMod)))

  // ----- PII redaction ----------------------------------------------------
  // Patterns are deliberately restricted to the syntax Java regex and RE2
  // (DuckDB) interpret identically — character classes, bounded repeats,
  // \b — so the oracle reproduces the redaction byte-for-byte. Replacement
  // order is fixed (email, IPv4, phone) and mirrored in the SQL.

  /** Email address pattern (pragmatic, not RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** North-American-style phone number: 3-3-4 digits with -, . or space. */
  val PhoneRe = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
  /** Dotted-quad IPv4 literal (no octet range check — redaction recall
    * beats precision for PII). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Text with emails, IPv4 literals and phone numbers replaced by typed
    * placeholders — the PII scrub pass of a training-data pipeline, as a
    * narrow codegen'd projection (regexp_replace): no shuffle, linear per
    * row, trivially parallel at any corpus size. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Fraction of characters surviving removal of `dropClass`, e.g. the
    * alphabetic ratio for `dropClass = "[^a-zA-Z ]"`. Exact small-int ratio. */
  private def keepRatio(text: Column, dropClass: String): Column = {
    val total = length(text)
    when(total === 0, 0.0d).otherwise(
      length(regexp_replace(text, dropClass, "")).cast("double") / total.cast("double"))
  }

  /**
   * Heuristic document quality score in [0, 1]: blends token count,
   * mean token length, and alphabetic-character ratio. All terms are exact
   * rationals of integer counts, so the score is bit-reproducible.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val meanTokLen = when(nTok === 0.0d, 0.0d).otherwise(nChar / nTok)
    val alphaRatio = keepRatio(text, "[^a-zA-Z ]")
    val lengthTerm = least(nTok / lit(64.0d), lit(1.0d))
    val tokLenTerm = when(meanTokLen >= 3.0d && meanTokLen <= 10.0d, 1.0d).otherwise(0.5d)
    lengthTerm * lit(0.4d) + tokLenTerm * lit(0.3d) + alphaRatio * lit(0.3d)
  }

  /**
   * Gopher-style document-quality rule flags (Rae et al. 2021, "Scaling
   * Language Models: ... Gopher", table A1 — simplified to rules exactly
   * expressible in integer arithmetic). Returns a bitmask; 0 = keep. The
   * mask, not just a boolean, is the useful artifact: pipelines audit WHY
   * documents were dropped, per source, before tuning thresholds.
   *
   *   bit 1  — word count outside [8, 1024]
   *   bit 2  — mean word length outside [2, 12]
   *   bit 4  — alphabetic-character ratio below 0.6
   *   bit 8  — no English stopword present (junk/non-language signal)
   *   bit 16 — distinct-token ratio below 0.3 (repetitive content)
   *
   * Every threshold is evaluated as a cross-multiplied integer comparison
   * (e.g. `10*alpha >= 6*chars`, never a float division), so the verdict
   * is bit-reproducible in any engine. Narrow projection, no shuffle.
   */
  def qualityFlags(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("long")
    val nChar = length(text).cast("long")
    // token chars = all chars minus separators (tokens come from a
    // single-space split, so this is exact)
    val wordChars = length(regexp_replace(text, " ", "")).cast("long")
    val alphaChars = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    val nDist = size(array_distinct(toks)).cast("long")
    val stop = stopwordScoreOn(toks, StopwordLists.toMap.apply("en"))
    when(nTok < 8L || nTok > 1024L, 1L).otherwise(0L) +
      when(wordChars < nTok * 2L || wordChars > nTok * 12L, 2L).otherwise(0L) +
      when(alphaChars * 10L < nChar * 6L, 4L).otherwise(0L) +
      when(stop === 0, 8L).otherwise(0L) +
      when(nDist * 10L < nTok * 3L, 16L).otherwise(0L)
  }

  /**
   * Stopword lists for the n-gram/stopword language-ID heuristic. Tiny fixed
   * lists keep the heuristic expressible in plain SQL (oracle parity) while
   * demonstrating the real pipeline shape: per-language token-overlap scores
   * plus a deterministic argmax.
   */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Tokens-in-list count against a pre-materialized token array: one fused
    * codegen pass ([[graft.functions.CountIn]]) — the interpreted
    * `size(filter(toks, isin))` HOF formulation costs an allocation and an
    * interpreted lambda per element per profile. */
  def stopwordScoreOn(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountIn(ColumnBridge.expression(toks), words))

  /** Tokens-in-list count for one language. */
  def stopwordScore(text: Column, words: Seq[String]): Column =
    stopwordScoreOn(tokens(text), words)

  /** Language ID over a PRE-MATERIALIZED token column — compute `tokens`
    * once per row; five per-language scores share the array. */
  def langIdOn(toks: Column): Column =
    argmaxLang(StopwordLists.map { case (lang, words) => lang -> stopwordScoreOn(toks, words) })

  /**
   * Predicted language: the first language (in alphabetical order) achieving
   * the maximum stopword-overlap score. Deterministic tie-break makes the
   * prediction oracle-reproducible. For hot paths prefer [[langIdOn]].
   */
  def langId(text: Column): Column = langIdOn(tokens(text))

  /** Character n-grams (sliding substrings of length n), via the fused
    * one-pass codegen expression [[graft.functions.CharNgramsExpr]] — the
    * `transform(sequence, substr)` formulation re-walks the string per
    * position (O(chars^2)) under an interpreted lambda. */
  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramsExpr(ColumnBridge.expression(text), n))

  /** Character collision probability in exact micro-units
    * ([[graft.functions.CollisionScoreExpr]]): `floor(1e6 * sum(c_i^2) /
    * n^2)` over codepoint counts — the log-free (Rényi-2) repetitiveness
    * signal: natural prose sits low, single-character padding and
    * separator spam drive it toward 1e6. One narrow codegen pass; exact
    * integers, so any engine replays it bit-for-bit. */
  def charCollisionMicro(text: Column): Column =
    ColumnBridge.column(graft.functions.CollisionScoreExpr(
      ColumnBridge.expression(text)))

  /**
   * Distinctive character trigrams per language, the classic n-gram-profile
   * language-ID signal (small fixed profiles keep the heuristic exactly
   * reproducible in plain SQL).
   */
  val TrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "sch", "ich", "und", "die"),
    "en" -> Seq("the", "ing", "ion", "and", "he "),
    "es" -> Seq("de ", "la ", "que", "os ", "ión"),
    "fr" -> Seq("le ", "ent", "les", "de ", "eur"),
    // profile entries must be length-3 to ever match a trigram
    "zh" -> Seq("我们的", "是一个", "不知道"))

  /** Count of the trigram-array elements present in one profile (fused
    * codegen membership pass, see [[stopwordScoreOn]]). */
  def trigramScoreOn(trigrams: Column, profile: Seq[String]): Column =
    ColumnBridge.column(CountIn(ColumnBridge.expression(trigrams), profile))

  /** Count of the text's trigrams present in one profile (with multiplicity). */
  def trigramScore(text: Column, profile: Seq[String]): Column =
    trigramScoreOn(charNgrams(text, 3), profile)

  /**
   * N-gram-profile language ID over a PRE-MATERIALIZED trigram column.
   * Building the trigram array is the expensive part (interpreted substring
   * generation); callers must compute it once per row — e.g.
   * `df.select(charNgrams(col("text"), 3).as("tg")).select(langIdNgramOn(col("tg")))`
   * — instead of letting each of the five profile scores regenerate it.
   */
  def langIdNgramOn(trigrams: Column): Column =
    argmaxLang(TrigramProfiles.map { case (lang, p) => lang -> trigramScoreOn(trigrams, p) })

  /** Convenience single-column form; for hot paths prefer [[langIdNgramOn]]. */
  def langIdNgram(text: Column): Column = langIdNgramOn(charNgrams(text, 3))

  /** First language (in list order) achieving the maximum score. */
  private def argmaxLang(scores: Seq[(String, Column)]): Column = {
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), rest) =>
      when(s === maxScore, lit(lang)).otherwise(rest)
    }
  }
}
