package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.CountIn

/**
 * TF-IDF / BM25 relevance scoring over a tokenized corpus — the retrieval
 * half of a training-data pipeline (quality-weighted sampling, targeted
 * corpus slicing, decontamination triage). The reference engine has no text
 * scoring at all (it is a metadata explorer; reference:
 * src/main/scala/com/github/sadikovi/metadata/README.md scope), so this is
 * an extension operator in the same composed-DataFrame style as [[Dedup]].
 *
 * Scale shape:
 *  - [[termStats]] is the corpus-wide IDF-table builder: one explode and
 *    two keyed aggregations, both with map-side partial aggregation — a
 *    document's tokens are contiguous within a partition, so the first
 *    (token, doc) aggregate collapses locally before the shuffle.
 *  - [[bm25TopK]] scores one literal query: the per-term document
 *    frequencies (a handful of longs) are collected driver-side and
 *    inlined, making scoring a pure NARROW projection — term frequencies
 *    via the fused codegen [[graft.functions.CountIn]] (interpreted HOFs
 *    never enter whole-stage codegen), zero corpus shuffle — followed by
 *    the bounded-heap top-k aggregate ([[graft.functions.TopKByScore]]):
 *    partial buffers hold <= k rows, so the single final reducer merges
 *    `partitions x k` rows, never the corpus.
 */
object Relevance {

  /**
   * Corpus term statistics `(token, df, tf_total)`: document frequency
   * (distinct documents containing the token) and total occurrence count.
   * This is the artifact an IDF table, a stopword list, or a vocabulary
   * cut is derived from.
   */
  def termStats(docs: DataFrame, id: Column, tokens: Column): DataFrame =
    docs.select(id.as("__doc"), explode(tokens).as("token"))
      .groupBy(col("token"), col("__doc"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("df"), sum(col("tf")).as("tf_total"))

  /**
   * Top-k documents for one literal query under a BM25-family score:
   *
   *   score(d) = sum over query terms t of
   *     idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * len(d)/avgLen))
   *
   * with `idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)` (the standard
   * Robertson-Sparck Jones form) when `logIdf`, else the plain ratio
   * `(N+1)/(df+1)` — monotone in the same direction and built from IEEE
   * ops both engines round identically, which makes results replayable
   * bit-exactly by a SQL oracle (`ln` differs in the last ulp across
   * libm implementations; the ratio never does).
   *
   * Output: (rank, doc_id, score) — rank from 1 by (score desc, id asc);
   * documents matching no term (score 0) are not retrieved. Corpus
   * scalars (N, total length) and the per-term dfs ride ONE aggregate
   * job (conditional counts), then everything is narrow.
   */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      logIdf: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK requires at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val idType = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"bm25TopK requires an integral id column, got '$idCol': ${idType.simpleString}")

    val toks = tokens.as("__toks")
    val base = docs.select(col(idCol), toks).filter(col("__toks").isNotNull)
    // ONE aggregate job carries every driver-side statistic: N, total
    // length, and each term's document frequency (a conditional count per
    // term) — a second corpus scan + tokenization pass would buy nothing.
    val aggs = Seq(
      count(lit(1)),
      sum(size(col("__toks")).cast("long"))) ++
      queryTerms.map(t =>
        sum(when(array_contains(col("__toks"), t), 1L).otherwise(0L)))
    val stats = base.agg(aggs.head, aggs.tail: _*).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK requires a non-empty corpus")
    val avgLen = stats.getLong(1).toDouble / n.toDouble
    val dfs: Map[String, Long] =
      queryTerms.zipWithIndex.map { case (t, i) => t -> stats.getLong(2 + i) }.toMap

    def tf(t: String): Column =
      ColumnBridge.column(CountIn(ColumnBridge.expression(col("__toks")), Seq(t)))
        .cast("double")

    // fixed left-to-right association so a SQL oracle can replay the
    // identical IEEE operation sequence
    val score = queryTerms.map { t =>
      val df = dfs.getOrElse(t, 0L)
      val idf =
        if (logIdf) math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        else (n + 1.0) / (df + 1.0)
      val tfc = tf(t)
      lit(idf) * ((tfc * lit(k1 + 1.0)) /
        (tfc + lit(k1) * (lit(1.0 - b) + lit(b) * (size(col("__toks")).cast("double") / lit(avgLen)))))
    }.reduceLeft(_ + _)

    base.select(col(idCol), score.as("score"))
      .filter(col("score") > 0.0d)
      .agg(Similarity.topKAgg(col("score"), col(idCol).cast("long"), k).as("top"))
      .select(posexplode(col("top")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col").getField("id").as("doc_id"),
        col("col").getField("score").as("score"))
  }

  /**
   * Batch BM25 retrieval — the termStats JOIN formulation, for query SETS
   * (the eval/mining shape: thousands of queries scored in one pass) and
   * for wide queries, where [[bm25TopK]]'s one-codegen-column-per-term
   * expression stops scaling past hundreds of terms.
   *
   * Plan at 100 TB: the corpus explodes ONCE into postings restricted to
   * the (broadcast) query vocabulary — the token stream is filtered
   * BEFORE the tf aggregate, so the posting shuffle carries
   * (matching doc, term) pairs, never the full token stream; document
   * frequencies are a vocabulary-sized aggregate OVER those postings (no
   * second corpus pass); scoring joins broadcast (vocab-sized) df and
   * query tables; ranking is the bounded-heap top-k per query
   * (mappers x queries x k rows, no window).
   *
   * Determinism contract: per-term scores are floored to integer MICROS
   * before the per-(query, doc) sum, so the aggregate is order-independent
   * and replayable bit-exactly by a SQL oracle — at 1e-6 score resolution,
   * which is the one semantic difference from [[bm25TopK]] (which sums
   * doubles in fixed term order then floors once). Same IEEE-identical
   * ratio-idf option, same (score desc, id asc) tie-break. Duplicate
   * (query, term) rows are collapsed (terms score once per query).
   */
  def bm25BatchTopK(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      queries: DataFrame,
      queryIdCol: String,
      termCol: String,
      k: Int,
      k1: Double = 1.0,
      b: Double = 0.5,
      logIdf: Boolean = false): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val integral = Seq(ByteType, ShortType, IntegerType, LongType)
    require(integral.contains(docs.schema(idCol).dataType),
      s"bm25BatchTopK requires an integral doc id column, got '$idCol': " +
        docs.schema(idCol).dataType.simpleString)
    require(integral.contains(queries.schema(queryIdCol).dataType),
      s"bm25BatchTopK requires an integral query id column, got '$queryIdCol': " +
        queries.schema(queryIdCol).dataType.simpleString)

    val base = docs.select(col(idCol).as("__doc"), tokens.as("__toks"))
      .filter(col("__toks").isNotNull)
    val stats = base.agg(count(lit(1)),
      sum(size(col("__toks")).cast("long"))).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25BatchTopK requires a non-empty corpus")
    val avgLen = stats.getLong(1).toDouble / n.toDouble

    val q = queries.select(col(queryIdCol).cast("long").as("__q"),
      col(termCol).as("token")).dropDuplicates("__q", "token")
    val vocab = q.select(col("token")).distinct()
    val postings = base
      .select(col("__doc"), size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("token"))
      .join(broadcast(vocab), Seq("token"))
      .groupBy(col("token"), col("__doc"))
      .agg(count(lit(1)).cast("double").as("__tf"), first(col("__dl")).as("__dl"))
    val dfs = postings.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("__df"))

    val dfD = col("__df").cast("double")
    val idf =
      if (logIdf) log((lit(n.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
      else lit(n + 1.0) / (dfD + lit(1.0))
    val termScore = idf * ((col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / lit(avgLen)))))

    postings
      .join(broadcast(dfs), Seq("token"))
      .join(broadcast(q), Seq("token"))
      .select(col("__q"), col("__doc"),
        floor(termScore * lit(1000000.0d)).cast("long").as("__m"))
      .groupBy(col("__q"), col("__doc"))
      .agg(sum(col("__m")).as("__sm"))
      .groupBy(col("__q").as("query_id"))
      .agg(Similarity.topKAgg(col("__sm").cast("double"), col("__doc").cast("long"), k)
        .as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col").getField("id").as("doc_id"),
        col("col").getField("score").cast("long").as("score_micro"))
  }

  /**
   * N-gram language-model familiarity — the CCNet-style statistical
   * quality filter: train an n-gram count LM on a reference corpus, score
   * each evaluation document by how familiar its n-gram sequence is, and
   * gate the crawl on the score (low familiarity = gibberish, boilerplate,
   * wrong-language or machine-generated text; the perplexity filter of
   * CCNet/RedPajama re-expressed in exact integer arithmetic so the score
   * is bit-identical across engines — counts and integer division instead
   * of float log-probabilities, same ordering signal).
   *
   * Returns `(id, n_ngrams, oov_ngrams, fam_micro)` per evaluation
   * document with at least one n-gram: the n-gram count, how many were
   * never seen in training, and `floor(1e6 * sum(train_count) / n_ngrams)`
   * — the average training-corpus occurrence count of the document's
   * n-grams, micro-scaled by exact long division.
   *
   * Scale shape: the LM is vocabulary-sized (Heaps' law — ~1e5..1e8 rows
   * against a 1e11-row corpus), built with one explode + map-side-partial
   * aggregate; scoring is an equi-join of exploded eval n-grams against it
   * (broadcast when the vocabulary cut fits, shuffle on the n-gram
   * otherwise) and one per-document re-aggregate. `fam_sum * 1e6` stays
   * below 2^63 for any corpus where a document's summed counts are under
   * ~9e12 — enforce with a vocabulary count cap if training counts can
   * exceed it.
   */
  def ngramFamiliarity(
      train: DataFrame,
      eval: DataFrame,
      id: Column,
      text: Column,
      n: Int = 2): DataFrame = {
    val lm = train.select(explode(TextOps.wordNgrams(text, n)).as("ng"))
      .groupBy(col("ng")).agg(count(lit(1)).as("cnt"))
    eval.select(id.as("id"), explode(TextOps.wordNgrams(text, n)).as("ng"))
      .join(lm, Seq("ng"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col("cnt").isNull, 1L).otherwise(0L)).as("oov_ngrams"),
        coalesce(sum(col("cnt")), lit(0L)).as("fam_sum"))
      .select(col("id"), col("n_ngrams"), col("oov_ngrams"),
        expr("fam_sum * 1000000 DIV n_ngrams").as("fam_micro"))
  }
}
