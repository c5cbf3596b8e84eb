package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RelevanceSpec extends SparkSpec {

  import spark.implicits._

  private def corpus: DataFrame = Seq(
    (1L, "cat dog cat"),
    (2L, "dog fish"),
    (3L, "cat cat cat whale"),
    (4L, "bird")
  ).toDF("doc_id", "text")

  private def toks = split(col("text"), " ")

  test("termStats computes exact df and total tf per token") {
    val got = Relevance.termStats(corpus, col("doc_id"), toks)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("cat", 2L, 5L), ("dog", 2L, 2L), ("fish", 1L, 1L),
      ("whale", 1L, 1L), ("bird", 1L, 1L)))
  }

  test("ngramFamiliarity: exact counts, OOV bigrams, integer micro-average") {
    val train = Seq(
      (10L, "the cat sat"),     // bigrams: "the cat", "cat sat"
      (11L, "the cat ran"),     // bigrams: "the cat", "cat ran"
      (12L, "the cat sat")      // duplicates doc 10's bigrams
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "the cat sat"),      // "the cat"=3, "cat sat"=2 → avg 2.5
      (2L, "a cat sat quietly"),// "a cat"=0(oov), "cat sat"=2, "sat quietly"=0(oov)
      (3L, "zz")                // no bigrams → absent from output
    ).toDF("doc_id", "text")
    val got = Relevance.ngramFamiliarity(train, eval, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 2L, 0L, 2500000L),   // (3+2)*1e6 div 2
      (2L, 3L, 2L, 666666L)))   // (0+2+0)*1e6 div 3, floor
  }

  test("bm25TopK ranks by term frequency within a term and skips non-matches") {
    val top = Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat"), k = 10)
      .select("rank", "doc_id").as[(Long, Long)].collect().toList
    // doc 3 has tf=3 but is longer; doc 1 tf=2. With k1=1.2/b=0.75 and
    // avgLen=2.5, doc 3 still outranks doc 1 (verified by hand: tf
    // saturation dominates the modest length penalty here).
    assert(top.map(_._2) === List(3L, 1L))
    assert(top.map(_._1) === List(1L, 2L))
  }

  test("bm25TopK matches a hand-computed score") {
    // single term 'dog': df=2, N=4, avgLen=(3+2+4+1)/4=2.5
    // idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    // doc 2: tf=1, len=2 -> ln(2) * (1*2.2)/(1 + 1.2*(0.25+0.75*(2/2.5)))
    val expected2 = math.log(2.0) * ((1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (2.0 / 2.5))))
    val got = Relevance.bm25TopK(corpus, "doc_id", toks, Seq("dog"), k = 10)
      .filter(col("doc_id") === 2L).select("score").as[Double].head()
    assert(math.abs(got - expected2) < 1e-12, s"got $got expected $expected2")
  }

  test("multi-term scores sum and rank deterministically") {
    val top = Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat", "fish"), k = 10)
      .select("doc_id").as[Long].collect().toList
    // docs 1, 2, 3 match at least one term; 4 does not appear at all
    assert(top.toSet === Set(1L, 2L, 3L))
  }

  test("ratio idf preserves single-term ranking direction") {
    def ranks(logIdf: Boolean) =
      Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat"), k = 10, logIdf = logIdf)
        .select("doc_id").as[Long].collect().toList
    assert(ranks(logIdf = true) === ranks(logIdf = false))
  }

  test("k caps the result") {
    val top = Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat", "dog"), k = 1)
    assert(top.count() === 1)
  }

  test("invalid arguments are rejected eagerly") {
    intercept[IllegalArgumentException] {
      Relevance.bm25TopK(corpus, "doc_id", toks, Seq.empty, k = 5)
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat"), k = 0)
    }
    intercept[IllegalArgumentException] {
      Relevance.bm25TopK(corpus.withColumn("sid", col("doc_id").cast("string")),
        "sid", toks, Seq("cat"), k = 5)
    }
  }

  // ----- batch (join-formulation) BM25 ----------------------------------

  /** In-memory replay of bm25BatchTopK's exact formula: ratio idf,
    * per-term micro-floor, integer sum, (score desc, id asc) top-k. */
  private def refBatch(
      docs: Seq[(Long, String)], queries: Seq[(Long, String)],
      k: Int, k1: Double, b: Double): Set[(Long, Long, Long, Long)] = {
    val tokd = docs.map { case (id, t) => id -> t.split(" ").toSeq.filter(_.nonEmpty) }
    val n = tokd.size
    val avgLen = tokd.map(_._2.size).sum.toDouble / n.toDouble
    val byQ = queries.distinct.groupBy(_._1)
    byQ.flatMap { case (qid, terms) =>
      val scored = tokd.flatMap { case (doc, ts) =>
        val micros = terms.map(_._2).distinct.flatMap { term =>
          val tf = ts.count(_ == term).toDouble
          if (tf == 0.0) None
          else {
            val df = tokd.count(_._2.contains(term)).toLong
            val idf = (n + 1.0) / (df.toDouble + 1.0)
            val s = idf * ((tf * (k1 + 1.0)) /
              (tf + k1 * ((1.0 - b) + b * (ts.size.toDouble / avgLen))))
            Some(math.floor(s * 1000000.0d).toLong)
          }
        }
        if (micros.isEmpty) None else Some(doc -> micros.sum)
      }
      scored.sortBy { case (doc, m) => (-m, doc) }.take(k).zipWithIndex
        .map { case ((doc, m), i) => (qid, (i + 1).toLong, doc, m) }
    }.toSet
  }

  test("bm25BatchTopK matches the in-memory reference formula exactly") {
    val docsSeq = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "cat cat cat whale"),
      (4L, "bird"), (5L, "dog dog cat fish whale bird"))
    val qSeq = Seq((10L, "cat"), (10L, "dog"), (20L, "fish"), (20L, "bird"),
      (20L, "nosuchterm"), (30L, "nosuchterm"))
    val got = Relevance.bm25BatchTopK(
        docsSeq.toDF("doc_id", "text"), "doc_id", toks,
        qSeq.toDF("q_id", "term"), "q_id", "term", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === refBatch(docsSeq, qSeq, k = 3, k1 = 1.0, b = 0.5))
    // query 30's only term is absent from the corpus: retrieves nothing
    assert(!got.exists(_._1 == 30L))
  }

  test("bm25BatchTopK queries are independent and duplicate terms collapse") {
    val docsSeq = Seq((1L, "cat dog cat"), (2L, "dog fish"), (3L, "cat whale"))
    val d = docsSeq.toDF("doc_id", "text")
    val together = Relevance.bm25BatchTopK(d, "doc_id", toks,
        Seq((0L, "cat"), (1L, "dog"), (1L, "dog")).toDF("q_id", "term"),
        "q_id", "term", k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    val alone = (Relevance.bm25BatchTopK(d, "doc_id", toks,
        Seq((0L, "cat")).toDF("q_id", "term"), "q_id", "term", k = 5)
      .as[(Long, Long, Long, Long)].collect() ++
      Relevance.bm25BatchTopK(d, "doc_id", toks,
        Seq((1L, "dog")).toDF("q_id", "term"), "q_id", "term", k = 5)
      .as[(Long, Long, Long, Long)].collect()).toSet
    assert(together === alone)
  }

  test("bm25BatchTopK single-term ranking agrees with bm25TopK") {
    val batch = Relevance.bm25BatchTopK(corpus, "doc_id", toks,
        Seq((0L, "cat")).toDF("q_id", "term"), "q_id", "term",
        k = 10, k1 = 1.2, b = 0.75, logIdf = true)
      .select("rank", "doc_id").as[(Long, Long)].collect().toList
    val narrow = Relevance.bm25TopK(corpus, "doc_id", toks, Seq("cat"),
        k = 10, k1 = 1.2, b = 0.75, logIdf = true)
      .select("rank", "doc_id").as[(Long, Long)].collect().toList
    assert(batch === narrow)
  }
}
