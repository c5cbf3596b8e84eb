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
}
