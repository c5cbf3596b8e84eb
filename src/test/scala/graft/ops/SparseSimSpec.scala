package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for [[SparseSim]] — inverted-index all-pairs similarity. */
class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a b c a"),
    (1L, "a b d"),
    (2L, "c c e"),
    (3L, "f g h"),
    (4L, "a c c"))
    .toDF("doc_id", "text")

  /** Brute-force pair dots over token tf vectors, computed driver-side. */
  private def bruteDots(maxDf: Long): Map[(Long, Long), (Long, Long)] = {
    val tfs = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val dfs = tfs.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val kept = dfs.filter(_._2 <= maxDf).keySet
    (for {
      a <- tfs.keys; b <- tfs.keys if a < b
      shared = (tfs(a).keySet & tfs(b).keySet & kept)
      if shared.nonEmpty
    } yield (a, b) -> ((shared.toSeq.map(t => tfs(a)(t) * tfs(b)(t)).sum,
      shared.size.toLong))).toMap
  }

  test("pairs equals brute force with no effective cap") {
    val got = SparseSim.pairs(docs, col("doc_id"), TextOps.tokens(col("text")), 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === bruteDots(100L))
  }

  test("df-cap drops frequent terms from pair scores") {
    // 'a' df=3, 'c' df=3; cap at 2 keeps b,d,e,f,g,h only
    val got = SparseSim.pairs(docs, col("doc_id"), TextOps.tokens(col("text")), 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === bruteDots(2L))
    assert(got === Map((0L, 1L) -> ((1L, 1L)))) // only shared rare term: 'b'
  }

  test("pairs is stable under repartitioning") {
    val base = SparseSim.pairs(docs, col("doc_id"), TextOps.tokens(col("text")), 3L)
      .collect().map(_.toSeq).toSet
    val rep = SparseSim.pairs(docs.repartition(7), col("doc_id"),
      TextOps.tokens(col("text")), 3L).collect().map(_.toSeq).toSet
    assert(rep === base)
  }

  test("self-join reuses one exchange and stays off BNLJ") {
    val q = SparseSim.pairs(docs, col("doc_id"), TextOps.tokens(col("text")), 3L)
    q.collect() // AQE finalizes the physical plan on execution
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"posting self-join sides must collapse to one exchange:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pair join must be an equi-join on term:\n$plan")
  }

  test("capAudit accounts for every term and posting") {
    val r = SparseSim.capAudit(docs, col("doc_id"), TextOps.tokens(col("text")), 2L)
      .collect()(0)
    // vocab: a(3) b(2) c(3) d(1) e(1) f(1) g(1) h(1) -> kept 6 terms / 7 postings
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((6L, 2L, 7L, 6L)))
  }

  test("topPairs ranks by dot desc with deterministic ties") {
    val top = SparseSim.topPairs(docs, col("doc_id"), TextOps.tokens(col("text")), 100L, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = bruteDots(100L).toSeq
      .sortBy { case ((a, b), (dot, _)) => (-dot, a, b) }
      .take(3).map { case ((a, b), (dot, _)) => (a, b, dot) }
    assert(top.toSeq === all)
  }
}
