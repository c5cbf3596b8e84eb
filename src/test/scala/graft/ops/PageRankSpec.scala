package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: the same integer recurrence, plain Scala. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      damp: Int = 85, scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val base = scale * (100 - damp) / 100 / n
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val sums = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (s, d) => sums(d) += rank(s) / outdeg(s) }
      rank = nodes.map(v => v -> (base + damp * sums(v) / 100)).toMap
    }
    rank
  }

  // directed graph with a hub, a chain, and a dangling node (4 -> nothing)
  private val edges = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (2L, 0L), (3L, 4L))

  test("integer PageRank equals the sequential reference exactly") {
    val df = edges.toDF("s", "d")
    val got = PageRank.run(df, "s", "d", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges, 4))
  }

  test("results are bit-stable under repartitioning") {
    val a = PageRank.run(edges.toDF("s", "d"), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(edges.toDF("s", "d").repartition(7), "s", "d", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("zero iterations returns the uniform initial mass") {
    val got = PageRank.run(edges.toDF("s", "d"), "s", "d", 0)
      .collect().map(r => r.getLong(1)).toSet
    assert(got === Set(1000000000000L / 5))
  }

  test("a symmetrized graph conserves mass up to floor losses") {
    val sym = edges ++ edges.map { case (s, d) => (d, s) }
    val total = PageRank.run(sym.toDF("s", "d"), "s", "d", 3)
      .agg(sum("rank")).collect()(0).getLong(0)
    val scale = 1000000000000L
    // each round floors at most one unit per edge-contrib + per node
    val slack = 3L * (sym.length + 5 + 100)
    assert(total <= scale && total >= scale - slack,
      s"total mass $total outside [${scale - slack}, $scale]")
  }
}
