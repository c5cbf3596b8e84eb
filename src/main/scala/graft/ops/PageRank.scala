package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Deterministic integer PageRank over an edge list — the graph-centrality
 * signal web-corpus pipelines use for document quality weighting (rank the
 * link graph, weight or filter pages by their centrality; see Page et al.
 * 1999, and harmonic-centrality ranking of Common Crawl).
 *
 * Determinism. Ranks live in fixed-point units of `scale` (initial total
 * mass = `scale`): every step is a long floor division or an exact long
 * sum, so results are bit-identical on any engine, partitioning, or
 * summation order — hash-checkable by an independent SQL engine, unlike
 * float PageRank whose sums reorder.
 *
 *   rank0(v)  = scale / n
 *   contrib(e)= rank(src) div outdeg(src)
 *   rank'(v)  = scale*(100-damp)/100/n  +  (damp * Σ contrib(in-edges)) div 100
 *
 * Dangling nodes (no out-edges) leak their damped mass each round — the
 * standard drop-dangling variant; symmetrize the edge list (as the
 * `pagerank` query does) when leakage is unwanted.
 *
 * Scale shape. Per iteration: one equi-join of the edge list to the
 * node-sized rank table on `src` (broadcast when ranks fit, shuffle
 * co-partitioned on src otherwise — pre-bucketing both by the join key
 * makes it zero-exchange), then one map-side-combined `groupBy(dst) sum`.
 * O(iters) rounds with [[org.apache.spark.sql.Dataset.localCheckpoint]]
 * hygiene per round (same pattern as [[ConnectedComponents]]): round k
 * does not re-run rounds 1..k-1, and exactly one rank table is retained.
 */
object PageRank {

  /**
   * Run `iters` exact-integer PageRank iterations; returns `(node, rank)`
   * with ranks in units of `scale`. `damp` is the damping percentage
   * (classic 0.85 -> 85).
   */
  def run(edges: DataFrame, src: String, dst: String, iters: Int,
      damp: Int = 85, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(damp >= 0 && damp <= 100, s"damp must be a percentage, got $damp")
    require(scale > 0, s"scale must be positive, got $scale")
    val e = edges.select(col(src).cast("long").as("s"), col(dst).cast("long").as("d"))
      .localCheckpoint(true)
    val nodes = e.select(col("s").as("node")).union(e.select(col("d").as("node")))
      .distinct().localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy(col("s")).agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    val base = scale * (100 - damp) / 100 / n
    var rank = nodes.select(col("node"), lit(scale / n).as("rank")).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val perSrc = rank.join(deg, col("node") === col("s"))
        .select(col("s"), expr("rank div outdeg").as("c"))
      val sums = e.join(perSrc, "s")
        .groupBy(col("d").as("node")).agg(sum(col("c")).as("m"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($damp * coalesce(m, 0L)) div 100")).as("rank"))
        .localCheckpoint(true)
      ColumnBridge.freeLocalCheckpoint(rank)
      rank = next
      i += 1
    }
    rank
  }
}
