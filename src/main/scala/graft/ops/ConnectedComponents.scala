package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.storage.StorageLevel

/**
 * Distributed connected components over an undirected edge list — the
 * transitive-closure step a dedup pipeline runs AFTER near-duplicate pair
 * detection: candidate pairs only say "a duplicates b"; choosing one
 * representative per duplicate *group* requires the components of the
 * duplicate graph (a~b, b~c => {a,b,c} keep one).
 *
 * Algorithm: alternating large-star/small-star (Kiveris et al.,
 * "Connected Components in MapReduce and Beyond", SoCC'14), the
 * shuffle-native formulation that converges in O(log^2 n) rounds (O(log n)
 * in practice) regardless of component diameter. Each round is two
 * edge-set rewrites, each one aggregate + one equi-join keyed by node id:
 *
 *  - large-star: every node u links each STRICTLY GREATER neighbor to the
 *    minimum of its neighborhood (including u itself);
 *  - small-star: every node u links each not-greater neighbor, and itself,
 *    to the minimum of those.
 *
 * Both preserve connectivity, never produce a node pointing above itself,
 * and monotonically contract every component onto its minimum node. The
 * label-propagation alternative needs one round per unit of graph DIAMETER
 * (a 1M-node duplicate chain = 1M rounds); star contraction handles chains
 * and stars alike in logarithmic rounds, which is what survives a 100x
 * corpus with adversarial duplicate topology.
 *
 * Plan shape per round: the per-node minimum is a map-side-combinable
 * `groupBy(node).agg(min(...))` joined back to the (symmetrized) edge list
 * — never a `collect_set` of neighborhoods, so a high-degree hub (every
 * near-dup cluster produces one) costs aggregation time, not executor
 * memory. Each round materializes via `localCheckpoint` to truncate the
 * otherwise exponentially deepening iterative lineage (a real cluster
 * deployment would use `checkpoint` to durable storage instead).
 *
 * The reference engine has no graph operator (its relational surface stops
 * at joins, reference: src/main/scala/com/github/sadikovi/metadata/
 * DefaultSource.scala delegates algebra to the host); this is part of the
 * LLM-pipeline extension surface.
 */
object ConnectedComponents {

  /**
   * Components of the undirected graph given by (srcCol, dstCol) node-id
   * pairs. Returns one row per distinct node appearing in any edge:
   * (node long, component long) with component = the minimum node id in the
   * node's component. Self-loops and duplicate/reversed edges are tolerated;
   * rows with a null endpoint are dropped. Node ids must be integral.
   *
   * Convergence is detected by a (count, bit_xor of pair-hash) fingerprint
   * of the deduplicated edge set — one narrow aggregate instead of a
   * two-shuffle EXCEPT per round. A false stop needs two DIFFERENT edge
   * sets of equal size with colliding 64-bit xor fingerprints in the same
   * run (~2^-64); `maxIter` additionally caps the loop, and hitting the cap
   * throws rather than returning possibly-unconverged labels.
   */
  def run(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var e = e0
    // all nodes, captured BEFORE contraction rewrites the edge set (roots
    // and nodes whose edges collapse away must still be labeled). Lazy:
    // first materialized by the final join — which is why e0's checkpoint
    // must stay alive until then (see the freeing discipline below).
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var fp = fingerprint(e)
    var converged = fp._1 == 0L // an edgeless graph is already done
    var iters = 0
    while (!converged && iters < maxIter) {
      // one star pair per materialization. Batching two pairs per
      // checkpoint was measured SLOWER (7.4s vs 4.3s on the dedup_cc
      // graph): each star references its input twice (the symmetrizing
      // union), so an unmaterialized chain re-evaluates the previous
      // round's subtree — materializing per pair keeps every subtree
      // evaluated exactly once.
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextFp = fingerprint(next)
      converged = nextFp == fp
      // Dataset.unpersist would be a silent no-op here: checkpoint blocks
      // are not CacheManager entries, they must be freed through the RDD.
      // e0 is exempt — the still-lazy `nodes` reads it at the final join.
      if (e ne e0) ColumnBridge.freeLocalCheckpoint(e)
      e = next
      fp = nextFp
      iters += 1
    }
    def freeAll(): Unit = {
      if (e ne e0) ColumnBridge.freeLocalCheckpoint(e)
      ColumnBridge.freeLocalCheckpoint(e0)
      nodes.unpersist()
    }
    if (!converged) {
      freeAll()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    }
    // fixed point: e = {(v, min of v's component) for every non-minimum v}
    val out = nodes
      .join(e.select(col("src").as("node"), col("dst").as("component")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
      .localCheckpoint(true)
    // `out` is eagerly checkpointed, so every input block can now be freed
    freeAll()
    out
  }

  /** (size, xor-of-pair-hashes) of a deduplicated edge set: an
    * order-independent fingerprint computed in one narrow aggregate. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L)).as("x"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Connect every neighbor v > u to min(N(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy(col("src").as("u"))
      .agg(min(col("dst")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    // No distinct here: duplicates cannot change smallStar's groupBy-min,
    // and its terminal distinct removes them — dropping the dedup saves one
    // shuffle per round at a bounded (per-neighborhood) duplication factor.
    sym.join(mins, col("src") === col("u"))
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** Connect every neighbor v <= u, and u itself, to min(N≤(u) ∪ {u}). */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(
      greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
    val mins = dir.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
    val relinked = dir.join(mins, col("src") === col("u"))
      .select(col("dst").as("src"), col("m").as("dst"))
    val self = mins.select(col("u").as("src"), col("m").as("dst"))
    relinked.union(self)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}
