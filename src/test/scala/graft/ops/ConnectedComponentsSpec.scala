package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Local oracle: path-compressing union-find returning min-id labels. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCC(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components match union-find on seeded random graphs") {
    for (seed <- Seq(1, 7, 13, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(runCC(edges) === unionFind(edges), s"seed=$seed")
    }
  }

  test("a long chain converges in logarithmic rounds, not diameter rounds") {
    // a 300-node path has diameter 299: label propagation would need 299
    // rounds; star contraction must finish well within 25
    val edges = (0L until 299L).map(i => (i, i + 1))
    val cc = runCC(edges, maxIter = 25)
    assert(cc.size === 300)
    assert(cc.values.toSet === Set(0L))
  }

  test("self-loops, duplicate and reversed edges, and nulls are tolerated") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (null, 5L), (6L, null), (7L, 8L))
      .toDF("a", "b")
    val cc = ConnectedComponents.run(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null endpoints and self-loops drop their edges entirely, so nodes 3,
    // 5 and 6 never appear — only real connectivity defines the node set
    assert(cc === Map(1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("an edgeless graph returns an empty labeling") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(empty, "a", "b").count() === 0)
  }

  test("star and anti-star topologies contract to the hub minimum") {
    // hub = 50 with spokes below and above it: component min is a spoke
    val star = (0L until 20L).filter(_ != 5L).map(i => (50L, i * 7 % 100))
    assert(runCC(star) === unionFind(star))
  }

  test("run frees every intermediate checkpoint (no storage leak)") {
    // a chain forces several rounds, i.e. several intermediate
    // checkpoints; after run, only the RETURNED labeling (caller-owned)
    // may remain in storage — Dataset.unpersist alone would leave one
    // pinned edge set per round (it never reaches checkpoint blocks)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = (0L until 64L).map(i => (i, i + 1))
    val out = ConnectedComponents.run(chain.toDF("a", "b"), "a", "b")
    assert(out.count() === 65)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"leaked ${added.size} persistent RDDs")
  }
}
