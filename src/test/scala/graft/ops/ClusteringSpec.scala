package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("vec", ArrayType(FloatType))))

  private def df(rows: (Long, Seq[Float])*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, 2),
      schema)

  test("two well-separated blobs converge to their exact integer means") {
    // blob A around (0, 0), blob B around (10, 10); seeds are the two
    // smallest ids — one inside each blob after the first Lloyd update
    val data = df(
      0L -> Seq(0.001f, 0.002f), 1L -> Seq(10.0f, 10.0f),
      2L -> Seq(0.004f, -0.001f), 3L -> Seq(-0.002f, 0.003f),
      4L -> Seq(10.002f, 9.999f), 5L -> Seq(9.998f, 10.001f))
    val out = Clustering.kmeansGridAssign(data, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("a cell that attracts no rows keeps its previous centroid") {
    // duplicate seeds: round 1 ties every row to cell 0, so cell 1 is
    // empty and must RETAIN its seed (0,0). The outlier drags cell 0's
    // mean away, and in round 2 the origin rows can only return to cell 1
    // because the empty cell kept a live centroid.
    val data = df(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.0f, 0.0f), 2L -> Seq(10.0f, 10.0f))
    val out = Clustering.kmeansGridAssign(data, "id", "vec", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(0L -> 1L, 1L -> 1L, 2L -> 0L))
  }

  test("null vectors are dropped, not assigned") {
    val data = df(0L -> Seq(1.0f, 2.0f), 1L -> null, 2L -> Seq(1.1f, 2.1f))
    val out = Clustering.kmeansGridAssign(data, "id", "vec", k = 1, iters = 1)
    assert(out.select(col("id")).collect().map(_.getLong(0)).sorted === Array(0L, 2L))
  }

  test("assignment is stable under repartitioning (order-independent math)") {
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
    val a = Clustering.kmeansGridAssign(e, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clustering.kmeansGridAssign(e.repartition(7), "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1, "expected more than one non-empty cluster")
  }

  test("the k-means oracle's seed contract holds on the oracle fixture") {
    // the cluster_kmeans DuckDB oracle seeds WHERE vec_id < 8 and labels
    // by vec_id; the engine seeds by the 8 smallest non-null ids and
    // labels by rank — equivalent ONLY if vec_ids 0..7 exist non-null at
    // the sf the driver verifies at. Fail here, loudly, if that moves.
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val seeds = e.filter(col("vec_id") < 8 && col("embedding").isNotNull)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(seeds === (0L until 8L).toArray,
      "cluster_kmeans oracle assumes vec_ids 0..7 with non-null embeddings")
  }

  test("semanticDedup drops planted exact duplicates, keeps min-id reps") {
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.union(
      e.filter(col("vec_id") < 5).select(col("vec_id") + 100000L, col("embedding")))
    val out = Clustering.semanticDedup(corpus, "vec_id", "embedding",
        k = 4, iters = 2, dim = 64, numPlanes = 16, threshold = 0.99d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val n = e.count()
    assert(out.length === n + 5)
    // exactly the planted copies are dropped; every original survives
    assert(out.filter(_._3).map(_._1).sorted === (100000L until 100005L).toArray)
    // a planted copy shares its source's cluster (identical quantized vector)
    val byId = out.map(t => t._1 -> t._2).toMap
    for (i <- 0L until 5L) assert(byId(i + 100000L) === byId(i))
  }

  test("semanticDedup drop rule is smaller-id dominance, not closure-greedy") {
    // chain: cos(v0,v1) ≈ cos(v1,v2) ≈ 0.9925 > τ but cos(v0,v2) ≈ 0.970 < τ.
    // Dominance drops anything with a smaller-id near neighbor → {1, 2}
    // (2 falls to the already-dropped 1); a keep-one-per-component rule
    // would give the same set here, but a greedy pass that skips pairs
    // whose smaller side was itself dropped would keep 2 — this pins the
    // declarative rule. k=1 and a single plane keep cluster/bucket shared.
    def at(deg: Double) = Seq(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val data = df(0L -> at(0), 1L -> at(7), 2L -> at(14))
    val out = Clustering.semanticDedup(data, "id", "vec",
        k = 1, iters = 0, dim = 2, numPlanes = 1, threshold = 0.99d)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> false, 1L -> true, 2L -> true))
  }

  test("semanticDedup with no near-dups drops nothing") {
    val e = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val out = Clustering.semanticDedup(e, "vec_id", "embedding",
      k = 4, iters = 1, dim = 64, numPlanes = 16, threshold = 0.99d)
    assert(out.filter(col("is_dup")).count() === 0L)
  }

  test("grid scaling is an exact integer-valued projection") {
    val v = df(0L -> Seq(0.1234567f, -0.9998f))
      .select(Clustering.gridScale(col("vec"), 1000).as("sv"))
      .collect()(0).getSeq[Float](0)
    assert(v === Seq(123.0f, -1000.0f))
    assert(v.forall(x => x == math.rint(x)))
  }
}
