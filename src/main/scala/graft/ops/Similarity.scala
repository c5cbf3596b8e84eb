package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimilarity, DotProductF}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two plans:
 *
 *  - [[bruteForceTopK]]: exact scoring of a (small, broadcast) query set
 *    against the full corpus — a broadcast nested-loop whose cost is
 *    O(|queries| * |corpus|) but with *zero shuffle of the corpus*; the
 *    corpus is scanned once in place and only top-k rows per query survive.
 *    This is the right plan when |queries| is small (the usual ANN probe
 *    shape) even at 100 TB corpus scale.
 *
 *  - [[lshTopK]]: random-hyperplane LSH — both sides are bucketed by the
 *    sign pattern of `numPlanes` fixed hyperplanes and candidates come from
 *    an *equi-join on the bucket id*, so the plan is shuffle-partitioned by
 *    bucket and never degenerates into a cartesian product (asserted by a
 *    plan-shape test). Scoring within buckets uses the same exact kernel.
 *
 * Scoring uses the native codegen'd Catalyst expressions
 * [[graft.functions.CosineSimilarity]] / [[graft.functions.DotProductF]]
 * (double accumulation, fused single pass).
 */
object Similarity {

  /** Cosine similarity column over two `array<float>` columns. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Dot product column over two `array<float>` columns. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /**
   * Exact top-k neighbours of each query vector. `queries` must be small
   * (it is broadcast). Returns (query_id, rank, neighbor_id, score).
   */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col(corpusId) =!= col(queryId))
      .withColumn("score", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("score").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), col("score"))
  }

  /**
   * Deterministic pseudo-random hyperplane for plane `j`: integer components
   * in [-3, 3] derived from a fixed hash of (dimension, plane), so every
   * plane is independent. (A plain affine formula mod 7 is degenerate —
   * plane j+7 would repeat plane j bit-for-bit — and hashing per ROW would
   * cost dim x planes hash calls per record; the plane is a CONSTANT, so it
   * is computed once here and embedded as a literal array.)
   */
  def hyperplane(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      val h = scala.util.hashing.MurmurHash3.productHash((i, j))
      (((h % 7) + 7) % 7 - 3).toDouble
    }

  /**
   * Sign-pattern LSH bucket id of a vector: bit `j` is the sign of the dot
   * product with fixed hyperplane `j`. Plain column arithmetic over literal
   * plane arrays (no UDF, no per-row hashing).
   */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int): Column =
    (0 until numPlanes).map { j =>
      val hp = typedLit(hyperplane(j, dim))
      val dotJ = aggregate(
        sequence(lit(0), lit(dim - 1)),
        lit(0.0d),
        (acc, i) => acc + element_at(vec, i + 1).cast("double") * element_at(hp, i + 1))
      when(dotJ >= 0.0d, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Squared L2 distance via the fused dot kernel. */
  def sqDist(a: Column, b: Column): Column =
    dot(a, a) - dot(a, b) * 2.0d + dot(b, b)

  /**
   * IVF coarse quantizer: k centroids seeded from the k smallest-id vectors
   * (deterministic) and refined with `iters` Lloyd iterations. Assignment is
   * a broadcast of the k centroids + one `min_by` aggregate — no window, no
   * shuffle of the corpus beyond the per-id aggregate; the per-dimension
   * mean is a (centroid, dimension)-keyed aggregate.
   */
  def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    var centroids = corpus
      .orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("centroid_id"),
        col(vecCol).as("centroid"))
    for (_ <- 0 until iters) {
      val means = assignCells(corpus, idCol, vecCol, centroids)
        .select(col("centroid_id"), posexplode(col(vecCol)))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("dims"))
        .select(col("centroid_id"),
          transform(col("dims"), d => d.getField("m").cast("float")).as("new_centroid"))
      // A cell that attracted no rows keeps its previous centroid instead of
      // vanishing, so the quantizer always has exactly k cells.
      centroids = centroids
        .join(means, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("new_centroid"), col("centroid")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment: broadcast the (small) centroid table and
    * take the per-row argmin with a deterministic tie-break. */
  def assignCells(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: DataFrame): DataFrame = {
    val d = sqDist(col(vecCol), col("centroid"))
    corpus.crossJoin(broadcast(centroids))
      .groupBy(col(idCol), col(vecCol))
      .agg(min_by(col("centroid_id"), struct(d, col("centroid_id"))).as("centroid_id"))
  }

  /**
   * IVF approximate top-k: corpus rows are searched only in the `nprobe`
   * cells nearest to each query, via an equi-join on the cell id. The
   * inverted-file shape — partition by cell, probe few cells — is the plan
   * that survives a 100x corpus scale-up (cells shard the shuffle key
   * space; probes touch a fixed fraction of the data).
   */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      centroids: DataFrame,
      nprobe: Int,
      k: Int): DataFrame = {
    val cells = assignCells(corpus, corpusId, corpusVec, centroids)
    val probeW = Window.partitionBy(col(queryId))
      .orderBy(sqDist(col(queryVec), col("centroid")), col("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nprobe)
      .select(col(queryId), col(queryVec), col("centroid_id"))
    val scored = cells
      .join(probes, Seq("centroid_id"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("score", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("score").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), col("score"))
  }

  /**
   * Bucketed approximate top-k: candidates limited to corpus rows whose LSH
   * bucket matches the query's bucket, joined on the bucket id (equi-join —
   * no cartesian product), then exact-scored and ranked within each query.
   */
  def lshTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      numPlanes: Int,
      k: Int): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(corpusVec), dim, numPlanes))
    val qb = queries.withColumn("bucket", lshBucket(col(queryVec), dim, numPlanes))
    val scored = cb
      .join(qb.withColumnRenamed("bucket", "qbucket"),
        col("bucket") === col("qbucket") && col(corpusId) =!= col(queryId))
      .withColumn("score", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId)).orderBy(col("score").desc, col(corpusId))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), col("score"))
  }
}
