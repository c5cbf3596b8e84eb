package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Reproducible k-means clustering over an embedding column — the corpus
 * partitioner a curation pipeline runs before per-cluster sampling, manual
 * inspection, or domain balancing.
 *
 * Every arithmetic step is EXACT, so the clustering is bit-reproducible
 * across engines, run orders and cluster sizes:
 *
 *  - vectors are quantized ONCE onto an integer grid (`round(x * scale)`,
 *    computed in double — a float times a small power of ten has <= 34
 *    significant bits, so the product is exact and no half-way rounding
 *    case can arise);
 *  - squared-L2 cell assignment sums exact integer squares in double
 *    ([[graft.functions.NearestCell]], codegen narrow projection; ties
 *    break to the lower cell index);
 *  - Lloyd means are exact-integer sums ([[graft.functions.VectorSumF]]
 *    double accumulation of integers is order-independent below 2^53)
 *    divided with integer truncation back onto the grid.
 *
 * Floating-point k-means instead drifts with aggregation order: a partial
 * mean summed in a different partition order flips boundary points between
 * runs, which poisons cache reuse and makes dedup/sampling decisions
 * unauditable. On a 1000-executor cluster the grid formulation returns the
 * same labels every run.
 *
 * Scale shape: the centroid matrix (k x dim floats) lives on the driver and
 * ships to executors as a codegen constant — assignment is a narrow
 * projection (no join, no shuffle of the corpus); each Lloyd iteration is
 * one map-side-combinable aggregate producing k rows. The corpus shuffles
 * zero times regardless of size.
 *
 * The reference engine has no clustering operator (its surface stops at
 * relational algebra, reference: src/main/scala/com/github/sadikovi/
 * metadata/DefaultSource.scala); this is part of the LLM-pipeline
 * extension surface.
 */
object Clustering {

  /** Integer-grid quantization of an `array<float>` column: each component
    * becomes `round(x * scale)` as an exact integer-valued float. */
  def gridScale(vec: Column, scale: Int): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("float"))

  /**
   * Grid-quantized Lloyd k-means: seeds are the `k` smallest-id vectors
   * (deterministic), refined with `iters` exact-integer Lloyd updates; a
   * cell that attracts no rows keeps its previous centroid. Returns
   * (id, cluster) with cluster in [0, k) indexed by seed rank (= the rank
   * of the seed's id among the k smallest). Rows with a null vector are
   * dropped.
   */
  def kmeansGridAssign(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      scale: Int = 1000,
      keepVec: Boolean = false): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    // quantize once; the grid column is scanned (1 + iters) times.
    // persist, not checkpoint: lineage-backed (executor loss recomputes)
    // and freeable by the caller once the assignment is consumed.
    // keepVec threads the ORIGINAL vector through to the output so callers
    // that verify candidates at full precision (semanticDedup) don't pay a
    // corpus-wide join back onto the assignment
    val passthrough = if (keepVec) Seq(col(vecCol).as("v")) else Nil
    val sv = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id") +: gridScale(col(vecCol), scale).as("sv") +: passthrough: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Float]] = sv
      .orderBy(col("id")).limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(cents.nonEmpty, s"kmeansGridAssign needs at least one non-null vector")
    for (_ <- 0 until iters) {
      val agg = sv
        .select(Similarity.nearestCell(col("sv"), cents).as("cell"), col("sv"))
        .groupBy(col("cell"))
        .agg(Similarity.vectorSumAgg(col("sv")).as("s"), count(lit(1)).as("n"))
        .collect()
      val upd = agg.map { r =>
        val n = r.getLong(2)
        // component sums are exact integers in double; truncating integer
        // division (toward zero) keeps the new centroid on the grid and
        // matches BIGINT // division in ANSI engines
        r.getInt(0) -> r.getSeq[Double](1).map(s => (s.toLong / n).toFloat).toArray
      }.toMap
      cents = cents.zipWithIndex.map { case (old, j) => upd.getOrElse(j, old) }
    }
    sv.select(col("id") +: Similarity.nearestCell(col("sv"), cents)
      .cast("long").as("cluster") +: passthrough.map(_ => col("v")): _*)
  }

  /**
   * Semantic deduplication (the SemDeDup shape): partition the corpus with
   * reproducible k-means, then find near-duplicate pairs ONLY within a
   * cluster, and drop every vector that has a same-cluster neighbor with
   * cosine above `threshold` and a SMALLER id (so each semantic group keeps
   * its min-id representative; the rule is a deterministic dominance
   * relation, not an order-dependent greedy pass).
   *
   * Scale shape — this is why it beats corpus-wide near-dup at 100 TB:
   * the quadratic candidate stage is confined to (cluster, LSH-bucket)
   * cells, so pair count is sum over cells of c_i^2 instead of n^2 / the
   * LSH-bucket global join of [[graft.SparkEntry]]'s dedup_embedding. `k`
   * scales with corpus size to keep expected cluster size bounded (SemDeDup
   * uses k ~ n / 10^4); assignment itself never shuffles the corpus (the
   * centroid matrix is a codegen constant). The within-cluster pair join
   * shuffles each row once on (cluster, bucket).
   *
   * Recall: exact duplicates (cosine = 1) always share both the k-means
   * cell (identical quantized vectors) and the LSH bucket (identical sign
   * patterns), so recall at cosine = 1 is exact; sub-1.0 near-dups are
   * subject to the usual LSH/cluster-boundary misses — inherent to the
   * method, which trades bounded recall for sub-quadratic cost.
   *
   * Returns (id, cluster, is_dup): every input row with its cluster and
   * whether the dominance rule drops it.
   */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      dim: Int,
      numPlanes: Int,
      threshold: Double): DataFrame = {
    val assigned = kmeansGridAssign(corpus, idCol, vecCol, k, iters, keepVec = true)
      .withColumn("bucket", Similarity.lshBucket(col("v"), dim, numPlanes))
    val l = assigned.select(col("cluster"), col("bucket"),
      col("id").as("a_id"), col("v").as("v_a"))
    val r = assigned.select(col("cluster"), col("bucket"),
      col("id").as("b_id"), col("v").as("v_b"))
    val dropped = l.join(r, Seq("cluster", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) > threshold)
      .select(col("b_id").as("id"))
      .distinct()
      .withColumn("is_dup", lit(true))
    assigned.select(col("id"), col("cluster"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }
}
