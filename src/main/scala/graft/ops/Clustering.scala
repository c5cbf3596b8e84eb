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
      scale: Int = 1000): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive and iters non-negative")
    // quantize once; the grid column is scanned (1 + iters) times.
    // persist, not checkpoint: lineage-backed (executor loss recomputes)
    // and freeable by the caller once the assignment is consumed
    val sv = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), gridScale(col(vecCol), scale).as("sv"))
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
    sv.select(col("id"),
      Similarity.nearestCell(col("sv"), cents).cast("long").as("cluster"))
  }
}
