package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * ANN recall on CLUSTERED embeddings — the distribution real encoders
 * produce. The uniform-random testdata embeddings are the documented
 * adversarial case for locality methods (pairwise cosine concentrates
 * near zero, "nearest" is barely distinguishable from random); this spec
 * pins that on a mixture-of-Gaussians distribution the same IVF and
 * multi-table-LSH constructions reach the recall the textbook analysis
 * predicts, at dials recorded in SURVEY §8's scale-audit notes.
 */
class ClusteredRecallSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val nClusters = 16
  private val perCluster = 200
  private val nQueries = 64

  /** Deterministic unit-normalized mixture-of-Gaussians point: cluster
    * center (seeded by cluster id) plus sigma-scaled noise (seeded by
    * point id). */
  private def point(cluster: Int, seed: Long, sigma: Double): Seq[Float] = {
    val cRnd = new scala.util.Random(cluster * 7919L + 13)
    val center = Array.fill(dim)(cRnd.nextGaussian())
    val cNorm = math.sqrt(center.map(x => x * x).sum)
    val pRnd = new scala.util.Random(seed)
    val v = center.map(_ / cNorm + sigma * pRnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat).toSeq
  }

  // sigma 0.05: within-cluster pairwise cosine ~0.86 — tight clusters, the
  // regime trained text/image encoders put near-duplicates in
  private lazy val corpus: DataFrame = (0 until nClusters * perCluster)
    .map(i => (i.toLong, point(i % nClusters, 1000L + i, 0.05)))
    .toDF("vec_id", "embedding")
    .withColumn("embedding", col("embedding").cast("array<float>"))

  private lazy val queries: DataFrame = (0 until nQueries)
    .map(i => (100000L + i, point(i % nClusters, 900000L + i, 0.05)))
    .toDF("q_id", "q_vec")
    .withColumn("q_vec", col("q_vec").cast("array<float>"))

  private lazy val truth: Map[Long, Set[Long]] =
    Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "q_id", "q_vec", 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAt10(approx: DataFrame): Double = {
    val got = approx.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size
  }

  test("IVF recall@10 >= 0.9 on clustered embeddings (16 cells, nprobe 4)") {
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding",
      k = nClusters, iters = 3)
    val r = recallAt10(Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", cents, nprobe = 4, k = 10))
    info(f"IVF clustered recall@10 = $r%.3f")
    assert(r >= 0.9, f"IVF recall@10 $r%.3f below the pinned 0.9")
  }

  test("multi-table LSH recall@10 >= 0.9 on clustered embeddings (6 planes x 12 tables)") {
    val r = recallAt10(Similarity.lshTopKMulti(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", dim, numPlanes = 6, k = 10, tables = 12))
    info(f"LSH clustered recall@10 = $r%.3f")
    assert(r >= 0.9, f"LSH recall@10 $r%.3f below the pinned 0.9")
  }

  test("int8 quantized recall@10 on clustered embeddings rises with scale (127 over 64)") {
    // tight clusters are the HARD case for quantization (the opposite of
    // LSH/IVF): neighbor score gaps shrink below the rounding error, so
    // agreement with the float ranking drops — and the scale dial buys it
    // back. Both figures are pinned so the trade-off stays measured.
    val r64 = recallAt10(Similarity.quantizedTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", scale = 64, k = 10))
    val r127 = recallAt10(Similarity.quantizedTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", scale = 127, k = 10))
    info(f"int8 clustered recall@10: scale64=$r64%.3f scale127=$r127%.3f")
    assert(r127 >= r64, f"scale 127 recall $r127%.3f below scale 64's $r64%.3f")
    assert(r64 >= 0.65, f"scale-64 recall@10 $r64%.3f below the pinned 0.65")
    assert(r127 >= 0.85, f"scale-127 recall@10 $r127%.3f below the pinned 0.85")
  }
}
