package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.{CosineSimilarity, DotProductF, LshBucketF, NearestCell, NearestCells, TopKByScore, VectorSumF}

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Three plans, all built to survive a 100x corpus scale-up:
 *
 *  - [[bruteForceTopK]]: exact scoring of a (small, broadcast) query set
 *    against the full corpus — a broadcast nested-loop whose cost is
 *    O(|queries| * |corpus|) but with *zero shuffle of the corpus*; the
 *    corpus is scanned once in place and only top-k rows per query survive
 *    the bounded top-k aggregation.
 *
 *  - [[lshTopK]]: random-hyperplane LSH — both sides are bucketed by the
 *    sign pattern of `numPlanes` fixed hyperplanes and candidates come from
 *    an *equi-join on the bucket id*, so the plan is shuffle-partitioned by
 *    bucket and never degenerates into a cartesian product (asserted by a
 *    plan-shape test). Scoring within buckets uses the same exact kernel.
 *
 *  - [[ivfTopK]]: IVF — a driver-resident coarse quantizer (k x dim floats,
 *    trivially small) assigns corpus rows to cells with the codegen'd
 *    [[graft.functions.NearestCell]] narrow projection (no join, no shuffle,
 *    no quantizer recomputation), and each query probes its `nprobe` nearest
 *    cells through an equi-join on the cell id.
 *
 * Ranking in all three uses [[graft.functions.TopKByScore]], a bounded-heap
 * aggregate whose partial stage truncates to k entries per query per mapper:
 * shuffle volume is `mappers x queries x k` rows, never the full scored
 * candidate set, and no per-query single-reducer sort exists anywhere.
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

  /** Unit-L2-norm projection of an `array<float>` column: normalize once
    * at ingest, then score with the cheaper [[dot]] kernel (cosine ==
    * dot over normalized vectors). */
  def l2Normalize(vec: Column): Column =
    ColumnBridge.column(graft.functions.L2Normalize(ColumnBridge.expression(vec)))

  /** Bounded top-k aggregate column: best-first `array<struct<score,id>>`. */
  def topKAgg(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Nearest-centroid index (squared L2) as a codegen'd narrow projection. */
  def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids))

  /** The `nprobe` nearest centroid indices, ascending by distance. */
  def nearestCells(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec), centroids, nprobe))

  /** Store schema + working column names of the persisted IVF index —
    * the one collision contract shared by [[writeIvfStore]] (extras),
    * [[appendToIvfStore]] (extras) and [[searchIvfStore]] (query id). */
  private val StoreReserved = Set("id", "cell", "qvec", "__qq", "__qc", "score")

  /** Element-wise vector sum aggregate (double accumulation, one pass). */
  def vectorSumAgg(vec: Column): Column =
    ColumnBridge.column(VectorSumF(ColumnBridge.expression(vec)).toAggregateExpression())

  /**
   * Rank scored candidates into per-query top-k via the bounded-heap
   * aggregate: one hash aggregate keyed by query id (map-side partial
   * buffers hold <= k entries), then an explode of `|queries| x k` rows.
   * Emits (query_id, rank, neighbor_id, score), rank starting at 1,
   * deterministic under any partitioning (score desc, id asc).
   *
   * The corpus id must be an integral column (the heap stores ids as
   * longs); a widening cast is applied, but non-integral ids are rejected
   * eagerly — a silent cast would null out e.g. string UUIDs and return
   * empty results instead of failing.
   */
  private def rankTopK(
      scored: DataFrame, queryId: String, corpusId: String, k: Int): DataFrame = {
    val idType = scored.schema(corpusId).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"top-k ranking requires an integral corpus id column, got " +
        s"'$corpusId': ${idType.simpleString}")
    scored
      .groupBy(col(queryId).as("query_id"))
      .agg(topKAgg(col("score"), col(corpusId).cast("long"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col").getField("id").as("neighbor_id"),
        col("col").getField("score").as("score"))
  }

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
    rankTopK(scored, queryId, corpusId, k)
  }

  /** Fixed-point int8 quantization column ([[graft.functions.QuantizeFixedPoint]]). */
  def quantizeI8(vec: Column, scale: Int): Column =
    ColumnBridge.column(
      graft.functions.QuantizeFixedPoint(ColumnBridge.expression(vec), scale))

  /** Deterministic ±1 random projection to k dims
    * ([[graft.functions.RandomProject]]) — the dimensionality cut that
    * composes with [[quantizeI8]]'s byte cut. */
  def randomProject(vec: Column, k: Int): Column =
    ColumnBridge.column(
      graft.functions.RandomProject(ColumnBridge.expression(vec), k))

  /** Exact integer dot product column over two `array<int>` columns. */
  def dotI(a: Column, b: Column): Column =
    ColumnBridge.column(
      graft.functions.DotProductI(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /**
   * Exact top-k by QUANTIZED integer dot product: both sides are reduced to
   * int8 fixed-point vectors once ([[quantizeI8]], a narrow codegen
   * projection — at scale, quantize at ingest and persist the int8 column
   * to cut corpus bytes 4x), then scored with the integer kernel
   * [[dotI]] inside the same broadcast corpus scan + bounded top-k shape
   * as [[bruteForceTopK]]: zero corpus shuffle, `mappers x queries x k`
   * shuffle rows. Scores are exact integers — fully hash-checkable by an
   * independent engine, no float tolerance. Returns (query_id, rank,
   * neighbor_id, score), score being the integer dot as a double.
   */
  def quantizedTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      scale: Int,
      k: Int): DataFrame = {
    val qc = corpus.select(col(corpusId), quantizeI8(col(corpusVec), scale).as("__qc"))
    val qq = queries.select(col(queryId), quantizeI8(col(queryVec), scale).as("__qq"))
    val scored = qc
      .join(broadcast(qq), col(corpusId) =!= col(queryId))
      .withColumn("score", dotI(col("__qc"), col("__qq")).cast("double"))
    rankTopK(scored, queryId, corpusId, k)
  }

  /**
   * Two-stage retrieval, stage two: re-score a candidate SHORTLIST exactly
   * in float and re-rank — the production recipe where a compressed index
   * (IVF cells, int8 dots, LSH buckets) RETRIEVES and the exact kernel
   * ORDERS. `shortlist` is any (query_id, neighbor_id) frame (typically a
   * stage-one top-k' with k' > k); it is queries x k' rows — tiny by
   * construction — so BOTH joins here broadcast: the corpus is scanned once
   * in place to fetch candidate float vectors (no corpus shuffle), queries
   * ride in by id, and ranking is the same bounded-heap aggregate as every
   * other ANN path. Returns (query_id, rank, neighbor_id, score).
   *
   * Recall composes: stage two never drops a candidate the shortlist
   * surfaced, so a planted duplicate retrieved by stage one keeps rank 1
   * under the exact scores.
   */
  def rerankExact(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      shortlist: DataFrame,
      k: Int): DataFrame = {
    val pairs = shortlist.select(
      col("query_id").as("__rr_q"), col("neighbor_id").as("__rr_n"))
    val scored = corpus
      .join(broadcast(pairs), col(corpusId) === col("__rr_n"))
      .join(broadcast(queries), col("__rr_q") === col(queryId))
      .withColumn("score", cosine(col(queryVec), col(corpusVec)))
    rankTopK(scored, queryId, corpusId, k)
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
   * product with fixed hyperplane `j`, all planes fused into one codegen
   * pass over the vector ([[graft.functions.LshBucketF]]) — the
   * per-plane `aggregate` HOF formulation re-walked the vector under an
   * interpreted lambda once per plane.
   */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int): Column =
    ColumnBridge.column(LshBucketF(ColumnBridge.expression(vec),
      Array.tabulate(numPlanes)(j => hyperplane(j, dim))))

  /**
   * IVF coarse quantizer, computed to the DRIVER: k centroids seeded from
   * the k smallest-id vectors (deterministic) and refined with `iters`
   * Lloyd iterations. Each iteration is one narrow [[nearestCell]]
   * projection over the corpus plus one (cell, dimension)-keyed partial
   * aggregate of k x dim rows collected back — the centroid matrix is tiny
   * by construction, so holding it driver-side costs nothing and buys the
   * IVF search plan freedom from quantizer lineage: no caching, no
   * recomputation, no windows, no joins to build cell ids.
   *
   * A cell that attracts no rows keeps its previous centroid, so the
   * quantizer always has exactly k cells.
   */
  def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): Array[Array[Float]] = {
    // null vectors cannot seed or attract a cell (nearestCell(null) is a
    // null group whose key would NPE the driver-side collect); drop them
    // here — the search side already drops them naturally, since a null
    // cell id never matches the probe equi-join
    val vecs = corpus.filter(col(vecCol).isNotNull)
    var cents: Array[Array[Float]] = vecs
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    for (_ <- 0 until iters) {
      // one pass, no explode: per-cell element-wise sums fold each vector
      // into a dim-sized buffer ([[graft.functions.VectorSumF]]); the
      // posexplode + avg formulation would multiply row count by dim first
      val means = vecs
        .select(nearestCell(col(vecCol), cents).as("cell"), col(vecCol))
        .groupBy(col("cell"))
        .agg(vectorSumAgg(col(vecCol)).as("vs"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2).toDouble
          r.getInt(0) -> r.getSeq[Double](1).map(s => (s / n).toFloat).toArray
        }.toMap
      cents = cents.zipWithIndex.map { case (old, j) => means.getOrElse(j, old) }
    }
    cents
  }

  /**
   * IVF approximate top-k: corpus rows are searched only in the `nprobe`
   * cells nearest to each query, via an equi-join on the cell id. Cell
   * assignment on BOTH sides is a narrow projection against the constant
   * centroid matrix; the (small) exploded probe list is broadcast, so the
   * corpus is never shuffled — the inverted-file shape that survives a 100x
   * corpus scale-up. (With a large query set, drop the broadcast hint and
   * the same plan becomes a shuffle equi-join partitioned by cell id.)
   */
  def ivfTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      centroids: Array[Array[Float]],
      nprobe: Int,
      k: Int): DataFrame = {
    val cells = corpus.withColumn("cell", nearestCell(col(corpusVec), centroids))
    val probes = queries.select(col(queryId), col(queryVec),
      explode(nearestCells(col(queryVec), centroids, nprobe)).as("cell"))
    val scored = cells
      .join(broadcast(probes), Seq("cell"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("score", cosine(col(queryVec), col(corpusVec)))
    rankTopK(scored, queryId, corpusId, k)
  }

  /**
   * The 100 TB ANN recipe, composed: IVF cell probing cuts the candidate
   * set ~(cells/nprobe)x, int8 fixed-point scoring cuts candidate bytes 4x
   * and replaces float multiplies with integer ones. Cell assignment still
   * argmins against FLOAT centroids (a narrow projection), but the float
   * vector is dropped before the join: only `(id, cell, int8 vec)` flows
   * into the probe equi-join, which is exactly the compressed posting-list
   * layout a persisted IVF index would hold. Same bounded top-k ranking;
   * integer scores, so results stay engine-checkable.
   */
  def ivfQuantizedTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      centroids: Array[Array[Float]],
      nprobe: Int,
      scale: Int,
      k: Int): DataFrame = {
    val cells = corpus.select(col(corpusId),
      nearestCell(col(corpusVec), centroids).as("cell"),
      quantizeI8(col(corpusVec), scale).as("__qc"))
    val probes = quantizedProbes(queries, queryId, queryVec, centroids, nprobe, scale)
    rankQuantizedCells(cells, corpusId, probes, queryId, k)
  }

  /** Exploded quantized probe rows `(queryId, __qq, cell)` — the shared
    * query side of [[ivfQuantizedTopK]] and [[searchIvfStore]]. */
  private def quantizedProbes(
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: Array[Array[Float]], nprobe: Int, scale: Int): DataFrame =
    queries.select(col(queryId),
      quantizeI8(col(queryVec), scale).as("__qq"),
      explode(nearestCells(col(queryVec), centroids, nprobe)).as("cell"))

  /** Shared scoring/ranking body: broadcast probe equi-join on the cell id
    * over `(corpusId, cell, __qc)` rows, integer dot, bounded-heap top-k.
    * One body by construction, so the direct and store-backed paths cannot
    * drift on the self-match filter or tie-break. */
  private def rankQuantizedCells(
      cells: DataFrame, corpusId: String,
      probes: DataFrame, queryId: String, k: Int): DataFrame = {
    val scored = cells
      .join(broadcast(probes), Seq("cell"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("score", dotI(col("__qc"), col("__qq")).cast("double"))
    rankTopK(scored, queryId, corpusId, k)
  }

  /**
   * Persist an IVF-quantized ANN index: the corpus is cell-assigned and
   * int8-quantized ONCE and written as a parquet table BUCKETED by cell id
   * (columns `id, cell, qvec`), alongside a `<table>_centroids` table
   * carrying the quantizer geometry (cell centroids + fixed-point scale) —
   * the index is self-describing, so writer and searcher cannot drift on
   * geometry the way a config-kept contract could. This is the write-once
   * layout a 100 TB corpus wants: quantization and cell assignment are
   * paid at ingest, and every future query batch reads only the probed
   * cells' buckets — [[searchIvfStore]] pushes the probed cell ids into
   * the scan as a literal `IN` filter, which is what drives bucket-file
   * pruning and row-group skipping (plan-asserted, along with the
   * store side never exchanging). Returns the centroids for callers
   * that also search directly.
   */
  def writeIvfStore(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      table: String,
      k: Int,
      iters: Int,
      scale: Int,
      buckets: Int = 16,
      extras: Seq[String] = Nil): Array[Array[Float]] = {
    require(extras.forall(!StoreReserved.contains(_)),
      s"extra columns collide with the store schema (${StoreReserved.mkString(", ")})")
    val centroids = ivfCentroids(corpus, idCol, vecCol, k, iters)
    // `extras` ride along in the store row (label, source, timestamp...)
    // so probes can PRE-filter on them in-scan — filtered vector search;
    // an absorb into an extras-carrying store must supply the same extras
    // (Spark rejects the schema mismatch loudly)
    val cells = corpus.select(col(idCol).as("id") +:
      nearestCell(col(vecCol), centroids).as("cell") +:
      quantizeI8(col(vecCol), scale).as("qvec") +:
      extras.map(col): _*)
    Bucketing.writeBucketed(cells, "cell", buckets, table)
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, scale) }
      .toDF("cell", "centroid", "scale")
      .write.mode("overwrite").format("parquet").saveAsTable(table + "_centroids")
    centroids
  }

  /**
   * Absorb new vectors into a persisted [[writeIvfStore]] index: the
   * increment is cell-assigned and int8-quantized with the STORE'S OWN
   * geometry (read back from `<table>_centroids`) and appended with the
   * bucket spec preserved, so future [[searchIvfStore]] probes see old and
   * new rows through one pruned bucketed scan — the embedding-side absorb
   * step of the ingest loop. Centroids are deliberately NOT retrained:
   * IVF ingest keeps the quantizer fixed (cell assignment must agree with
   * what is already laid out; retraining would strand existing rows in
   * stale cells). Re-index when the vector distribution drifts materially
   * — the drift monitors are that signal. `buckets` must match the
   * original write, same caller-kept contract as the band store (Spark
   * rejects a mismatched bucket count loudly). A store written with
   * [[writeIvfStore]] `extras` must be absorbed with the SAME `extras`
   * (Spark rejects the schema mismatch loudly otherwise).
   */
  def appendToIvfStore(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      buckets: Int = 16,
      extras: Seq[String] = Nil): Unit = {
    require(spark.catalog.tableExists(table),
      s"IVF store '$table' does not exist; write it with writeIvfStore first")
    require(extras.forall(!StoreReserved.contains(_)),
      s"extra columns collide with the store schema (${StoreReserved.mkString(", ")})")
    val (centroids, scale) = readIvfGeometry(spark, table)
    val cells = vecs.select(col(idCol).as("id") +:
      nearestCell(col(vecCol), centroids).as("cell") +:
      quantizeI8(col(vecCol), scale).as("qvec") +:
      extras.map(col): _*)
    Bucketing.writeBucketed(cells, "cell", buckets, table, mode = "append")
  }

  /** Decode the persisted quantizer geometry of a [[writeIvfStore]] index —
    * the ONE read-back of the centroid-table schema, shared by append and
    * search so writer and reader cannot drift on the layout. */
  private def readIvfGeometry(
      spark: org.apache.spark.sql.SparkSession,
      table: String): (Array[Array[Float]], Int) = {
    val geo = spark.table(table + "_centroids").orderBy(col("cell")).collect()
    require(geo.nonEmpty, s"empty or missing centroid table: ${table}_centroids")
    (geo.map(_.getSeq[Float](1).toArray), geo.head.getInt(2))
  }

  /**
   * Query batch against a persisted [[writeIvfStore]] index: geometry is
   * read back from `<table>_centroids` (k x dim floats — driver-resident
   * like every quantizer here), and the UNION of probed cell ids (at most
   * queries x nprobe values, tiny by the broadcast-queries contract) is
   * pushed into the store scan as a static `IN` filter — which is what
   * actually restricts I/O: Spark prunes bucket files from literal
   * filters on the bucketing column and skips row groups from footer
   * min/max (a broadcast join alone would scan every bucket; bucket
   * co-location only pays in shuffle joins). Probes then broadcast onto
   * the pruned scan — the store side never exchanges; integer dot scores,
   * bounded-heap top-k; self-matches excluded by id, the same contract as
   * [[ivfQuantizedTopK]]. The query id column must not be named
   * `id`/`cell`/`qvec`/`__qq`/`__qc` (the store schema + working columns).
   */
  def searchIvfStore(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      nprobe: Int,
      k: Int,
      storeFilter: Option[Column] = None): DataFrame = {
    require(!StoreReserved.contains(queryId),
      s"query id column '$queryId' collides with the store schema or a " +
        s"working column (${StoreReserved.mkString(", ")}); alias it first")
    val (centroids, scale) = readIvfGeometry(spark, table)
    val probes = quantizedProbes(queries, queryId, queryVec, centroids, nprobe, scale)
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq
    // storeFilter is a PRE-filter over stored extras (see writeIvfStore):
    // top-k is computed among matching rows only — not a post-filter that
    // silently returns fewer than k — and the predicate reaches the
    // parquet scan next to the cell IN-list (row-group skipping applies)
    val store0 = spark.table(table)
      .filter(col("cell").isin(probedCells: _*))
    val store = storeFilter.fold(store0)(store0.filter)
      .select(col("id"), col("cell"), col("qvec").as("__qc"))
    rankQuantizedCells(store, "id", probes, queryId, k)
  }

  /**
   * Bucketed approximate top-k: candidates limited to corpus rows whose LSH
   * bucket matches the query's bucket, joined on the bucket id (equi-join —
   * no cartesian product), then exact-scored and ranked per query with the
   * bounded top-k aggregate.
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
      k: Int): DataFrame =
    lshTopKMulti(corpus, corpusId, corpusVec, queries, queryId, queryVec,
      dim, numPlanes, k, tables = 1)

  /**
   * Multi-table LSH top-k: `tables` INDEPENDENT hyperplane sets, candidates
   * from the union of per-table bucket matches — the textbook recall dial.
   * One table at P planes finds a neighbor with probability `p(theta)^P`
   * (per-plane agreement p shrinks with angle); L tables lift that to
   * `1 - (1 - p^P)^L` while each table's buckets stay sparse, so recall
   * rises without the candidate explosion of simply using fewer planes.
   *
   * Plan shape: both sides compute all L bucket ids in one projection and
   * explode to (table, bucket) keys — an equi-join on the composite key
   * (never cartesian), duplicates across tables dropped on the candidate
   * pair key before scoring, then the bounded top-k aggregate. Corpus cost
   * is L bucket rows per record; candidate volume is the union, typically
   * a hair above one table's.
   */
  def lshTopKMulti(
      corpus: DataFrame,
      corpusId: String,
      corpusVec: String,
      queries: DataFrame,
      queryId: String,
      queryVec: String,
      dim: Int,
      numPlanes: Int,
      k: Int,
      tables: Int): DataFrame = {
    require(tables > 0, s"lsh requires tables > 0, got $tables")
    // table t uses plane indices [t*numPlanes, (t+1)*numPlanes) — fully
    // independent hyperplane sets from the same deterministic family
    def tableBucket(vec: String, t: Int): Column =
      ColumnBridge.column(graft.functions.LshBucketF(
        ColumnBridge.expression(col(vec)),
        Array.tabulate(numPlanes)(j => hyperplane(t * numPlanes + j, dim))))
    val candidates = if (tables == 1) {
      // single table: plain bucket column, no per-row explode (a Generate
      // node copies every corpus row even for a 1-element array — measured
      // ~2x on the narrow scan) and no cross-table duplicates to drop
      corpus.withColumn("bucket", tableBucket(corpusVec, 0))
        .join(broadcast(
          queries.withColumn("qbucket", tableBucket(queryVec, 0))),
          col("bucket") === col("qbucket") && col(corpusId) =!= col(queryId))
    } else {
      def withBuckets(df: DataFrame, vec: String): DataFrame =
        df.select(col("*"), posexplode(
          array((0 until tables).map(t => tableBucket(vec, t)): _*))
          .as(Seq("table", "bucket")))
      // a pair found by several tables must rank once, not L times
      withBuckets(corpus, corpusVec)
        .join(broadcast(withBuckets(queries, queryVec)
          .withColumnRenamed("table", "qtable").withColumnRenamed("bucket", "qbucket")),
          col("table") === col("qtable") && col("bucket") === col("qbucket") &&
            col(corpusId) =!= col(queryId))
        .dropDuplicates(queryId, corpusId)
    }
    val scored = candidates.withColumn("score", cosine(col(queryVec), col(corpusVec)))
    rankTopK(scored, queryId, corpusId, k)
  }
}
