package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * KMV (k-minimum-values) distinct-count sketch — the classic mergeable
 * cardinality estimator: keep the k smallest distinct hash values of a
 * key; if the k-th smallest normalized hash is t, the key space holds
 * roughly (k-1)/t distinct values. Bottom-k sketches of two partitions
 * merge by union + re-truncate, which is exactly what a map-side-combined
 * bounded-heap aggregate does — so the plan shuffles `mappers x groups x k`
 * rows, never the distinct key sets themselves (the `collect_set`
 * formulation this replaces holds whole key sets in executor memory).
 *
 * Determinism: with [[Sampling.arithHash]] the sketch CONTENTS (not just
 * the estimate) are a pure function of the key set, reproducible in plain
 * SQL by any engine — the correctness gate pins the k minimum hashes, the
 * k-th value, and the integer-exact estimate, not a tolerance band.
 */
object Sketches {

  /** Hash modulus of [[Sampling.arithHash]] — the sketch's value space. */
  val ArithHashModulus = 1000003L

  /**
   * Per-group KMV sketch of a pre-hashed key column: `(g, kmv array<long>)`
   * with the k smallest DISTINCT hash values ascending. One (group, hash)
   * dedupe aggregate, then one bounded-heap top-k (score = -hash) — both
   * map-side combinable.
   */
  def kmvSketch(df: DataFrame, group: Column, hashed: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(group.as("g"), hashed.as("h"))
      .distinct()
      .groupBy(col("g"))
      .agg(Similarity.topKAgg((col("h") * lit(-1L)).cast("double"), col("h"), k).as("topk"))
      .select(col("g"), transform(col("topk"), x => x.getField("id")).as("kmv"))
  }

  /**
   * Distinct-count estimate in micro-units from a KMV sketch over
   * [[Sampling.arithHash]] values: exact `n * 1e6` when the sketch is not
   * full (every distinct value is present), else the bottom-k estimator
   * `(k-1) * modulus * 1e6 div kth_min` — all integer arithmetic, so any
   * engine reproduces the same number bit-for-bit.
   */
  /** Bottom-k cardinality estimate in micro-units from a sketch's size and
    * k-th minimum: exact `n * 1e6` when not full, else `(k-1) * modulus *
    * 1e6 div kth` — shared by the per-group and overlap paths so the
    * estimator has exactly one definition. */
  private def estMicroExpr(nSketchCol: String, kthMinCol: String, k: Int): Column =
    expr(s"CASE WHEN $nSketchCol < $k THEN $nSketchCol * 1000000L " +
      s"ELSE ${(k - 1).toLong * ArithHashModulus * 1000000L}L div $kthMinCol END")

  def kmvEstimateMicro(df: DataFrame, k: Int): DataFrame =
    df.select(col("g"),
        size(col("kmv")).cast("long").as("n_sketch"),
        when(size(col("kmv")) >= k, element_at(col("kmv"), k))
          .otherwise(lit(0L)).as("kth_min"))
      .withColumn("est_micro", estMicroExpr("n_sketch", "kth_min", k))

  /**
   * Bottom-k OVERLAP sketch between two key sets — the join-cardinality /
   * corpus-contamination profiler. Because a KMV sketch is a uniform sample
   * of the hashed key space, the bottom-k of the UNION is itself a KMV
   * sketch, and the fraction of its members present in both input sketches
   * estimates the Jaccard similarity |A∩B| / |A∪B| (Beyer et al., SIGMOD'07
   * "On synopses for distinct-value estimation under multiset operations").
   *
   * Each side is one distinct + bounded-heap aggregate: the distinct stage
   * map-side-dedups and shuffles HASH VALUES only, bounded by the hash
   * modulus (~1M longs = megabytes, regardless of key-set size), and the
   * heap stage shuffles `mappers x k` rows — at 100 TB the key sets
   * themselves never move. The merge is a 1x1 join on two k-element arrays. With [[Sampling
   * .arithHash]] inputs everything is integer arithmetic: the oracle
   * reproduces the sketch contents, the union estimate, and the Jaccard
   * estimate bit-for-bit.
   *
   * Returns one row: (n_a, n_b, inter_k, union_est_micro, jaccard_micro).
   */
  def kmvOverlap(a: DataFrame, hashedA: Column, b: DataFrame, hashedB: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // first+coalesce re-aggregation guarantees exactly ONE row per side
    // even when an input is empty (groupBy over nothing yields no rows,
    // which would make the result frame empty instead of all-zero)
    def oneRow(df: DataFrame, hashed: Column, as: String): DataFrame =
      kmvSketch(df, lit(0), hashed, k)
        .agg(coalesce(first(col("kmv")), array().cast("array<long>")).as(as))
    oneRow(a, hashedA, "ka").crossJoin(oneRow(b, hashedB, "kb")) // 1x1
      .withColumn("mk", slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k))
      .select(
        size(col("ka")).cast("long").as("n_a"),
        size(col("kb")).cast("long").as("n_b"),
        size(array_intersect(array_intersect(col("mk"), col("ka")), col("kb")))
          .cast("long").as("inter_k"),
        size(col("mk")).cast("long").as("n_mk"),
        when(size(col("mk")) >= k, element_at(col("mk"), k)).otherwise(lit(0L)).as("kth"))
      .select(col("n_a"), col("n_b"), col("inter_k"),
        estMicroExpr("n_mk", "kth", k).as("union_est_micro"),
        when(col("n_mk") === 0L, lit(0L))
          .otherwise(expr("(inter_k * 1000000L) div n_mk")).as("jaccard_micro"))
  }

  /** Misra-Gries heavy-hitters aggregate column ([[graft.functions.FreqSketch]]):
    * `array<struct<item, count_lb, count_ub>>`, at most `capacity` entries. */
  def freqSketchAgg(item: Column, capacity: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.FreqSketch(
        org.apache.spark.sql.graft.ColumnBridge.expression(item), capacity)
        .toAggregateExpression())

  /**
   * Per-group heavy hitters: `(g, item, count_lb, count_ub)` — constant
   * executor memory per group regardless of distinct-item cardinality (the
   * `groupBy(item).count()` it replaces is itself the scale hazard when the
   * item space is huge: URLs, n-grams, user ids). Partial sketches are
   * bounded and map-side combined; see [[graft.functions.FreqSketch]] for
   * the exact error-bound contract carried in (count_lb, count_ub).
   */
  def heavyHitters(df: DataFrame, group: Column, item: Column,
      capacity: Int): DataFrame =
    df.groupBy(group.as("g"))
      .agg(freqSketchAgg(item, capacity).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.item").as("item"),
        col("e.count_lb").as("count_lb"), col("e.count_ub").as("count_ub"))

  /**
   * Fixed-width histogram sketch: `(g, bin, cnt)` where
   * `bin = clamp(floor(value) div width, 0, nbins-1)` — ONE map-side-
   * combined hash aggregate over a narrow integer projection, the quantile
   * path that scales where an exact per-group sort ([[expr percentile]])
   * does not: at 100 TB the shuffle carries at most `groups x nbins`
   * counter rows, never the values. Integer binning (floor then integer
   * div) keeps the sketch engine-portable and bit-exact.
   *
   * NULL values are EXCLUDED (they have no bin; a null row would otherwise
   * sort nulls-first into every cumulative count in [[histQuantilesMicro]]
   * and skew each quantile downward — and engines disagree on null
   * ordering). Count nulls separately ([[Profile.profile]]) if needed.
   */
  def histogram(df: DataFrame, group: Column, value: Column,
      width: Long, nbins: Int): DataFrame = {
    require(width > 0 && nbins > 0, s"width/nbins must be positive, got $width/$nbins")
    df.select(group.as("g"), value.as("v"))
      .filter(col("v").isNotNull)
      .select(col("g"),
        expr(s"least(greatest(floor(v), 0L) div ${width}L, ${(nbins - 1).toLong}L)").as("bin"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Quantile UPPER BOUNDS from a [[histogram]]: for each requested quantile
   * `q` (in micro-units, in (0, 1e6]), the upper edge `(bin+1) * width` of
   * the first bin whose cumulative count reaches `q * n` — within one bin
   * width above the exact quantile FOR VALUES INSIDE THE HISTOGRAM DOMAIN
   * `[0, nbins*width)`. Values clamped into the edge bins report the domain
   * cap (`nbins*width`) / floor (`width`) instead of their true magnitude —
   * the standard fixed-histogram contract: size the domain to the data
   * (check the edge-bin mass) or read an edge-bin answer as "at or beyond
   * the cap". The windows here run over the POST-AGGREGATION sketch
   * (`groups x nbins` rows, constant-size), not the data, so the
   * single-reducer-window concern does not apply.
   */
  def histQuantilesMicro(hist: DataFrame, width: Long,
      quantiles: Seq[(String, Long)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, qm) => qm > 0L && qm <= 1000000L },
      s"quantiles must be micro-units in (0, 1000000], got $quantiles")
    val c = hist
      .withColumn("cum", sum(col("cnt")).over(Window.partitionBy("g").orderBy("bin")))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("g")))
    val aggs = quantiles.map { case (name, qm) =>
      min(when(col("cum") * lit(1000000L) >= col("n") * lit(qm),
        (col("bin") + 1) * lit(width))).as(name)
    }
    c.groupBy(col("g"))
      .agg(max(col("n")).as("n"), aggs: _*)
  }

  /**
   * Winsorization (quantile clipping) through the [[histogram]] sketch:
   * clamp `value` into the per-group `[lo, hi]` where lo/hi are the
   * histogram-quantile upper bounds at `loMicro`/`hiMicro`
   * ([[histQuantilesMicro]]'s one-bin-width resolution and domain-cap
   * contract apply) — the outlier-clipping step of a feature pipeline
   * without ever sorting the data: the sketch is one counter-scale
   * aggregate (`groups x nbins` rows), the bounds broadcast back, and the
   * clip is a narrow projection. Appends `clipped`, `lo_bound`,
   * `hi_bound`; null values stay null (no bound substitution); a group
   * whose values are all null gets null bounds and passes values through.
   */
  def winsorize(df: DataFrame, group: Column, value: Column,
      width: Long, nbins: Int, loMicro: Long, hiMicro: Long): DataFrame = {
    require(loMicro > 0L && loMicro <= hiMicro && hiMicro <= 1000000L,
      s"need 0 < loMicro <= hiMicro <= 1e6, got $loMicro/$hiMicro")
    // appended/join columns must not collide with the input's — fail with
    // a targeted message instead of Catalyst's ambiguous-reference error
    // (the same contract Similarity's store writers enforce)
    val reserved = Seq("clipped", "lo_bound", "hi_bound", "__wg")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"winsorize reserves column names ${reserved.mkString(", ")}; " +
        s"input already has ${clash.mkString(", ")} — rename before calling")
    val bounds = histQuantilesMicro(histogram(df, group, value, width, nbins),
        width, Seq("lo_bound" -> loMicro, "hi_bound" -> hiMicro))
      .select(col("g").as("__wg"), col("lo_bound"), col("hi_bound"))
    df.join(broadcast(bounds), group === col("__wg"), "left")
      .withColumn("clipped",
        when(value.isNull, lit(null))
          .otherwise(least(greatest(value, col("lo_bound")), col("hi_bound"))))
      .drop("__wg")
  }
}
