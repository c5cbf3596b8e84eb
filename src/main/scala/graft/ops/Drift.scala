package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution-drift monitoring — the data-quality watchdog every
 * long-running ingestion pipeline needs: per window (day, batch, crawl
 * snapshot), the categorical distribution of a column, and the L1
 * distance between consecutive windows' distributions. A drift spike is
 * the canonical early warning that an upstream source changed (new
 * scraper, schema rot, a dropped partner feed) before it poisons a
 * training mix.
 *
 * Scale shape: ONE map-side-combined count aggregate over the data
 * (shuffle = windows x categories counter rows, never the events);
 * shares, the consecutive-window join, and the distance fold all run on
 * that tiny aggregate. Integer micro-shares (`cnt * 1e6 div total`) keep
 * the whole report engine-exact — drift numbers are hash-pinnable, not
 * float-fuzzy.
 */
object Drift {

  /** Per-window categorical counts and integer micro-shares:
    * `(w, cat, cnt, share_micro)`. The window over the POST-AGGREGATION
    * counts (windows x categories rows) computes totals — not a window
    * over the data. */
  def categoricalShares(df: DataFrame, window: Column, category: Column): DataFrame =
    df.select(window.as("w"), category.as("cat"))
      .groupBy(col("w"), col("cat"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("share_micro",
        expr("cnt * 1000000L div " +
          "(sum(cnt) OVER (PARTITION BY w))"))

  /**
   * L1 drift between each window and its predecessor `w - 1`:
   * `(w, l1_micro)` for every window PRESENT in the data that has a
   * predecessor window present. Categories missing on either side count
   * with share 0 (a category appearing or vanishing IS drift). L1 ranges
   * [0, 2e6] micro-units: 0 = identical distributions, 2e6 = disjoint.
   */
  def l1Drift(shares: DataFrame): DataFrame = {
    val a = shares.select(col("w"), col("cat"), col("share_micro").as("sa"))
    val b = shares.select((col("w") + 1).as("wb"), col("cat").as("catb"),
      col("share_micro").as("sb"))
    val days = shares.select(col("w")).distinct()
    val prevDays = days.select((col("w") + 1).as("w"))
    // cat compares NULL-SAFELY: a null category is a legitimate stable
    // category, not appear+vanish phantom drift every window
    a.join(b, col("w") === col("wb") && (col("cat") <=> col("catb")), "full_outer")
      .select(coalesce(col("w"), col("wb")).as("w"), col("sa"), col("sb"))
      .groupBy(col("w"))
      .agg(sum(abs(coalesce(col("sa"), lit(0L)) - coalesce(col("sb"), lit(0L))))
        .as("l1_micro"))
      // keep only windows that exist AND whose predecessor exists: the
      // full-outer join also manufactures w rows for the first window
      // (nothing to compare against) and for the phantom window after the
      // last (predecessor side only)
      .join(days, Seq("w"), "left_semi")
      .join(prevDays, Seq("w"), "left_semi")
  }

  /**
   * NUMERIC drift: the same consecutive-window L1, over fixed-width
   * histogram bins of a value column ([[Sketches.histogram]] binning:
   * `clamp(floor(v) div width, 0, nbins-1)`, nulls excluded) — detects a
   * value-distribution shift (prices jump, lengths collapse, a sensor
   * saturates) with the identical constant-size plan: one (window, bin)
   * counter aggregate over the data, everything else on the tiny sketch.
   */
  def histL1Drift(df: DataFrame, window: Column, value: Column,
      width: Long, nbins: Int): DataFrame = {
    require(width > 0 && nbins > 0, s"width/nbins must be positive, got $width/$nbins")
    val binned = df.select(window.as("__w"), value.as("v"))
      .filter(col("v").isNotNull)
      .select(col("__w"),
        expr(s"least(greatest(floor(v), 0L) div ${width}L, ${(nbins - 1).toLong}L)").as("bin"))
    l1Drift(categoricalShares(binned, col("__w"), col("bin")))
  }

  /**
   * EMBEDDING drift between two corpus snapshots, per group — the signal
   * the IVF-store contract names for "re-index when the vector
   * distribution drifts" ([[Similarity.appendToIvfStore]]): the exact
   * integer cross-multiplied L1 distance between the groups' mean
   * quantized vectors,
   *   `l1_cross(g) = sum_d | sa_d * n_b - sb_d * n_a |`
   * (the L1 of the mean difference scaled by `n_a * n_b` — division-free,
   * so no rounding anywhere). Output `(g, n_a, n_b, l1_cross)`; a group
   * missing from one side drifts 0 by this metric (its other side's mean
   * times n=0) and still appears, so side-only groups are visible.
   *
   * Exactness chain: int8 quantization ([[Similarity.quantizeI8]], SQL-
   * replayable floor/clamp) -> element sums in double
   * ([[Similarity.vectorSumAgg]] — int8 values are integer-valued, so the
   * double accumulation is exact below 2^53, i.e. to ~7e13 rows/group) ->
   * BigInt cross-products driver-side. The per-side aggregate is ONE pass
   * folding each vector into a dim-sized buffer; only `groups x dim`
   * sums reach the driver (the same counter-scale collect as the k-means
   * centroids). Result must fit a long — loud failure otherwise.
   */
  def vectorDriftI8(a: DataFrame, b: DataFrame, group: Column, vec: Column,
      scale: Int): DataFrame = {
    // null vectors are excluded on BOTH legs of the ratio: vectorSumAgg
    // skips them, so counting them in n would silently shrink the mean
    // (the same hazard ivfCentroids filters at its collect). Null GROUPS
    // are excluded too: a null label would surface as a null String key
    // and break the driver-side sorted merge of the two key sets.
    def side(df: DataFrame): Map[String, (IndexedSeq[Long], Long)] =
      df.filter(vec.isNotNull && group.isNotNull)
        .select(group.cast("string").as("g"),
          Similarity.quantizeI8(vec, scale).cast("array<float>").as("q"))
        .groupBy(col("g"))
        .agg(Similarity.vectorSumAgg(col("q")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getSeq[Double](1).map(_.toLong).toIndexedSeq, r.getLong(2))))
        .toMap
    val sa = side(a)
    val sb = side(b)
    val rows = (sa.keySet ++ sb.keySet).toSeq.sorted.map { g =>
      val (va, na) = sa.getOrElse(g, (IndexedSeq.empty[Long], 0L))
      val (vb, nb) = sb.getOrElse(g, (IndexedSeq.empty[Long], 0L))
      val dim = math.max(va.length, vb.length)
      val l1 = (0 until dim).map { d =>
        (BigInt(va.applyOrElse(d, (_: Int) => 0L)) * nb -
          BigInt(vb.applyOrElse(d, (_: Int) => 0L)) * na).abs
      }.sum
      require(l1.isValidLong,
        s"l1_cross for group '$g' exceeds Long range; compare means directly " +
          "at this population size")
      (g, na, nb, l1.toLong)
    }
    val spark = a.sparkSession
    import spark.implicits._
    rows.toDF("g", "n_a", "n_b", "l1_cross")
  }
}
