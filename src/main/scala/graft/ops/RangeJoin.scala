package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Range (interval-containment) join: pair every point with every interval
 * that contains it, WITHOUT an equi-key. The declarative formulation
 * (`p BETWEEN s AND e` with no equality conjunct) gives Catalyst nothing
 * to hash on, so it plans a broadcast-nested-loop / cartesian — quadratic
 * and the canonical non-equi scale-killer.
 *
 * This operator manufactures the missing equi-key by BINNING the domain:
 * each interval replicates onto every fixed-width bin it overlaps
 * (`sequence(s div w, e div w)`), each point keys by its own bin
 * (`p div w`), and a plain hash equi-join on the bin id plus the exact
 * `BETWEEN` residual filter recovers precisely the true pairs.
 *
 * Each qualifying (point, interval) pair is emitted EXACTLY once with no
 * dedup pass: the pair can only meet in the point's own bin, and
 * containment implies the interval covers that bin
 * (`s <= p <= e  =>  s div w <= p div w <= e div w`).
 *
 * Cost at scale: points shuffle once (one bin row each); intervals
 * shuffle `span/w + 1` rows each — `w` dials replication against
 * per-bin join fan-in. Skewed bins (rush-hour timestamps) respond to the
 * standard salting pattern ([[Skew.saltedJoin]]) since this is a plain
 * equi-join underneath. The reference engine has no join operators at all
 * (delegates to its host; reference: src/main/scala/com/github/sadikovi/
 * metadata/DefaultSource.scala), and Spark has no native range join — a
 * composed operator per the extension contract.
 */
object RangeJoin {

  /**
   * Join `points` to `intervals` on `startCol <= pointCol <= endCol`
   * (inclusive both ends). All columns of both inputs survive; non-key
   * column names must not collide. Intervals with `end < start` or a null
   * endpoint match nothing (dropped, mirroring `BETWEEN` semantics — and
   * guarding Spark's `sequence`, which COUNTS DOWN on a reversed range
   * instead of returning empty). Domain columns must be integral (`div`
   * bin arithmetic is exact); both engines' truncating division agrees on
   * the non-negative domain and on negatives alike (Spark `div` == Java
   * long division == DuckDB `//` toward zero).
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    // case-insensitive: Spark's default resolution would make "P_ID" vs
    // "p_id" ambiguous downstream even though the exact strings differ
    val collisions = points.columns.map(_.toLowerCase).toSet
      .intersect(intervals.columns.map(_.toLowerCase).toSet)
    require(collisions.isEmpty,
      s"range join: colliding column names ${collisions.mkString(", ")}")
    // the working column must not shadow (and silently destroy) a real one
    val bin = freshName("__bin", points.columns.toSet ++ intervals.columns)
    val iv = binExplode(intervals, startCol, endCol, bin,
      binWidth, maxBinsPerInterval, "range join")
    val p = points
      .filter(col(pointCol).isNotNull)
      .withColumn(bin, binOf(pointCol, binWidth))
    p.join(iv, Seq(bin))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bin)
  }

  /**
   * Interval-overlap join: pair every `a` interval with every `b` interval
   * it overlaps (`a.start <= b.end AND b.start <= a.end`, inclusive), with
   * no equi-key — the session-vs-outage / span-vs-span shape. Both sides
   * replicate onto their overlapped bins and hash-join on the bin id; a
   * pair that shares several bins is emitted EXACTLY once with no dedup
   * pass, by keeping only the join row in the FIRST bin both intervals
   * cover (`bin == greatest(binOf(a.start), binOf(b.start))` — overlap
   * guarantees both cover that bin, so exactly one surviving row exists).
   * Invalid intervals (null endpoint or end < start) match nothing; the
   * same bins-per-interval cap as [[pointInInterval]] applies to both
   * sides.
   */
  def intervalOverlap(
      a: DataFrame,
      aStart: String,
      aEnd: String,
      b: DataFrame,
      bStart: String,
      bEnd: String,
      binWidth: Long,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val collisions = a.columns.map(_.toLowerCase).toSet
      .intersect(b.columns.map(_.toLowerCase).toSet)
    require(collisions.isEmpty,
      s"interval join: colliding column names ${collisions.mkString(", ")}")
    val taken = a.columns.toSet ++ b.columns
    val binA = freshName("__bin_a", taken)
    val binB = freshName("__bin_b", taken)

    binExplode(a, aStart, aEnd, binA, binWidth, maxBinsPerInterval, "interval join")
      .join(binExplode(b, bStart, bEnd, binB, binWidth, maxBinsPerInterval, "interval join"),
        col(binA) === col(binB))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col(binA) === greatest(binOf(aStart, binWidth), binOf(bStart, binWidth)))
      .drop(binA, binB)
  }

  /** Exact integral bin id: `c div w` (floor in doubles silently loses
    * precision above 2^53 — nanosecond epochs live there). */
  private def binOf(c: String, binWidth: Long) =
    expr(s"CAST(`$c` AS BIGINT) div CAST($binWidth AS BIGINT)")

  /**
   * Valid intervals of `df` exploded onto every bin they overlap, as
   * working column `out`. Null endpoints and reversed intervals are
   * dropped (BETWEEN semantics — and Spark's `sequence` COUNTS DOWN on a
   * reversed range instead of returning empty). A span/binWidth ratio
   * past the cap fails with an operator-specific message naming the dial
   * — not the opaque array-length/OOM failure `sequence` would raise —
   * and the guard arithmetic itself cannot ANSI-overflow (a
   * near-full-domain span at binWidth=1 does): try_subtract nulls on
   * overflow, and an unrepresentable span is certainly over any cap.
   */
  private def binExplode(
      df: DataFrame, startCol: String, endCol: String, out: String,
      binWidth: Long, maxBinsPerInterval: Long, label: String): DataFrame = {
    val span = try_subtract(binOf(endCol, binWidth), binOf(startCol, binWidth))
    val bins = when(span.isNull || span > lit(maxBinsPerInterval - 1L),
      raise_error(concat(
        lit(s"$label: an interval overlaps "),
        coalesce(try_add(span, lit(1L)).cast("string"), lit("> 2^63")),
        lit(s" bins (cap $maxBinsPerInterval); increase binWidth or raise maxBinsPerInterval"))))
      .otherwise(sequence(binOf(startCol, binWidth), binOf(endCol, binWidth)))
    df.filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(startCol) <= col(endCol))
      .withColumn(out, explode(bins))
  }

  /** A column name not present in `taken` (appends a numeric suffix).
    * Comparison is case-insensitive: Spark resolves column references
    * case-insensitively by default, so `withColumn("__bin", ...)` would
    * silently REPLACE a user column named `__Bin`. */
  private[graft] def freshName(base: String, taken: Set[String]): String = {
    val lower = taken.map(_.toLowerCase)
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !lower(n.toLowerCase)).get
  }
}
