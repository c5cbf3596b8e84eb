package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * One-pass table profiling — the first query anyone runs against a new
 * 100 TB table: per-column row/null counts, min/max, and exact sums.
 *
 * The whole profile is ONE aggregate over ONE scan: every per-column
 * statistic is map-side combinable, the shuffle carries a single partial
 * row per mapper, and the per-column pivot happens on the 1-row result
 * (a driver-side `stack`, free). Profiling N columns costs the same scan
 * as profiling one — never N passes.
 *
 * Engine-portable exactness: numeric sums accumulate in DECIMAL(28,6)
 * (order-independent, unlike double summation, so the result is
 * bit-identical under any partitioning or engine) and min/max render
 * through DECIMAL(28,6)/date→string casts that Spark and DuckDB print
 * identically — the gate hash-pins the full profile.
 *
 * Output: (column, n, n_null, min_s, max_s, sum_d) — min/max as strings
 * (uniform schema across numeric/string/date columns), sum as the double
 * cast of the exact decimal (null for non-numerics).
 */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Render a min/max value engine-portably: numerics via DECIMAL(28,6),
    * everything else via a plain string cast. */
  private def render(c: Column, dt: DataType): Column =
    if (isNumeric(dt)) c.cast(DecimalType(28, 6)).cast("string") else c.cast("string")

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val schema = df.schema
    val aggs: Seq[Column] = cols.flatMap { name =>
      val dt = schema(name).dataType
      val c = col(name)
      Seq(
        count(lit(1)).as(s"__n_$name"),
        (count(lit(1)) - count(c)).as(s"__nulls_$name"),
        render(min(c), dt).as(s"__min_$name"),
        render(max(c), dt).as(s"__max_$name"),
        (if (isNumeric(dt)) sum(c.cast(DecimalType(28, 6))).cast("double")
         else lit(null).cast("double")).as(s"__sum_$name"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the 1-row aggregate into one row per column: stack is evaluated
    // on a single row, so this costs nothing regardless of table size
    val stackArgs = cols.map { name =>
      s"'$name', __n_$name, __nulls_$name, __min_$name, __max_$name, __sum_$name"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.length}, $stackArgs) AS (column, n, n_null, min_s, max_s, sum_d)"))
  }
}
