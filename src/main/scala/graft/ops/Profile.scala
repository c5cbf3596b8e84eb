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
 * Numeric domain: |x| < 10^32 (DECIMAL(38,6) headroom); values beyond it
 * overflow the exact accumulator and fail loudly under ANSI rather than
 * profiling wrong.
 *
 * Engine-portable exactness: numeric sums accumulate in DECIMAL(38,6)
 * (order-independent, unlike double summation, so the result is
 * bit-identical under any partitioning or engine) and min/max render
 * through DECIMAL(38,6)/date→string casts that Spark and DuckDB print
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

  /** Render a min/max value engine-portably: numerics via DECIMAL(38,6),
    * everything else via a plain string cast. */
  private def render(c: Column, dt: DataType): Column =
    if (isNumeric(dt)) c.cast(DecimalType(38, 6)).cast("string") else c.cast("string")

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val schema = df.schema
    // one struct of aggregates per column: pure Column construction, no SQL
    // string round-trip, so any legal column name (spaces, quotes, dots)
    // profiles fine
    val perCol: Seq[Column] = cols.map { name =>
      val dt = schema(name).dataType
      // backtick-quote so a dotted name profiles the top-level column it
      // names rather than being parsed as a nested-field path
      val c = col(s"`${name.replace("`", "``")}`")
      struct(
        lit(name).as("column"),
        count(lit(1)).as("n"),
        (count(lit(1)) - count(c)).as("n_null"),
        render(min(c), dt).as("min_s"),
        render(max(c), dt).as("max_s"),
        (if (isNumeric(dt)) sum(c.cast(DecimalType(38, 6))).cast("double")
         else lit(null).cast("double")).as("sum_d"))
    }
    // pivot the 1-row aggregate into one row per column: the explode runs
    // on a single row, so it costs nothing regardless of table size
    df.agg(array(perCol: _*).as("__p"))
      .select(explode(col("__p")).as("e"))
      .select(col("e.column"), col("e.n"), col("e.n_null"),
        col("e.min_s"), col("e.max_s"), col("e.sum_d"))
  }
}
