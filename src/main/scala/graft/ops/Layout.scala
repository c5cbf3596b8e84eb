package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton curve) data layout for multi-dimensional data skipping.
 *
 * A table sorted by one column gives parquet min/max stats that prune
 * scans filtered on THAT column only; a filter on any other column reads
 * every file. Interleaving the bits of two columns into one z-value and
 * range-partition-sorting by it clusters rows so BOTH columns' min/max
 * ranges are tight in every file — point/range filters on either prune
 * most files. This is the layout half of the skipping story whose read
 * half is the metadata engine: [[graft.meta.MetaPrune]] consumes exactly
 * the footer stats this write tightens (the reference explorer exposes
 * those stats read-only — reference:
 * src/main/scala/com/github/sadikovi/metadata/MetadataLevel.scala
 * statistics struct; it has no layout writer).
 *
 * The z-value is pure bit arithmetic on builtin codegen'd expressions
 * (shift/and/or — no UDF, no custom Expression needed), and the write is
 * `repartitionByRange(zval) + sortWithinPartitions(zval)`: one range
 * shuffle, embarrassingly parallel within partitions, any output file
 * count. At 100 TB the range exchange is the same one any global-sort
 * write pays; nothing about the construction is scale-bound.
 */
object Layout {

  /** Canonical 2-D Morton bit-spread steps: after masking to 31 bits,
    * each (shift, mask) round doubles the gap until bit i sits at bit 2i.
    * (private[graft]: the SQL registration re-roots the same tree at
    * catalyst Expression level.) */
  private[graft] val steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread of the low 31 bits of `c`: bit i -> bit 2i (even positions). */
  private def spread(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /**
   * 2-D Morton value of two non-negative integral columns: bits of `a` on
   * even positions, bits of `b` on odd. The low 31 bits of each column
   * participate (mask/rank/bucket wider domains first); the result stays
   * below bit 63, no sign issues. Deterministic, engine-portable integer
   * arithmetic — the DuckDB oracle replays it verbatim via [[zvalue2Sql]].
   */
  def zvalue2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** The same spread as unrolled SQL over expression `e` — shared with the
    * DuckDB oracle so both engines evaluate literally identical math. */
  def spreadSql(e: String): String = {
    val seed = s"(CAST($e AS BIGINT) & 2147483647)"
    steps.foldLeft(seed) { case (x, (s, m)) =>
      s"((($x | ($x << $s)) & $m))"
    }
  }

  /** Unrolled SQL mirror of [[zvalue2]]. */
  def zvalue2Sql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /**
   * Rewrite `df` into `path` as parquet clustered by the z-order of the
   * two given columns across `numFiles` range partitions. The payoff is
   * measured by reading the written footers' min/max stats (LayoutSpec:
   * per-file ranges of BOTH columns tighten vs. the natural layout, which
   * is what file-level pruning consumes). Values must be non-null and in
   * [0, 2^31) — anything else fails the write loudly rather than silently
   * degrading the clustering.
   */
  def writeZOrdered(
      df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    // zvalue2 only interleaves the low 31 bits; a value outside [0, 2^31)
    // (epoch-millis timestamps, negatives) would wrap silently and destroy
    // the monotonicity the clustering depends on — fail loudly instead and
    // point at the fix (rank/bucket the column into the domain first).
    // Nulls fail too (they have no z-order position; coalesce them to a
    // sentinel first if they are expected) — via coalesce in the MESSAGE as
    // well, since concat is null-intolerant and would otherwise raise with
    // a null message that names neither the operator nor the column.
    def inDomain(c: String): Column =
      when(col(c).isNull || col(c).cast("long") < 0 ||
          col(c).cast("long") > 0x7FFFFFFFL,
        raise_error(concat(
          lit(s"z-order: column '$c' value "),
          coalesce(col(c).cast("string"), lit("NULL")),
          lit(" outside [0, 2^31); rank or bucket it into the domain first"))))
        .otherwise(col(c))
    val z = RangeJoin.freshName("__z", df.columns.toSet)
    df.withColumn(z, zvalue2(inDomain(colA), inDomain(colB)))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
      .write.mode("overwrite").parquet(path)
  }
}
