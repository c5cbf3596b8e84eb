package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical consecutive distributions have zero drift") {
    val df = Seq((0L, "a"), (0L, "a"), (0L, "b"), (1L, "a"), (1L, "a"), (1L, "b"))
      .toDF("w", "cat")
    val out = Drift.l1Drift(Drift.categoricalShares(df, col("w"), col("cat")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L))
  }

  test("disjoint consecutive distributions have maximal drift 2e6") {
    val df = Seq((0L, "a"), (0L, "a"), (1L, "b"), (1L, "c"))
      .toDF("w", "cat")
    val out = Drift.l1Drift(Drift.categoricalShares(df, col("w"), col("cat")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2000000L))
  }

  test("partial shift computes the exact integer L1 and skips gap windows") {
    // day 0: a=3/4, b=1/4; day 1: a=1/4, b=3/4 -> L1 = 2 * 500000 = 1e6.
    // day 3 exists but day 2 does not: no drift row for 3 (and none for 2).
    val df = Seq(
      (0L, "a"), (0L, "a"), (0L, "a"), (0L, "b"),
      (1L, "a"), (1L, "b"), (1L, "b"), (1L, "b"),
      (3L, "a"))
      .toDF("w", "cat")
    val out = Drift.l1Drift(Drift.categoricalShares(df, col("w"), col("cat")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1000000L))
  }

  test("a stable null category contributes zero drift (null-safe matching)") {
    val df = Seq[(Long, String)]((0L, null), (0L, "a"), (1L, null), (1L, "a"))
      .toDF("w", "cat")
    val out = Drift.l1Drift(Drift.categoricalShares(df, col("w"), col("cat")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L))
  }

  test("histL1Drift detects a shifted numeric distribution and ignores a stable one") {
    // window 0 and 1: same values -> zero drift; window 2: all mass moves
    // two bins up -> maximal drift
    val df = Seq((0L, 5.0), (0L, 15.0), (1L, 5.0), (1L, 15.0), (2L, 25.0), (2L, 35.0))
      .toDF("w", "v")
    val out = Drift.histL1Drift(df, col("w"), col("v"), width = 10L, nbins = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 2000000L))
  }

  test("shares are integer micro-units that sum to <= 1e6 per window") {
    val df = Seq((0L, "a"), (0L, "b"), (0L, "c")).toDF("w", "cat")
    val shares = Drift.categoricalShares(df, col("w"), col("cat"))
      .collect().map(_.getAs[Long]("share_micro"))
    assert(shares.forall(_ === 333333L)) // 1000000 div 3, integer division
  }

  test("vector drift is zero for identical snapshots, exact for a planted shift") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // group "same": identical vectors both sides -> l1_cross 0
    // group "shifted": side A all (1.0, 0.0), side B all (0.0, 1.0)
    //   quantized at 64: A sums (2*64, 0), B sums (3*0, 3*64)
    //   l1 = |128*3 - 0*2| + |0*3 - 192*2| = 384 + 384 = 768
    val a = Seq(
      ("same", Array(0.5f, 0.5f)), ("same", Array(0.25f, 0.75f)),
      ("shifted", Array(1.0f, 0.0f)), ("shifted", Array(1.0f, 0.0f)))
      .toDF("g0", "v")
    val b = Seq(
      ("same", Array(0.5f, 0.5f)), ("same", Array(0.25f, 0.75f)),
      ("shifted", Array(0.0f, 1.0f)), ("shifted", Array(0.0f, 1.0f)),
      ("shifted", Array(0.0f, 1.0f)))
      .toDF("g0", "v")
    val out = Drift.vectorDriftI8(a, b, col("g0"), col("v"), scale = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("same") === ((2L, 2L, 0L)))
    assert(out("shifted") === ((2L, 3L, 768L)))
  }

  test("vector drift reports side-only groups with zero cross-metric") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = Seq(("only_a", Array(1.0f, 0.0f))).toDF("g0", "v")
    val b = Seq(("only_b", Array(0.0f, 1.0f))).toDF("g0", "v")
    val out = Drift.vectorDriftI8(a, b, col("g0"), col("v"), scale = 64)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map("only_a" -> ((1L, 0L, 0L)), "only_b" -> ((0L, 1L, 0L))))
  }
}
