package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  // trades (left): want the prevailing quote at-or-before each trade
  private def trades: DataFrame =
    Seq(
      ("A", 10L, 100),
      ("A", 20L, 200),
      ("A", 25L, 250), // between quotes: matches the 20 quote
      ("B", 10L, 999), // before B's first quote: dropped (inner)
      ("B", 50L, 500)
    ).toDF("sym", "t_ts", "qty")

  private def quotes: DataFrame =
    Seq(
      ("A", 10L, 1.0), // equal-ts: INCLUSIVE match for trade ("A", 10)
      ("A", 20L, 2.0),
      ("B", 30L, 3.0)
    ).toDF("sym", "q_ts", "px")

  test("backward as-of: latest right row at-or-before, inclusive, inner") {
    val out = TemporalJoin.asofBackward(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select("sym", "t_ts", "qty", "q_ts", "px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(out === Set(
      ("A", 10L, 100, 10L, 1.0), // equal timestamp matches
      ("A", 20L, 200, 20L, 2.0),
      ("A", 25L, 250, 20L, 2.0), // carries latest, not first
      ("B", 50L, 500, 30L, 3.0)
      // ("B", 10) has no quote at-or-before: dropped
    ))
  }

  test("tolerance drops matches older than left.ts - tolerance, boundary kept") {
    val out = TemporalJoin.asofBackward(
      trades, quotes, Seq("sym"), "t_ts", "q_ts", tolerance = Some(5L))
      .select("sym", "t_ts").as[(String, Long)].collect().toSet
    // ("A",25) matched the 20 quote: gap 5 == tolerance => kept
    // ("B",50) matched the 30 quote: gap 20 > 5 => dropped
    assert(out === Set(("A", 10L), ("A", 20L), ("A", 25L)))
  }

  test("tolerance gap that overflows Long drops the row instead of throwing") {
    val l = Seq(("k", Long.MaxValue, 1)).toDF("k", "lts", "lv")
    val r = Seq(("k", -10L, 2.0)).toDF("k", "rts", "rv")
    // gap = MaxValue - (-10) overflows; the row is certainly out of any
    // tolerance, so it must be DROPPED (ANSI subtraction would throw here)
    val out = TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts", Some(100L))
    assert(out.count() === 0)
    // sanity: same shape in-range still matches
    val l2 = Seq(("k", Long.MinValue + 5, 1)).toDF("k", "lts", "lv")
    val r2 = Seq(("k", Long.MinValue, 2.0)).toDF("k", "rts", "rv")
    assert(TemporalJoin.asofBackward(l2, r2, Seq("k"), "lts", "rts", Some(5L)).count() === 1)
  }

  test("int timestamps whose gap overflows int still match within a long tolerance") {
    // int epoch-second columns: true gap 4e9 fits a long tolerance but
    // overflows int-width subtraction — the gap must be computed at long
    // width, or these in-tolerance rows silently vanish
    val l = Seq(("k", 2000000000, 1)).toDF("k", "lts", "lv")
    val r = Seq(("k", -2000000000, 2.0)).toDF("k", "rts", "rv")
    val tol = Some(5000000000L)
    assert(TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts", tol).count() === 1)
    assert(TemporalJoin.asofForward(r.toDF("k", "lts", "lv2"),
      l.toDF("k", "rts", "rv2"), Seq("k"), "lts", "rts", tol).count() === 1)
    val near = TemporalJoin.asofNearest(l, r, Seq("k"), "lts", "rts", tol)
    assert(near.count() === 1)
    // and the nearest pick itself must compare int candidates at long width:
    // candidates at -2e9 (gap 4e9, overflows int) and 2100000000 (gap 1e8)
    val r2 = Seq(("k", -2000000000, 2.0), ("k", 2100000000L.toInt, 3.0))
      .toDF("k", "rts", "rv")
    val picked = TemporalJoin.asofNearest(l, r2, Seq("k"), "lts", "rts")
      .select("rv").as[Double].collect()
    assert(picked.toSeq === Seq(3.0))
  }

  test("null timestamps match nothing on either side (ASOF drop semantics)") {
    val l = Seq(("A", Some(10L), 1), ("A", Option.empty[Long], 2)).toDF("k", "lts", "lv")
    val r = Seq(("A", Some(5L), 1.0), ("A", Option.empty[Long], 9.9)).toDF("k", "rts", "rv")
    val out = TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts")
      .select("lv", "rv").as[(Int, Double)].collect().toSet
    // the null-ts right row must NOT be carried onto anything, and the
    // null-ts left row must not match
    assert(out === Set((1, 1.0)))
    // a left row BEFORE any real right row is dropped even when a null-ts
    // right row exists (nulls would otherwise sort first and "match")
    val l2 = Seq(("A", 3L, 1)).toDF("k", "lts", "lv")
    assert(TemporalJoin.asofBackward(l2, r, Seq("k"), "lts", "rts").count() === 0)
  }

  test("null equi-keys match nothing on either side (SQL join equality)") {
    val l = Seq((Some("A"), 10L, 1), (Option.empty[String], 10L, 2)).toDF("k", "lts", "lv")
    val r = Seq((Some("A"), 5L, 1.0), (Option.empty[String], 5L, 9.9)).toDF("k", "rts", "rv")
    for (dir <- Seq(false, true)) {
      val out = if (dir) TemporalJoin.asofForward(
          l, r.withColumn("rts", col("rts") + 10L), Seq("k"), "lts", "rts")
        else TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts")
      val rows = out.select("lv", "rv").as[(Int, Double)].collect().toSet
      assert(rows === Set((1, 1.0)), s"forward=$dir: null keys must not match")
    }
  }

  test("a join key named like a working column survives") {
    val l = Seq(("A", 10L, 1)).toDF("__m", "lts", "lv")
    val r = Seq(("A", 5L, 2.0)).toDF("__m", "rts", "rv")
    val out = TemporalJoin.asofBackward(l, r, Seq("__m"), "lts", "rts")
    assert(out.columns.toSet === Set("__m", "lts", "lv", "rts", "rv"))
    assert(out.select("__m").as[String].head() === "A")
  }

  test("forward as-of: earliest right row at-or-after, inclusive, inner") {
    val out = TemporalJoin.asofForward(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select("sym", "t_ts", "q_ts", "px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(out === Set(
      ("A", 10L, 10L, 1.0), // equal timestamp matches (inclusive)
      ("A", 20L, 20L, 2.0),
      ("B", 10L, 30L, 3.0)
      // ("A", 25) and ("B", 50) have no quote at-or-after: dropped
    ))
  }

  test("forward tolerance drops matches later than left.ts + tolerance") {
    val out = TemporalJoin.asofForward(
      trades, quotes, Seq("sym"), "t_ts", "q_ts", tolerance = Some(5L))
      .select("sym", "t_ts").as[(String, Long)].collect().toSet
    // ("B",10) -> quote at 30: gap 20 > 5 => dropped
    assert(out === Set(("A", 10L), ("A", 20L)))
  }

  test("forward tolerance gap that overflows Long drops the row") {
    val l = Seq(("k", Long.MinValue, 1)).toDF("k", "lts", "lv")
    val r = Seq(("k", 10L, 2.0)).toDF("k", "rts", "rv")
    assert(TemporalJoin.asofForward(l, r, Seq("k"), "lts", "rts", Some(100L)).count() === 0)
  }

  test("forward: null timestamps match nothing on either side") {
    val l = Seq(("A", Some(10L), 1), ("A", Option.empty[Long], 2)).toDF("k", "lts", "lv")
    val r = Seq(("A", Some(20L), 1.0), ("A", Option.empty[Long], 9.9)).toDF("k", "rts", "rv")
    val out = TemporalJoin.asofForward(l, r, Seq("k"), "lts", "rts")
      .select("lv", "rv").as[(Int, Double)].collect().toSet
    assert(out === Set((1, 1.0)))
    // a left row AFTER every real right row must not "match" the null-ts row
    val l2 = Seq(("A", 30L, 1)).toDF("k", "lts", "lv")
    assert(TemporalJoin.asofForward(l2, r, Seq("k"), "lts", "rts").count() === 0)
  }

  test("empty left payload (key + timestamp only) works in both directions") {
    val l = Seq(("A", 10L), ("A", 25L)).toDF("k", "lts")
    val r = Seq(("A", 5L, 1.0), ("A", 20L, 2.0)).toDF("k", "rts", "rv")
    val back = TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts")
      .select("lts", "rv").as[(Long, Double)].collect().toSet
    assert(back === Set((10L, 1.0), (25L, 2.0)))
    val fwd = TemporalJoin.asofForward(l, r, Seq("k"), "lts", "rts")
      .select("lts", "rv").as[(Long, Double)].collect().toSet
    assert(fwd === Set((10L, 2.0)))
  }

  test("forward mirrors backward under time negation") {
    // structural check that the descending-order formulation IS forward:
    // forward(t) == backward(-t) on negation-safe timestamps
    val l = trades.withColumn("t_ts", -col("t_ts"))
    val r = quotes.withColumn("q_ts", -col("q_ts"))
    val viaBackward = TemporalJoin.asofBackward(l, r, Seq("sym"), "t_ts", "q_ts")
      .select(col("sym"), (-col("t_ts")).as("t_ts"), (-col("q_ts")).as("q_ts"))
      .as[(String, Long, Long)].collect().toSet
    val direct = TemporalJoin.asofForward(trades, quotes, Seq("sym"), "t_ts", "q_ts")
      .select("sym", "t_ts", "q_ts").as[(String, Long, Long)].collect().toSet
    assert(direct === viaBackward)
  }

  test("identical timestamp column names are rejected, not silently duplicated") {
    val l = Seq(("k", 1L, 1)).toDF("k", "ts", "lv")
    val r = Seq(("k", 1L, 2.0)).toDF("k", "ts", "rv")
    val e = intercept[IllegalArgumentException] {
      TemporalJoin.asofBackward(l, r, Seq("k"), "ts", "ts")
    }
    assert(e.getMessage.contains("ts"))
  }

  test("payload column colliding with the other side's timestamp is rejected") {
    val l = Seq(("k", 1L, 1)).toDF("k", "lts", "rts") // payload 'rts' collides
    val r = Seq(("k", 1L, 2.0)).toDF("k", "rts", "rv")
    intercept[IllegalArgumentException] {
      TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts")
    }
  }

  test("tolerance on non-integral timestamps is rejected eagerly") {
    val l = Seq(("k", 1.5, 1)).toDF("k", "lts", "lv")
    val r = Seq(("k", 1.0, 2.0)).toDF("k", "rts", "rv")
    intercept[IllegalArgumentException] {
      TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts", Some(1L))
    }
  }
}
