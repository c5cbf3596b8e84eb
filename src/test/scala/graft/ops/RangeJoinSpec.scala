package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private def points: DataFrame =
    Seq((1L, 0L), (2L, 10L), (3L, 15L), (4L, 99L), (5L, 100L), (6L, -7L))
      .toDF("p_id", "p")

  private def intervals: DataFrame =
    Seq(
      (10L, 0L, 10L),    // spans bins 0..1 at width 10
      (11L, 10L, 10L),   // degenerate single-point interval
      (12L, -20L, 200L), // spans everything incl. negative domain
      (13L, 16L, 98L),   // contains nothing
      (14L, 50L, 40L),   // reversed: matches nothing
      (15L, 5L, 15L)
    ).toDF("iv_id", "s", "e")

  /** Ground truth by brute force (the quadratic plan this op replaces). */
  private def naive: Set[(Long, Long)] =
    points.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet

  test("binned equi-join equals the naive non-equi join, each pair once") {
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("p_id", "iv_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === naive, s"wrong pairs at binWidth=$w")
    }
  }

  test("null endpoints match nothing (BETWEEN semantics)") {
    val iv = Seq((1L, Some(0L), Option.empty[Long]), (2L, Option.empty[Long], Some(10L)))
      .toDF("iv_id", "s", "e")
    assert(RangeJoin.pointInInterval(points, "p", iv, "s", "e", 10L).count() === 0)
  }

  test("all columns of both inputs survive") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 10L)
    assert(out.columns.sorted === Array("e", "iv_id", "p", "p_id", "s"))
  }

  test("a user column named __bin survives untouched") {
    val p2 = points.withColumn("__bin", col("p_id") * 100)
    val out = RangeJoin.pointInInterval(p2, "p", intervals, "s", "e", 10L)
    assert(out.columns.contains("__bin"))
    assert(out.select("p_id", "__bin").as[(Long, Long)].collect()
      .forall { case (id, b) => b == id * 100 })
    assert(out.select("p_id", "iv_id").as[(Long, Long)].collect().toSet === naive)
  }

  private def ivsA: DataFrame =
    Seq((1L, 0L, 10L), (2L, 5L, 25L), (3L, 40L, 45L), (4L, -30L, -10L))
      .toDF("a_id", "a_s", "a_e")

  private def ivsB: DataFrame =
    Seq((10L, 8L, 12L), (11L, 26L, 39L), (12L, -15L, 2L), (13L, 50L, 40L))
      .toDF("b_id", "b_s", "b_e")

  test("interval overlap equals the naive non-equi join, each pair once") {
    val naiveOverlap = ivsA.join(ivsB,
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(naiveOverlap.nonEmpty) // the fixture must actually overlap
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.intervalOverlap(ivsA, "a_s", "a_e", ivsB, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === naiveOverlap, s"wrong pairs at binWidth=$w")
    }
  }

  test("interval overlap matches the naive join on random interval sets") {
    val rnd = new scala.util.Random(99)
    for (round <- 0 until 10) {
      // small domain incl. negatives forces boundary hits and bin straddling
      def gen(n: Int, ids: Range) = ids.take(n).map { i =>
        val s = rnd.nextInt(60) - 30L
        (i.toLong, s, s + rnd.nextInt(15))
      }
      val ga = gen(12, 0 until 12).toDF("a_id", "a_s", "a_e")
      val gb = gen(12, 100 until 112).toDF("b_id", "b_s", "b_e")
      val naive = ga.join(gb, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val w = Seq(1L, 4L, 9L)(round % 3)
      val got = RangeJoin.intervalOverlap(ga, "a_s", "a_e", gb, "b_s", "b_e", w)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"dup pairs round $round w=$w")
      assert(got.toSet === naive, s"mismatch round $round w=$w")
    }
  }

  test("interval overlap drops invalid intervals and keeps all columns") {
    val out = RangeJoin.intervalOverlap(ivsA, "a_s", "a_e", ivsB, "b_s", "b_e", 5L)
    assert(out.columns.sorted === Array("a_e", "a_id", "a_s", "b_e", "b_id", "b_s"))
    // b 13 is reversed: participates in nothing even though a 3 overlaps [40,50]
    assert(out.filter(col("b_id") === 13L).count() === 0)
  }

  test("colliding column names across inputs are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(
        points.withColumnRenamed("p_id", "iv_id"), "p", intervals, "s", "e", 10L)
    }
  }

  test("interval overlapping more bins than the cap fails with a named dial") {
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
        binWidth = 1L, maxBinsPerInterval = 4L).count()
    }
    assert(causeMessages(e).contains("binWidth"))
  }

  test("a near-full-domain span still fails with the named dial, not ANSI overflow") {
    val iv = Seq((1L, Long.MinValue + 10L, Long.MaxValue - 10L)).toDF("iv_id", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", iv, "s", "e", binWidth = 1L).count()
    }
    assert(causeMessages(e).contains("binWidth"),
      s"expected the range-join cap message, got: ${causeMessages(e).take(300)}")
  }

  test("working-column collision detection is case-insensitive like Spark resolution") {
    val p2 = points.withColumn("__Bin", col("p_id") * 100)
    val out = RangeJoin.pointInInterval(p2, "p", intervals, "s", "e", 10L)
    assert(out.columns.contains("__Bin"))
    assert(out.select("p_id", "__Bin").as[(Long, Long)].collect()
      .forall { case (id, b) => b == id * 100 })
  }
}
