package graft.ops

import scala.util.Random

import graft.SparkSpec

/**
 * Both as-of directions against a brute-force in-memory reference over
 * random keyed streams: few keys and a tiny timestamp domain force heavy
 * key collision, timestamp ties (inclusive-match edge), and no-match rows —
 * the regimes the merge-window formulation must get right.
 */
class TemporalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  /** (key, ts, payload) rows; right unique per (key, ts) by construction. */
  private def gen(rnd: Random, n: Int, unique: Boolean): Seq[(String, Long, Long)] = {
    val raw = Seq.fill(n)((s"k${rnd.nextInt(3)}", rnd.nextInt(20).toLong, rnd.nextLong()))
    if (unique) raw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq else raw
  }

  private def refBackward(
      left: Seq[(String, Long, Long)],
      right: Seq[(String, Long, Long)],
      tol: Option[Long]): Set[(String, Long, Long, Long, Long)] =
    left.flatMap { case (k, lts, lv) =>
      right.filter(r => r._1 == k && r._2 <= lts && tol.forall(t => lts - r._2 <= t))
        .sortBy(_._2).lastOption
        .map { case (_, rts, rv) => (k, lts, lv, rts, rv) }
    }.toSet

  private def refForward(
      left: Seq[(String, Long, Long)],
      right: Seq[(String, Long, Long)],
      tol: Option[Long]): Set[(String, Long, Long, Long, Long)] =
    left.flatMap { case (k, lts, lv) =>
      right.filter(r => r._1 == k && r._2 >= lts && tol.forall(t => r._2 - lts <= t))
        .sortBy(_._2).headOption
        .map { case (_, rts, rv) => (k, lts, lv, rts, rv) }
    }.toSet

  test("both directions match the brute-force reference on random streams") {
    val rnd = new Random(1234)
    for (round <- 0 until 20) {
      val left = gen(rnd, 30, unique = false)
      val right = gen(rnd, 25, unique = true)
      val tol = if (round % 3 == 0) Some(rnd.nextInt(8).toLong) else None
      val l = left.toDF("k", "lts", "lv")
      val r = right.toDF("k", "rts", "rv")
      def run(dir: Boolean) = {
        val out = if (dir) TemporalJoin.asofForward(l, r, Seq("k"), "lts", "rts", tol)
          else TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts", tol)
        out.select("k", "lts", "lv", "rts", "rv")
          .as[(String, Long, Long, Long, Long)].collect().toSet
      }
      assert(run(dir = false) === refBackward(left, right, tol),
        s"backward mismatch, round $round tol $tol")
      assert(run(dir = true) === refForward(left, right, tol),
        s"forward mismatch, round $round tol $tol")
    }
  }

  private def refNearest(
      left: Seq[(String, Long, Long)],
      right: Seq[(String, Long, Long)],
      tol: Option[Long]): Set[(String, Long, Long, Long, Long)] =
    left.flatMap { case (k, lts, lv) =>
      right.filter(r => r._1 == k && tol.forall(t => math.abs(lts - r._2) <= t))
        // min distance, then earlier ts (backward bias on ties)
        .sortBy(r => (math.abs(lts - r._2), r._2)).headOption
        .map { case (_, rts, rv) => (k, lts, lv, rts, rv) }
    }.toSet

  test("nearest direction matches the brute-force argmin on random streams") {
    val rnd = new Random(4321)
    for (round <- 0 until 20) {
      val left = gen(rnd, 30, unique = false)
      val right = gen(rnd, 25, unique = true)
      val tol = if (round % 3 == 0) Some(rnd.nextInt(8).toLong) else None
      val out = TemporalJoin.asofNearest(
          left.toDF("k", "lts", "lv"), right.toDF("k", "rts", "rv"),
          Seq("k"), "lts", "rts", tol)
        .select("k", "lts", "lv", "rts", "rv")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(out === refNearest(left, right, tol),
        s"nearest mismatch, round $round tol $tol")
    }
  }

  test("nearest plans one exchange, two windows, no join operator") {
    val l = Seq(("a", 1L, 1L)).toDF("k", "lts", "lv")
    val r = Seq(("a", 2L, 2L)).toDF("k", "rts", "rv")
    val plan = TemporalJoin.asofNearest(l, r, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length === 2, s"expected 2 windows:\n$plan")
    assert(!plan.contains("Join"), s"nearest must not plan a join:\n$plan")
    assert("(?<!Broadcast)Exchange".r.findAllIn(plan).length === 1,
      s"the two window passes must share one exchange:\n$plan")
  }

  test("time-range-salted as-of equals the unsalted join at every bucket width") {
    val rnd = new Random(5678)
    for (round <- 0 until 8) {
      // dominant key: ~70% of rows on k0 (the salting target), timestamps
      // spanning negative values to stress the truncating `div` bucketing
      def genSkewed(n: Int, unique: Boolean): Seq[(String, Long, Long)] = {
        val raw = Seq.fill(n)((
          if (rnd.nextInt(10) < 7) "k0" else s"k${1 + rnd.nextInt(2)}",
          (rnd.nextInt(60) - 30).toLong, rnd.nextLong()))
        if (unique) raw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq else raw
      }
      val left = genSkewed(60, unique = false)
      val right = genSkewed(40, unique = true)
      val tol = if (round % 2 == 0) Some(rnd.nextInt(10).toLong) else None
      val l = left.toDF("k", "lts", "lv")
      val r = right.toDF("k", "rts", "rv")
      def run(dir: Boolean, width: Option[Long]) = {
        val out = (dir, width) match {
          case (false, None) => TemporalJoin.asofBackward(l, r, Seq("k"), "lts", "rts", tol)
          case (true, None) => TemporalJoin.asofForward(l, r, Seq("k"), "lts", "rts", tol)
          case (false, Some(bw)) =>
            TemporalJoin.asofBackwardSalted(l, r, Seq("k"), "lts", "rts", bw, tol)
          case (true, Some(bw)) =>
            TemporalJoin.asofForwardSalted(l, r, Seq("k"), "lts", "rts", bw, tol)
        }
        out.select("k", "lts", "lv", "rts", "rv")
          .as[(String, Long, Long, Long, Long)].collect().toSet
      }
      for (dir <- Seq(false, true); width <- Seq(1L, 3L, 7L, 1000L)) {
        assert(run(dir, Some(width)) === run(dir, None),
          s"salted(width=$width, dir=${if (dir) "fwd" else "bwd"}) " +
            s"differs from unsalted, round $round tol $tol")
      }
      // and the unsalted side is itself pinned to the brute-force reference
      assert(run(dir = false, None) === refBackward(left, right, tol))
      assert(run(dir = true, None) === refForward(left, right, tol))

      // nearest: salted (dual boundary carry) == unsalted == brute force
      def runNearest(width: Option[Long]) = (width match {
        case None => TemporalJoin.asofNearest(l, r, Seq("k"), "lts", "rts", tol)
        case Some(bw) =>
          TemporalJoin.asofNearestSalted(l, r, Seq("k"), "lts", "rts", bw, tol)
      }).select("k", "lts", "lv", "rts", "rv")
        .as[(String, Long, Long, Long, Long)].collect().toSet
      for (width <- Seq(1L, 3L, 7L, 1000L)) {
        assert(runNearest(Some(width)) === runNearest(None),
          s"salted nearest (width=$width) differs, round $round tol $tol")
      }
      assert(runNearest(None) === refNearest(left, right, tol))
    }
  }

  test("salted as-of spreads a hot key across bucket sub-windows") {
    val l = (0 until 200).map(i => ("hot", i.toLong, i.toLong)).toDF("k", "lts", "lv")
    val r = (0 until 50).map(i => ("hot", (i * 4).toLong, i.toLong)).toDF("k", "rts", "rv")
    val out = TemporalJoin.asofBackwardSalted(l, r, Seq("k"), "lts", "rts", bucketWidth = 25L)
    assert(out.count() === 200)
    // the merge window partitions by (key, bucket), not key alone: the
    // plan's window spec must carry two partition expressions
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition"), plan.take(500))
    val spec = plan.linesIterator.find(_.contains("windowspecdefinition")).get
    assert(spec.contains("__bucket"), spec)
  }
}
