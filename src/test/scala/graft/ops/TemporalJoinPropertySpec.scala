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
}
