package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FreqBuffer
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the Misra-Gries buffer: for ARBITRARY streams,
  * splits, and merge orders, the certified bounds must bracket the true
  * counts, the tracked error must respect the n/(capacity+1) bound, and
  * every guaranteed-heavy item must survive — the invariants the
  * distributed aggregate's output contract rests on. */
class FreqSketchPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // small alphabet => heavy collisions and frequent evictions
  private val genStream: Gen[List[String]] =
    Gen.listOf(Gen.chooseNum(0, 30).map(i => s"w$i"))

  private def feed(items: Seq[String], cap: Int): FreqBuffer = {
    val b = new FreqBuffer(cap)
    items.foreach(s => b.add(UTF8String.fromString(s), 1L))
    b
  }

  private def sound(b: FreqBuffer, truth: Map[String, Long], n: Long, cap: Int): Prop = {
    val entries = b.sortedEntries().map { case (u, lb) => (u.toString, lb, lb + b.err) }
    val bounds = entries.forall { case (item, lb, ub) =>
      val t = truth.getOrElse(item, 0L); lb <= t && t <= ub
    }
    val errBound = b.err <= n / (cap + 1)
    val capBound = entries.length <= cap
    // MG guarantee: anything strictly more frequent than n/(cap+1) survives
    val heavyKept = truth.filter(_._2 > n / (cap + 1)).keys
      .forall(h => entries.exists(_._1 == h))
    Prop(bounds && errBound && capBound && heavyKept) :| (
      s"bounds=$bounds errBound=$errBound (err=${b.err}, n=$n) " +
        s"capBound=$capBound heavyKept=$heavyKept entries=${entries.toList}")
  }

  test("single-buffer bounds, error, capacity, and heavy-survival invariants") {
    check(Prop.forAll(genStream, Gen.chooseNum(1, 8)) { (items, cap) =>
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sound(feed(items, cap), truth, items.length.toLong, cap)
    })
  }

  test("merged split halves keep every invariant in either merge direction") {
    check(Prop.forAll(genStream, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) {
      (items, cap, cut) =>
        val (l, r) = items.splitAt(cut % (items.length + 1))
        val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ab = { val a = feed(l, cap); a.mergeFrom(feed(r, cap)); a }
        val ba = { val b = feed(r, cap); b.mergeFrom(feed(l, cap)); b }
        sound(ab, truth, items.length.toLong, cap) &&
          sound(ba, truth, items.length.toLong, cap)
    })
  }

  test("serialization round-trip through the aggregate preserves state") {
    check(Prop.forAll(genStream, Gen.chooseNum(1, 8)) { (items, cap) =>
      val agg = graft.functions.FreqSketch(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
      val b = feed(items, cap)
      val rt = agg.deserialize(agg.serialize(b))
      val same = rt.err == b.err &&
        rt.sortedEntries().map { case (u, c) => (u.toString, c) }.toList ==
          b.sortedEntries().map { case (u, c) => (u.toString, c) }.toList
      Prop(same) :| "round-trip changed sketch state"
    })
  }
}
