package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKHeap

/** Property tests for the bounded top-k heap: for ARBITRARY insert orders,
  * splits, and merge directions the result must equal a plain
  * sort-and-take — this is the invariant the distributed aggregate's
  * correctness rests on (partial buffers meet in any order). */
class TopKHeapPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val genEntries: Gen[List[(Double, Long)]] = Gen.listOf(for {
    // small score range forces heavy ties; ids may collide too
    s <- Gen.oneOf(Gen.chooseNum(-5, 5).map(_.toDouble), Gen.chooseNum(-1e9, 1e9))
    id <- Gen.chooseNum(-1000L, 1000L)
  } yield (s, id))

  private def reference(entries: List[(Double, Long)], k: Int): List[(Double, Long)] =
    entries.sortBy { case (s, id) => (-s, id) }.take(k)

  test("heap equals sort-and-take for any insert order") {
    check(Prop.forAll(genEntries, Gen.chooseNum(1, 8)) { (entries, k) =>
      val h = new TopKHeap(k)
      entries.foreach { case (s, id) => h.insert(s, id) }
      h.sortedBestFirst().toList == reference(entries, k)
    })
  }

  test("merging split halves in either direction equals the whole") {
    check(Prop.forAll(genEntries, Gen.chooseNum(1, 8), Gen.chooseNum(0, 100)) {
      (entries, k, cut) =>
        val (l, r) = entries.splitAt(cut % (entries.length + 1))
        val h1 = new TopKHeap(k); l.foreach { case (s, id) => h1.insert(s, id) }
        val h2 = new TopKHeap(k); r.foreach { case (s, id) => h2.insert(s, id) }
        val h3 = new TopKHeap(k); r.foreach { case (s, id) => h3.insert(s, id) }
        val h4 = new TopKHeap(k); l.foreach { case (s, id) => h4.insert(s, id) }
        h1.mergeFrom(h2)
        h3.mergeFrom(h4)
        h1.sortedBestFirst().toList == reference(entries, k) &&
          h3.sortedBestFirst().toList == reference(entries, k)
    })
  }

  test("NaN entries never surface regardless of position") {
    check(Prop.forAll(genEntries, Gen.chooseNum(1, 8), Gen.chooseNum(0, 50)) {
      (entries, k, at) =>
        val withNaN = {
          val (l, r) = entries.splitAt(at % (entries.length + 1))
          l ++ List((Double.NaN, 77L)) ++ r
        }
        val h = new TopKHeap(k)
        withNaN.foreach { case (s, id) => h.insert(s, id) }
        h.sortedBestFirst().toList == reference(entries, k)
    })
  }
}
