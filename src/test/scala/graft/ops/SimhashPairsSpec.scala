package graft.ops

import graft.SparkSpec

class SimhashPairsSpec extends SparkSpec {

  import spark.implicits._

  private def bruteForce(sigs: Seq[(Long, Long)], d: Int): Set[(Long, Long)] =
    (for {
      (ia, ha) <- sigs; (ib, hb) <- sigs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= d
    } yield (ia, ib)).toSet

  private def run(sigs: Seq[(Long, Long)], d: Int): Set[(Long, Long)] =
    Dedup.simhashHammingPairs(sigs.toDF("sh_id", "simhash"), d)
      .as[(Long, Long)].collect().toSet

  test("pigeonhole banding finds exactly the pairs within the distance") {
    val rnd = new scala.util.Random(7)
    val sigs = (0L until 40L).map { i =>
      // half the corpus are near-flips of a few base signatures so the
      // distance spectrum actually straddles the thresholds under test
      val base = Array(0L, -1L, 0x5555555555555555L, rnd.nextLong())(i.toInt % 4)
      val flips = rnd.nextInt(8)
      val h = (0 until flips).foldLeft(base)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
      (i, h)
    }
    for (d <- Seq(0, 1, 3, 7)) {
      assert(run(sigs, d) === bruteForce(sigs, d), s"maxDist=$d")
    }
  }

  test("pairs are emitted exactly once") {
    val sigs = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L)) // three identical
    val got = Dedup.simhashHammingPairs(sigs.toDF("sh_id", "simhash"), 3)
      .collect()
    assert(got.length === got.toSet.size)
    assert(got.length === 6) // C(4,2): all within distance 3 of each other
  }

  test("maxDist=0 degenerates to exact signature equality") {
    val sigs = Seq((1L, 42L), (2L, 42L), (3L, 43L)) // 43 is 1 flip from 42
    assert(run(sigs, 0) === Set((1L, 2L)))
  }

  test("uneven block widths still cover all 64 bits (no blind spots)") {
    // maxDist=4 -> 5 blocks of widths 13,13,13,13,12; a pair differing
    // only in the LAST block's bits must still be found via earlier blocks
    val a = 0L
    val b = 1L << 63 // single flip in the top bit (last block)
    assert(run(Seq((1L, a), (2L, b)), 4) === Set((1L, 2L)))
  }

  test("invalid maxDist is rejected") {
    val df = Seq((1L, 0L)).toDF("sh_id", "simhash")
    intercept[IllegalArgumentException] { Dedup.simhashHammingPairs(df, -1) }
    intercept[IllegalArgumentException] { Dedup.simhashHammingPairs(df, 64) }
  }
}
