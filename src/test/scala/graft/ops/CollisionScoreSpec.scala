package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for [[TextOps.charCollisionMicro]]
  * ([[graft.functions.CollisionScoreExpr]]). */
class CollisionScoreSpec extends SparkSpec {
  import spark.implicits._

  private def score(s: String): Long =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.charCollisionMicro(col("t")).as("m"))
      .collect()(0).getLong(0)

  /** Exact BigInt reference over codepoints. */
  private def ref(s: String): Long = {
    val cps = s.codePoints().toArray
    if (cps.isEmpty) return 0L
    val sq = cps.groupBy(identity).values.map(g => BigInt(g.length) * g.length).sum
    ((BigInt(1000000) * sq) / (BigInt(cps.length) * cps.length)).toLong
  }

  test("matches the exact BigInt reference on random strings") {
    val rnd = new scala.util.Random(13)
    val alphabets = Seq("a", "ab", "abcdefgh ", "xy😀é", "abcdefghijklmnop .,;")
    for (trial <- 0 until 80) {
      val alpha = alphabets(trial % alphabets.size)
      val chars = alpha.codePoints().toArray
      val s = Seq.fill(rnd.nextInt(400))(
        new String(Character.toChars(chars(rnd.nextInt(chars.length))))).mkString
      assert(score(s) === ref(s), s"s='${s.take(40)}...'")
    }
  }

  test("degenerate and balanced extremes") {
    assert(score("") === 0L)
    assert(score("aaaaaaaa") === 1000000L)        // all collisions
    assert(score("ab") === 500000L)               // 2 chars, 2 counts of 1
    assert(score("abcd") === 250000L)             // uniform over 4
    assert(score("😀😀😀") === 1000000L)          // supplementary chars count once
  }

  test("prose scores below padding spam") {
    val prose = score("the quick brown fox jumps over the lazy dog")
    val spam = score("---- ---- ---- ---- ---- ---- ---- ----")
    assert(prose < spam, s"prose=$prose spam=$spam")
  }

  test("null yields null") {
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextOps.charCollisionMicro(col("t")).as("m")).collect()(0)
    assert(r.isNullAt(0))
  }
}
