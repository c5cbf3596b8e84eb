package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for content-defined chunking ([[Dedup.cdcChunks]] /
  * [[Dedup.cdcSharedPairs]], [[graft.functions.CdcChunksExpr]]). */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: per-position DIRECT window hash (no rolling) —
    * the same mathematical function the rolling codegen pass must equal. */
  private def refChunks(s: String, w: Int, d: Int): Seq[String] = {
    val cps = s.codePoints().toArray
    def winHash(end: Int): Long = { // window ending at index `end` inclusive
      var h = 0L
      for (j <- (end - w + 1) to end) h = (h * 31L + cps(j)) % 1000003L
      h
    }
    val cuts = (w - 1 until cps.length).filter(i => winHash(i) % d == 0)
    val bounds = 0 +: cuts.map(_ + 1) :+ cps.length
    bounds.sliding(2).collect {
      case Seq(a, b) if b > a => new String(cps, a, b - a)
    }.toSeq
  }

  private def sparkChunks(s: String, w: Int, d: Int): Seq[String] =
    Seq(Tuple1(s)).toDF("t")
      .select(Dedup.cdcChunks(col("t"), w, d).as("c"))
      .collect()(0).getSeq[String](0)

  test("rolling chunker equals the direct window-hash reference") {
    val rnd = new scala.util.Random(7)
    val alphabets = Seq("ab", "abcde ", "xyz019 .,")
    for (trial <- 0 until 60) {
      val alpha = alphabets(trial % alphabets.size)
      val s = Seq.fill(rnd.nextInt(300))(alpha(rnd.nextInt(alpha.length))).mkString
      for ((w, d) <- Seq((16, 32), (8, 16), (4, 4))) {
        assert(sparkChunks(s, w, d) === refChunks(s, w, d),
          s"w=$w d=$d s='${s.take(60)}...'")
      }
    }
  }

  test("chunks operate on codepoints, not UTF-16 units") {
    val s = "héllo 😀 wörld 😀 test padding here" * 3
    val got = sparkChunks(s, 8, 4)
    assert(got === refChunks(s, 8, 4))
    assert(got.mkString === s) // concatenation identity holds through emoji
  }

  test("chunks always concatenate back to the input") {
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 30) {
      val s = Seq.fill(rnd.nextInt(500))(('a' + rnd.nextInt(26)).toChar).mkString
      assert(sparkChunks(s, 16, 32).mkString === s)
    }
  }

  test("empty and sub-window strings yield the whole string or nothing") {
    assert(sparkChunks("", 16, 32) === Seq.empty)
    assert(sparkChunks("short", 16, 32) === Seq("short")) // no full window
  }

  test("a shifted duplicate re-synchronizes to shared chunks") {
    val base = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .filter(col("doc_id") < 40).select(col("doc_id"), col("text"))
    val corpus = base.union(base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000L).as("doc_id"),
        concat(lit("x"), col("text")).as("text")))
    val pairs = Dedup.cdcSharedPairs(corpus, col("doc_id"), col("text"),
        window = 16, divisor = 32, minChunkLen = 20, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // most planted (orig, orig+1000) pairs must be found despite the
    // 1-char shift that misaligns every fixed-stride segmentation
    val planted = pairs.count { case (a, b) => b == a + 1000L }
    assert(planted >= 7, s"found only $planted/10 shifted duplicates: $pairs")
  }

  test("pair self-join is an equi-join on the chunk, never a cartesian") {
    val corpus = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .filter(col("doc_id") < 40).select(col("doc_id"), col("text"))
    val q = Dedup.cdcSharedPairs(corpus, col("doc_id"), col("text"))
    q.collect()
    // the chunk relation is NARROW (scan -> explode -> filter), so the
    // self-join needs no shuffle at all: AQE broadcasts one side at this
    // scale, sort-merge on `chunk` beyond — either way an equi-join
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"pair join must be an equi-join on chunk:\n$plan")
  }
}
