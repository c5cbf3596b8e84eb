package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE merge training against a sequential reference implementation. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ----- sequential reference (the semantics BPE literature defines) ----

  private def refMerge(toks: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    toks.foreach { x =>
      if (out.nonEmpty && out.last == l && x == r) {
        out.remove(out.length - 1)
        out += (l + " " + r)
      } else out += x
    }
    out.toList
  }

  private def refTrain(corpus: List[List[String]], n: Int): List[(String, String)] = {
    var cur = corpus
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var continue = true
    for (_ <- 0 until n if continue) {
      val counts = cur.flatMap(t => t.zip(t.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) continue = false
      else {
        val (l, r) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((l, r))
        cur = cur.map(refMerge(_, l, r))
      }
    }
    merges.toList
  }

  private val corpus = List(
    "low low low lower lowest",
    "new newer newest low",
    "wide wider widest new new")
  private lazy val df = corpus.map(Tuple1(_)).toDF("text")

  test("mergePair equals the sequential greedy fold, including overlapping runs") {
    val toks = Seq(Tuple1(Seq("a", "a", "a", "b", "a", "a"))).toDF("t")
    val merged = toks.select(Bpe.mergePair(col("t"), "a", "a").as("m"))
      .collect().head.getSeq[String](0)
    assert(merged === refMerge(List("a", "a", "a", "b", "a", "a"), "a", "a"))
    assert(merged === Seq("a a", "a", "b", "a a"))
  }

  test("train reproduces the reference merge sequence") {
    val expect = refTrain(corpus.map(_.split(" ").toList), 5)
    val got = Bpe.train(df, TextOps.tokens(col("text")), 5)
    assert(got === expect)
  }

  test("applyMerges compresses token counts monotonically and deterministically") {
    val merges = Bpe.train(df, TextOps.tokens(col("text")), 3)
    val before = df.select(size(TextOps.tokens(col("text"))).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    val after = df.select(size(Bpe.applyMerges(TextOps.tokens(col("text")), merges)).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(after < before)
    // second application of the same merges over the merged symbols is a
    // no-op (the pair members no longer appear as separate symbols)
    val again = df.select(size(Bpe.applyMerges(
        Bpe.applyMerges(TextOps.tokens(col("text")), merges), merges)).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(again === after)
  }

  test("train stops early when no adjacent pairs remain") {
    val tiny = Seq(Tuple1("a b")).toDF("text")
    val merges = Bpe.train(tiny, TextOps.tokens(col("text")), 10)
    assert(merges === Seq(("a", "b"))) // one merge exhausts the only pair
  }
}
