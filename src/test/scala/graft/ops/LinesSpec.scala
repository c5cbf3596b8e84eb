package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinesSpec extends SparkSpec {
  import spark.implicits._

  // Corpus with a header repeated across 4 docs, a footer across 3, an
  // intra-doc repeated line, a doc that is ALL boilerplate, and unique bodies.
  private def corpus = Seq(
    (0L, "HEAD\nbody zero\nFOOT"),
    (1L, "HEAD\nbody one\nbody one again"),
    (2L, "HEAD\nFOOT"),
    (3L, "HEAD\nrepeat\nrepeat\nbody three\nFOOT"),
    (4L, "only unique content here"),
    (5L, "")).toDF("doc_id", "text")

  /** Brute-force reference: string-keyed counts, per-doc filtered rebuild. */
  private def reference(docs: Seq[(Long, String)], minCount: Long): Map[Long, (String, Long, Long)] = {
    val counts = docs.flatMap(_._2.split("\n", -1)).groupBy(identity).view.mapValues(_.length.toLong)
    docs.map { case (id, text) =>
      val lines = text.split("\n", -1)
      val kept = lines.filter(l => counts(l) < minCount)
      (id, (kept.mkString("\n"), kept.length.toLong, (lines.length - kept.length).toLong))
    }.toMap
  }

  test("removeBoilerplate equals the string-keyed brute force, keeps order, retains emptied docs") {
    val docs = corpus.as[(Long, String)].collect().toSeq
    val ref = reference(docs, minCount = 3)
    val got = Lines.removeBoilerplate(corpus, col("doc_id"), col("text"), minCount = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === ref)
    // HEAD (4 docs) removed, FOOT (3) removed, intra-doc "repeat" (2) kept
    assert(got(3L)._1 === "repeat\nrepeat\nbody three")
    // doc 2 was pure boilerplate: survives as an empty document
    assert(got(2L) === (("", 0L, 2L)))
  }

  test("frequentLines returns exact string counts above the threshold only") {
    val freq = Lines.frequentLines(corpus, col("doc_id"), col("text"), minCount = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freq === Map("HEAD" -> 4L, "FOOT" -> 3L))
  }

  test("a threshold above every count is the identity transform") {
    val out = Lines.removeBoilerplate(corpus, col("doc_id"), col("text"), minCount = 100)
      .orderBy("id").collect()
    val orig = corpus.orderBy("doc_id").collect()
    out.zip(orig).foreach { case (c, o) =>
      assert(c.getString(1) === o.getString(1))
      assert(c.getLong(3) === 0L)
    }
  }

  test("removal join broadcasts the frequent set — no corpus-side sort-merge join") {
    val plan = Lines.removeBoilerplate(corpus, col("doc_id"), col("text"), minCount = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast removal join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
  }

  test("qualityFlags sets exactly the bits each planted defect trips") {
    val cases = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today fine", 0L), // clean
      (2L, "too short", 1L + 8L),                    // <8 words, no stopword
      (3L, "the " + Seq.fill(30)("zz").mkString(" "), 16L), // repetitive, has stopword
      (4L, "the 00 11 22 33 44 55 66 77 88 99", 4L), // digits kill alpha ratio
      (5L, "the extraordinarily incomprehensible characteristically " +
        "internationalization multidimensionality discombobulated " +
        "electroencephalography catastrophically", 2L)) // mean word len > 12
      .toDF("id", "text", "expect")
    val got = cases.select(col("id"), col("expect"),
        TextOps.qualityFlags(col("text")).as("flags"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (id, (expect, flags)) =>
      assert(flags === expect, s"doc $id: expected mask $expect, got $flags")
    }
  }

  test("results are stable under repartitioning") {
    val a = Lines.removeBoilerplate(corpus, col("doc_id"), col("text"), 3)
      .orderBy("id").collect().toSeq
    val b = Lines.removeBoilerplate(corpus.repartition(7), col("doc_id"), col("text"), 3)
      .orderBy("id").collect().toSeq
    assert(a === b)
  }
}
