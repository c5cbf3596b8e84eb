package graft.ops

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * duplicatedSpanStats against a brute-force in-memory reference over random
 * small-alphabet corpora (a tiny alphabet forces plenty of genuine span
 * collisions, the regime the hash-prefilter + exact-string re-group must
 * get right).
 */
class SpanDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def reference(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long)] = {
    val spans = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      id -> toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    }
    val occ = spans.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    spans.collect { case (id, ss) if ss.nonEmpty =>
      id -> ((ss.size.toLong, ss.count(g => occ(g) > 1).toLong))
    }.toMap
  }

  test("matches the brute-force reference on random tiny-alphabet corpora") {
    val genDoc = Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val rng = new scala.util.Random(42)
    (0 until 8).foreach { trial =>
      val docs = (0L until 20L).map { id =>
        id -> genDoc(Gen.Parameters.default.withSize(12),
          org.scalacheck.rng.Seed(rng.nextLong())).getOrElse("")
      }
      val n = 2 + trial % 3
      val got = Dedup.duplicatedSpanStats(docs.toDF("doc_id", "text"), "doc_id", "text", n)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got === reference(docs, n), s"trial=$trial n=$n docs=$docs")
    }
  }
}
