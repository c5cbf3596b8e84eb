package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for [[SubstrSearch]] — q-gram index substring retrieval. */
class SubstrSearchSpec extends SparkSpec {
  import spark.implicits._

  /** Non-overlapping occurrence count, the replace-based semantics. */
  private def occ(text: String, pat: String): Long = {
    var (i, n) = (text.indexOf(pat), 0L)
    while (i >= 0) { n += 1; i = text.indexOf(pat, i + pat.length) }
    n
  }

  test("search equals the plain contains scan on real corpus data") {
    val d = spark.read.parquet(sf("0.001") + "/documents.parquet")
    for (pat <- Seq("fast merge", "merge batch part", "the quick")) {
      val got = SubstrSearch.search(d, "doc_id", "text", pat, q = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = d.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> occ(r.getString(1), pat))
        .filter(_._2 > 0).toMap
      assert(got === want, s"pattern '$pat'")
    }
  }

  test("gram-coincidence candidates are removed by the exact verify") {
    // contains both q=4 grams of "abcde" ("abcd", "bcde") but not "abcde"
    val d = Seq((1L, "xx abcdX and Ybcde xx"), (2L, "has abcde here"))
      .toDF("doc_id", "text")
    val cand = SubstrSearch.candidatesFrom(
      SubstrSearch.gramPostings(d, col("doc_id"), col("text"), 4), "abcde", 4)
      .collect().map(_.getLong(0)).toSet
    assert(cand === Set(1L, 2L)) // doc 1 is a q-gram false positive
    val got = SubstrSearch.search(d, "doc_id", "text", "abcde", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(2L -> 1L))
  }

  test("counts non-overlapping occurrences exactly") {
    val d = Seq((1L, "ababab"), (2L, "abab x abab")).toDF("doc_id", "text")
    val got = SubstrSearch.search(d, "doc_id", "text", "abab", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 2L)) // "ababab" has ONE non-overlapping
  }

  test("short patterns are rejected loudly") {
    val d = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SubstrSearch.search(d, "doc_id", "text", "ab", 4)
    }
  }

  test("persisted index search matches ad-hoc search and prunes buckets") {
    val d = spark.read.parquet(sf("0.001") + "/documents.parquet")
    val table = freshTable("substr_gram_idx")
    SubstrSearch.writeGramIndex(d, col("doc_id"), col("text"), 8, table, 16)
    val viaIndex = SubstrSearch.searchIndex(spark, table, d, "doc_id", "text",
      "fast merge", 8)
    val adHoc = SubstrSearch.search(d, "doc_id", "text", "fast merge", 8)
      .collect().map(_.toSeq).toSet
    assert(viaIndex.collect().map(_.toSeq).toSet === adHoc)
    // the gram IN-list must reach the index scan as a pushed filter
    // (bucket-file pruning applies underneath; the planner only surfaces
    // SelectedBucketsCount when an operator also needs the partitioning)
    val plan = viaIndex.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(gram"),
      s"index probe must push the gram IN-list to the scan:\n$plan")
  }
}
