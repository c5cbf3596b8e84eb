package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benchmark-decontamination operator: exactness and plan shape. */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val bench = Seq(
    (0L, "the capital of france is paris and the capital of italy is rome today"),
    (1L, "water boils at one hundred degrees celsius under standard pressure always"))
    .toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // contaminated: contains benchmark doc 0's opening 8-gram verbatim
    (10L, "quiz answer: the capital of france is paris and the capital is known"),
    // clean: shares words but no 8-gram
    (11L, "paris and rome are both capital cities in europe visited by many"),
    // clean: unrelated
    (12L, "spark builds distributed query plans over parquet files at scale"),
    // contaminated: benchmark doc 1 verbatim
    (13L, "water boils at one hundred degrees celsius under standard pressure always"))
    .toDF("doc_id", "text")

  test("contaminatedIds finds exactly the overlapping docs") {
    val bad = Decontam.contaminatedIds(corpus, "doc_id", "text", bench, "text", n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(bad === Set(10L, 13L))
  }

  test("clean removes contaminated docs and keeps the rest intact") {
    val kept = Decontam.clean(corpus, "doc_id", "text", bench, "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L))
  }

  test("bloom prefilter never loses a true overlap (no false negatives)") {
    val bloom = Decontam.benchmarkBloom(bench, "text", n = 8)
    val flagged = corpus
      .select(col("doc_id"), Decontam.shingles(col("text"), 8).as("ng"))
      .filter(Decontam.anyInBloom(col("ng"), bloom))
      .collect().map(_.getLong(0)).toSet
    assert(Set(10L, 13L).subsetOf(flagged))
  }

  test("short documents cannot be contaminated (no shingles)") {
    val tiny = Seq((20L, "too short"), (21L, "")).toDF("doc_id", "text")
    val bad = Decontam.contaminatedIds(tiny, "doc_id", "text", bench, "text", n = 8)
    assert(bad.count() === 0)
    assert(Decontam.clean(tiny, "doc_id", "text", bench, "text", n = 8).count() === 2)
  }

  test("prefilter stage is a narrow projection over the corpus") {
    // a file-backed corpus: a local Seq would be constant-folded by
    // ConvertToLocalRelation, hiding the executed shape under test
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bad = Decontam.contaminatedIds(docs, "doc_id", "text", bench, "text", n = 8)
    val plan = bad.queryExecution.executedPlan.toString
    // exact verification joins the BROADCAST benchmark set; the corpus side
    // must never hit a shuffle-partitioned join or cartesian product
    assert(plan.contains("any_in_bloom"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
