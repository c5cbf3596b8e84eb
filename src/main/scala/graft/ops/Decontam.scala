package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.AnyInBloom

/**
 * Benchmark decontamination: remove training documents that share any
 * word n-gram shingle with an evaluation/benchmark set — the test-set
 * overlap scrub every serious training-data pipeline runs.
 *
 * The scale asymmetry is the whole design: benchmarks are megabytes while
 * the corpus is the 100 TB side, so the benchmark's distinct shingles are
 * collected to the driver ONCE, folded into a Bloom filter, and shipped as
 * a constant. The plan is then:
 *
 *  1. PREFILTER (narrow, no shuffle): every corpus row checks its shingles
 *     against the broadcast Bloom ([[graft.functions.AnyInBloom]]). The
 *     Bloom guarantee means no false negatives — nothing contaminated
 *     slips through — and the tuned ~1e-4 false-positive rate means only a
 *     vanishing fraction of clean rows survive to step 2.
 *  2. EXACT VERIFY (tiny by construction): survivors explode their
 *     shingles and equi-join the real benchmark shingle set (broadcast),
 *     so the final answer is EXACT — the Bloom only ever pruned work.
 *
 * The result is byte-identical to the naive explode-everything join while
 * shuffling ~0 corpus rows instead of corpus x shingles.
 */
object Decontam {

  /** Distinct word n-gram shingles of a document. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(TextOps.wordNgrams(text, n))

  /** The benchmark's distinct shingles, collected to the driver (the
    * benchmark is the small side by definition — megabytes of eval sets
    * against a corpus of terabytes). */
  def collectShingles(bench: DataFrame, textCol: String, n: Int): Array[String] =
    bench
      .select(explode(shingles(col(textCol), n)).as("ng"))
      .distinct()
      .collect()
      .map(_.getString(0))

  private def bloomOf(grams: Array[String], fpp: Double): BloomFilter = {
    val bloom = BloomFilter.create(math.max(grams.length.toLong, 1L), fpp)
    grams.foreach(g => bloom.putBinary(g.getBytes("UTF-8")))
    bloom
  }

  /** Driver-side Bloom filter over the benchmark's distinct shingles. */
  def benchmarkBloom(bench: DataFrame, textCol: String, n: Int,
      fpp: Double = 1e-4): BloomFilter =
    bloomOf(collectShingles(bench, textCol, n), fpp)

  /** Prefilter column: true iff any shingle might be in the Bloom. */
  def anyInBloom(shingleArr: Column, bloom: BloomFilter): Column =
    ColumnBridge.column(AnyInBloom(ColumnBridge.expression(shingleArr), bloom))

  /**
   * Ids of corpus documents sharing at least one word n-gram with the
   * benchmark. Exact (see class doc): Bloom prefilter, then explode only
   * the surviving rows into an equi-join with the true shingle set.
   */
  def contaminatedIds(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      fpp: Double = 1e-4): DataFrame = {
    // one job over the benchmark: the collected gram array feeds BOTH the
    // Bloom filter and the exact-verify relation (no distributed recompute)
    val grams = collectShingles(bench, benchTextCol, n)
    val bloom = bloomOf(grams, fpp)
    val spark = corpus.sparkSession
    import spark.implicits._
    val benchGrams = grams.toSeq.toDF("ng")
    corpus
      .select(col(idCol), shingles(col(textCol), n).as("__ng"))
      .filter(anyInBloom(col("__ng"), bloom))
      .select(col(idCol), explode(col("__ng")).as("ng"))
      .join(broadcast(benchGrams), Seq("ng"))
      .select(col(idCol))
      .distinct()
  }

  /** The corpus minus contaminated documents (left-anti on the id). */
  def clean(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchTextCol: String,
      n: Int,
      fpp: Double = 1e-4): DataFrame = {
    val bad = contaminatedIds(corpus, idCol, textCol, bench, benchTextCol, n, fpp)
      .withColumnRenamed(idCol, "__bad_id")
    corpus.join(bad, col(idCol) === col("__bad_id"), "left_anti")
  }
}
