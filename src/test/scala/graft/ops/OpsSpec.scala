package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit specs for the LLM-data-pipeline operators. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "dog lazy the over jumps fox brown quick the"), // same word set as 0
    (3L, "completely different text about spark engines"),
    (4L, "the quick brown fox jumps over energetic dogs")) // near-dup of 0
    .toDF("doc_id", "text")

  // ----- dedup ----------------------------------------------------------

  test("exact dedup keeps the smallest id per key with counts") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out === Map(0L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("keepBest keeps the max-score row per key, ties to the smallest id") {
    val rows = Seq(
      (10L, "a", 5L), (11L, "a", 9L), (12L, "a", 9L), // best score 9, tie -> 11
      (20L, "b", 3L),                                 // singleton
      (31L, "c", 7L), (30L, "c", 7L))                 // all tied -> 30
      .toDF("id", "k", "q")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.keepBest(df, col("k"), col("id"), col("q"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expect = Map("a" -> ((3L, 9L, 11L)), "b" -> ((1L, 3L, 20L)), "c" -> ((2L, 7L, 30L)))
    assert(run(rows) === expect)
    // partial aggregation must not change the argmax: force many partitions
    assert(run(rows.repartition(7)) === expect)
  }

  test("identical token sets produce identical minhash signatures") {
    val corpus = docs.withColumn("ws", graft.ops.TextOps.tokenSet(col("text")))
    val sigs = Dedup.minhashSignatures(corpus, col("doc_id"), col("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) === sigs(1L)) // identical text
    assert(sigs(0L) === sigs(2L)) // permuted words, same set
    assert(sigs(0L) !== sigs(3L))
    assert(sigs.values.head.length === 64)
  }

  test("LSH banding surfaces duplicate pairs as candidates") {
    val corpus = docs.withColumn("ws", graft.ops.TextOps.tokenSet(col("text")))
    val sigs = Dedup.minhashSignatures(corpus, col("doc_id"), col("ws"))
    val pairs = Dedup.candidatePairs(Dedup.lshBands(sigs, bands = 4, rowsPerBand = 16))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((1L, 2L)))
  }

  test("cross-corpus banding finds duplicates across frames, not within") {
    val a = docs.withColumn("ws", TextOps.tokenSet(col("text")))
    val b = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // dup of a:0/1/2
      (101L, "no overlap with anything in the other corpus at all"))
      .toDF("doc_id", "text").withColumn("ws", TextOps.tokenSet(col("text")))
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.lshBands(Dedup.minhashSignatures(df, col("doc_id"), col("ws")), 4, 16)
    val pairs = Dedup.crossCandidatePairs(bands(a), bands(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)))
    assert(pairs.contains((1L, 100L)))
    assert(pairs.contains((2L, 100L)))
    // within-corpus pairs (0,1) etc. must NOT appear — it is a cross join
    assert(pairs.forall { case (x, y) => x < 100L && y >= 100L })
  }

  test("lshBands rejects a banding that does not tile the signature") {
    val corpus = docs.withColumn("ws", TextOps.tokenSet(col("text")))
    val sigs = Dedup.minhashSignatures(corpus, col("doc_id"), col("ws"))
    intercept[IllegalArgumentException](Dedup.lshBands(sigs, bands = 4, rowsPerBand = 20))
  }

  test("simhash is equal for identical sets and close for near-dups") {
    val corpus = docs.withColumn("ws", graft.ops.TextOps.tokenSet(col("text")))
    val sh = Dedup.simhash64(corpus, col("doc_id"), col("ws"))
    val hams = sh.as("a").join(sh.as("b"), col("a.sh_id") < col("b.sh_id"))
      .select(col("a.sh_id"), col("b.sh_id"),
        Dedup.hamming64(col("a.simhash"), col("b.simhash")).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(hams((0L, 1L)) === 0)
    assert(hams((0L, 2L)) === 0)
    assert(hams((0L, 4L)) < hams((0L, 3L))) // near-dup closer than unrelated
  }

  test("containment is asymmetric: excerpt fully contained, page is not") {
    import spark.implicits._
    val c = Seq(
      (Seq("a b", "b c"), Seq("a b", "b c", "c d", "d e")), // excerpt ⊂ page
      (Seq.empty[String], Seq("a b")))                      // empty side → 0
      .toDF("ex", "page")
      .select(
        Dedup.containment(col("ex"), col("page")).as("fwd"),
        Dedup.containment(col("page"), col("ex")).as("rev"))
      .collect()
    assert(c(0).getDouble(0) === 1.0d) // all excerpt bigrams in the page
    assert(c(0).getDouble(1) === 0.5d) // only half the page's in the excerpt
    assert(c(1).getDouble(0) === 0.0d)
  }

  test("fused sorted jaccard agrees with the array_intersect formulation") {
    val pairs = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        TextOps.tokenSet(col("a.text")).as("sa"),
        TextOps.tokenSet(col("b.text")).as("sb"))
    val both = pairs.select(
      Dedup.jaccard(col("sa"), col("sb")).as("generic"),
      Dedup.jaccardSorted(col("sa"), col("sb")).as("fused")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // empty/empty edge
    val z = Seq(("", "")).toDF("x", "y")
      .select(Dedup.jaccardSorted(TextOps.tokenSet(col("x")), TextOps.tokenSet(col("y"))))
      .collect().head.getDouble(0)
    assert(z === 0.0d)
  }

  test("jaccard over word sets") {
    val j = docs.filter(col("doc_id").isin(0L, 2L))
      .withColumn("ws", TextOps.tokenSet(col("text")))
      .agg(collect_list(col("ws")).as("l"))
      .select(Dedup.jaccard(element_at(col("l"), 1), element_at(col("l"), 2)))
      .collect().head.getDouble(0)
    assert(j === 1.0d)
  }

  test("salted join equals the plain join") {
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "v") // key skew on 3 keys
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = big.join(small, "k").select("k", "v", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).select("k", "v", "name")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("salted join output and salt assignment are deterministic under repartitioning") {
    val big = (1 to 500).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    def run(b: org.apache.spark.sql.DataFrame): Seq[(Int, Int, String)] =
      Skew.saltedJoin(b, small, "k", salts = 8).select("k", "v", "name")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2))).toSeq.sorted
    // same rows, different physical layout: the hash salt is a pure
    // function of row values, so the multiset AND assignment match exactly
    assert(run(big.repartition(13)) === run(big.coalesce(1)))
    // salts actually spread a hot key across sub-keys (load is split)
    val spread = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("v")), lit(8L)))
      .filter(col("k") === 0).select("__salt").distinct().count()
    assert(spread > 1)
  }

  // ----- text -----------------------------------------------------------

  test("token count ignores repeated separators") {
    val out = Seq("a  b   c", "", "single").toDF("text")
      .select(TextOps.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(out.toSeq === Seq(3, 0, 1))
  }

  test("word ngrams guard short documents") {
    val out = Seq("one", "one two", "one two three").toDF("text")
      .select(TextOps.wordNgrams(col("text"), 2)).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq.empty)
    assert(out(1) === Seq("one two"))
    assert(out(2) === Seq("one two", "two three"))
  }

  test("fingerprint matches the closed-form polynomial") {
    val fp = Seq("abc").toDF("text")
      .select(TextOps.fingerprint(col("text"))).collect().head.getLong(0)
    // ((0*31+97)*31+98)*31+99 mod 1e9+7
    val expected = ((97L * 31 + 98) * 31 + 99) % 1000000007L
    assert(fp === expected)
  }

  test("langid picks the dominant stopword language deterministically") {
    val out = Seq(
      "the cat and the hat of a dog",
      "el perro y la casa de que",
      "xyzzy plugh").toDF("text")
      .select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(out(0) === "en")
    assert(out(1) === "es")
    assert(out(2) === "de") // zero scores tie -> first language in order
  }

  test("char ngrams slide over the text and guard short inputs") {
    val out = Seq("abcd", "ab", "").toDF("text")
      .select(TextOps.charNgrams(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("abc", "bcd"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
  }

  test("ngram langid picks the dominant trigram profile") {
    val out = Seq(
      "the thing and the motion",
      "der einige schwer und dich").toDF("text")
      .select(TextOps.langIdNgram(col("text"))).collect().map(_.getString(0))
    assert(out(0) === "en")
    assert(out(1) === "de")
  }

  test("quality score stays within [0,1]") {
    val bounds = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(TextOps.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect().head
    assert(bounds.getDouble(0) >= 0.0d && bounds.getDouble(1) <= 1.0d)
  }

  // ----- similarity -----------------------------------------------------

  test("brute-force top-k ranks an exact duplicate vector first") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
    // plant an exact copy of vec 0 under id 9999
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 0).select(lit(9999L).as("vec_id"),
        col("embedding"), col("label")))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val top = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, "q_id", "q_vec", 1)
      .collect().head
    assert(top.getAs[Long]("neighbor_id") === 9999L)
    assert(math.abs(top.getAs[Double]("score") - 1.0d) < 1e-12)
  }

  test("LSH top-k plan is a bucketed join, not a cartesian product") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q, "q_id", "q_vec",
      dim = 64, numPlanes = 8, k = 3)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // and it still finds self-bucket neighbours
    assert(lsh.count() > 0)
  }

  test("multi-table LSH recall dominates single-table and keeps exact duplicates") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 3).select(lit(9999L).as("vec_id"), col("embedding")))
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, "q_id", "q_vec", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(tables: Int): Double = {
      val got = Similarity.lshTopKMulti(corpus, "vec_id", "embedding", q, "q_id", "q_vec",
          dim = 64, numPlanes = 6, k = 5, tables = tables)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val single = recall(1)
    val multi = recall(6)
    assert(multi >= single, s"multi-table recall $multi below single-table $single")
    assert(multi > 0.0)
    // the exact duplicate of query 3 is always found at rank 1 (identical
    // vector -> same bucket in EVERY table), and never ranked twice even
    // though several tables surface the same candidate pair
    val top = Similarity.lshTopKMulti(corpus, "vec_id", "embedding",
        q.filter(col("q_id") === 3), "q_id", "q_vec", 64, 6, 5, tables = 6)
      .collect().sortBy(_.getInt(1))
    assert(top.head.getLong(2) === 9999L)
    val ids = top.map(_.getLong(2))
    assert(ids.distinct.length === ids.length, s"duplicate neighbors ranked: ${ids.toSeq}")
  }

  test("IVF finds an exact duplicate vector in its own cell") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 7).select(lit(9999L).as("vec_id"), col("embedding")))
    val q = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 8, iters = 2)
    assert(centroids.length === 8)
    val top = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, "q_id", "q_vec",
      centroids, nprobe = 2, k = 1).collect().head
    // identical vector lands in the same cell -> always found, rank 1
    assert(top.getAs[Long]("neighbor_id") === 9999L)
    val plan = Similarity.ivfTopK(corpus, "vec_id", "embedding", q, "q_id", "q_vec",
      centroids, nprobe = 2, k = 1).queryExecution.executedPlan.toString
    // the corpus-side search join is an equi-join on the cell id
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("cosine expression agrees with a reference computation") {
    val rows = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = rows.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    val expected = {
      val dot = 1.0 * 4 + 2.0 * 5 + 3.0 * 6
      dot / (math.sqrt(1.0 + 4 + 9) * math.sqrt(16.0 + 25 + 36))
    }
    assert(math.abs(got - expected) < 1e-15)
  }

  // ----- multimodal -----------------------------------------------------

  test("frame sampling keeps every stride-th media row") {
    val media = (0L until 20L).map(i => (i, s"frame$i")).toDF("media_id", "payload")
    val kept = Multimodal.sampleFrames(media, "media_id", stride = 4)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 4L, 8L, 12L, 16L))
  }

  test("typed mapPartitions decode agrees with the SQL variant") {
    // includes multibyte payloads: the checksum is over the UTF-8 decode's
    // first 64 characters, so byte-slicing bugs would diverge here
    val df = Seq((1L, "hello world"), (2L, "a" * 100),
      (3L, "café Ünïcøde 你好 " * 10)).toDF("media_id", "text")
      .select(col("media_id"), lit("text/plain").as("kind"),
        col("text").cast("binary").as("bytes"))
    val typed = Multimodal.extractFeatures(
        df.as[MediaRecord](Multimodal.mediaRecordEnc))
      .collect().map(f => f.media_id -> ((f.byte_size, f.width, f.height, f.checksum))).toMap
    val viaSql = Multimodal.extractFeaturesSql(df)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(typed === viaSql)
  }
}
