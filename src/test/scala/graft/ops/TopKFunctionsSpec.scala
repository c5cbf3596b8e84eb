package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec
import graft.functions.{CountIn, NearestCell, NearestCells, TopKHeap}

/** Specs for the round-3 scale-path expressions: the bounded top-k
  * aggregate, the constant-centroid argmin projections, and the fused
  * set-membership counter. */
class TopKFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // ----- TopKByScore ----------------------------------------------------

  test("bounded top-k agrees with the window row_number formulation") {
    // deterministic synthetic scores with ties: score = id % 7
    val df = spark.range(0, 1000, 1, 8)
      .select(pmod(col("id"), lit(97)).as("q"),
        (col("id") % 7).cast("double").as("score"), col("id"))
    val viaAgg = df.groupBy(col("q").as("query_id"))
      .agg(Similarity.topKAgg(col("score"), col("id"), 3).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("col").getField("id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("q")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("q"), col("rn"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
  }

  test("top-k heap truncates at k and merges deterministically") {
    // inserting in any order yields the same best-first result
    val entries = (0 until 100).map(i => ((i * 37 % 100).toDouble, i.toLong))
    val expected = entries.sortBy { case (s, id) => (-s, id) }.take(5)
    for (seed <- Seq(1, 7, 42)) {
      val shuffled = new scala.util.Random(seed).shuffle(entries)
      val (l, r) = shuffled.splitAt(50)
      val h1 = new TopKHeap(5)
      val h2 = new TopKHeap(5)
      l.foreach { case (s, id) => h1.insert(s, id) }
      r.foreach { case (s, id) => h2.insert(s, id) }
      h1.mergeFrom(h2)
      assert(h1.size === 5)
      assert(h1.sortedBestFirst().toSeq === expected)
    }
  }

  test("top-k heap ties break toward the smaller id") {
    val h = new TopKHeap(2)
    Seq((1.0, 30L), (1.0, 10L), (1.0, 20L)).foreach { case (s, id) => h.insert(s, id) }
    assert(h.sortedBestFirst().toSeq === Seq((1.0, 10L), (1.0, 20L)))
  }

  test("top-k heap never admits NaN scores") {
    // a NaN at the root would block every later insert (all comparisons
    // against NaN are false) — NaN must be rejected at the door
    val h = new TopKHeap(2)
    h.insert(Double.NaN, 1L)
    h.insert(0.5, 2L)
    h.insert(Double.NaN, 3L)
    h.insert(0.9, 4L)
    assert(h.sortedBestFirst().toSeq === Seq((0.9, 4L), (0.5, 2L)))
  }

  test("ANN ranking plans contain no window and no per-query global sort") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 4, iters = 1)
    val plans = Seq(
      Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, "q_id", "q_vec", 3),
      Similarity.lshTopK(emb, "vec_id", "embedding", q, "q_id", "q_vec", 64, 8, 3),
      Similarity.ivfTopK(emb, "vec_id", "embedding", q, "q_id", "q_vec", cents, 2, 3))
      .map(_.queryExecution.executedPlan.toString)
    plans.foreach { p =>
      // ranking is the bounded-heap aggregate, never a window (whose
      // partition-by-query shape serializes each query's full candidate
      // set onto one reducer) and never a global sort of candidates
      assert(p.contains("top_k_by_score"), p)
      assert(!p.contains("Window"), p)
      // SortExec prints as "Sort [ordering...]" in plan strings
      assert(!p.contains("Sort ["), p)
    }
  }

  // ----- NearestCell / NearestCells -------------------------------------

  test("nearest cell picks the argmin with smallest-index tie-break") {
    val cents = Array(Array(0.0f, 0.0f), Array(1.0f, 1.0f), Array(0.0f, 0.0f))
    val out = Seq(
      (0L, Array(0.1f, 0.1f)),   // nearest: centroid 0 (tie with 2 -> 0)
      (1L, Array(0.9f, 0.9f)),   // nearest: centroid 1
      (2L, Array(0.5f, 0.5f)))   // exact tie 0/1/2 -> 0
      .toDF("id", "v")
      .select(col("id"), Similarity.nearestCell(col("v"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("nearest cells orders probes by distance with index tie-break") {
    val cents = Array(Array(0.0f), Array(10.0f), Array(4.0f), Array(6.0f))
    val out = Seq(Tuple1(Array(5.0f))).toDF("v")
      .select(Similarity.nearestCells(col("v"), cents, 3))
      .collect().head.getSeq[Int](0)
    // distances: c0=25, c1=25, c2=1, c3=1 -> order (2, 3, 0)
    assert(out === Seq(2, 3, 0))
  }

  test("codegen and interpreted nearest-cell agree on real embeddings") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", k = 8, iters = 1)
    val expr = ColumnBridge.expression(Similarity.nearestCell(col("embedding"), cents))
    val viaPlan = emb.select(col("vec_id"),
        Similarity.nearestCell(col("embedding"), cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // interpreted path: evaluate the expression row by row
    val nc = NearestCell(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), true),
      cents)
    val rows = emb.select(col("embedding"), col("vec_id")).queryExecution.toRdd
      .map(r => (r.getLong(1), nc.eval(r).asInstanceOf[Int])).collect().toMap
    assert(rows === viaPlan)
    assert(expr.dataType === org.apache.spark.sql.types.IntegerType)
  }

  // ----- VectorSumF -----------------------------------------------------

  test("vector sum aggregate matches the posexplode-avg formulation") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select((col("vec_id") % 5).as("g"), col("embedding"))
    val viaAgg = emb.groupBy(col("g"))
      .agg(Similarity.vectorSumAgg(col("embedding")).as("vs"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(_ / r.getLong(2)).toVector).toMap
    val viaExplode = emb.select(col("g"), posexplode(col("embedding")))
      .groupBy(col("g"), col("pos")).agg(avg(col("col")).as("m"))
      .collect().groupBy(_.getLong(0))
      .map { case (g, rows) => g -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector }
    assert(viaAgg.keySet === viaExplode.keySet)
    viaAgg.foreach { case (g, v) =>
      v.zip(viaExplode(g)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  // ----- CharNgramsExpr -------------------------------------------------

  test("fused char ngrams match the transform-substr formulation on real docs") {
    // includes zh documents: multibyte UTF-8 must slice on codepoints
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
    val viaTransform = docs.select(col("doc_id"),
        when(length(col("text")) < 3, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), length(col("text")) - 2),
            i => col("text").substr(i, lit(3)))).as("tg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaFused = docs.select(col("doc_id"), TextOps.charNgrams(col("text"), 3).as("tg"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaFused === viaTransform)
  }

  test("fused char ngrams edge cases") {
    val out = Seq("abcd", "ab", "", "你好世界").toDF("text")
      .select(TextOps.charNgrams(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0) === Seq("abc", "bcd"))
    assert(out(1) === Seq.empty)
    assert(out(2) === Seq.empty)
    assert(out(3) === Seq("你好世", "好世界"))
  }

  test("fused char ngrams survive malformed UTF-8 bytes") {
    // a truncated multi-byte lead (0xE4 not followed by continuations):
    // parquet does not validate UTF-8, so the slicer must not crash
    import org.apache.spark.unsafe.types.UTF8String
    val bad = UTF8String.fromBytes(Array(0xE4.toByte, 0x41.toByte, 0x42.toByte, 0x43.toByte))
    val res = graft.functions.CharNgramsExpr.compute(bad, 3)
    assert(res.numElements() === 2) // 4 codepoint starts -> 2 trigrams
  }

  test("ivf centroids tolerate null vectors in the corpus") {
    val rows = Seq(
      (0L, Some(Array(0.0f, 0.0f))),
      (1L, Some(Array(1.0f, 1.0f))),
      (2L, None: Option[Array[Float]]),
      (3L, Some(Array(2.0f, 2.0f))))
      .toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(rows, "vec_id", "embedding", k = 2, iters = 1)
    assert(cents.length === 2)
    assert(cents.forall(_ != null))
  }

  // ----- L2 normalization -----------------------------------------------

  test("dot over l2-normalized vectors equals cosine over the originals") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("va"),
      Similarity.l2Normalize(col("embedding")).as("na"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("vb"),
      Similarity.l2Normalize(col("embedding")).as("nb"))
    val rows = a.join(b, col("a_id") < col("b_id"))
      .select(Similarity.cosine(col("va"), col("vb")).as("c"),
        Similarity.dot(col("na"), col("nb")).as("d"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
    // normalized vectors have unit norm; zero vector passes through
    val norms = emb.select(Similarity.dot(
      Similarity.l2Normalize(col("embedding")), Similarity.l2Normalize(col("embedding"))))
      .collect().map(_.getDouble(0))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-6))
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(Similarity.l2Normalize(col("v"))).collect().head.getSeq[Float](0)
    assert(z === Seq(0.0f, 0.0f))
  }

  // ----- hash sketches --------------------------------------------------

  test("fused minhash keeps the signature invariants") {
    val docs = Seq(
      (0L, "a b c d"), (1L, "d c b a"), // same set, different order
      (2L, "a b c e"),                  // near set
      (3L, ""))                         // empty
      .toDF("doc_id", "text").withColumn("ws", TextOps.tokenSet(col("text")))
    val sigs = Dedup.minhashSignatures(docs, col("doc_id"), col("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(sigs(0L) === sigs(1L))
    assert(sigs(0L) !== sigs(2L))
    // near sets share a large fraction of mins (Pr[share] = Jaccard = 3/5)
    val shared = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(shared > 8, s"only $shared/64 mins shared for J=0.6 sets")
    assert(sigs(0L).length === 64)
    assert(sigs(3L).forall(_ == null)) // empty set -> all-null signature
  }

  test("fused lsh bucket is bit-identical to the column-arithmetic formulation") {
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
    def oldBucket(vec: org.apache.spark.sql.Column, dim: Int, numPlanes: Int) =
      (0 until numPlanes).map { j =>
        val hp = typedLit(Similarity.hyperplane(j, dim))
        val dotJ = aggregate(
          sequence(lit(0), lit(dim - 1)),
          lit(0.0d),
          (acc, i) => acc + element_at(vec, i + 1).cast("double") * element_at(hp, i + 1))
        when(dotJ >= 0.0d, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val both = emb.select(
      Similarity.lshBucket(col("embedding"), 64, 16).as("fused"),
      oldBucket(col("embedding"), 64, 16).as("old"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  // ----- CountIn --------------------------------------------------------

  test("count_in matches the interpreted isin-filter formulation") {
    val docs = Seq(
      "the cat and the hat of a dog",
      "el perro y la casa de que",
      "", "the the the").toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"))
    val words = Seq("the", "a", "of", "and", "to")
    val fused = docs.select(
      ColumnBridge.column(CountIn(ColumnBridge.expression(col("toks")), words)))
      .collect().map(_.getInt(0)).toSeq
    val interpreted = docs.select(
      size(filter(col("toks"), t => t.isin(words.map(lit): _*))))
      .collect().map(_.getInt(0)).toSeq
    assert(fused === interpreted)
    assert(fused === Seq(5, 0, 0, 3))
  }

  test("count_in counts multiplicity and tolerates null elements") {
    val out = Seq(Tuple1(Seq(Some("x"), None, Some("x"), Some("y"))))
      .toDF("arr")
      .select(ColumnBridge.column(CountIn(
        ColumnBridge.expression(col("arr")), Seq("x", "z"))))
      .collect().head.getInt(0)
    assert(out === 2)
  }

  test("langid over the corpus is unchanged by the fused scorer") {
    // pin the aggregate result the CORRECTNESS gate checks, computed on the
    // sf0.001 corpus with the pre-fusion interpreted scorer
    val viaFused = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(TextOps.charNgrams(col("text"), 3).as("tg"))
      .select(TextOps.langIdNgramOn(col("tg")).as("pred_lang"))
      .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaInterpreted = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(TextOps.charNgrams(col("text"), 3).as("tg"))
      .select({
        val scores = TextOps.TrigramProfiles.map { case (lang, p) =>
          lang -> size(filter(col("tg"), t => t.isin(p.map(lit): _*)))
        }
        val maxScore = greatest(scores.map(_._2): _*)
        scores.foldRight(lit("und")) { case ((lang, s), rest) =>
          when(s === maxScore, lit(lang)).otherwise(rest)
        }.as("pred_lang")
      })
      .groupBy(col("pred_lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFused === viaInterpreted)
  }

  // ----- round-4 advice regressions --------------------------------------

  test("top-k heap output order treats -0.0 and 0.0 as equal scores") {
    // insert/evict compare scores with ==, which equates -0.0 and 0.0; the
    // final sort must use the same comparator or a -0.0/0.0 tie can emit
    // ids out of the documented 'score desc, id asc' order
    val h = new TopKHeap(3)
    Seq((0.0, 20L), (-0.0, 10L), (1.0, 5L)).foreach { case (s, id) => h.insert(s, id) }
    val out = h.sortedBestFirst().toSeq
    assert(out.map(_._2) === Seq(5L, 10L, 20L))
  }

  test("ANN top-k rejects non-integral id columns instead of nulling them") {
    val corpus = Seq(("a", Array(1.0f, 0.0f)), ("b", Array(0.0f, 1.0f)))
      .toDF("doc", "v")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("qid", "qv")
    val e = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(corpus, "doc", "v", queries, "qid", "qv", k = 1)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("constant-matrix expressions compare by value, enabling CSE") {
    import graft.functions.LshBucketF
    val child = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType), true)
    def cents = Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f))  // fresh arrays each call
    assert(NearestCell(child, cents) === NearestCell(child, cents))
    assert(NearestCell(child, cents).semanticEquals(NearestCell(child, cents)))
    assert(NearestCell(child, cents).hashCode === NearestCell(child, cents).hashCode)
    assert(NearestCells(child, cents, 2) === NearestCells(child, cents, 2))
    assert(NearestCells(child, cents, 2) !== NearestCells(child, cents, 1))
    def planes = Array(Array(1.0, -1.0), Array(-1.0, 1.0))
    assert(LshBucketF(child, planes) === LshBucketF(child, planes))
    assert(NearestCell(child, cents) !==
      NearestCell(child, Array(Array(9.0f, 9.0f), Array(3.0f, 4.0f))))
  }
}
