package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Specs for split carving, histogram quantiles, KMV overlap, and the
  * int8-quantized similarity path. */
class SketchQuantSpec extends SparkSpec {
  import spark.implicits._

  // ----- deterministic split carving -----------------------------------

  test("splitColumn bands are disjoint, exhaustive, and deterministic") {
    val ids = (0L until 1000L).toDF("id")
    val out = ids.withColumn("split", Sampling.splitColumn(col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L) // every row in exactly one split
    assert(counts.keySet === Set("train", "val", "test"))
    // roughly proportional (hash is uniform-ish over 1000 keys)
    assert(counts("train") > 700L && counts("train") < 900L)
    // pure function of key: a second evaluation matches row-for-row
    val again = ids.withColumn("split", Sampling.splitColumn(col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
    assert(out.except(again).count() === 0L && again.except(out).count() === 0L)
    // split agrees with the hash band it is defined by
    val cross = out.withColumn("b", Sampling.arithBucket(col("id")))
      .filter(
        (col("b") < 80 && col("split") =!= "train") ||
        (col("b") >= 80 && col("b") < 90 && col("split") =!= "val") ||
        (col("b") >= 90 && col("split") =!= "test"))
    assert(cross.count() === 0L)
  }

  test("splitColumn rejects percents that do not sum to 100") {
    val e = intercept[IllegalArgumentException] {
      Sampling.splitColumn(col("id"), Seq("a" -> 50, "b" -> 40))
    }
    assert(e.getMessage.contains("sum to 100"))
  }

  // ----- histogram-sketch quantiles ------------------------------------

  test("histogram quantile upper bounds bracket the exact quantiles") {
    val values = (1 to 500).map(i => ("g", (i * 7 % 1000).toDouble)) ++
      (1 to 300).map(i => ("h", (i * 13 % 2000).toDouble))
    val df = values.toDF("g", "v")
    val width = 100L
    val hist = Sketches.histogram(df, col("g"), col("v"), width, nbins = 24)
    val out = Sketches.histQuantilesMicro(hist, width,
        Seq("p50_ub" -> 500000L, "p90_ub" -> 900000L))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    for ((g, vals) <- values.groupBy(_._1)) {
      val sorted = vals.map(_._2).sorted
      val (n, p50ub, p90ub) = out(g)
      assert(n === sorted.length.toLong)
      def exact(q: Double) = sorted((q * (sorted.length - 1)).toInt)
      // upper bound: at or above the exact quantile, within one bin width
      assert(p50ub >= exact(0.5) && p50ub <= exact(0.5) + width)
      assert(p90ub >= exact(0.9) && p90ub <= exact(0.9) + width)
      assert(p50ub <= p90ub)
    }
  }

  test("winsorize clips to the sketch bounds and matches a driver replay") {
    val values = (1 to 500).map(i => ("g", (i * 7 % 1000).toDouble)) ++
      (1 to 300).map(i => ("h", (i * 13 % 2000).toDouble))
    val df = values.toDF("grp", "v")
    val width = 100L
    val out = Sketches.winsorize(df, col("grp"), col("v"), width, nbins = 24,
        loMicro = 50000L, hiMicro = 950000L)
      .select(col("grp"), col("v"), col("clipped"), col("lo_bound"), col("hi_bound"))
      .collect()
    // bounds replay: first bin whose cumulative count reaches q*n
    val bounds = values.groupBy(_._1).map { case (g, vs) =>
      val bins = vs.map(_._2).map(v => math.min(math.max(v.toLong, 0L) / width, 23L))
      val counts = bins.groupBy(identity).view.mapValues(_.size.toLong)
      val n = bins.size.toLong
      def ub(qMicro: Long): Long = (0L to 23L)
        .find(b => counts.filterKeys(_ <= b).values.sum * 1000000L >= n * qMicro)
        .map(b => (b + 1) * width).get
      g -> ((ub(50000L), ub(950000L)))
    }
    for (r <- out) {
      val (lo, hi) = bounds(r.getString(0))
      assert((r.getLong(3), r.getLong(4)) === ((lo, hi)))
      val expect = math.min(math.max(r.getDouble(1), lo.toDouble), hi.toDouble)
      assert(r.getDouble(2) === expect)
    }
    // every clipped value is inside the bounds
    assert(out.forall(r => r.getDouble(2) >= r.getLong(3) && r.getDouble(2) <= r.getLong(4)))
  }

  test("winsorize passes nulls through and keeps row count") {
    val df = Seq(("g", Some(1.0)), ("g", None), ("g", Some(9.0)), ("g", Some(5.0)),
      ("g", Some(5.0)), ("g", Some(5.0))).toDF("grp", "v")
    val out = Sketches.winsorize(df, col("grp"), col("v"), 1L, 16, 100000L, 900000L)
    assert(out.count() === 6L)
    assert(out.filter(col("v").isNull && col("clipped").isNotNull).count() === 0L)
  }

  test("histogram clamps values outside [0, nbins*width) into edge bins") {
    val df = Seq(("g", -50.0), ("g", 1e9), ("g", 150.0)).toDF("g", "v")
    val bins = Sketches.histogram(df, col("g"), col("v"), width = 100L, nbins = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bins === Map(0L -> 1L, 3L -> 1L, 1L -> 1L))
  }

  test("histogram excludes null values from bins and quantile counts") {
    val df = Seq[(String, java.lang.Double)](
      ("g", 50.0), ("g", 150.0), ("g", null), ("g", null), ("g", null))
      .toDF("g", "v")
    val hist = Sketches.histogram(df, col("g"), col("v"), width = 100L, nbins = 4)
    assert(hist.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      === Map(0L -> 1L, 1L -> 1L))
    val q = Sketches.histQuantilesMicro(hist, 100L, Seq("p50_ub" -> 500000L))
      .collect().head
    assert(q.getLong(1) === 2L, "n must count only non-null values")
    assert(q.getLong(2) === 100L, "p50 over {50,150} is in bin 0")
  }

  test("kmvOverlap returns one all-zero-style row when an input is empty") {
    val a = (0L until 5L).toDF("k")
    val empty = spark.emptyDataFrame.withColumn("k", lit(0L)).filter(lit(false))
    val out = Sketches.kmvOverlap(a, Sampling.arithHash(col("k")),
        empty, Sampling.arithHash(col("k")), k = 16).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_a") === 5L)
    assert(out.head.getAs[Long]("n_b") === 0L)
    assert(out.head.getAs[Long]("inter_k") === 0L)
    assert(out.head.getAs[Long]("jaccard_micro") === 0L)
    assert(out.head.getAs[Long]("union_est_micro") === 5000000L)
  }

  test("weightedPriority rejects fractional weight columns at plan time") {
    val df = Seq((1L, 0.8), (2L, 0.3)).toDF("id", "score")
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedPriority(df, col("id"), col("score"), 1)
    }
    assert(e.getMessage.contains("integral weight column"))
  }

  test("quantizeI8 clamps non-finite elements deterministically") {
    val df = Seq(Tuple1(Array(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)))
      .toDF("v")
    val q = df.select(Similarity.quantizeI8(col("v"), 64).as("q"))
      .collect().head.getSeq[Int](0)
    assert(q === Seq(0, 127, -128))
  }

  test("randomProject matches a driver-side replay of the sign formula") {
    val vecs = (0 until 20).map { r =>
      (r.toLong, Array.tabulate(12)(i => ((r * 31 + i * 7) % 17 - 8).toFloat))
    }
    val got = vecs.toDF("id", "v")
      .select(col("id"), Similarity.randomProject(col("v"), 5).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      val want = Array.tabulate(5) { j =>
        v.indices.map { i =>
          graft.functions.RandomProject.sign(j, i).toDouble * v(i)
        }.sum.toFloat
      }
      assert(got(id).toSeq === want.toSeq, s"id=$id")
    }
    // identical vectors project identically — the projection is a pure
    // function of the vector, so planted-copy recall oracles carry over
    assert(got(0L) === vecs.toDF("id", "v")
      .select(Similarity.randomProject(col("v"), 5).as("p"))
      .limit(1).collect()(0).getSeq[Float](0))
  }

  test("randomProject keeps a planted duplicate rank-1 under projected cosine") {
    val dim = 32
    def mixed(r: Int, i: Int): Float =
      ((r.toLong * 73856093L + i.toLong * 19349663L + 104729L) % 1000003L
        * 2654435761L % 1000003L % 61L - 30L).toFloat
    val corpus = (0 until 200).map { r =>
      (r.toLong, Array.tabulate(dim)(i => mixed(r, i)))
    }
    val dupOf = 123L
    val query = corpus(dupOf.toInt)._2.clone()
    val projected = corpus.toDF("id", "v")
      .select(col("id"), Similarity.randomProject(col("v"), 8).as("p"))
    val q = Seq((999L, query)).toDF("qid", "qv")
      .select(col("qid"), Similarity.randomProject(col("qv"), 8).as("qp"))
    val top = projected.crossJoin(q)
      .withColumn("score", Similarity.cosine(col("p"), col("qp")))
      .orderBy(col("score").desc, col("id")).limit(1)
      .select("id").as[Long].collect()
    assert(top.toSeq === Seq(dupOf))
  }

  test("rerankExact over a true-top-k' shortlist equals brute force, with no corpus shuffle join") {
    // deterministic small corpus: 40 unit-ish vectors + 3 queries
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => (((i * 7 + d * 13) % 17) - 8).toFloat / 8f))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).map { case (i, v) => (i, v) }.toDF("q_id", "q_vec")
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", 3)
      .select("query_id", "rank", "neighbor_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // shortlist = brute-force top-10: contains the true top-3, so the exact
    // rerank must reproduce brute-force top-3 exactly
    val shortlist = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", 10)
    val rr = Similarity.rerankExact(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", shortlist, 3)
    val got = rr.select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === brute)
    val plan = rr.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"rerank joins must broadcast the shortlist, not shuffle the corpus:\n$plan")
  }

  test("quantizeI8 rejects non-positive scales") {
    intercept[IllegalArgumentException](Similarity.quantizeI8(col("v"), 0))
    intercept[IllegalArgumentException](Similarity.quantizeI8(col("v"), -64))
  }

  test("histQuantilesMicro rejects out-of-domain quantiles") {
    val hist = Seq(("g", 0L, 10L)).toDF("g", "bin", "cnt")
    intercept[IllegalArgumentException](
      Sketches.histQuantilesMicro(hist, 100L, Seq("p" -> 9500000L)))
    intercept[IllegalArgumentException](
      Sketches.histQuantilesMicro(hist, 100L, Seq("p" -> 0L)))
  }

  test("weightedPriority rejects weights outside the exact-double domain loudly") {
    val df = Seq((1L, 1L << 33)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedPriority(df, col("id"), col("w"), 1).collect()
    }
    assert(causeMessages(e).contains("weightedPriority"), causeMessages(e))
  }

  // ----- KMV overlap sketch --------------------------------------------

  test("kmvOverlap of a set with itself estimates Jaccard 1") {
    val a = (0L until 200L).toDF("k")
    val out = Sketches.kmvOverlap(a, Sampling.arithHash(col("k")),
        a, Sampling.arithHash(col("k")), k = 16).collect().head
    assert(out.getAs[Long]("n_a") === 16L)
    assert(out.getAs[Long]("inter_k") === 16L)
    assert(out.getAs[Long]("jaccard_micro") === 1000000L)
  }

  test("kmvOverlap of disjoint sets estimates Jaccard 0 and exact small unions") {
    val a = (0L until 5L).toDF("k")
    val b = (1000L until 1005L).toDF("k")
    val out = Sketches.kmvOverlap(a, Sampling.arithHash(col("k")),
        b, Sampling.arithHash(col("k")), k = 16).collect().head
    assert(out.getAs[Long]("n_a") === 5L)
    assert(out.getAs[Long]("n_b") === 5L)
    assert(out.getAs[Long]("inter_k") === 0L)
    assert(out.getAs[Long]("jaccard_micro") === 0L)
    // union has 10 distinct keys < k: sketch is exact
    assert(out.getAs[Long]("union_est_micro") === 10000000L)
  }

  test("kmvOverlap estimates a planted 50% overlap within sketch error") {
    // |A| = |B| = 400, |A∩B| = 200 → true J = 200/600 ≈ 0.333
    val a = (0L until 400L).toDF("k")
    val b = (200L until 600L).toDF("k")
    val out = Sketches.kmvOverlap(a, Sampling.arithHash(col("k")),
        b, Sampling.arithHash(col("k")), k = 64).collect().head
    val j = out.getAs[Long]("jaccard_micro") / 1e6
    assert(j > 0.15 && j < 0.55, s"jaccard estimate $j far from 1/3")
    val u = out.getAs[Long]("union_est_micro") / 1e6
    assert(u > 300 && u < 1200, s"union estimate $u far from 600")
  }

  // ----- Misra-Gries heavy hitters -------------------------------------

  test("freq_sketch with capacity >= distinct items is exact in any merge order") {
    val rows = (0 until 300).map(i => ("g", s"tok${i % 7}"))
    val df = rows.toDF("g", "item").repartition(7) // force partial merges
    val out = Sketches.heavyHitters(df, col("g"), col("item"), capacity = 16)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(out.length === 7)
    for ((item, lb, ub) <- out) {
      assert(lb === truth(item), s"$item lower bound")
      assert(ub === truth(item), s"$item upper bound (no eviction => no error)")
    }
  }

  test("freq_sketch under eviction keeps guaranteed-heavy items within certified bounds") {
    // 1000 occurrences of 'hot' + 900 distinct singletons; capacity 8.
    // n = 1900, err <= n/(cap+1) = 211 < 1000, so 'hot' MUST survive and
    // its bounds must bracket the true count.
    val rows = (0 until 1000).map(_ => ("g", "hot")) ++
      (0 until 900).map(i => ("g", s"rare$i"))
    val df = scala.util.Random.shuffle(rows).toDF("g", "item").repartition(5)
    val out = Sketches.heavyHitters(df, col("g"), col("item"), capacity = 8)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length <= 8)
    val hot = out.find(_._1 === "hot")
    assert(hot.isDefined, "guaranteed-heavy item evicted — MG bound violated")
    val (_, lb, ub) = hot.get
    assert(lb <= 1000L && 1000L <= ub, s"bounds [$lb,$ub] exclude true count 1000")
    assert(ub - lb <= 1900L / 9 + 1, s"certified error ${ub - lb} above n/(c+1)")
    // bounds are sound for every kept item
    val truth = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    for ((item, l, u) <- out) assert(l <= truth(item) && truth(item) <= u, item)
  }

  // ----- weighted priority sampling ------------------------------------

  test("weightedPriority selects the true top-n by integer priority") {
    val rows = (0L until 500L).map(i => (i, 1L + (i * 37 % 1000)))
    val df = rows.toDF("id", "w")
    val out = Sampling.weightedPriority(df, col("id"), col("w"), n = 25)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force replay of the priority formula
    def h(k: Long) = ((k % 1000003L) * 2654435761L + 104729L) % 1000003L
    val expect = rows.map { case (i, w) => (i, w * 1000003L / (h(i) + 1L)) }
      .sortBy { case (i, p) => (-p, i) }.take(25)
    assert(out.map(_._2).toSeq === expect.map(_._1))
    assert(out.map(_._3).toSeq === expect.map(_._2))
    assert(out.map(_._1).toSeq === (1L to 25L))
  }

  // ----- int8 quantized similarity -------------------------------------

  test("quantizeI8 floors, scales, and clamps") {
    val df = Seq(Tuple1(Array(0.51f, -0.26f, 0.99f, 5.0f, -5.0f))).toDF("v")
    val q = df.select(Similarity.quantizeI8(col("v"), 64).as("q"))
      .collect().head.getSeq[Int](0)
    assert(q === Seq(32, -17, 63, 127, -128))
  }

  test("dotI computes the exact integer dot product") {
    val df = Seq((Array(1, -2, 3), Array(4, 5, -6))).toDF("a", "b")
    val d = df.select(Similarity.dotI(col("a"), col("b"))).collect().head.getLong(0)
    assert(d === (4 - 10 - 18).toLong)
  }

  test("ivfQuantizedTopK recalls planted duplicates through probed cells") {
    val rnd = new scala.util.Random(11)
    def unit(): Array[Float] = {
      val v = Array.fill(32)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, unit()))
    val corpus = (base ++ (0L until 5L).map(i => (i + 1000L, base(i.toInt)._2)))
      .toDF("vec_id", "embedding")
    val queries = base.take(5).toDF("q_id", "q_vec")
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 8, iters = 1)
    val top = Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", cents, nprobe = 2, scale = 64, k = 3)
    val rank1 = top.filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    for (q <- 0L until 5L) assert(rank1(q) === q + 1000L,
      s"query $q rank-1 neighbour should be its planted duplicate")
  }

  test("persisted IVF store search equals the direct quantized IVF search") {
    val rnd = new scala.util.Random(23)
    def unit(): Array[Float] = {
      val v = Array.fill(32)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, unit()))
    val corpus = (base ++ (0L until 5L).map(i => (i + 1000L, base(i.toInt)._2)))
      .toDF("vec_id", "embedding")
    val queries = base.take(5).toDF("q_id", "q_vec")
    for (t <- Seq("graft_ivf_spec", "graft_ivf_spec_centroids")) {
      // drop the registration AND any orphaned location from a prior JVM
      // (the per-session metastore forgets tables; the directory survives)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    val cents = Similarity.writeIvfStore(corpus, "vec_id", "embedding",
      "graft_ivf_spec", k = 8, iters = 1, scale = 64, buckets = 4)
    val fromStore = Similarity.searchIvfStore(spark, "graft_ivf_spec",
      queries, "q_id", "q_vec", nprobe = 2, k = 3)
    val direct = Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding",
      queries, "q_id", "q_vec", cents, nprobe = 2, scale = 64, k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(fromStore) === rows(direct))
    // the store side must not exchange: probes broadcast onto the bucketed
    // scan, so the only shuffle in the whole plan is the top-k aggregate
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected only the ranking exchange:\n$plan")
    // and the probed-cell IN filter is PUSHED into the store scan — the
    // literal filter is what drives bucket pruning + row-group skipping
    // (a broadcast join alone would scan every bucket)
    assert(plan.contains("PushedFilters: [In(cell"),
      s"probed cells must reach the scan as a pushed IN filter:\n$plan")
  }

  test("absorbed increment is searched identically to the direct grown-corpus search") {
    val rnd = new scala.util.Random(31)
    def unit(): Array[Float] = {
      val v = Array.fill(32)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, unit()))
    val inc = (0L until 5L).map(i => (i + 2000L, base(i.toInt)._2))
    for (t <- Seq("graft_ivf_abs", "graft_ivf_abs_centroids")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    // train + write on the BASE corpus only, then absorb the increment
    // with the store's persisted geometry
    val cents = Similarity.writeIvfStore(base.toDF("vec_id", "embedding"),
      "vec_id", "embedding", "graft_ivf_abs", k = 8, iters = 1, scale = 64,
      buckets = 4)
    Similarity.appendToIvfStore(spark, "graft_ivf_abs",
      inc.toDF("vec_id", "embedding"), "vec_id", "embedding", buckets = 4)
    val queries = base.take(5).toDF("q_id", "q_vec")
    val fromStore = Similarity.searchIvfStore(spark, "graft_ivf_abs",
      queries, "q_id", "q_vec", nprobe = 2, k = 3)
    // the reference: the grown corpus searched directly under the SAME
    // (base-trained) geometry — exactly what an append must be equivalent to
    val direct = Similarity.ivfQuantizedTopK(
      (base ++ inc).toDF("vec_id", "embedding"), "vec_id", "embedding",
      queries, "q_id", "q_vec", cents, nprobe = 2, scale = 64, k = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(fromStore) === rows(direct))
    // absorbed duplicates surface at rank 1 (self-match excluded by id)
    val rank1 = fromStore.filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    for (q <- 0L until 5L) assert(rank1(q) === q + 2000L)
    // the grown store still prunes + avoids store-side exchange
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(cell"),
      s"probed-cell pushdown lost after absorb:\n$plan")
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected only the ranking exchange:\n$plan")
  }

  test("appendToIvfStore refuses a missing store") {
    val err = intercept[IllegalArgumentException] {
      Similarity.appendToIvfStore(spark, "graft_ivf_nope",
        Seq((1L, Array.fill(32)(0.1f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", buckets = 4)
    }
    assert(err.getMessage.contains("does not exist"))
  }

  test("filtered store search pre-filters: decoy duplicates never rank") {
    val rnd = new scala.util.Random(29)
    def unit(): Array[Float] = {
      val v = Array.fill(32)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, unit(), (i % 3).toInt))
    // per query: one exact copy with the target label, one with a decoy
    val planted = (0L until 5L).flatMap { i =>
      Seq((i + 1000L, base(i.toInt)._2, 7), (i + 2000L, base(i.toInt)._2, 999))
    }
    val corpus = (base ++ planted).toDF("vec_id", "embedding", "lab")
    val queries = base.take(5).map(t => (t._1, t._2)).toDF("q_id", "q_vec")
    val tbl = freshTable("graft_ivf_filt_spec")
    freshTable("graft_ivf_filt_spec_centroids")
    Similarity.writeIvfStore(corpus, "vec_id", "embedding", tbl,
      k = 8, iters = 1, scale = 64, buckets = 4, extras = Seq("lab"))
    val out = Similarity.searchIvfStore(spark, tbl, queries, "q_id", "q_vec",
      nprobe = 2, k = 3, storeFilter = Some(col("lab") === 7))
    out.collect() // finalize AQE
    val neighbors = out.select("query_id", "rank", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // rank 1 per query = its target-label copy; the decoy never appears
    for (q <- 0L until 5L) {
      assert(neighbors.contains((q, 1, q + 1000L)),
        s"query $q should find its label-7 copy at rank 1: ${neighbors.toSeq}")
    }
    assert(!neighbors.exists(_._3 >= 2000L),
      s"decoy-label duplicates must be pre-filtered away: ${neighbors.toSeq}")
    // only label-7 rows competed at all (planted copies are the whole set)
    assert(neighbors.forall(_._3 >= 1000L))
    // the label predicate reaches the store scan next to the cell IN-list
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(lab,7)"),
      s"store filter must push to the parquet scan:\n$plan")
  }

  test("writeIvfStore rejects extras colliding with the store schema") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 0.0f), 3)).toDF("vec_id", "embedding", "cell")
    intercept[IllegalArgumentException] {
      Similarity.writeIvfStore(df, "vec_id", "embedding", "graft_never_written",
        k = 2, iters = 1, scale = 64, extras = Seq("cell"))
    }
  }

  test("searchIvfStore rejects query id columns that collide with the store schema") {
    val err = intercept[IllegalArgumentException] {
      Similarity.searchIvfStore(spark, "graft_ivf_spec",
        Seq((1L, Array.fill(32)(0.1f))).toDF("id", "q_vec"),
        "id", "q_vec", nprobe = 1, k = 1)
    }
    assert(err.getMessage.contains("collides"))
  }

  test("quantizedTopK recalls a planted exact duplicate at rank 1") {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 50L).map(i => (i, unit()))
    // plant exact duplicates of vectors 0..4 at ids 1000..1004
    val corpus = (base ++ (0L until 5L).map(i => (i + 1000L, base(i.toInt)._2)))
      .toDF("vec_id", "embedding")
    val queries = base.take(5).map { case (i, v) => (i, v) }
      .toDF("q_id", "q_vec")
    val top = Similarity.quantizedTopK(corpus, "vec_id", "embedding",
        queries, "q_id", "q_vec", scale = 64, k = 3)
    val rank1 = top.filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    for (q <- 0L until 5L) assert(rank1(q) === q + 1000L,
      s"query $q rank-1 neighbour should be its planted duplicate")
    // k rows per query, ranks dense 1..k
    val perQuery = top.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(perQuery.forall(_ === 3L))
  }
}
