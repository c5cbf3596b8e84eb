package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sequence packing and deterministic sampling. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----- packing --------------------------------------------------------

  test("sequence packing cuts at the token budget in order") {
    val docs = Seq(
      ("a", 1L, 30L), ("a", 2L, 50L), ("a", 3L, 40L), ("a", 4L, 10L),
      ("b", 1L, 150L), ("b", 2L, 10L))
      .toDF("shard", "id", "n_tok")
    val packed = Packing.packSequences(docs, col("shard"), col("id"), col("n_tok"), budget = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // shard a: cum-before 0, 30, 80, 120 -> seqs 0, 0, 0, 1
    assert(packed(("a", 1L)) === 0L)
    assert(packed(("a", 2L)) === 0L)
    assert(packed(("a", 3L)) === 0L)
    assert(packed(("a", 4L)) === 1L)
    // shard b: cum-before 0, 150 -> seqs 0, 1 (oversized doc occupies seq 0 alone)
    assert(packed(("b", 1L)) === 0L)
    assert(packed(("b", 2L)) === 1L)
  }

  test("sequence stats conserve documents and tokens") {
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
    val stats = Packing.sequenceStats(docs, col("source"), col("doc_id"), col("n_tok"), 1024L)
    val (docsOut, toksOut) = stats.agg(sum("n_docs"), sum("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val (docsIn, toksIn) = docs.agg(count(lit(1)), sum("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(docsOut === docsIn)
    assert(toksOut === toksIn)
    // every sequence except possibly the last per shard starts under budget:
    // a doc lands in seq s iff its preceding cumsum is in [s*B, (s+1)*B)
    val bad = stats.filter(col("seq_id") < 0).count()
    assert(bad === 0)
  }

  // ----- sampling -------------------------------------------------------

  test("hash sample is deterministic and approximately sized") {
    val df = spark.range(0, 20000).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, col("id"), 0.25).collect().map(_.getLong(0)).toSet
    assert(a === b) // pure function of the key
    assert(math.abs(a.size / 20000.0 - 0.25) < 0.02)
    // repartitioning must not change the selection (df.sample would)
    val c = Sampling.hashSample(df.repartition(13), col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(c === a)
  }

  test("hash bands of one seed are disjoint and exhaustive") {
    val df = spark.range(0, 5000).toDF("id")
    val lo = Sampling.hashBand(df, col("id"), 0.0, 0.7).collect().map(_.getLong(0)).toSet
    val hi = Sampling.hashBand(df, col("id"), 0.7, 1.0).collect().map(_.getLong(0)).toSet
    assert(lo.intersect(hi).isEmpty)
    assert(lo.size + hi.size === 5000)
  }

  test("different seeds draw independent samples") {
    val df = spark.range(0, 20000).toDF("id")
    val s1 = Sampling.hashSample(df, col("id"), 0.5, seed = 1L).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(df, col("id"), 0.5, seed = 2L).collect().map(_.getLong(0)).toSet
    val overlap = s1.intersect(s2).size.toDouble / 20000.0
    assert(math.abs(overlap - 0.25) < 0.02, s"overlap $overlap should be ~0.25")
  }

  test("mixture keeps per-source rates and drops unknown sources") {
    val df = spark.range(0, 9000)
      .select(col("id"), element_at(
        array(lit("web"), lit("books"), lit("junk")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("source"))
    val kept = Sampling.mixture(df, col("source"), col("id"),
      Map("web" -> 80, "books" -> 20))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("junk")) // unweighted source never passes
    assert(math.abs(kept("web") / 3000.0 - 0.80) < 0.05)
    assert(math.abs(kept("books") / 3000.0 - 0.20) < 0.05)
    // deterministic: repartitioning selects the same rows
    val a = Sampling.mixture(df, col("source"), col("id"), Map("web" -> 80))
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.mixture(df.repartition(17), col("source"), col("id"), Map("web" -> 80))
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Sampling.mixture(df, col("source"), col("id"), Map("web" -> 101))
    }
  }

  test("temperature permilles match exact BigInt arithmetic on skewed sources") {
    // 6000 web / 3000 books / 1000 code; target 5000 of 10000
    val df = spark.range(0, 10000)
      .select(col("id"), when(col("id") % 10 < 6, "web")
        .when(col("id") % 10 < 9, "books").otherwise("code").as("source"))
    val perm = Sampling.temperaturePermilles(df, col("source"), 5000L)
    def expect(n: Long, sw: Long, w: Long) =
      math.min(1000L, 1000L * 5000L * w / (sw * n)).toInt
    // isqrt: 6000->77, 3000->54, 1000->31; sum 162
    assert(perm === Map(
      "web" -> expect(6000, 162, 77),
      "books" -> expect(3000, 162, 54),
      "code" -> expect(1000, 162, 31)))
    // alpha=1/2 flattens: keep RATE must increase as source size decreases
    assert(perm("web") < perm("books") && perm("books") < perm("code"))
  }

  test("temperature mixture is deterministic and hits per-source allocations") {
    val df = spark.range(0, 10000)
      .select(col("id"), when(col("id") % 10 < 6, "web")
        .when(col("id") % 10 < 9, "books").otherwise("code").as("source"))
    val perm = Sampling.temperaturePermilles(df, col("source"), 5000L)
    val kept = Sampling.temperatureMixture(df, col("source"), col("id"), 5000L)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = Map("web" -> 6000L, "books" -> 3000L, "code" -> 1000L)
    sizes.foreach { case (s, n) =>
      assert(math.abs(bySrc(s).toDouble / n - perm(s) / 1000.0) < 0.03,
        s"$s kept ${bySrc(s)} of $n vs permille ${perm(s)}")
    }
    // pure function of the key: repartitioning selects the SAME rows
    val a = kept.collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMixture(df.repartition(17), col("source"),
      col("id"), 5000L).collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("temperature mixture drops a source only when its allocation rounds to zero") {
    val df = spark.range(0, 4000)
      .select(col("id"), when(col("id") < 3996, "big").otherwise("tiny").as("source"))
    // target so small that big's permille floors to 0 but tiny's stays > 0:
    // w(big)=63, w(tiny)=2, sw=65; big: 1000*T*63/(65*3996) -> 0 for T<5
    val perm = Sampling.temperaturePermilles(df, col("source"), 4L)
    assert(perm("big") === 0)
    assert(perm("tiny") > 0)
    val kept = Sampling.temperatureMixture(df, col("source"), col("id"), 4L)
    assert(kept.filter(col("source") === "big").count() === 0L)
  }

  test("per-group quota matches the sort-based selection") {
    val df = spark.range(0, 2000)
      .select(col("id"), pmod(col("id"), lit(7)).as("g"))
    val viaQuota = Sampling.quotaPerGroup(df, col("g"), col("id"), 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: full sort by (bucket desc, id asc), take 12 per group
    val scored = df.select(col("g"), col("id"),
      Sampling.arithBucket(col("id")).as("hv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val viaSort = scored.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy { case (_, id, hv) => (-hv, id) }.take(12).toSeq
    }.map { case (g, id, _) => (g, id) }.toSet
    assert(viaQuota === viaSort)
    assert(viaQuota.groupBy(_._1).forall(_._2.size == 12))
  }

  test("budget carve equals the global windowed prefix at every budget") {
    val df = spark.range(0, 500)
      .select(col("id"), (pmod(col("id") * 37, lit(19)) + 1).as("cost"))
    // brute-force reference: cumulative cost in (arithHash(id), id) order
    val scored = df.select(col("id"), col("cost"),
      Sampling.arithHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, _, h) => (h, id) }
    val cum = scored.scanLeft(0L)(_ + _._2).tail
    val total = cum.last
    for (budget <- Seq(0L, 1L, total / 100, total / 3, total - 1, total, total + 7)) {
      val want = scored.zip(cum).takeWhile(_._2 <= budget).map(_._1._1).toSet
      val got = Sampling.budgetCarve(df, col("id"), col("cost"), budget)
        .select("id").as[Long].collect().toSet
      assert(got === want, s"budget=$budget")
    }
  }

  test("budget carve is stable under repartitioning and keeps original columns") {
    val df = spark.range(0, 300).select(col("id"),
      (pmod(col("id"), lit(11)) + 1).as("cost"), lit("x").as("tag"))
    val a = Sampling.budgetCarve(df, col("id"), col("cost"), 700L)
    assert(a.columns.toSeq === Seq("id", "cost", "tag"))
    val b = Sampling.budgetCarve(df.repartition(13), col("id"), col("cost"), 700L)
    assert(a.select("id").as[Long].collect().toSet ===
      b.select("id").as[Long].collect().toSet)
    // null keys/costs are dropped, not carried into the prefix
    val withNulls = df.unionByName(spark.sql(
      "SELECT CAST(9999 AS BIGINT) id, CAST(NULL AS BIGINT) cost, 'x' tag " +
        "UNION ALL SELECT CAST(NULL AS BIGINT), CAST(5 AS BIGINT), 'x'"))
    val c = Sampling.budgetCarve(withNulls, col("id"), col("cost"), 700L)
    assert(c.select("id").as[Long].collect().toSet ===
      a.select("id").as[Long].collect().toSet)
  }

  test("per-group budget carve equals per-group windowed prefixes; unknown groups drop") {
    val df = spark.range(0, 600).select(col("id"),
      element_at(array(lit("web"), lit("code"), lit("books")),
        (pmod(col("id"), lit(3)) + 1).cast("int")).as("src"),
      (pmod(col("id") * 13, lit(23)) + 1).as("cost"))
    // books is missing from the budgets: dropped entirely; web's budget
    // exceeds its total: kept whole; code crosses mid-bucket
    val budgets = Map("web" -> 1000000L, "code" -> 900L)
    val got = Sampling.budgetCarvePerGroup(df, col("src"), col("id"), col("cost"), budgets)
    assert(got.columns.toSeq === Seq("id", "src", "cost"))
    val gotIds = got.select("id").as[Long].collect().toSet
    val scored = df.select(col("id"), col("src"), col("cost"),
      Sampling.arithHash(col("id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = scored.groupBy(_._2).collect {
      case (g, rows) if budgets.contains(g) =>
        val ordered = rows.sortBy { case (id, _, _, h) => (h, id) }
        val cum = ordered.scanLeft(0L)(_ + _._3).tail
        ordered.zip(cum).takeWhile(_._2 <= budgets(g)).map(_._1._1)
    }.flatten.toSet
    assert(gotIds === want)
    // web kept whole, books absent
    val bySrc = got.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("web") === 200L && !bySrc.contains("books"))
    // stable under repartition
    val again = Sampling.budgetCarvePerGroup(
      df.repartition(17), col("src"), col("id"), col("cost"), budgets)
    assert(again.select("id").as[Long].collect().toSet === gotIds)
  }

  test("mass carve equals per-group (mass desc, id) prefixes at every permille and width") {
    val df = spark.range(0, 400).select(col("id"),
      element_at(array(lit("a"), lit("b")), (pmod(col("id"), lit(2)) + 1).cast("int")).as("g"),
      (pmod(col("id") * 211, lit(997)) + 1).as("m"))
    val scored = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    for (permille <- Seq(0, 250, 800, 1000); width <- Seq(1L, 64L, 100000L)) {
      val want = scored.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val ordered = rows.sortBy { case (id, _, m) => (-m, id) }
        val thr = ordered.map(_._3).sum * permille / 1000
        val cum = ordered.scanLeft(0L)(_ + _._3).tail
        ordered.zip(cum).takeWhile(_._2 <= thr).map(_._1._1).toSeq
      }.toSet
      val got = Sampling.massCarve(df, col("g"), col("id"), col("m"), permille, width)
        .select("id").as[Long].collect().toSet
      assert(got === want, s"permille=$permille width=$width")
    }
    // permille 1000 keeps everything; columns survive untouched
    val all = Sampling.massCarve(df, col("g"), col("id"), col("m"), 1000)
    assert(all.count() === 400 && all.columns.toSeq === Seq("id", "g", "m"))
  }

  test("mass carve threshold is exact when total*permille would overflow long") {
    // 12 rows of ~1e15 mass: tot ~1.2e16, tot*997 wraps past Long.MaxValue
    // — the decomposed threshold must still equal the BigInt floor
    val df = spark.range(0, 12).select(col("id"), lit("g").as("g"),
      (lit(1000000000000000L) + col("id") * 7919L).as("m"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(2)))
    val ordered = rows.sortBy { case (id, m) => (-m, id) }
    val thr = ordered.map(v => BigInt(v._2)).sum * 997 / 1000
    val cum = ordered.scanLeft(BigInt(0))(_ + _._2).tail
    val want = ordered.zip(cum).takeWhile(_._2 <= thr).map(_._1._1).toSet
    val got = Sampling.massCarve(df, col("g"), col("id"), col("m"), 997)
      .select("id").as[Long].collect().toSet
    assert(want.nonEmpty && want.size < 12)
    assert(got === want)
  }

  test("budget carve rejects fractional costs at plan time, negative costs loudly") {
    val frac = spark.range(0, 10).select(col("id"), (col("id") * 0.5).as("cost"))
    val e1 = intercept[IllegalArgumentException](
      Sampling.budgetCarve(frac, col("id"), col("cost"), 100L))
    assert(e1.getMessage.contains("integral cost column"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.budgetCarvePerGroup(frac.withColumn("g", lit("a")),
        col("g"), col("id"), col("cost"), Map("a" -> 100L)))
    assert(e2.getMessage.contains("integral cost column"))
    val neg = spark.range(0, 10).select(col("id"), (lit(5L) - col("id")).as("cost"))
    val e3 = intercept[Exception](
      Sampling.budgetCarve(neg, col("id"), col("cost"), 100L).collect())
    assert(causeMessages(e3).contains("negative cost"))
  }

  test("pii redaction replaces emails, ips and phones and nothing else") {
    val rows = Seq(
      (1L, "write to alice.smith+x@sub.example.org today"),
      (2L, "server at 10.0.3.77 answered"),
      (3L, "call 555-867-5309 or 555.867.5309 now"),
      (4L, "no pii here, just 12345 and a.b"),
      (5L, "mixed bob@x.io at 192.168.1.1 call 123-456-7890"))
      .toDF("id", "t")
      .select(col("id"), TextOps.redactPii(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "write to <EMAIL> today")
    assert(rows(2L) === "server at <IP> answered")
    assert(rows(3L) === "call <PHONE> or <PHONE> now")
    assert(rows(4L) === "no pii here, just 12345 and a.b")
    assert(rows(5L) === "mixed <EMAIL> at <IP> call <PHONE>")
  }

  // ----- deterministic shard + order ------------------------------------

  test("shardAndOrder gives dense 0-based positions per shard, stable under repartition") {
    val ids = (0L until 100L).toDF("id")
    val out = Packing.shardAndOrder(ids, col("id"), Sampling.arithHash(col("id")), 4)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense positions within each shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted === (0L until g.length.toLong).toArray)
    }
    // pure function of the key set: identical layout after repartition
    val again = Packing.shardAndOrder(ids.repartition(7), col("id"),
      Sampling.arithHash(col("id")), 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sortBy(_._1) === again.sortBy(_._1))
    assert(rows.map(_._2).distinct.length === 4)
  }

  // ----- substring-level dedup ------------------------------------------

  test("duplicated span stats count cross-doc and within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d"),     // spans: "a b" "b c" "c d"
      (2L, "c d e"),       // spans: "c d" "d e" — shares "c d" with doc 1
      (3L, "x y x y x"),   // every bigram span repeats within the doc
      (4L, "q r")          // one unique span, no duplication
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((3L, 1L)), 2L -> ((2L, 1L)), 3L -> ((4L, 4L)), 4L -> ((1L, 0L))))
  }

  test("documents shorter than the span width produce no span row") {
    val docs = Seq((1L, "only three words"), (2L, "a b c d e")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(2L))
  }

  test("chunkTokens covers every token with stride overlap, stops at the end") {
    val toks = (1 to 10).map(i => s"t$i")
    val df = Seq(Tuple1(toks)).toDF("toks")
    val chunks = df.select(TextOps.chunkTokens(col("toks"), size = 4, stride = 3).as("c"))
      .selectExpr("c").as[Seq[Seq[String]]].head()
    // starts 0,3,6: chunk 2 reaches token 10, so no redundant [t10] tail
    // (it would be a strict subset of chunk 2 — duplicate content)
    assert(chunks === Seq(
      Seq("t1", "t2", "t3", "t4"),
      Seq("t4", "t5", "t6", "t7"),
      Seq("t7", "t8", "t9", "t10")))
    // disjoint chunking when stride == size
    val disjoint = df.select(TextOps.chunkTokens(col("toks"), 5, 5).as("c"))
      .as[Seq[Seq[String]]].head()
    assert(disjoint === Seq((1 to 5).map(i => s"t$i"), (6 to 10).map(i => s"t$i")))
    // a doc no longer than size is one whole chunk
    val short = df.select(TextOps.chunkTokens(col("toks"), 10, 3).as("c"))
      .as[Seq[Seq[String]]].head()
    assert(short === Seq(toks))
    // short tail past the overlap still gets its own chunk (new content)
    val tail = Seq(Tuple1((1 to 12).map(i => s"t$i")))
      .toDF("toks")
      .select(TextOps.chunkTokens(col("toks"), 4, 3).as("c"))
      .as[Seq[Seq[String]]].head()
    // starts 0,3,6,9 — chunk at 9 holds t10..t12, t12 appears nowhere else
    assert(tail.last === Seq("t10", "t11", "t12"))
    assert(tail.length === 4)
  }

  test("chunkTokens matches a brute-force reference on random lengths and geometries") {
    val rnd = new scala.util.Random(5)
    def reference(len: Int, size: Int, stride: Int): Seq[Seq[String]] = {
      val toks = (1 to len).map(i => s"t$i")
      if (len == 0) Seq.empty
      else {
        val n = if (len <= size) 1 else (len - size + stride - 1) / stride + 1
        (0 until n).map(i => toks.slice(i * stride, math.min(i * stride + size, len)))
      }
    }
    for (_ <- 0 until 25) {
      val len = rnd.nextInt(30)
      val size = rnd.nextInt(8) + 1
      val stride = rnd.nextInt(8) + 1
      val got = Seq(Tuple1((1 to len).map(i => s"t$i")))
        .toDF("toks")
        .select(TextOps.chunkTokens(col("toks"), size, stride).as("c"))
        .as[Seq[Seq[String]]].head()
      assert(got === reference(len, size, stride),
        s"len=$len size=$size stride=$stride")
    }
  }

  test("chunkTokens yields no chunks for empty or null input") {
    val df = Seq((1L, Seq.empty[String]), (2L, null)).toDF("id", "toks")
    val out = df.select(col("id"), TextOps.chunkTokens(col("toks"), 4, 3).as("c"))
      .collect().map(r =>
        r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[scala.collection.Seq[_]]))
      .toMap
    assert(out(1L).exists(_.isEmpty))
    assert(out(2L).forall(_.isEmpty)) // null tokens: no chunks (empty or null ok)
    intercept[IllegalArgumentException] { TextOps.chunkTokens(col("toks"), 0, 3) }
    intercept[IllegalArgumentException] { TextOps.chunkTokens(col("toks"), 4, 0) }
  }
}
