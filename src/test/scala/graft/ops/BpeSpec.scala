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

  // ----- word-frequency formulation (Sennrich learn_bpe) ----------------

  /** Deterministic synthetic word corpus: `n` distinct words over a small
    * alphabet with varying lengths and weights 1..4. */
  private def syntheticVocab(n: Int): Seq[(String, Long)] = {
    val alpha = "abcdef"
    (0 until n).map { i =>
      var h = i * 2654435761L + 17
      val len = 8 + (math.abs(h) % 9).toInt
      val sb = new StringBuilder
      for (_ <- 0 until len) {
        h = h * 6364136223846793005L + 1442695040888963407L
        sb += alpha(((h >>> 33) % alpha.length).toInt)
      }
      (sb.result(), 1L + (i % 4))
    }
  }

  test("trainWeighted equals the sequential reference on the expanded corpus") {
    val vocab = syntheticVocab(40)
    // weights = row repetition: expand each word `w` times into its own row
    val expanded = vocab.flatMap { case (word, w) =>
      Seq.fill(w.toInt)(word.map(_.toString).toList)
    }.toList
    val expect = refTrain(expanded, 64)
    val got = Bpe.trainWeighted(
      vocab.map { case (word, w) => (word.map(_.toString): IndexedSeq[String], w) }, 64)
    assert(got === expect)
    assert(got.length === 64) // corpus is rich enough that training never exhausts
  }

  test("trainWeighted is independent of vocabulary ordering") {
    val vocab = syntheticVocab(40)
      .map { case (word, w) => (word.map(_.toString): IndexedSeq[String], w) }
    assert(Bpe.trainWeighted(vocab.reverse, 48) === Bpe.trainWeighted(vocab, 48))
  }

  test("trainOnWords equals sequential BPE over one row per word occurrence") {
    val rows = corpus ++ Seq("low new wide wide", "newest lowest")
    val df2 = rows.map(Tuple1(_)).toDF("text")
    val expanded = rows.flatMap(_.split(" +").filter(_.nonEmpty))
      .map(_.map(_.toString).toList).toList
    val expect = refTrain(expanded, 12)
    val got = Bpe.trainOnWords(df2, col("text"), 12)
    assert(got === expect)
  }

  test("trainOnWords runs O(1) Spark jobs regardless of merge count") {
    val vocab = syntheticVocab(200)
    val df2 = vocab.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .grouped(50).map(ws => Tuple1(ws.mkString(" "))).toSeq.toDF("text")

    def jobsDuring(body: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      // listener events are posted asynchronously and the bus-drain API is
      // private; a settle sleep is accurate enough for a job-count assert
      try { body; Thread.sleep(1500) }
      finally spark.sparkContext.removeSparkListener(l)
      jobs.get()
    }

    var few: Seq[(String, String)] = null
    var many: Seq[(String, String)] = null
    val jobsFew = jobsDuring { few = Bpe.trainOnWords(df2, col("text"), 8) }
    val jobsMany = jobsDuring { many = Bpe.trainOnWords(df2, col("text"), 300) }
    assert(many.length === 300) // the corpus genuinely supports 300 merges
    assert(many.take(8) === few) // greedy prefix property
    // the merge loop is driver-side: job count does not grow with merges
    assert(jobsMany === jobsFew)
    assert(jobsMany <= 4) // the single word-count aggregate (plus AQE stages)
  }

  test("trainWeighted stops when pairs are exhausted") {
    val vocab = Seq((IndexedSeq("a", "b"), 3L), (IndexedSeq("c"), 5L))
    val got = Bpe.trainWeighted(vocab, 10)
    assert(got === Seq(("a", "b")))
  }

  test("trainOnWords splits supplementary characters as code points, not surrogates") {
    // U+1D54F (MATHEMATICAL DOUBLE-STRUCK X) is two UTF-16 chars; a
    // char-level split would learn merges over unpaired surrogates
    val x = new String(Character.toChars(0x1D54F))
    val w = s"a${x}b"
    assert(Bpe.codePointSymbols(w) === IndexedSeq("a", x, "b"))
    val df2 = Seq.fill(3)(Tuple1(s"$w $w")).toDF("text")
    val merges = Bpe.trainOnWords(df2, col("text"), 2)
    // most frequent pair is (a, X) (ties broken lexicographically after
    // count): every learned symbol must be a well-formed string
    assert(merges.nonEmpty)
    merges.flatMap(m => Seq(m._1, m._2)).foreach { sym =>
      sym.split(" ").foreach { part =>
        assert(!part.exists(c => Character.isSurrogate(c) &&
          part.length == 1), s"unpaired surrogate symbol in $sym")
      }
    }
    assert(merges.head._2 === x || merges.head._1 === x)
  }

  test("encoding a seen word equals its progressive training-time state") {
    // the bpe_encode oracle relies on this: applying the trained merges in
    // rank order to a RAW word reproduces the word's final state in the
    // training replay, so encode needs no separate SQL simulation. Pin it
    // by re-running the training merges over the word-frequency table and
    // comparing against applyMerges on raw code-point symbols.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.trainOnWords(docs, col("text"), nMerges = 8)
    val words = Bpe.wordCounts(docs, col("text"))
      .orderBy(col("w").desc).limit(50).collect().map(_.getString(0))
    // sequential progressive state: replay each merge greedily in order
    def progressive(w: String): Seq[String] =
      merges.foldLeft(Bpe.codePointSymbols(w): Seq[String]) { case (s, (l, r)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (t <- s) {
          if (out.nonEmpty && out.last == l && t == r)
            out(out.length - 1) = l + " " + r
          else out += t
        }
        out.toSeq
      }
    val enc = Seq(words.toSeq).flatten.toDF("word")
      .select(col("word"),
        Bpe.applyMerges(regexp_extract_all(col("word"), lit("."), lit(0)), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach(w => assert(enc(w) === progressive(w), s"word '$w'"))
  }

  test("trainOnWords enforces the driver vocabulary cap") {
    val err = intercept[IllegalArgumentException] {
      Bpe.trainOnWords(df, col("text"), 4, maxVocab = 3)
    }
    assert(err.getMessage.contains("maxVocab"))
  }

  test("minCount prefilter trains under a cap the raw vocabulary exceeds") {
    // head: a handful of words frequent enough to drive every merge;
    // tail: hundreds of hapax "words" (the web-scale typo/URL tail) that
    // would blow a small maxVocab if collected
    val head = Seq("lower" -> 40L, "newest" -> 30L, "widest" -> 20L,
      "low" -> 25L, "new" -> 15L)
    val tail = (0 until 400).map(i => s"hapax$i" -> 1L)
    val rows = (head ++ tail).flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
    val df2 = rows.grouped(25).map(ws => Tuple1(ws.mkString(" "))).toSeq.toDF("text")

    // raw distinct count (405) exceeds the cap -> loud failure without the filter
    val err = intercept[IllegalArgumentException] {
      Bpe.trainOnWords(df2, col("text"), 6, maxVocab = 64)
    }
    assert(err.getMessage.contains("maxVocab"))

    // with minCount=2 the collected vocabulary is just the head and fits
    val got = Bpe.trainOnWords(df2, col("text"), 6, maxVocab = 64, minCount = 2L)
    // result equals sequential BPE over the corpus restricted to kept words
    val expanded = head.flatMap { case (w, n) =>
      Seq.fill(n.toInt)(w.map(_.toString).toList) }.toList
    assert(got === refTrain(expanded, 6))
  }
}
