package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/**
 * Streaming specs: each pipeline runs over a real `readStream` file source
 * into a memory sink with Trigger.AvailableNow, proving the streaming
 * wiring (watermarks, session windows, stateful dedup) — not just the
 * batch-equivalent transform.
 */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private lazy val eventsDf = Seq(
    (1L, ts(0), 1.0),
    (1L, ts(5), 2.0),   // same session as minute 0 (gap 10m)
    (1L, ts(40), 3.0),  // new session
    (2L, ts(0), 4.0),
    (2L, ts(45), 5.0),  // new session
    (2L, ts(46), 6.0)).toDF("user_id", "ts", "value")

  /** Write events as parquet, stream them through `f`, return the sink.
    * Aggregations need `complete`/`update` mode here: in a single
    * AvailableNow batch the watermark never closes a window, so `append`
    * would emit nothing. */
  private def runStream(name: String, mode: String = "append")(
      f: DataFrame => DataFrame): DataFrame = {
    val dir = Files.createTempDirectory(s"graft_stream_$name").toString
    eventsDf.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(eventsDf.schema).parquet(dir)
    val q = f(src).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory(s"ckpt_$name").toString)
      .start()
    q.awaitTermination(60000)
    spark.table(name)
  }

  test("text-pipeline transforms produce identical rows on batch and stream") {
    // the narrow pipeline ops (quality gate, language ID, fingerprint,
    // Bloom decontamination prefilter) are pure projections/filters, so
    // the SAME function runs on spark.read and spark.readStream — the
    // backfill/incremental parity a production pipeline needs
    import org.apache.spark.sql.functions._
    import graft.ops.{Decontam, TextOps}
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
      .select(col("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") < 10)
    val bloom = Decontam.benchmarkBloom(bench, "text", n = 8)
    val pipeline: DataFrame => DataFrame = df => df
      .withColumn("q_micro", floor(TextOps.qualityScore(col("text")) * 1000000.0d))
      .filter(col("q_micro") >= 500000L)
      .withColumn("lang", TextOps.langIdNgramOn(TextOps.charNgrams(col("text"), 3)))
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("flagged", Decontam.anyInBloom(Decontam.shingles(col("text"), 8), bloom))
      .select("doc_id", "q_micro", "lang", "fp", "flagged")

    val dir = Files.createTempDirectory("graft_stream_docs").toString
    docs.coalesce(2).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(docs.schema).parquet(dir)
    val q = pipeline(src).writeStream
      .format("memory").queryName("stream_pipeline").outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_docs").toString)
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stream_pipeline").collect().map(_.toSeq).toSet
    val batch = pipeline(spark.read.parquet(dir)).collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the planted benchmark docs flag themselves (self-overlap), unless too
    // short to shingle
    val flaggedIds = spark.table("stream_pipeline")
      .filter(col("flagged")).select("doc_id").collect().map(_.getLong(0)).toSet
    val longBench = pipeline(bench).filter(col("flagged"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(longBench.subsetOf(flaggedIds))
  }

  test("streaming ANN: a query-vector stream ranks against the static corpus") {
    // stream-static join + the bounded top-k aggregate in update mode: the
    // retrieval shape of a live embedding service. The static corpus is
    // scanned per micro-batch; per-query state is the k-entry heap.
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    val emb = spark.read.parquet(sf("0.001") + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val dir = Files.createTempDirectory("graft_stream_ann").toString
    queries.coalesce(1).write.mode("overwrite").parquet(dir)
    val qStream = spark.readStream.schema(queries.schema).parquet(dir)
    val ranked = qStream.join(emb, col("vec_id") =!= col("q_id"))
      .withColumn("score", Similarity.cosine(col("q_vec"), col("embedding")))
      .groupBy(col("q_id"))
      .agg(Similarity.topKAgg(col("score"), col("vec_id"), 3).as("top"))
    val q = ranked.writeStream
      .format("memory").queryName("ann_stream").outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_ann").toString)
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("ann_stream")
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.id").as("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "q_id", "q_vec", 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.size === 15) // 5 queries x k=3
  }

  test("streaming sessionization groups events by gap windows") {
    val sessions = runStream("sessions", "complete") { src =>
      StreamOps.sessionize(src, "ts", "user_id", "10 minutes")
    }.collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    // user 1: [0,5] then [40]; user 2: [0] then [45,46]
    assert(sessions.toSet === Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0), (2L, 2L, 11.0)))
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val deduped = runStream("dedup") { src =>
      StreamOps.dedupStream(src, "ts", Seq("user_id"), "2 hours")
    }
    assert(deduped.select("user_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("windowed counts bucket all events") {
    val counts = runStream("wincounts", "complete") { src =>
      StreamOps.windowedCounts(src, "ts", "30 minutes", "30 minutes")
    }.collect().map(_.getLong(1))
    assert(counts.sum === 6L)
  }

  test("stateful running totals accumulate per user") {
    val totals = runStream("totals", "update") { src =>
      StreamOps.runningTotals(src.as[UserEvent](StreamOps.userEventEnc)).toDF()
    }.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(totals(1L) === ((3L, 6.0)))
    assert(totals(2L) === ((3L, 15.0)))
  }

  test("sessionize is batch/stream agnostic (same answer on spark.read)") {
    val batch = StreamOps.sessionize(eventsDf, "ts", "user_id", "10 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(batch.toSet === Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0), (2L, 2L, 11.0)))
  }

  test("closedSessions emits finished sessions only, recovering state across runs") {
    // Run 1: user 1 events at minutes 0,5,40 — the (0,5) session closes
    // when minute 40 arrives IN the same batch; (40) stays open in state.
    // User 2: (0) closes when 45 arrives; (45,46) stays open.
    val dir = Files.createTempDirectory("graft_stream_fmgws").toString
    val ckpt = Files.createTempDirectory("ckpt_fmgws").toString
    // parquet sink, not memory: the memory sink cannot recover from a
    // checkpoint, and run 2 exercises exactly that recovery
    val outDir = Files.createTempDirectory("out_fmgws").toString
    eventsDf.coalesce(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(eventsDf.schema).parquet(dir)
      val q = StreamOps.closedSessions(
          src.as[UserEvent](StreamOps.userEventEnc), gapMs = 10 * 60 * 1000L)
        .toDF()
        .writeStream.format("parquet").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .start()
      q.awaitTermination(60000)
    }
    def sink(): Set[(Long, Long, Double)] = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    runOnce()
    assert(sink() === Set((1L, 2L, 3.0), (2L, 1L, 4.0)))

    // Run 2 (same checkpoint): a minute-80 event for user 1 arrives — the
    // open (40) session restored from state must close and emit.
    Seq((1L, Timestamp.valueOf("2024-01-01 11:20:00"), 9.0))
      .toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    assert(sink().contains((1L, 1L, 3.0)), s"open session not closed: ${sink()}")
  }

  test("closedSessions does not swallow an out-of-order event into a later session") {
    // Run 1 leaves an open session at 12:30. Run 2 delivers an
    // out-of-order event at 11:40 — ABOVE the watermark (Spark drops
    // sub-watermark rows before flatMapGroupsWithState under
    // EventTimeTimeout), but 50 minutes BEFORE the open session with a
    // 10-minute gap. A signed `t - last <= gap` merge guard would fuse
    // them into one session bridging the 50-minute silence; the sorted
    // sweep must instead emit {11:40} as its own superseded session and
    // keep (12:30) open.
    val dir = Files.createTempDirectory("graft_stream_ooo").toString
    val ckpt = Files.createTempDirectory("ckpt_ooo").toString
    val outDir = Files.createTempDirectory("out_ooo").toString
    def addEvents(rows: (Long, String, Double)*): Unit =
      rows.map { case (u, t, v) => (u, Timestamp.valueOf(t), v) }
        .toDF("user_id", "ts", "value").coalesce(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(eventsDf.schema).parquet(dir)
      val q = StreamOps.closedSessions(
          src.as[UserEvent](StreamOps.userEventEnc), gapMs = 10 * 60 * 1000L)
        .toDF()
        .writeStream.format("parquet").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .option("path", outDir)
        .start()
      q.awaitTermination(60000)
    }
    addEvents((2L, "2024-01-01 12:30:00", 7.0))
    runOnce() // open (12:30) in state; watermark -> 11:30
    addEvents((2L, "2024-01-01 11:40:00", 8.0)) // out-of-order, above watermark
    runOnce()
    val sessions = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    assert(sessions === Set((2L, 1L, 8.0)),
      s"the 11:40 event must close alone, not merge forward: $sessions")
  }

  test("closedSessions on a batch dataset closes successor-bounded sessions") {
    val closed = StreamOps.closedSessions(
        eventsDf.as[UserEvent](StreamOps.userEventEnc), gapMs = 10 * 60 * 1000L)
      .collect().map(c => (c.user_id, c.n_events, c.value_sum)).toSet
    assert(closed === Set((1L, 2L, 3.0), (2L, 1L, 4.0)))
  }

  private lazy val priceDim = Seq(
    (1L, 0L, 10.0),
    (1L, 20L, 11.0),
    (2L, 5L, 20.0)).toDF("user_id", "price_ts", "price")

  private lazy val tickEvents = Seq(
    (1L, 0L, "a"),   // equal ts: inclusive match at price 10.0
    (1L, 25L, "b"),  // between updates: carries price 11.0
    (2L, 3L, "c"),   // before user 2's first price: nulls (left semantics)
    (3L, 9L, "d")    // unknown key: nulls
  ).toDF("user_id", "ev_ts", "tag")

  test("enrichAsOf matches the batch as-of join where matches exist, keeps misses") {
    val got = StreamOps.enrichAsOf(tickEvents, priceDim, Seq("user_id"), "ev_ts", "price_ts")
      .select("user_id", "ev_ts", "tag", "price_ts", "price")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toSet
    assert(got === Set(
      (1L, 0L, "a", Some(0L), Some(10.0)),
      (1L, 25L, "b", Some(20L), Some(11.0)),
      (2L, 3L, "c", None, None),
      (3L, 9L, "d", None, None)))
    // parity: the matched subset equals TemporalJoin.asofBackward (inner)
    import graft.ops.TemporalJoin
    val inner = TemporalJoin.asofBackward(
        tickEvents, priceDim, Seq("user_id"), "ev_ts", "price_ts")
      .select("user_id", "ev_ts", "tag", "price_ts", "price")
      .as[(Long, Long, String, Long, Double)].collect().toSet
    val matched = got.collect { case (u, e, t, Some(p), Some(v)) => (u, e, t, p, v) }
    assert(matched === inner)
  }

  test("enrichAsOf: null keys match nothing, mirroring the batch operator") {
    val dim = Seq((Option.empty[Long], 0L, 5.0), (Some(1L), 0L, 10.0))
      .toDF("user_id", "price_ts", "price")
    val ev = Seq((Option.empty[Long], 5L, "x"), (Some(1L), 5L, "y"))
      .toDF("user_id", "ev_ts", "tag")
    val got = StreamOps.enrichAsOf(ev, dim, Seq("user_id"), "ev_ts", "price_ts")
      .select("tag", "price").collect()
      .map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(got === Set(("x", None), ("y", Some(10.0))))
  }

  test("enrichAsOf matches asofBackward on random keyed data (matched subset)") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(77)
    for (round <- 0 until 8) {
      val dim = Seq.fill(15)((rnd.nextInt(3).toLong, rnd.nextInt(12).toLong, rnd.nextLong()))
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq // unique per (key, ts)
        .toDF("user_id", "price_ts", "price")
      val ev = Seq.fill(20)((rnd.nextInt(4).toLong, rnd.nextInt(12).toLong, rnd.nextLong()))
        .toDF("user_id", "ev_ts", "tag")
      val enriched = StreamOps.enrichAsOf(ev, dim, Seq("user_id"), "ev_ts", "price_ts")
        .filter(col("price_ts").isNotNull)
        .select("user_id", "ev_ts", "tag", "price_ts", "price")
        .as[(Long, Long, Long, Long, Long)].collect()
      val inner = graft.ops.TemporalJoin.asofBackward(
          ev, dim, Seq("user_id"), "ev_ts", "price_ts")
        .select("user_id", "ev_ts", "tag", "price_ts", "price")
        .as[(Long, Long, Long, Long, Long)].collect()
      // multiset comparison: duplicate events must enrich once each
      assert(enriched.sorted.toSeq === inner.sorted.toSeq, s"round $round")
    }
  }

  test("enrichAsOf runs as a STATELESS streaming transform in append mode") {
    val dir = Files.createTempDirectory("graft_stream_asof").toString
    tickEvents.coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(tickEvents.schema).parquet(dir)
    val q = StreamOps.enrichAsOf(src, priceDim, Seq("user_id"), "ev_ts", "price_ts")
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_asof").toString)
      .start()
    q.awaitTermination(60000)
    val got = spark.table("asof_enrich")
      .select("user_id", "ev_ts", "price").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got === Set(
      (1L, 0L, Some(10.0)), (1L, 25L, Some(11.0)),
      (2L, 3L, None), (3L, 9L, None)))
  }

  test("histogram sketch runs unchanged on a stream (backfill/live parity)") {
    // Sketches.histogram is select/filter/groupBy-count — engine-agnostic,
    // so the 100 TB backfill and its streaming tail share one code path.
    import graft.ops.Sketches
    import org.apache.spark.sql.functions.col
    val rows = Seq(("g", 50.0), ("g", 150.0), ("g", 450.0), ("h", 10.0))
    val dir = Files.createTempDirectory("graft_stream_hist").toString
    rows.toDF("g", "v").coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("g", "string").add("v", "double")
    val src = spark.readStream.schema(schema).parquet(dir)
    val q = Sketches.histogram(src, col("g"), col("v"), width = 100L, nbins = 4)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_hist").toString)
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("hist_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.histogram(rows.toDF("g", "v"), col("g"), col("v"), 100L, 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(batch === Set(("g", 0L, 1L), ("g", 1L, 1L), ("g", 3L, 1L), ("h", 0L, 1L)))
  }

  test("streamingHeavyHitters accumulates exact counts across runs (no eviction)") {
    val dir = Files.createTempDirectory("graft_stream_hh").toString
    val ckpt = Files.createTempDirectory("ckpt_hh").toString
    val outDir = Files.createTempDirectory("out_hh").toString
    def tokens(rows: (String, String)*): Unit =
      rows.toDF("group", "item").coalesce(1).write.mode("append").parquet(dir)
    def runOnce(): Unit = {
      val schema = new org.apache.spark.sql.types.StructType()
        .add("group", "string").add("item", "string")
      val src = spark.readStream.schema(schema).parquet(dir)
      implicit val ev: org.apache.spark.sql.Encoder[ItemEvent] =
        org.apache.spark.sql.Encoders.product[ItemEvent]
      // foreachBatch parquet append: the file sink is Append-only and the
      // memory sink cannot recover a checkpoint; this sink supports both
      // Update output and run-2 state recovery
      val q = StreamOps.streamingHeavyHitters(src.as[ItemEvent], capacity = 8)
        .toDF()
        .writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination(60000)
    }
    tokens(("g", "a"), ("g", "a"), ("g", "b"), ("h", "x"))
    runOnce()
    // Run 2 (same checkpoint): counters restored from state keep counting
    tokens(("g", "a"), ("g", "b"), ("g", "c"))
    runOnce()
    // latest snapshot per (group, item): under capacity there is no
    // eviction, so bounds collapse to exact cumulative counts
    val last = spark.read.parquet(outDir).groupBy("group", "item")
      .agg(org.apache.spark.sql.functions.max("count_lb").as("lb"),
        org.apache.spark.sql.functions.max("count_ub").as("ub"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(last(("g", "a")) === ((3L, 3L)))
    assert(last(("g", "b")) === ((2L, 2L)))
    assert(last(("g", "c")) === ((1L, 1L)))
    assert(last(("h", "x")) === ((1L, 1L)))
  }

  test("streamingHeavyHitters keeps per-group state bounded under eviction") {
    // 30 distinct singletons + a hot item through a capacity-4 sketch, in
    // ONE batch: state and every emitted snapshot hold <= 4 items, the hot
    // item survives with sound certified bounds.
    val rows = (0 until 30).map(i => ("g", s"rare$i")) ++
      (0 until 40).map(_ => ("g", "hot"))
    val dir = Files.createTempDirectory("graft_stream_hh2").toString
    scala.util.Random.shuffle(rows).toDF("group", "item")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("group", "string").add("item", "string")
    val src = spark.readStream.schema(schema).parquet(dir)
    implicit val ev: org.apache.spark.sql.Encoder[ItemEvent] =
      org.apache.spark.sql.Encoders.product[ItemEvent]
    val q = StreamOps.streamingHeavyHitters(src.as[ItemEvent], capacity = 4)
      .toDF()
      .writeStream.format("memory").queryName("hh_evict")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", Files.createTempDirectory("ckpt_hh2").toString)
      .start()
    q.awaitTermination(60000)
    val snap = spark.table("hh_evict").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(snap.length <= 4, s"sketch exceeded capacity: ${snap.toSeq}")
    val hot = snap.find(_._1 === "hot")
    assert(hot.isDefined, "guaranteed-heavy item evicted")
    assert(hot.get._2 <= 40L && 40L <= hot.get._3,
      s"bounds ${hot.get} exclude true count 40")
  }
}
