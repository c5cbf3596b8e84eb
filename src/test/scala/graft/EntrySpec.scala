package graft

import graft.SparkSpec

/** Driver-contract smoke: every registered query runs and every oracle key
  * has a query. Runs at sf0.001 to keep the suite fast. */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("every query has an oracle except the documented page-level exemption") {
    // meta_page_level has no DuckDB page-metadata equivalent; its byte
    // accounting is oracle-checked via meta_page_bytes and a byte-exact
    // page_content golden. Nothing else may silently skip the gate.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === Set("meta_page_level"), s"queries without oracles: $missing")
  }

  test("every registered query executes and returns rows at sf0.001") {
    val dir = sf("0.001")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        if (fn(spark, dir).count() >= 0) None else Some(name -> "negative count")
      } catch {
        case e: Throwable => Some(name -> e.toString.take(200))
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("meta_bloom_probe joins probes to bloom rows hash-wise, never nested-loop") {
    val plan = SparkEntry.queries("meta_bloom_probe")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "bloom probe planned a BNLJ")
    assert(!plan.contains("Cartesian"), "bloom probe planned a cartesian")
  }

  test("range_join never degrades to a nested-loop or cartesian plan") {
    // the operator exists to give Catalyst an equi-key where a bare
    // BETWEEN has none; a BNLJ here is the quadratic plan it replaces
    val plan = SparkEntry.queries("range_join")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "range_join planned a BNLJ")
    assert(!plan.contains("Cartesian"), "range_join planned a cartesian")
  }

  test("multi-column prune and page-skip plans stay key-wise, never nested-loop") {
    // every join inside pageSkipReportMulti / readPrunedWhere is on
    // (filepath, row_group_id[, column_id]) keys over metadata-scale rows;
    // a BNLJ or cartesian would mean the conjunction machinery regressed
    for (q <- Seq("meta_prune_multi", "meta_page_skip_multi")) {
      val plan = SparkEntry.queries(q)(spark, sf("0.001"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoop"), s"$q planned a BNLJ")
      assert(!plan.contains("Cartesian"), s"$q planned a cartesian")
    }
  }

  test("interval_join never degrades to a nested-loop or cartesian plan") {
    val plan = SparkEntry.queries("interval_join")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "interval_join planned a BNLJ")
    assert(!plan.contains("Cartesian"), "interval_join planned a cartesian")
  }

  test("dedup_semantic's pair stage is an equi-join, never a cartesian") {
    val plan = SparkEntry.queries("dedup_semantic")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "dedup_semantic planned a BNLJ")
    assert(!plan.contains("Cartesian"), "dedup_semantic planned a cartesian")
  }

  test("event_funnel joins on user_id, never a nested loop") {
    val plan = SparkEntry.queries("event_funnel")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), "event_funnel planned a BNLJ")
    assert(!plan.contains("Cartesian"), "event_funnel planned a cartesian")
  }

  test("heavy_hitters aggregates bounded sketches, not exploded token rows") {
    // the partial freq_sketch must run BEFORE the exchange (map-side), so
    // only capacity-bounded buffers cross the shuffle
    val plan = SparkEntry.queries("heavy_hitters")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_freq_sketch"), s"no map-side partial sketch:\n$plan")
  }

  test("weighted_sample plans a bounded heap, not a global sort") {
    val plan = SparkEntry.queries("weighted_sample")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_score"), s"no partial top-k:\n$plan")
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort "),
      s"weighted_sample planned a sort:\n$plan")
  }

  test("quantized ANN scores int8 vectors through the codegen kernels") {
    val plan = SparkEntry.queries("ann_quantized")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("quantize_i8") && plan.contains("dot_i"),
      s"quantized path missing its kernels:\n$plan")
    assert(plan.contains("partial_top_k_by_score"), "ranking must be the bounded heap")
  }

  test("asof_join is the merge formulation: one window pass, no join") {
    // one shuffle per input keyed by the equi-key, a single window per
    // key, and NO join operator of any kind — per-key cost stays linear
    val plan = SparkEntry.queries("asof_join")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert("Window".r.findAllIn(plan).length === 1, s"expected 1 window:\n$plan")
    assert(!plan.contains("Join"), "asof_join must not plan a join")
  }
}
