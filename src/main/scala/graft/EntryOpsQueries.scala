package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.meta.{AvroMeta, DeltaMeta, FooterEdit, IcebergMeta, MetaPrune, MetaValues, OrcPrune}
import graft.ops.{Bpe, Bucketing, Clustering, ConnectedComponents, Decontam, Dedup, Drift, Layout, Lines, MediaRecord, Multimodal, Packing, PageRank, Profile, RangeJoin, Relevance, Sampling, Similarity, Sketches, Skew, SparseSim, SubstrSearch, TemporalJoin, TextOps}
import org.apache.spark.sql.graft.ColumnBridge

/**
 * Driver contract: the full query inventory with DuckDB oracles.
 *
 * Conventions that keep the oracle hash-compare deterministic:
 *  - every computed column is aliased identically in Spark and SQL;
 *  - integer outputs are cast to BIGINT on both sides;
 *  - double aggregates go through exact DECIMAL sums (order-independent)
 *    and only then cast to DOUBLE, so partition order cannot change a bit;
 *  - ANN/similarity queries emit integer ranks, not raw float scores;
 *  - all ratio-style doubles are exact small-integer rationals, identical
 *    in any IEEE-754 engine.
 *
 * The oracle SQL for metadata queries uses DuckDB's
 * `parquet_metadata`/`parquet_file_metadata`/`read_blob` table functions on
 * the sf0.01 files (the scale the driver verifies at).
 */
/** Query + oracle inventory — the LLM-data-pipeline operator inventory: dedup, ANN, text,
  * multimodal, sampling, sketches, layout, graph, core SQL.
  * Assembled (disjointly) into the driver contract by
  * [[SparkEntry]]. */
private[graft] object EntryOpsQueries {
  import EntryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CLUSTERING-quality report: per-column chunk-stat spans vs the
    // global span — span_sum/global_span IS the average overlap depth
    // a stats-pruned scan pays (1 = perfectly clustered, n_chunks =
    // unclustered). The fixture sorts by k (clustered) while r rides
    // along uncorrelated (every chunk spans the whole r range): the
    // report must show the contrast from footer stats alone. Oracle:
    // DuckDB computes the same integers from parquet_metadata's own
    // stats over the same files.
    "clustering_report" -> ((s, dir) => {
      val out = "/tmp/graft_cluster_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "orders"))
        .select(col("o_orderkey").as("k"), col("o_custkey").as("r"))
        .repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536")
        .parquet(out)
      MetaPrune.clusteringReport(s, out, Seq("k", "r"))
    }),


    // Z-ORDER vs LINEAR clustering, MEASURED: the same data written
    // sorted by k alone and sorted by the z-interleave of (k, r); the
    // clustering report must show the trade from footer stats alone —
    // linear gives k depth ~1 but r depth ~n_chunks (pruning on r
    // skips nothing), z-order gives BOTH columns intermediate depth
    // (multi-dimension pruning works). Oracle: DuckDB aggregates the
    // same integers from parquet_metadata over both layouts.
    "zorder_clustering" -> ((s, dir) => {
      val sfx = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      val base = s.read.parquet(pq(dir, "orders"))
        .select(col("o_custkey").as("k"), col("o_orderkey").as("r"))
      val lin = "/tmp/graft_zclin_" + sfx
      val zo = "/tmp/graft_zczo_" + sfx
      base.repartition(1).sortWithinPartitions("k")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536").parquet(lin)
      // z-interleave needs BIT-ALIGNED domains: k (custkey, ~1.5k) is
      // scaled into r's range (orderkey, ~15k) before interleaving —
      // raw interleave of mismatched magnitudes degenerates to a sort
      // by the wider column
      base.withColumn("z", Layout.zvalue2(col("k") * lit(10L), col("r")))
        .repartition(1).sortWithinPartitions("z").drop("z")
        .write.mode("overwrite")
        .option("parquet.block.size", "65536").parquet(zo)
      MetaPrune.clusteringReport(s, lin, Seq("k", "r"))
        .withColumn("layout", lit("linear"))
        .unionByName(MetaPrune.clusteringReport(s, zo, Seq("k", "r"))
          .withColumn("layout", lit("zorder")))
    }),


    // End-to-end export audit: write a Hive-partitioned training export
    // (one file per partition via repartition-by-key), then build its
    // MANIFEST — files, rows, bytes per partition — from OUR OWN metadata
    // source scanning the freshly written footers; the oracle re-derives
    // the same manifest by reading the data files with an independent
    // engine. The close-the-loop shape every 100 TB export needs: the
    // audit costs footer reads, not a data rescan.
    "export_manifest" -> ((s, dir) => {
      // path keyed by scale dir so a bench/audit run at another sf cannot
      // overwrite the export the (sf0.01-pinned) oracle reads
      val out = "/tmp/graft_export_manifest_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      s.read.parquet(pq(dir, "documents"))
        .repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      meta(s, out, "rowgroup")
        .withColumn("lang",
          regexp_extract(col("filepath"), "lang=([^/]+)", 1))
        .groupBy(col("lang"))
        .agg(countDistinct(col("filepath")).as("n_files"),
          sum(col("num_rows")).as("n_rows"))
    }),


    // Size-targeted output compaction audited from its own footers: the
    // planned-stats sizing (no sampling job, no extra shuffle) writes the
    // documents table toward 256 KB files; the manifest — file count and
    // total rows — is then read from OUR metadata source and the oracle
    // re-derives it from the written files with an independent engine.
    "sized_write" -> ((s, dir) => {
      val out = "/tmp/graft_sized_write_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9.]", "_")
      Bucketing.writeSized(s.read.parquet(pq(dir, "documents")), out,
        targetBytes = 256L << 10)
      meta(s, out, "rowgroup")
        .agg(countDistinct(col("filepath")).as("n_files"),
          sum(col("num_rows")).as("n_rows"))
    }),


    // Bucketed-layout join: both sides written ONCE as parquet tables
    // bucketed on the join key (Bucketing.writeBucketed), then joined with
    // NO exchange on either side (plan-asserted in BucketingSpec) — the
    // write-once/never-reshuffle fact-table layout. The oracle recomputes
    // the same join from the raw tables, pinning that the bucketed
    // round-trip loses and alters nothing.
    "bucketed_join" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val ct = freshTable(s, "graft_bucketed_customer_" + suffix)
      val ot = freshTable(s, "graft_bucketed_orders_" + suffix)
      Bucketing.writeBucketed(s.read.parquet(pq(dir, "customer")),
        "c_custkey", buckets = 8, table = ct)
      Bucketing.writeBucketed(s.read.parquet(pq(dir, "orders"))
        .withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey", buckets = 8, table = ot)
      s.table(ot).join(s.table(ct), Seq("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"))
    }),


    // ----- delegated relational capabilities (Catalyst-native plans) -----
    "q1_agg" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"), col("sum_disc_price"), col("count_order"))
    }),


    "q3_topk" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer")).filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(pq(dir, "orders"))
      val l = s.read.parquet(pq(dir, "lineitem"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),


    "q5_join" -> ((s, dir) => {
      val n = s.read.parquet(pq(dir, "nation"))
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      val l = s.read.parquet(pq(dir, "lineitem"))
      val su = s.read.parquet(pq(dir, "supplier"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_lineitems"))
    }),


    "win_rank" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn").cast("long").as("rn"), col("o_orderkey"))
    }),


    "win_sessions" -> ((s, dir) => {
      // exact integer gap arithmetic over eventsNs's epoch-nanos ts
      val e = eventsNs(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > 1800L * 1000000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),


    // Correlated subquery (Catalyst decorrelates to an aggregate + join):
    // orders priced above 1.5x their customer's average. The comparison is
    // cross-multiplied in exact decimals, so no division order-dependence.
    "q_corr_subquery" -> ((s, dir) => {
      s.read.parquet(pq(dir, "orders")).createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT CAST(count(*) AS LONG) AS n_above
        FROM orders_v o
        WHERE (SELECT count(*) FROM orders_v i WHERE i.o_custkey = o.o_custkey) *
            CAST(o.o_totalprice AS DECIMAL(28,6)) * 2 >
          (SELECT sum(CAST(i.o_totalprice AS DECIMAL(28,6)))
           FROM orders_v i WHERE i.o_custkey = o.o_custkey) * 3""")
    }),


    // Moving-frame window: trailing-3 revenue per supplier over ship dates.
    "win_moving" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem")).filter(col("l_suppkey") < 20)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-2, 0)
      l.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).over(w).cast("double").as("trailing_rev"))
    }),


    "cube_rollup" -> ((s, dir) =>
      s.read.parquet(pq(dir, "orders"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n_orders"), col("total_price"))),


    "q_percentiles" -> ((s, dir) =>
      s.read.parquet(pq(dir, "lineitem"))
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, array(0.5, 0.9))").getItem(0).as("p50"),
          expr("percentile(l_extendedprice, array(0.5, 0.9))").getItem(1).as("p90"),
          count(lit(1)).as("n"))),


    "semi_join" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_customers_with_orders"))
    }),


    "set_except" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer")).select(col("c_custkey").as("k"))
      val o = s.read.parquet(pq(dir, "orders")).select(col("o_custkey").as("k"))
      c.except(o).agg(count(lit(1)).as("n_customers_without_orders"))
    }),


    "distinct_agg" -> ((s, dir) => {
      val su = s.read.parquet(pq(dir, "supplier"))
      val n = s.read.parquet(pq(dir, "nation"))
      su.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(countDistinct(col("s_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_rows"))
    }),


    // ----- LLM-data-pipeline: dedup ------------------------------------
    // Exact dedup over a corpus with planted duplicate texts: one
    // hash-aggregate on the text key.
    "dedup_exact" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
      Dedup.exact(corpus, col("text"), col("doc_id"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_total"),
          sum(col("rep_id")).as("rep_id_sum"))
    }),


    // MinHash + banded-LSH near-dup detection, verified by exact token-set
    // equality. Identical token sets -> identical signatures -> guaranteed
    // LSH recall at J=1, so the candidate-join result equals the oracle's
    // exact all-pairs answer while the plan stays a bucketed equi-join.
    "dedup_minhash" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      // 4 bands x 16 rows: candidate threshold (1/4)^(1/16) ~= 0.92, so the
      // bucket join stays sparse on vocabulary-dense corpora while recall at
      // J=1 (identical sets -> identical signatures) remains exactly 1.
      // Only a 64-bit hash of the token set rides the band shuffle (three
      // longs per band row, not the set itself); the candidate pairs are
      // tiny by construction, so EXACT set equality is re-verified by
      // broadcasting them back against the corpus — same result, a
      // fraction of the shuffle bytes.
      val withH = corpus.withColumn("wsh", xxhash64(col("ws")))
      val sigs = Dedup.minhashSignatures(withH, col("doc_id"), col("ws"),
        carry = Seq(col("wsh")))
      val bands = Dedup.lshBands(sigs, bands = 4, rowsPerBand = 16)
      val pairs = Dedup.candidatePairs(bands, extraKeys = Seq("wsh"))
      exactPairAgg(corpus.select(col("doc_id"), col("ws")), "doc_id", "ws", pairs)
    }),


    // Duplicate-cluster statistics: identical-token-set groups with sizes
    // and representatives — one hash-aggregate on the set key.
    "dedup_clusters" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      corpus.groupBy(col("ws"))
        .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("rep_id"))
        .filter(col("cluster_size") > 1)
        .agg(count(lit(1)).as("n_clusters"),
          coalesce(sum(col("cluster_size")), lit(0L)).as("n_dup_docs"),
          coalesce(max(col("cluster_size")), lit(0L)).as("max_cluster"),
          coalesce(sum(col("rep_id")), lit(0L)).as("rep_sum"))
    }),


    // SimHash dedup: 64-bit signature equi-join. The self-join carries only
    // (id, simhash, xxhash64(text)) — three longs per row, not the document
    // text — and the (rare) signature+hash-equal candidates are re-verified
    // for EXACT text equality by fetching both texts through broadcast joins
    // of the tiny pair set against the corpus. No false positives (exact
    // final check), no false negatives (equal texts always hash equal), and
    // the wide column never rides a shuffle.
    "dedup_simhash" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir)
        .withColumn("ws", TextOps.tokenSet(col("text")))
      val sh = Dedup.simhash64(corpus, col("doc_id"), col("ws"))
      val keyed = sh.join(
        corpus.select(col("doc_id").as("sh_id"), xxhash64(col("text")).as("th")), "sh_id")
      val l = keyed.select(col("sh_id").as("a_id"), col("simhash").as("h_a"), col("th").as("th_a"))
      val r = keyed.select(col("sh_id").as("b_id"), col("simhash").as("h_b"), col("th").as("th_b"))
      val pairs = l.join(r,
        col("h_a") === col("h_b") && col("th_a") === col("th_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      exactPairAgg(corpus.select(col("doc_id"), col("text")), "doc_id", "text", pairs)
    }),


    // Cross-corpus dedup: scrub an incoming corpus B against reference
    // corpus A (the new-crawl-vs-already-trained shape). B = 30 exact
    // copies of A docs (shifted ids) + 20 A docs made unique by a
    // per-doc suffix token. Banded cross-equi-join candidates (hash-only
    // carry), broadcast exact token-set verification -> the 30 copies,
    // exactly, DuckDB-checkable.
    "dedup_cross" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val b = d.filter(col("doc_id") < 30)
        .select((col("doc_id") + 300000L).as("doc_id"), col("text"))
        .union(d.filter(col("doc_id") >= 30 && col("doc_id") < 50)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" uniquesuffix"), col("doc_id").cast("string")).as("text")))
      def bands(df: DataFrame): DataFrame = {
        val c = df.withColumn("ws", TextOps.tokenSet(col("text")))
          .withColumn("wsh", xxhash64(col("ws")))
        Dedup.lshBands(
          Dedup.minhashSignatures(c, col("doc_id"), col("ws"), carry = Seq(col("wsh"))),
          bands = 4, rowsPerBand = 16)
      }
      val pairs = Dedup.crossCandidatePairs(bands(d), bands(b), extraKeys = Seq("wsh"))
      val va = d.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val vb = b.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val withA = va.join(broadcast(pairs), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      vb.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("b_id")).distinct()
        .agg(count(lit(1)).as("n_dup_docs"),
          coalesce(sum(col("b_id")), lit(0L)).as("id_sum"))
    }),


    // Incremental dedup against a PERSISTED band store: the reference
    // corpus's LSH bands are written once as a parquet table bucketed by
    // band hash (zero store-side shuffle on every future scrub,
    // plan-asserted in DedupStoreSpec), then an increment with planted
    // exact copies (docs <20, +400000) and near-miss edits (20..39,
    // unique suffix) scrubs against it. Candidates exact-verify by
    // token-set equality over the broadcast candidate set.
    "dedup_store_scrub" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_band_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      Dedup.writeBandStore(d, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      val inc = d.filter(col("doc_id") < 20)
        .select((col("doc_id") + 400000L).as("doc_id"), col("text"))
        .union(d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
          .select((col("doc_id") + 400000L).as("doc_id"),
            concat(col("text"), lit(" storesuffix"), col("doc_id").cast("string")).as("text")))
      val pairs = Dedup.scrubAgainstBandStore(s, tbl, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
      val va = d.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val vb = inc.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      val withA = va.join(broadcast(pairs), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      vb.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("b_id")).distinct()
        .agg(count(lit(1)).as("n_dup_docs"),
          coalesce(sum(col("b_id")), lit(0L)).as("id_sum"))
    }),


    // Transitive duplicate clustering: near-dup pairs only say "a ~ b";
    // the group a pipeline keeps ONE representative of is a connected
    // component of the duplicate graph (a~b, b~c => {a,b,c}). Edges are
    // exact-duplicate pairs (token-set-hash equi-join, exact verification
    // by broadcasting the tiny candidate set — only longs ride the
    // shuffle) plus a chain relation (doc_id -> doc_id+1 within runs of
    // five) that forces MULTI-HOP transitivity, which pairwise dedup
    // queries never exercise. Components via alternating large-star/
    // small-star — O(log n) rounds regardless of component diameter.
    "dedup_cc" -> ((s, dir) => {
      // Tokenize ONCE: the set column is consumed by three separate scans
      // (hash self-join plus two verification joins); without the
      // materialization each scan would re-run the tokenizer over the
      // corpus. persist keeps it lineage-backed and freeable.
      val sets = plantedCorpus(s, dir)
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val hashes = sets.select(col("doc_id"), xxhash64(col("ws")).as("wsh"))
      val cand = hashes.select(col("doc_id").as("a_id"), col("wsh").as("h_a"))
        .join(hashes.select(col("doc_id").as("b_id"), col("wsh").as("h_b")),
          col("h_a") === col("h_b") && col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
      val withA = sets.join(broadcast(cand), col("doc_id") === col("a_id"))
        .select(col("a_id"), col("b_id"), col("ws").as("ws_a"))
      val dupEdges = sets.join(broadcast(withA), col("doc_id") === col("b_id"))
        .filter(col("ws") === col("ws_a"))
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      val chainEdges = sets
        .filter(col("doc_id") < 299 && col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("src"), (col("doc_id") + 1L).as("dst"))
      val cc = ConnectedComponents.run(dupEdges.union(chainEdges), "src", "dst")
      cc.groupBy(col("component")).agg(count(lit(1)).as("csize"))
        .agg(count(lit(1)).as("n_components"),
          coalesce(sum(col("csize")), lit(0L)).as("n_nodes"),
          coalesce(max(col("csize")), lit(0L)).as("max_size"),
          coalesce(sum(col("component")), lit(0L)).as("comp_id_sum"))
    }),


    // Graph centrality for corpus quality weighting: exact-integer
    // PageRank over the symmetrized customer-supplier trade graph (the
    // web-pipeline shape: rank the link graph, weight documents by their
    // page's centrality). Fixed-point long arithmetic end to end, so three
    // distributed iterations are bit-identical to the oracle's unrolled
    // SQL replay — no float summation order anywhere.
    "pagerank" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders")).select(col("o_orderkey"), col("o_custkey"))
      val l = s.read.parquet(pq(dir, "lineitem")).select(col("l_orderkey"), col("l_suppkey"))
      val cs = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
        .distinct()
      val edges = cs.union(cs.select(col("dst").as("src"), col("src").as("dst")))
      PageRank.run(edges, "src", "dst", iters = 3)
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),


    // Mergeable distinct-count sketch (KMV bottom-k): per language, the 8
    // smallest distinct arithmetic hashes of doc_id, the k-th minimum, and
    // the integer-exact cardinality estimate. Bounded-heap aggregation —
    // the sketch, not the key set, is what shuffles.
    "kmv_distinct" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sketches.kmvEstimateMicro(
          Sketches.kmvSketch(d, col("lang"), Sampling.arithHash(col("doc_id")), k = 8), k = 8)
        .withColumnRenamed("g", "lang")
    }),


    // Tokenizer coverage: out-of-vocabulary fraction per document against
    // the corpus top-16 vocabulary (the synthetic corpus has 31 distinct
    // tokens, so a larger cut would cover everything). The vocabulary is
    // one token-keyed aggregate collected to the driver (constant-size);
    // scoring is then a fused codegen membership pass (`count_in`) — a
    // narrow projection, no join, no second shuffle of the corpus.
    "text_oov" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val vocab = d.select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(16)
        .collect().map(_.getString(0)).toSeq
      d.filter(col("doc_id") < 50)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
        .filter(size(col("t")) > 0)
        .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
          TextOps.stopwordScoreOn(col("t"), vocab).cast("long").as("known"))
        .select(col("doc_id"), col("n_tokens"),
          expr("((n_tokens - known) * 1000000L) div n_tokens").as("oov_micro"))
    }),


    // Statistical LM quality filter (the CCNet/RedPajama perplexity-filter
    // shape in exact integers): a bigram count LM trained on the held-out
    // reference split (doc_id >= 50) scores the evaluation split — average
    // training-corpus occurrence of each doc's bigrams plus its OOV count.
    // The LM is vocabulary-sized; scoring is one exploded equi-join
    // against it and a per-doc re-aggregate.
    "text_lm_score" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.ngramFamiliarity(
          d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
          col("doc_id"), col("text"), n = 2)
        .select(col("id").as("doc_id"), col("n_ngrams"),
          col("oov_ngrams"), col("fam_micro"))
    }),


    // Corpus report card: doc counts and exact char statistics rolled up
    // over (source, lang) — integer-exact means in micro-units, so any
    // engine reproduces them bit-for-bit.
    "corpus_report" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
        .withColumn("mean_chars_micro", expr("(chars_sum * 1000000L) div n_docs"))),


    // Snapshot delta between two corpus versions — the daily-crawl
    // incremental audit: which documents were added, removed, changed, or
    // carried over, as one full-outer id join comparing SHA-256 content
    // digests computed in-scan — the text itself never shuffles (measured
    // 1.6 MB → digest-rows-only at sf0.1), which is the whole game at
    // 100 TB where both sides live in id-bucketed stores with digests
    // already materialized (zero-exchange join, no payload movement). The
    // "new" crawl is simulated in-query (drop ids ≡ 0 mod 17, rewrite text
    // for ids ≡ 0 mod 13, add fresh ids) so both engines derive the same
    // pair of versions; the oracle compares raw text — equal by digest
    // collision-freeness.
    "corpus_diff" -> ((s, dir) => {
      val old = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val nw = old.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .union(old.filter(col("doc_id") < 30)
          .select(col("doc_id") + 1000000L, col("text")))
      def dig(df: DataFrame, as: String) = df.select(col("doc_id"),
        sha2(encode(col("text"), "UTF-8"), 256).as(as))
      dig(old, "d_old")
        .join(dig(nw, "d_new"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("d_old").isNull, "added")
            .when(col("d_new").isNull, "removed")
            .when(col("d_old") =!= col("d_new"), "changed")
            .otherwise("unchanged").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
    }),


    // Deterministic global shuffle for training export: shard by an
    // engine-portable arithmetic hash, order by (hash, id) within shard —
    // a reproducible pseudo-random layout with parallelism = shard count
    // (no unpartitioned window, no zipWithIndex, no RNG).
    "shard_order" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"))
      Packing.shardAndOrder(d, col("doc_id"),
          Sampling.arithHash(col("doc_id")), nShards = 8)
        .select(col("doc_id"), col("shard"), col("shuffle_pos"))
    }),


    // Substring-level dedup signal (the suffix-array pass of exact
    // training-data dedup, re-expressed shuffle-native): per document, the
    // count of word 8-gram spans occurring more than once in the corpus.
    // The corpus-wide occurrence count aggregates 8-byte span hashes; span
    // STRINGS only re-group inside the tiny >1-occurrence candidate set
    // (exact despite hashing — collisions die in the string re-group).
    "span_dedup" -> ((s, dir) =>
      Dedup.duplicatedSpanStats(plantedCorpus(s, dir), "doc_id", "text", n = 8)
        .filter(col("n_dup_spans") > 0)),


    // Reproducible corpus clustering: grid-quantized Lloyd k-means
    // (exact-integer arithmetic end to end, so labels are bit-stable
    // across engines and run orders — the oracle replays the identical
    // iterations in SQL). Assignment is a codegen narrow projection
    // against driver-resident centroids; each Lloyd update is one
    // map-side-combinable k-row aggregate. Zero corpus shuffles.
    "cluster_kmeans" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      Clustering.kmeansGridAssign(e, "vec_id", "embedding", k = 8, iters = 2)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("csize"), sum(col("id")).as("id_sum"))
    }),


    // Word-bigram Jaccard similarity over a bounded pair set.
    "ngram_jaccard" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), sort_array(array_distinct(TextOps.wordNgrams(col("text"), 2))).as("ng"))
      val a = d.select(col("doc_id").as("a_id"), col("ng").as("ng_a"))
      val b = d.select(col("doc_id").as("b_id"), col("ng").as("ng_b"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          floor(Dedup.jaccardSorted(col("ng_a"), col("ng_b")) * 1000000.0d).as("j_micro"))
        .filter(col("j_micro") >= 100000L)
    }),


    // Containment near-dup: the ASYMMETRIC |A∩B|/|A| over word-bigram sets,
    // catching excerpt-in-page duplication that symmetric Jaccard
    // structurally misses. Planted: for each doc < 20, its 30-token prefix
    // as a new doc (id+100000) — a contiguous token slice, so every planted
    // bigram occurs in the source: containment exactly 1.0 while Jaccard
    // stays far below any dedup threshold (both reported to pin the
    // asymmetry). Pairing is over a bounded id set like ngram_jaccard; the
    // corpus-scale path reuses the MinHash band store for candidates and
    // this containment verify in place of the Jaccard verify.
    "ngram_containment" -> ((s, dir) => {
      val toks = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val corpus = toks.union(
        toks.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000L).as("doc_id"), slice(col("toks"), 1, 30).as("toks")))
      val ng = corpus
        .select(col("doc_id"),
          sort_array(array_distinct(TextOps.wordNgramsOn(col("toks"), 2))).as("ng"))
        .filter(size(col("ng")) > 0)
      val a = ng.select(col("doc_id").as("a_id"), col("ng").as("ng_a"))
      val b = ng.select(col("doc_id").as("b_id"), col("ng").as("ng_b"))
      a.join(b, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          floor(Dedup.containment(col("ng_a"), col("ng_b")) * 1000000.0d).as("c_micro"),
          floor(Dedup.jaccardSorted(col("ng_a"), col("ng_b")) * 1000000.0d).as("j_micro"))
        .filter(col("c_micro") >= 900000L)
    }),


    // ----- LLM-data-pipeline: text analysis ----------------------------
    "text_tokens" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))),


    "text_quality" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
          floor(TextOps.qualityScore(col("text")) * 1000000.0d).as("q_micro"))),


    // Gopher-style quality-rule audit: five integer-exact keep/drop rules
    // evaluated as one narrow bitmask projection, rolled up per source with
    // per-rule failure counts — the WHY of every dropped document, which is
    // what threshold tuning actually needs. Planted failures: every 17th
    // doc becomes pure repetition (no stopwords, 1 distinct token), every
    // 13th gets a digit/symbol tail (alphabetic-ratio hit on short docs).
    "quality_rules" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 17 === 0, repeat(lit("zz "), 40)).otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 13 === 0,
            concat(col("t1"),
              lit(" 0123456789 #### $$$$ %%%% ^^^^ &&&& 1111 2222 3333 4444 5555")))
            .otherwise(col("t1")))
      planted.select(col("source"), TextOps.qualityFlags(col("text2")).as("flags"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("flags") === 0, 1)).as("n_kept"),
          count(when(col("flags").bitwiseAND(lit(1L)) =!= 0L, 1)).as("n_wordcount"),
          count(when(col("flags").bitwiseAND(lit(2L)) =!= 0L, 1)).as("n_wordlen"),
          count(when(col("flags").bitwiseAND(lit(4L)) =!= 0L, 1)).as("n_alpha"),
          count(when(col("flags").bitwiseAND(lit(8L)) =!= 0L, 1)).as("n_nostop"),
          count(when(col("flags").bitwiseAND(lit(16L)) =!= 0L, 1)).as("n_repetitive"))
    }),


    // BPE-ish subword tokenization: letter runs, digit runs, or single
    // non-space symbols — the pre-tokenization regex family BPE vocabularies
    // are trained over.
    "text_bpe_tokens" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(col("text"),
            lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")).as("n_subwords"))),


    "text_langid" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .select(TextOps.tokens(col("text")).as("toks"))
        .select(TextOps.langIdOn(col("toks")).as("pred_lang"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))),


    "text_langid_ngram" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        // materialize trigrams once per row; the five profile scores share it
        .select(TextOps.charNgrams(col("text"), 3).as("tg"))
        .select(TextOps.langIdNgramOn(col("tg")).as("pred_lang"))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))),


    "text_fingerprint" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),


    // PII scrub: plant synthetic PII deterministically (an email on every
    // 7th doc, an IPv4 + phone on every 11th), redact with the shared
    // Java/RE2-compatible patterns, and account for every removed
    // character. The redaction is a narrow regexp projection; the
    // accounting is one map-side-combining hash aggregate on lang.
    "text_redact" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"),
              col("doc_id").cast("string"), lit("@example.com now")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 11 === 0,
            concat(col("t1"), lit(" via 10.0.3.77 call 555-867-5309")))
            .otherwise(col("t1")))
      planted
        .select(col("lang"), col("text2"),
          TextOps.redactPii(col("text2")).as("red"))
        .groupBy(col("lang"))
        .agg(
          count(when(col("red") =!= col("text2"), 1)).as("n_redacted_docs"),
          coalesce(sum((length(col("text2")) - length(col("red"))).cast("long")),
            lit(0L)).as("chars_removed"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.EmailRe)).cast("long")),
            lit(0L)).as("n_emails"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.Ipv4Re)).cast("long")),
            lit(0L)).as("n_ips"),
          coalesce(sum(regexp_count(col("text2"), lit(TextOps.PhoneRe)).cast("long")),
            lit(0L)).as("n_phones"))
    }),


    // Quality-aware dedup: of each near-identical family, keep the BEST-
    // scoring document rather than the first-crawled one. Families are
    // keyed by a 6-token prefix; every doc<60 gets a degraded copy (digit
    // noise + symbol spam lowers the alphabetic ratio), and the argmax
    // rides the one cluster-key aggregate as a (score, -id) struct max —
    // bounded state per group, ties to the smallest id.
    "dedup_keep_best" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val corpus = d.union(d.filter(col("doc_id") < 60)
        .select((col("doc_id") + 500000L).as("doc_id"),
          concat(col("text"), lit(" 1234 !!!! ####")).as("text")))
      val scored = corpus.select(col("doc_id"),
        array_join(slice(TextOps.tokens(col("text")), 1, 6), " ").as("pfx"),
        floor(TextOps.qualityScore(col("text")) * 1000000.0d).as("q_micro"))
      Dedup.keepBest(scored, col("pfx"), col("doc_id"), col("q_micro"))
        .filter(col("n_copies") > 1)
        .select(col("dedup_key"), col("n_copies"),
          col("best_score").as("best_q_micro"), col("rep_id"))
    }),


    // CCNet-style line-level boilerplate removal: lines repeated across
    // many pages (navigation menus, copyright footers — planted here on
    // every 3rd/4th doc) are deleted in place, preserving document order.
    // Counting shuffles 8-byte line hashes only (map-side combined); the
    // exact string threshold is re-applied to the small candidate set, and
    // removal is a broadcast join — no corpus shuffle anywhere. Carrying
    // `source` inside the group key keeps the rebuild single-aggregate.
    "line_dedup" -> ((s, dir) => {
      val planted = s.read.parquet(pq(dir, "documents"))
        .withColumn("t1",
          when(col("doc_id") % 3 === 0,
            concat(lit("shared navigation header menu\n"), col("text")))
            .otherwise(col("text")))
        .withColumn("text2",
          when(col("doc_id") % 4 === 0,
            concat(col("t1"), lit("\ncopyright footer all rights reserved")))
            .otherwise(col("t1")))
      Lines.removeBoilerplate(planted,
          struct(col("doc_id"), col("source")), col("text2"), minCount = 100L)
        .groupBy(col("id.source").as("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_lines_kept")).as("lines_kept"),
          sum(col("n_lines_removed")).as("lines_removed"),
          sum(length(col("clean_text")).cast("long")).as("chars_after"))
    }),


    // Weighted dataset mixture: deterministic per-source sampling rates
    // (80% web / 50% books / 20% code) as a narrow key-hash filter — the
    // training-mix composition step; reproducible under repartitioning,
    // retries and backfills because the kept set is a pure function of
    // (source, key).
    "mix_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .withColumn("source",
          when(col("doc_id") % 3 === 0, lit("web"))
            .when(col("doc_id") % 3 === 1, lit("books"))
            .otherwise(lit("code")))
      Sampling.mixture(d, col("source"), col("doc_id"),
          Map("web" -> 80, "books" -> 50, "code" -> 20))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // Temperature-scaled mixture (alpha = 1/2): keep probability
    // proportional to sqrt(source size) — the multilingual/low-resource
    // flattening recipe. Weights are EXACT integer sqrts of the per-source
    // counts (one counter-scale aggregate, BigInt permille arithmetic
    // driver-side), then a zero-shuffle arithHash gate over the corpus;
    // the skewed 60/30/10 source split makes the flattening visible
    // (small sources keep a higher rate than large ones).
    "temp_mixture" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .withColumn("src",
          when(col("doc_id") % 10 < 6, lit("web"))
            .when(col("doc_id") % 10 < 9, lit("books"))
            .otherwise(lit("code")))
      Sampling.temperatureMixture(d, col("src"), col("doc_id"), 250L)
        .groupBy(col("src").as("source"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // Per-group quota: at most 25 docs per language, picked by descending
    // deterministic hash with id tie-break — domain/language capping via
    // the bounded top-k heap aggregate, so no per-group window sort and
    // shuffle volume of at most mappers x groups x 25 rows.
    "quota_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.quotaPerGroup(d, col("lang"), col("doc_id"), 25)
        .groupBy(col("group").as("lang"))
        .agg(count(lit(1)).as("n_kept"),
          coalesce(sum(col("id")), lit(0L)).as("id_sum"))
    }),


    // Deterministic train/val/test carving: disjoint, exhaustive hash bands
    // (80/10/10) as a narrow CASE projection — every row lands in exactly
    // one split, stable under repartitioning/retries/backfills, no
    // train-eval leakage by construction.
    "sample_split" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      d.withColumn("split", Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // xxhash64 hash-band carving: the bucket values cannot be replayed by
    // another engine (the hash is Spark's), but the CONTRACT is closed-form
    // and that is what the oracle checks — bands of one seed are exactly
    // disjoint and exactly exhaustive. Carving [0,.1)/[.1,.37)/[.37,.62)/
    // [.62,1) and unioning back must hit every document exactly once: an
    // off-by-one at any band edge double-counts (n_in_bands) or drops
    // (n_distinct) a row; both totals must equal the table count.
    "hash_bands" -> ((s, dir) => {
      val docs = s.read.parquet(pq(dir, "documents"))
      val cuts = Seq(0.0, 0.1, 0.37, 0.62, 1.0)
      val banded = cuts.sliding(2).toSeq.map { c =>
        Sampling.hashBand(docs, col("doc_id"), c.head, c.last)
          .select(col("doc_id"))
      }.reduce(_.unionAll(_))
      banded.agg(count(lit(1)).as("n_in_bands"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
    }),


    // Leakage-FREE split: duplicate families must not straddle train/eval
    // (a train-side copy of an eval doc is benchmark contamination), so the
    // split key is the family REPRESENTATIVE, not the document — every
    // member of a family inherits the same band and co-travels by
    // construction. Families are exact token-set groups via one keyed
    // window min; the split itself stays the narrow hash-band CASE.
    "group_split" -> ((s, dir) => {
      val c = plantedCorpus(s, dir)
        .select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws"))
      c.withColumn("rep_id",
          min(col("doc_id")).over(Window.partitionBy(col("ws"))))
        .withColumn("split", Sampling.splitColumn(col("rep_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep_id")).as("n_families"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // Token-budget carve: "exactly N training tokens" as a deterministic
    // pseudo-random prefix. The plan is the 100 TB shape: a counter-scale
    // bucket ledger + ONE driver row, narrow filter for whole buckets, a
    // keyed window only over the single crossing bucket — never a global
    // sort or corpus-wide running total (the oracle's window IS that
    // non-scalable formulation, which is the point of the comparison).
    "budget_carve" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.budgetCarve(d, col("doc_id"), col("n_chars"), 75000L)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),


    // Quality-mass (top-p) carve: the longest documents covering 80% of
    // each source's total chars — the relative-mass counterpart of the
    // budget carves, with the crossing-bucket plan laid along the MASS
    // axis (per-(source, mass-bin) counter ledger; only crossing-bin rows
    // pay a window; never a per-group sort of the corpus).
    "mass_carve" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.massCarve(d, col("source"), col("doc_id"), col("n_chars"),
          permille = 800, binWidth = 64L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars_kept"))
    }),


    // Budgeted mixture: absolute per-source token budgets (mix_sample's
    // rates say 80%; this says "exactly 40k chars of src2") — budgets that
    // exceed a source keep it whole, sources without a budget drop, and
    // only each source's single crossing hash-bucket pays a row-level
    // window. Aggregated per source for an order-free compare.
    "budget_mixture" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.budgetCarvePerGroup(d, col("source"), col("doc_id"), col("n_chars"),
          Map("src0" -> 100000L, "src1" -> 4000L, "src2" -> 40000L, "src3" -> 12000L))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
          sum(col("n_chars")).as("chars_kept"))
    }),


    // Histogram-sketch quantiles: the quantile plan that survives 100 TB —
    // one narrow integer-bin projection + one (group, bin) counter
    // aggregate (shuffle carries at most groups x nbins rows, never the
    // values), vs q_percentiles' exact per-group percentile over the data.
    // Emits exact-integer quantile upper bounds (within one bin width).
    "quantile_hist" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
      val hist = Sketches.histogram(l, col("l_returnflag"), col("l_extendedprice"),
        width = 5000L, nbins = 24)
      Sketches.histQuantilesMicro(hist, width = 5000L,
          Seq("p50_ub" -> 500000L, "p90_ub" -> 900000L, "p99_ub" -> 990000L))
        .withColumnRenamed("g", "l_returnflag")
    }),


    // BPE tokenizer induction, round-1 statistics: the corpus-wide
    // adjacent-pair counts every merge decision is made from — a narrow
    // zip-of-shifted-slices projection + one map-side-combined aggregate
    // (shuffle = distinct-pair vocabulary, never the corpus). The greedy
    // merge LOOP is spec-tested against a sequential reference
    // implementation (BpeSpec); this query pins its decision input.
    "bpe_pairs" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Bpe.pairCounts(d, TextOps.tokens(col("text")))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(20)
    }),


    // Full tokenizer-induction pin: the ordered merge list trainOnWords
    // learns (one corpus aggregate + driver loop over the vocabulary-sized
    // word-frequency table). The oracle replays every round in SQL —
    // weighted pair counts, the (cnt desc, left, right) argmax, and the
    // greedy left-to-right merge via non-overlapping string replace over
    // bracket-delimited symbols (exact because replace() scans left to
    // right and never matches inside a bracketed symbol).
    "bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val d = s.read.parquet(pq(dir, "documents"))
      Bpe.trainOnWords(d, col("text"), nMerges = 8)
        .zipWithIndex.map { case ((l, r), i) => (i + 1L, l, r) }
        .toDF("rank", "left", "right")
    }),


    // Tokenize-with-trained-vocabulary accounting — the token-budget
    // primitive every mixture/packing stage consumes: train 8 merges, then
    // encode the evaluation docs (per-word greedy merge application as ONE
    // codegen expression with the constant merge table inlined — a narrow
    // projection, zero extra shuffles beyond the per-doc re-aggregate).
    // The oracle needs no encode replay: applying merges in rank order to
    // a raw word reproduces the training-time progressive state, so each
    // word's encoding IS its row in the replay's final vocabulary table.
    "bpe_encode" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      d.filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("doc_id"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges)).as("n_sym"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sym").cast("long")).as("n_bpe_tokens"))
    }),


    // EMBEDDING drift per label between two snapshot halves (even/odd
    // vec_id): exact cross-multiplied L1 between mean quantized vectors —
    // division-free integers end to end, the re-index-the-vector-store
    // alarm. One dim-sized-buffer aggregate per side; only groups x dim
    // sums reach the driver.
    "drift_vector" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      Drift.vectorDriftI8(
        e.filter(col("vec_id") % 2 === 0),
        e.filter(col("vec_id") % 2 === 1),
        col("label"), col("embedding"), scale = 64)
    }),


    // Tokenizer fertility per domain: chars-per-BPE-token in exact micro
    // units for each source — the tokenizer-QA table that shows which
    // domains a trained vocabulary serves poorly (low chars/token = more
    // tokens per char = more compute per char). Same trained merges and
    // narrow codegen encode as bpe_encode; one counter-scale aggregate.
    "bpe_efficiency" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      d.select(col("source"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("source"), length(col("word")).cast("long").as("nc"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges))
            .cast("long").as("ns"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("nc")).as("n_chars"),
          sum(col("ns")).as("n_bpe_tokens"))
        .withColumn("chars_per_tok_micro",
          expr("n_chars * 1000000L div n_bpe_tokens"))
    }),


    // Distribution-drift monitor: per-day event-type distributions and
    // the integer L1 distance between consecutive days — the upstream-
    // source-changed alarm, computed from one counter aggregate (shuffle
    // = days x types rows, never the events), exact micro-units.
    "drift_l1" -> ((s, dir) => {
      // see eventsNs for the ts normalization;
      // day index = nanos since 2024-01-01 UTC div 86400e9, exact integers
      val e = eventsNs(s, dir)
        // FLOOR division (div truncates toward zero): a pre-epoch event
        // must land in day -1, matching the oracle's calendar datediff
        .withColumn("day", expr(
          "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
            "86400000000000L)) div 86400000000000L"))
      Drift.l1Drift(Drift.categoricalShares(e, col("day"), col("event_type")))
        .select(col("w").as("day"), col("l1_micro"))
    }),


    // Ordered conversion funnel (view → click → purchase) with first-touch
    // anchoring: stage k+1 is the user's earliest qualifying event
    // STRICTLY AFTER their stage-k anchor, ordered by (ts, event_id) so
    // ties are deterministic. Three user-keyed min-struct aggregates (all
    // map-side combinable) and two users-sized equi-joins — the corpus
    // shuffles once per stage on user_id, anchors are one struct per user.
    "event_funnel" -> ((s, dir) => {
      val e = eventsNs(s, dir)
        .select(col("user_id"), col("event_type"),
          struct(col("ts"), col("event_id")).as("k"))
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("k")).as("s1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id")).filter(col("k") > col("s1"))
        .groupBy(col("user_id")).agg(min(col("k")).as("s2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, Seq("user_id")).filter(col("k") > col("s2"))
        .groupBy(col("user_id")).agg(min(col("k")).as("s3"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("stage"), col("n_users"))
        .union(c.agg(count(lit(1)).as("n_users")).select(lit(2L).as("stage"), col("n_users")))
        .union(p.agg(count(lit(1)).as("n_users")).select(lit(3L).as("stage"), col("n_users")))
    }),


    // Cohort retention: users grouped by first-active day, counted on each
    // later active day offset — two keyed aggregates (distinct user-days,
    // then per-user min) and one users-sized join; the classic product-
    // analytics table from one pass over the event log.
    "event_retention" -> ((s, dir) => {
      val e = eventsNs(s, dir).withColumn("day", expr(
        "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
          "86400000000000L)) div 86400000000000L"))
      val ud = e.select(col("user_id"), col("day")).distinct()
      val fd = ud.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      ud.join(fd, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),


    // Numeric drift: the same consecutive-day L1 over fixed-width value
    // bins of events.value — the value-distribution-shifted alarm, same
    // constant-size counter-aggregate plan as the categorical monitor.
    "drift_hist" -> ((s, dir) => {
      val e = eventsNs(s, dir)
        .withColumn("day", expr(
          "(ts - 1704067200000000000L - pmod(ts - 1704067200000000000L, " +
            "86400000000000L)) div 86400000000000L"))
      Drift.histL1Drift(e, col("day"), col("value"), width = 10L, nbins = 12)
        .select(col("w").as("day"), col("l1_micro"))
    }),


    // Salted skew join: the hot-key mitigation produces EXACTLY the same
    // rows as the plain equi-join it replaces (the oracle is the plain
    // join), while spreading each hot key across 8 sub-keys — proven here
    // by aggregate equality on a join whose left side is artificially
    // skewed onto one customer.
    "skew_join" -> ((s, dir) => {
      val o = s.read.parquet(pq(dir, "orders"))
        .withColumn("cust", when(col("o_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("o_custkey"))) // hot key: ~1/3 of rows on cust 1
        .select(col("cust"), col("o_totalprice"))
      val c = s.read.parquet(pq(dir, "customer"))
        .select(col("c_custkey").as("cust"), col("c_mktsegment"))
      Skew.saltedJoin(o, c, "cust", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
    }),


    // One-pass table profile: every per-column statistic of 6 mixed-type
    // lineitem columns from ONE scan and ONE aggregate (map-side partials;
    // the per-column pivot runs on the 1-row result). Decimal-exact sums
    // make even the double columns' profile hash-pinnable.
    "profile_table" -> ((s, dir) =>
      Profile.profile(s.read.parquet(pq(dir, "lineitem")),
        Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_returnflag", "l_shipdate", "l_linestatus"))),


    // Misra-Gries heavy hitters per language: constant executor memory per
    // group no matter the vocabulary size. capacity=64 exceeds the
    // synthetic corpus's distinct-token count, so the sketch is provably
    // eviction-free here: exact counts, count_lb == count_ub, any merge
    // order — the deterministic regime the gate can hash-pin (the eviction
    // regime's error bound is spec-asserted instead).
    "heavy_hitters" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val toks = d.select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      Sketches.heavyHitters(toks, col("lang"), col("token"), capacity = 64)
        .withColumnRenamed("g", "lang")
    }),


    // Deterministic weighted sampling without replacement (priority
    // sampling, hash-derived draws): 20 documents weighted by length —
    // integer-exact priorities, bounded-heap selection, no global sort.
    "weighted_sample" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Sampling.weightedPriority(d, col("doc_id"), length(col("text")), n = 20)
    }),


    // Bottom-k overlap sketch: Jaccard/containment estimate between the
    // customer key set and the order-customer key set from two constant-
    // size KMV sketches — join-cardinality profiling without moving either
    // key set; everything integer-exact and hash-pinned.
    "kmv_overlap" -> ((s, dir) => {
      val c = s.read.parquet(pq(dir, "customer"))
      val o = s.read.parquet(pq(dir, "orders"))
      Sketches.kmvOverlap(
        c, Sampling.arithHash(col("c_custkey")),
        o, Sampling.arithHash(col("o_custkey")), k = 16)
    }),


    // Keyword extraction: each document's 3 most DISTINCTIVE tokens — high
    // term frequency, low document frequency (the exact-integer tf-idf
    // ordering: tf desc, df asc, token asc). Document frequency is one
    // corpus-wide aggregate (map-side partial, vocabulary-sized result);
    // per-doc ranking windows over the 30 selected docs only.
    "text_keywords" -> ((s, dir) => {
      val toks = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val docFreq = toks.select(col("doc_id"), col("token")).distinct()
        .groupBy(col("token")).agg(count(lit(1)).as("df"))
      val tf = toks.filter(col("doc_id") < 30)
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("token"))
      tf.join(docFreq, "token")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("token"), col("tf"), col("df"))
    }),


    // Vocabulary building: corpus-wide token frequencies, top 20 with a
    // deterministic tie-break. Explode + map-side-partial hash aggregate +
    // TakeOrdered — the BPE/vocab-training preparation scan.
    "text_vocab" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)),


    // Embedding-cosine near-dup: plant exact-duplicate vectors, bucket both
    // sides with sign-pattern LSH (identical vectors share a bucket, so
    // recall at cos=1 is exact), then verify candidates with the exact
    // cosine kernel. Random 64-dim embeddings have pairwise cosine far
    // below the 0.99 threshold, so the answer is exactly the planted set.
    "dedup_embedding" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 25).select(col("vec_id") + 100000L, col("embedding")))
      val b = corpus.withColumn("bucket", Similarity.lshBucket(col("embedding"), 64, 16))
      val l = b.select(col("vec_id").as("a_id"), col("embedding").as("v_a"), col("bucket"))
      val r = b.select(col("vec_id").as("b_id"), col("embedding").as("v_b"), col("bucket"))
      l.join(r, Seq("bucket"))
        .filter(col("a_id") < col("b_id"))
        .filter(Similarity.cosine(col("v_a"), col("v_b")) > 0.99d)
        .agg(count(lit(1)).as("dup_pairs"),
          coalesce(sum(col("a_id") + col("b_id")), lit(0L)).as("id_sum"))
    }),


    // Semantic dedup (the SemDeDup shape): k-means partitions the corpus,
    // near-dup pairs are found only WITHIN a cluster (the quadratic stage
    // confined to (cluster, LSH-bucket) cells — k grows with n at 100 TB
    // so cluster size stays bounded), and each semantic group keeps its
    // min-id representative. Planted exact duplicates land in their
    // source's cluster (identical quantized vector) and bucket (identical
    // sign pattern), so the drop set is exactly the planted ids;
    // per-cluster stats pin both the assignment and the drop rule.
    "dedup_semantic" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 25).select(col("vec_id") + 100000L, col("embedding")))
      Clustering.semanticDedup(corpus, "vec_id", "embedding",
          k = 8, iters = 2, dim = 64, numPlanes = 16, threshold = 0.99d)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dropped"),
          sum(when(!col("is_dup"), col("id")).otherwise(0L)).as("keep_id_sum"))
    }),


    // Composed cleaning pipeline: exact-dedup to representatives, drop
    // low-quality docs, aggregate corpus statistics — the full
    // training-data-cleaning shape in a single declarative plan (one
    // dedup shuffle + one final aggregate).
    "pipeline_clean" -> ((s, dir) => {
      val reps = plantedCorpus(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      reps
        .withColumn("q_micro", floor(TextOps.qualityScore(col("text")) * 1000000.0d))
        .filter(col("q_micro") >= 800000L)
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          coalesce(sum(col("q_micro")), lit(0L)).as("q_micro_sum"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // The INGEST composition — the daily-crawl loop at 100 TB: scrub an
    // increment against the PERSISTED reference band store, exact-verify
    // candidates by token-set equality, drop confirmed duplicates, ABSORB
    // the survivors into the store (bucket-spec-preserving append), and
    // audit the grown store from the table itself. Every stage is
    // individually proven (dedup_store_scrub, the append spec); this pins
    // the loop end to end, including the store's post-absorb row count
    // ((ref + survivors) x 16 band rows).
    "pipeline_ingest" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ingest_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      // increment: docs <70 re-labeled — 50..69 are literal store members
      // (guaranteed duplicates); <50 are novel unless their text happens
      // to repeat a stored doc's (the oracle recomputes exactly that)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 600000L).as("doc_id"), col("text"))
      // ONE shared verify body (dupsVerifiedBy), with the verification
      // token sets sourced from the RAW reference corpus; the decision is
      // pinned (localCheckpoint) so the append and both audit aggregates
      // reuse a single scrub run — unpinned, the post-append aggregates
      // would re-scrub against the grown store
      val dupIds = Dedup.dupsVerifiedBy(s, tbl,
          ref.select(col("doc_id"), TextOps.tokenSet(col("text")).as("ws")),
          inc, col("doc_id"), TextOps.tokenSet(col("text")))
        .withColumnRenamed("doc_id", "dup_id")
        .localCheckpoint()
      val survivors = inc.join(broadcast(dupIds),
        col("doc_id") === col("dup_id"), "left_anti")
      Dedup.appendToBandStore(survivors, col("doc_id"),
        TextOps.tokenSet(col("text")), tbl, buckets = 8)
      dupIds.agg(count(lit(1)).as("n_dups"),
          coalesce(sum(col("dup_id")), lit(0L)).as("dup_id_sum"))
        .crossJoin(survivors.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(col("doc_id")), lit(0L)).as("surv_id_sum")))
        .crossJoin(s.table(tbl).agg(count(lit(1)).as("store_band_rows")))
    }),


    // Band-store COMPACTION: every absorb lays down one file per bucket,
    // so a store that has taken N increments carries N x buckets files —
    // the small-file storm relocated inside the store. compactBucketed
    // rewrites it to one file per bucket through a same-bucket-spec
    // staging table + catalog swap. The audit composes two subsystems:
    // file counts before/after come from OUR metadata source over the
    // store's own directory (the export_manifest pattern), and semantic
    // preservation is pinned by scrubbing the absorbed increment against
    // the compacted store — every literal member must still surface as
    // its own (ref, relabeled) candidate pair.
    "store_compact" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_compact_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "__compacting")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      Dedup.writeBandStore(ref, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
      Dedup.appendToBandStore(inc, col("doc_id"), TextOps.tokenSet(col("text")),
        tbl, buckets = 8)
      def loc: String = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(tbl)).location.toString
      val filesBefore = meta(s, loc, "file").count()
      Bucketing.compactBucketed(s, tbl, "band_hash", buckets = 8)
      val filesAfter = meta(s, loc, "file").count()
      val pairs = Dedup.scrubAgainstBandStore(s, tbl, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
      pairs.filter(col("b_id") >= 900050L && col("a_id") === col("b_id") - 900000L)
        .agg(count(lit(1)).as("n_literal_pairs"))
        .crossJoin(s.table(tbl).agg(count(lit(1)).as("store_rows")))
        .select(lit(filesBefore).as("n_files_before"),
          lit(filesAfter).as("n_files_after"),
          col("store_rows"), col("n_literal_pairs"))
    }),


    // Duplicate PROVENANCE: for each increment doc dropped as a duplicate,
    // WHICH stored document it collided with (smallest matching store id)
    // — the audit view the drop path's distinct() discards; per-row
    // output, not an aggregate, so the pairing itself is hash-pinned.
    "dedup_provenance" -> ((s, dir) => {
      val band = freshTable(s, "graft_prov_band_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      val docs = freshTable(s, band + "_docs")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val ref = d.filter(col("doc_id") >= 50)
      // independent store-pair builds over the same source — overlap
      // them (guide §2.6)
      parJobs(
        () => Dedup.writeDocStore(ref, col("doc_id"),
          TextOps.tokenSet(col("text")), docs),
        () => Dedup.writeBandStore(ref, col("doc_id"),
          TextOps.tokenSet(col("text")), band, buckets = 8))
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 850000L).as("doc_id"), col("text"))
      Dedup.dupProvenance(s, band, docs, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
    }),


    // CROSS-MODAL ingest: one increment carrying text AND its embedding
    // under a shared id, deduplicated on the text side (scrub against the
    // band/doc store pair via dupsAgainstStore — the doc store supplies
    // the verification token sets, no raw-corpus re-read), then ABSORBED
    // on both sides: surviving texts into the dedup store pair, surviving
    // embeddings into the IVF index under its persisted geometry. The
    // retrieval proof closes the loop: probing the grown index with the
    // ORIGINALS of queries 0..9 must hit the absorbed copy at rank 1
    // exactly when the query's text survived the scrub — the dedup
    // decision and the index contents agree, per modality, per id.
    "pipeline_crossmodal" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val band = freshTable(s, "graft_xm_band_" + suffix)
      val docs = freshTable(s, "graft_xm_docs_" + suffix)
      val ivf = freshTable(s, "graft_xm_ivf_" + suffix)
      freshTable(s, ivf + "_centroids")
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val ref = d.filter(col("doc_id") >= 50)
      // the three reference stores (band/doc/IVF) build from independent
      // inputs — overlap all three (guide §2.6)
      parJobs(
        () => Similarity.writeIvfStore(e.filter(col("vec_id") >= 50),
          "vec_id", "embedding", ivf, k = 16, iters = 1, scale = 64,
          buckets = 8),
        () => Dedup.writeBandStore(ref, col("doc_id"),
          TextOps.tokenSet(col("text")), band, buckets = 8),
        () => Dedup.writeDocStore(ref, col("doc_id"),
          TextOps.tokenSet(col("text")), docs))
      val inc = d.filter(col("doc_id") < 70)
        .select((col("doc_id") + 950000L).as("doc_id"), col("text"))
      val incE = e.filter(col("vec_id") < 70)
        .select((col("vec_id") + 950000L).as("vec_id"), col("embedding"))
      val dups = Dedup.dupsAgainstStore(s, band, docs, inc,
        col("doc_id"), TextOps.tokenSet(col("text")))
        .withColumnRenamed("doc_id", "dup_id")
      // materialize BEFORE absorbing: the scrub reads the stores lazily,
      // so any post-absorb re-evaluation would re-scrub against the GROWN
      // store, where every survivor matches its own absorbed copy and the
      // anti-join collapses to empty. localCheckpoint (eager) pins the
      // decision — batch-sized storage, the increment by contract.
      val survivors = inc.join(broadcast(dups),
        col("doc_id") === col("dup_id"), "left_anti")
        .localCheckpoint()
      val survE = incE.join(
        broadcast(survivors.select(col("doc_id").as("vec_id"))),
        Seq("vec_id"), "left_semi")
      // both absorbs read only the pinned survivor set and target disjoint
      // stores (band/doc pair vs IVF) — overlap them (guide §2.6); the
      // retrieval probe below waits on both
      parJobs(
        () => Dedup.absorbIntoStore(survivors, col("doc_id"),
          TextOps.tokenSet(col("text")), band, docs, buckets = 8),
        () => Similarity.appendToIvfStore(s, ivf, survE, "vec_id",
          "embedding", buckets = 8))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val hits = Similarity.searchIvfStore(s, ivf, queries, "q_id", "q_vec",
          nprobe = 4, k = 1)
        .filter(col("rank") === 1 && col("neighbor_id") === col("query_id") + 950000L)
      survivors.agg(count(lit(1)).as("n_survivors"),
          coalesce(sum(col("doc_id")), lit(0L)).as("surv_id_sum"))
        .crossJoin(s.table(band).agg(count(lit(1)).as("store_band_rows")))
        .crossJoin(s.table(docs).agg(count(lit(1)).as("doc_store_rows")))
        .crossJoin(s.table(ivf).agg(count(lit(1)).as("ivf_rows")))
        .crossJoin(hits.agg(count(lit(1)).as("n_rank1_hits")))
    }),


    // The full composition flagship: one DAG through the pipeline stages —
    // exact dedup (representative = min id, carrying its lang via min_by)
    // -> quality gate -> deterministic train/val/test carve -> per-(lang,
    // split) doc/token rollup. Every stage is individually oracle-proven;
    // this pins their COMPOSITION end to end. Plan: one dedup shuffle, the
    // rest narrow until the final small rollup.
    "pipeline_train" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val reps = d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), expr("min_by(lang, doc_id)").as("lang"))
      reps
        .withColumn("q_micro", floor(TextOps.qualityScore(col("text")) * 1000000.0d))
        .filter(col("q_micro") >= 800000L)
        .withColumn("split", Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // Benchmark decontamination: corpus docs sharing any word 8-gram with
    // the benchmark set (docs 0-19), with planted contamination (benchmark
    // texts re-inserted at id + 200000). Bloom prefilter (narrow, no
    // corpus shuffle, no false negatives) + exact shingle-join verification
    // -> the answer is exact and DuckDB-checkable.
    "decontam" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents")).select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") < 20)
      val corpus = d.filter(col("doc_id") >= 20)
        .union(bench.select(col("doc_id") + 200000L, col("text")))
      Decontam.contaminatedIds(corpus, "doc_id", "text", bench, "text", n = 8)
        .agg(count(lit(1)).as("n_contaminated"),
          coalesce(sum(col("doc_id")), lit(0L)).as("id_sum"))
    }),


    // Repetition-based quality filter (the Gopher-style duplicate-n-gram
    // fraction): 1 - distinct/total over word bigrams, exact micro-units.
    "text_repetition" -> ((s, dir) =>
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), {
          val ng = TextOps.wordNgrams(col("text"), 2)
          when(size(ng) === 0, lit(0L)).otherwise(
            floor((lit(1.0d) -
              size(array_distinct(ng)).cast("double") / size(ng).cast("double")) *
              1000000.0d)).as("rep_micro")
        })),


    // Training-sequence packing: concat documents per source in doc_id
    // order, cut every 4096 tokens; per-sequence doc/token stats. One
    // window cumsum partitioned by the shard key (see Packing scaladoc).
    "pack_sequences" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
        .select(col("source"), col("doc_id"), TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
      Packing.sequenceStats(d, col("source"), col("doc_id"), col("n_tok"), budget = 4096L)
        .select(col("source"), col("seq_id").cast("long").as("seq_id"),
          col("n_docs"), col("n_tokens"))
    }),


    // The full pre-training tokenize-and-pack composition: induce the
    // tokenizer (one corpus aggregate + driver merge loop), encode every
    // document with the trained vocabulary (narrow codegen constant-table
    // pass), pack the REAL token counts into fixed-budget context windows
    // per source. This is the pipeline a 100 TB corpus runs nightly; the
    // only corpus shuffles are the per-doc count re-aggregate and the one
    // shard-keyed window packing needs anyway.
    "pipeline_tokenize" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val merges = Bpe.trainOnWords(d, col("text"), nMerges = 8)
      val toks = d
        .select(col("source"), col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
        .select(col("source"), col("doc_id"),
          size(Bpe.applyMerges(
            regexp_extract_all(col("word"), lit("."), lit(0)), merges)).as("n_sym"))
        .groupBy(col("source"), col("doc_id"))
        .agg(sum(col("n_sym").cast("long")).as("n_tok"))
      Packing.sequenceStats(toks, col("source"), col("doc_id"), col("n_tok"), budget = 2048L)
        .select(col("source"), col("seq_id").cast("long").as("seq_id"),
          col("n_docs"), col("n_tokens"))
    }),


    // ----- LLM-data-pipeline: similarity search ------------------------
    // Exact brute-force cosine top-3 (integer ranks; the scores order the
    // rows but are not emitted, keeping the hash compare float-free).
    "ann_cosine_topk" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.bruteForceTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec", 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // Int8-quantized exact ANN: the memory/bandwidth scale path (4x smaller
    // corpus, integer multiply-adds). Fixed power-of-two scale keeps scores
    // comparable across rows AND integer-exact, so unlike the float-scored
    // ANN queries this one hash-pins the raw scores, not just ranks.
    "ann_quantized" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.quantizedTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec",
          scale = 64, k = 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("score").cast("long").as("score"))
    }),


    // Cross-modal: exact ANN neighbours joined back to document metadata
    // (embeddings.vec_id aligns with documents.doc_id in the testdata) —
    // the retrieve-then-enrich shape of a RAG/curation pipeline.
    "ann_join_meta" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings"))
      val queries = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val top = Similarity.bruteForceTopK(e, "vec_id", "embedding", queries, "q_id", "q_vec", 3)
      val docs = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id"), col("lang"), col("source"))
      top.join(broadcast(docs), col("neighbor_id") === col("doc_id"))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("neighbor_id"), col("lang"), col("source"))
    }),


    // Bucketed LSH ANN with an exact-recall oracle: plant one exact
    // duplicate per query vector (id + 100000). Identical vectors share
    // every hyperplane sign, hence the LSH bucket, and cosine 1.0 beats any
    // non-identical random 64-dim vector by a wide margin — so rank 1 of
    // each query is provably its planted copy and the rank-1 slice is a
    // deterministic, DuckDB-checkable integer result. The plan is still the
    // full approximate index (bucket equi-join + bounded top-k at k=3).
    "ann_lsh" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        dim = 64, numPlanes = 8, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // Random-projection ANN: deterministic ±1 JL projection 64 -> 8 dims
    // (random_project codegen expression, 8x byte cut), then exact cosine
    // ranking in the PROJECTED space. The planted duplicate projects
    // identically (pure function of the vector) so it must stay rank-1;
    // a degenerate projection (e.g. a collapsed sign matrix) sends every
    // pair to cosine 1 and the tie-break hands rank 1 to the wrong id —
    // the oracle is load-bearing for the projection itself.
    "ann_project" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
          e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
        .select(col("vec_id"), Similarity.randomProject(col("embedding"), 8).as("pvec"))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          Similarity.randomProject(col("embedding"), 8).as("q_pvec"))
      Similarity.bruteForceTopK(corpus, "vec_id", "pvec", queries, "q_id", "q_pvec", 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // Multi-table LSH (the recall dial): 4 independent hyperplane sets,
    // candidates from the union of per-table bucket matches. The planted
    // duplicate is an identical vector, so it shares the query's bucket in
    // EVERY table — always a candidate, always rank 1 at cosine 1; extra
    // tables only ADD candidates, never lose the duplicate.
    "ann_lsh_multi" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.lshTopKMulti(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        dim = 64, numPlanes = 8, k = 3, tables = 4)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // IVF ANN with the same planted-duplicate exact-recall oracle: an
    // identical vector maps to the same nearest cell as its query, and the
    // query's rank-1 probe is that very cell, so the copy is always searched
    // and always wins rank 1. Centroids are a deterministic driver-side
    // quantizer; cell assignment is a codegen'd narrow projection.
    "ann_ivf" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      Similarity.ivfTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        centroids, nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // The composed 100 TB recipe — IVF probing (candidate cut) + int8
    // scoring (byte cut) — under the same planted-duplicate exact-recall
    // oracle: an identical vector shares its query's nearest cell AND its
    // quantized representation, so its integer self-dot beats any
    // non-identical unit vector's cross-dot by the cosine margin.
    "ann_ivf_quantized" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding", queries, "q_id", "q_vec",
        centroids, nprobe = 4, scale = 64, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // Two-stage retrieval: the compressed index RETRIEVES (IVF probing +
    // int8 integer dots build a k'=10 shortlist), the exact float kernel
    // ORDERS (broadcast shortlist joins fetch candidate vectors in place —
    // no corpus shuffle — and exact cosine re-ranks). The planted duplicate
    // survives stage one (shares its query's cell and quantized codes) and
    // wins stage two at cosine 1 — same closed-form oracle.
    "ann_rerank" -> ((s, dir) => {
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val centroids = Similarity.ivfCentroids(corpus, "vec_id", "embedding", k = 16, iters = 1)
      val shortlist = Similarity.ivfQuantizedTopK(corpus, "vec_id", "embedding",
        queries, "q_id", "q_vec", centroids, nprobe = 4, scale = 64, k = 10)
      Similarity.rerankExact(corpus, "vec_id", "embedding",
          queries, "q_id", "q_vec", shortlist, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // PERSISTED IVF index: the corpus is cell-assigned + int8-quantized
    // once and written bucketed by cell (plus a self-describing geometry
    // table), then the query batch probes the store — the write-once ANN
    // layout. Same planted-duplicate closed-form oracle: an identical
    // vector shares its query's nearest cell and wins the integer dot.
    "ann_ivf_store" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_store_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val corpus = e.union(
        e.filter(col("vec_id") < 10).select(col("vec_id") + 100000L, col("embedding")))
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.writeIvfStore(corpus, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // Drift-triggered RE-INDEX, composed end to end: IVF ingest keeps the
    // quantizer fixed (appendToIvfStore's documented contract), so the
    // lifecycle needs a monitor that says WHEN to rebuild. Here the
    // increment is a genuinely shifted distribution (negated vectors —
    // norms preserved, every cell wrong), vectorDriftI8 measures the
    // cross-multiplied mean-L1 between base and increment, and the
    // threshold crossing drives the decision branch that retrains the
    // quantizer on base+increment and rebuilds the store. Proof the
    // rebuilt index serves the NEW distribution: each query is an exact
    // copy of a drifted vector and must find it at rank 1 (closed form);
    // under the stale base geometry the drifted rows would sit in
    // arbitrary cells. The emitted `reindexed` flag pins the decision
    // itself — if the monitor failed to cross, the oracle breaks.
    "ann_reindex_on_drift" -> ((s, dir) => {
      val suffix = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
      val tbl = freshTable(s, "graft_ivf_reindex_" + suffix)
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val drifted = e.select((col("vec_id") + 300000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      // the store as it existed before the increment arrived
      Similarity.writeIvfStore(e, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      // monitor: quantized mean-vector drift, base vs increment
      val drift = Drift.vectorDriftI8(e, drifted, lit("all"), col("embedding"),
        scale = 64).collect().head
      val (nA, l1) = (drift.getLong(1), drift.getLong(3))
      // threshold: mean gap beyond one quantization step per row pair
      val reindex = l1 > nA
      if (reindex) {
        freshTable(s, tbl)
        freshTable(s, tbl + "_centroids")
        Similarity.writeIvfStore(e.unionByName(drifted), "vec_id", "embedding",
          tbl, k = 16, iters = 1, scale = 64, buckets = 8)
      }
      val queries = drifted.filter(col("vec_id") < 300010L)
        .select((col("vec_id") - 300000L).as("q_id"), col("embedding").as("q_vec"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), lit(reindex).as("reindexed"), col("neighbor_id"))
    }),


    // FILTERED vector search against the persisted IVF store: the store
    // carries a label attribute (writeIvfStore extras) and the probe
    // PRE-filters on it in-scan, so top-k is computed among matching rows
    // only. Two exact duplicates are planted per query — one with the
    // target label (+100000), one with a decoy label (+200000). Under a
    // post-filter the decoy would crowd the shortlist; under the correct
    // pre-filter rank 1 is provably the matching-label copy and the decoy
    // cannot appear at all — which is exactly what the closed-form oracle
    // pins.
    "ann_filtered" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_filtered_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      val base = e.withColumn("lab", pmod(col("vec_id"), lit(7L)).cast("int"))
      val dupGood = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"),
          lit(5).as("lab"))
      val dupDecoy = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"),
          lit(999).as("lab"))
      val corpus = base.union(dupGood).union(dupDecoy)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.writeIvfStore(corpus, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8, extras = Seq("lab"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec",
          nprobe = 4, k = 3, storeFilter = Some(col("lab") === 5))
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // IVF store ABSORB: the index is written from the base corpus only,
    // then an increment of exact copies (+200000) is absorbed with the
    // store's own persisted geometry — searching afterwards must rank each
    // absorbed copy at 1 (the original self-match is excluded by id), i.e.
    // appended rows are probed through the same pruned bucketed scan as
    // the initial write. The embedding-side mirror of the band-store
    // absorb loop.
    "ann_ivf_absorb" -> ((s, dir) => {
      val tbl = freshTable(s, "graft_ivf_absorb_" +
        new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_"))
      freshTable(s, tbl + "_centroids")
      val e = s.read.parquet(pq(dir, "embeddings")).select(col("vec_id"), col("embedding"))
      Similarity.writeIvfStore(e, "vec_id", "embedding", tbl,
        k = 16, iters = 1, scale = 64, buckets = 8)
      val inc = e.filter(col("vec_id") < 10)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfStore(s, tbl, inc, "vec_id", "embedding", buckets = 8)
      val queries = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      Similarity.searchIvfStore(s, tbl, queries, "q_id", "q_vec", nprobe = 4, k = 3)
        .filter(col("rank") === 1)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
    }),


    // ----- LLM-data-pipeline: multimodal columns -----------------------
    // REAL image decode: each documents row becomes a genuine PNG or JPEG
    // payload (JDK ImageIO fixture encoder, dimensions closed-form in
    // doc_id), and the query recovers width/height by parsing the PNG IHDR
    // / JPEG SOF container headers executor-side — no pixel decode, the
    // 100 TB-appropriate kernel. The oracle re-derives the dimensions from
    // the same closed form, so a header-parse bug (endianness, offset,
    // marker walk) breaks the hash match. Fixture generation is a narrow
    // typed map; extraction is the mapPartitions batch-decode contract.
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 16 + (id % 37).toInt
          val h = 16 + (id % 23).toInt
          val fmt = if (id % 2 == 0) "png" else "jpeg"
          MediaRecord(id, s"image/$fmt", Multimodal.encodeFixture(fmt, w, h, id))
        }(Multimodal.mediaRecordEnc)
      Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          (col("width") * col("height")).cast("long").as("n_pixels"))
    }),


    // REAL pixel-path resize: encode a known-dimension PNG per row (some
    // within bounds, some not), run the full decode -> bilinear rescale ->
    // PNG re-encode kernel batched over partitions, then recover the
    // OUTPUT dimensions by parsing the re-encoded container headers. The
    // oracle reproduces the integer shrink arithmetic from doc_id alone
    // (ow = greatest(1, w*24 // greatest(w,h)), passthrough when already
    // within bounds) — a rescale rounding bug, a swapped axis, or a
    // corrupted re-encode each break the hash.
    "mm_resize" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .map { id =>
          val w = 12 + (id * 7 % 60).toInt
          val h = 10 + (id * 5 % 45).toInt
          MediaRecord(id, "image/png", Multimodal.encodeFixture("png", w, h, id))
        }(Multimodal.mediaRecordEnc)
      Multimodal.extractFeatures(Multimodal.resizeImages(media, maxDim = 24))
        .toDF()
        .select(col("media_id"),
          col("width").cast("long").as("out_w"),
          col("height").cast("long").as("out_h"))
    }),


    // Image near-dup via perceptual hash: dHash-64 every payload through
    // the REAL pixel path (decode -> 9x8 grayscale -> gradient bits),
    // group by hash — identical pixels hash identically whatever the
    // container bytes say, which is exactly what byte-level dedup
    // (mm_dedup) cannot see. Exact pixel copies are planted under
    // shifted ids; the oracle predicts the resulting families from the
    // plant alone (the spec pins that the 30 distinct base images do NOT
    // collide, so families are exactly the planted pairs).
    "mm_phash_dedup" -> ((s, dir) => {
      import s.implicits._
      val mk = (id: Long) => Multimodal.encodeNoiseFixture(
        24 + (id % 13).toInt, 18 + (id % 11).toInt, id * 97 + 5)
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val base = MediaRecord(id, "image/png", mk(id))
          if (id < 10) Seq(base, MediaRecord(id + 1000L, "image/png", mk(id)))
          else Seq(base)
        }(Multimodal.mediaRecordEnc)
      media.map(r => (r.media_id, Multimodal.dHash64(r.bytes).get))
        .toDF("media_id", "phash")
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keep_id"),
          sum(col("media_id")).as("id_sum"))
        .filter(col("n_copies") > 1)
        .select(col("keep_id"), col("n_copies"), col("id_sum"))
    }),


    // Image NEAR-dup retrieval end to end: pattern fixtures make the
    // perceptual hash bit-exact controllable, near copies are planted at
    // EXACTLY 3 flipped bits, and the banded Hamming retrieval
    // (pigeonhole guarantee at d <= 3) must find exactly the planted
    // pairs — the same machinery that serves text simhash, proven on the
    // real image pixel path. Base patterns are splitmix-scrambled, so no
    // accidental base pair sits within the distance (spec-pinned).
    "mm_phash_near" -> ((s, dir) => {
      import s.implicits._
      val mix = (z0: Long) => { // splitmix64 finalizer
        var z = z0 + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val flips = (id: Long) =>
        (1L << (id % 64).toInt) | (1L << ((id + 21) % 64).toInt) |
          (1L << ((id + 43) % 64).toInt)
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val base = (id, Multimodal.encodePatternFixture(mix(id)))
          if (id < 10) Seq(base,
            (id + 1000L, Multimodal.encodePatternFixture(mix(id) ^ flips(id))))
          else Seq(base)
        }
      val hashed = media.map { case (id, bytes) =>
          (id, Multimodal.dHash64(bytes).get)
        }.toDF("doc_id", "phash")
      graft.ops.Dedup.simhashHammingPairs(
          hashed.select(col("doc_id").as("sh_id"), col("phash").as("simhash")), 3)
        .select(col("a_id"), col("b_id"))
    }),


    // REAL WAV audio probe: RIFF/WAVE chunk walk recovers sample rate,
    // channels and frame count without touching a sample; the exact
    // integer duration (frames * 1e6 / rate) is re-derived by the oracle
    // from the fixture arithmetic alone. The encoder side is validated
    // against the JDK's independent javax.sound parser in specs.
    "mm_audio_probe" -> ((s, dir) => {
      import s.implicits._
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .map { id =>
          MediaRecord(id, "audio/wav", Multimodal.encodeWavFixture(
            rate = 8000 + 1000 * (id % 4).toInt,
            channels = 1 + (id % 2).toInt,
            nFrames = 500 + id.toInt * 3,
            seed = id))
        }(Multimodal.mediaRecordEnc)
      media.map { r =>
        val w = Multimodal.decodeWavInfo(r.bytes).get
        (r.media_id, w.sampleRate.toLong, w.channels.toLong, w.nFrames, w.durationMicros)
      }.toDF("media_id", "sample_rate", "channels", "n_frames", "dur_us")
    }),


    // The WAV probe generalized across containers: the same per-id audio
    // parameters synthesized into THREE container formats — WAV through
    // our encoder, AIFF and AU through the JDK's independent
    // javax.sound writer — and every one decoded back by the unified
    // big/little-endian header walk (decodeAudioInfo: RIFF chunk walk,
    // IFF COMM with its 80-bit extended sample rate, .snd fixed header).
    // The oracle reproduces all 3x parameters from doc_id arithmetic.
    "mm_audio_formats" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .flatMap { id =>
          Seq("wav", "aiff", "au").map { c =>
            val a = Multimodal.decodeAudioInfo(Multimodal.encodeAudioFixture(c,
              rate = 8000 + 1000 * (id % 4).toInt,
              channels = 1 + (id % 2).toInt,
              nFrames = 400 + id.toInt * 3, seed = id)).get
            (id, a.container, a.sampleRate.toLong, a.channels.toLong,
              a.nFrames, a.durationMicros)
          }
        }
        .toDF("media_id", "container", "sample_rate", "channels",
          "n_frames", "dur_us")
    }),


    // VIDEO container probe — MP4/ISO-BMFF box walk (ftyp check, moov →
    // mvhd timescale/duration, per-trak tkhd 16.16 presentation dims;
    // zero-dim audio tracks coexist as real muxers write them). Every
    // parameter doc_id arithmetic, so DuckDB recomputes the whole table
    // in closed form; frame/codec decode stays behind the documented
    // stub boundary — container metadata IS the Spark-side contract.
    "mm_video_probe" -> ((s, dir) => {
      import s.implicits._
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 40).select(col("doc_id")).as[Long]
        .flatMap { id =>
          val dur = 4000L + id * 7L
          val (w, h) = (320 + 16 * (id % 5).toInt, 180 + 9 * (id % 5).toInt)
          val nT = 1 + (id % 3).toInt
          Seq("mp4", "mkv", "webm").map { c =>
            val bytes = c match {
              case "mp4" => Multimodal.encodeMp4Fixture(
                1000 * (1 + (id % 3).toInt), dur, w, h, nT, id)
              case "mkv" => Multimodal.encodeMkvFixture(
                "matroska", 1000000L, dur, w, h, nT)
              case "webm" => Multimodal.encodeMkvFixture(
                "webm", 1000000L, dur, w, h, nT)
            }
            val v = Multimodal.decodeVideoInfo(bytes).get
            (id, v.container, v.timescale, v.durationTicks, v.durationMicros,
              v.nTracks.toLong, v.width.toLong, v.height.toLong)
          }
        }
        .toDF("media_id", "container", "timescale", "dur_ticks", "dur_us",
          "n_tracks", "width", "height")
    }),


    // Binary content dedup — the image/audio exact-dedup pass: group
    // opaque payloads by their SHA-256 digest, surface every duplicate
    // family with its representative (min id). The shuffle moves only
    // (digest, id) pairs — 40 bytes a row regardless of payload size; the
    // payload itself never leaves its scan partition. Payloads are
    // synthesized from text (the established stub — the container has no
    // media libs) with copies planted under shifted ids.
    "mm_dedup" -> ((s, dir) => {
      val media = s.read.parquet(pq(dir, "documents"))
        .select(col("doc_id").as("media_id"), encode(col("text"), "UTF-8").as("bytes"))
      val corpus = media.union(
        media.filter(col("media_id") < 30)
          .select(col("media_id") + 1000000L, col("bytes")))
      corpus
        .select(col("media_id"), sha2(col("bytes"), 256).as("digest"))
        .groupBy(col("digest"))
        .agg(count(lit(1)).as("n_copies"), min(col("media_id")).as("keep_id"),
          sum(col("media_id")).as("id_sum"))
        .filter(col("n_copies") > 1)
    }),


    // Frame sampling over media rows: every 4th frame by deterministic id
    // stride — a narrow filter, no shuffle; the video-pipeline shape.
    "mm_frames" -> ((s, dir) => {
      val media = s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
      Multimodal.sampleFrames(media, "media_id", stride = 4)
        .agg(count(lit(1)).as("n_frames"),
          coalesce(sum(col("media_id")), lit(0L)).as("id_sum"),
          coalesce(sum(length(col("bytes")).cast("long")), lit(0L)).as("byte_sum"))
    }),


    // ----- Composed join / layout operators -----------------------------

    // Backward as-of join: each event of a low-id user picks that user's
    // most recent order at-or-before the event (price-at-trade-time shape).
    // Timestamps become exact epoch MICROS on both engines: DuckDB's
    // TIMESTAMP truncates the nano-precision events.ts to micros, so the
    // Spark side truncates identically (`ts div 1000`; exact — and order
    // timestamps are micro-aligned, so no match can flip). The right side
    // pre-aggregates to one row per (user, ts) — the determinism contract
    // DuckDB's native ASOF JOIN (the oracle) imposes too.
    "asof_join" -> ((s, dir) => {
      val ev = eventsNs(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), expr("ts div 1000").as("e_ts"), col("event_id"))
      val ord = s.read.parquet(pq(dir, "orders"))
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
        .agg(max(col("o_orderkey")).as("o_key"))
      TemporalJoin.asofBackward(ev, ord, Seq("user_id"), "e_ts", "o_ts")
        .select(col("user_id"), col("e_ts"), col("event_id"), col("o_ts"), col("o_key"))
    }),


    // Nearest as-of join: each event picks the order closest in time in
    // EITHER direction (ties to the earlier row — backward bias). The
    // oracle is a per-row argmin via LATERAL; the operator is the same
    // linear merge shape as the directional as-ofs (one shuffle, two
    // growing-frame window passes sharing the exchange, no join operator).
    "asof_nearest" -> ((s, dir) => {
      val ev = eventsNs(s, dir)
        .filter(col("user_id") < 30)
        .select(col("user_id"), expr("ts div 1000").as("e_ts"), col("event_id"))
      val ord = s.read.parquet(pq(dir, "orders"))
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
        .agg(max(col("o_orderkey")).as("o_key"))
      TemporalJoin.asofNearest(ev, ord, Seq("user_id"), "e_ts", "o_ts")
        .select(col("user_id"), col("e_ts"), col("event_id"), col("o_ts"), col("o_key"))
    }),


    // Range (point-in-interval) join with no equi-key: shipments that fell
    // inside an order's 30-day fulfilment window. The binned equi-join
    // replaces the broadcast-nested-loop cartesian Catalyst plans for a
    // bare BETWEEN; one day per bin, exact nano arithmetic on both engines.
    "range_join" -> ((s, dir) => {
      val day = 86400L * 1000000000L
      val pts = s.read.parquet(pq(dir, "lineitem"))
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (unix_micros(col("l_shipdate").cast("timestamp")) * 1000L).as("ship_ns"))
      val ivs = s.read.parquet(pq(dir, "orders"))
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("iv_order"),
          (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("w_start"))
        .withColumn("w_end", col("w_start") + lit(30L * 86400L * 1000000000L))
      RangeJoin.pointInInterval(pts, "ship_ns", ivs, "w_start", "w_end", day)
        .groupBy(col("iv_order"))
        .agg(count(lit(1)).as("n_ship"),
          sum(col("l_linenumber").cast("long")).as("ln_sum"))
    }),


    // Forward as-of join: time-to-first-shipment — each order picks the
    // EARLIEST shipment date at-or-after its order date (same merge
    // formulation, mirrored frame). Right side pre-aggregated per
    // (order, ship date) for the uniqueness contract.
    "asof_fwd" -> ((s, dir) => {
      val ord = s.read.parquet(pq(dir, "orders"))
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_ts"))
      val ship = s.read.parquet(pq(dir, "lineitem"))
        .groupBy(col("l_orderkey").as("o_orderkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_ts"))
        .agg(count(lit(1)).as("n_items"),
          max(col("l_linenumber")).cast("long").as("max_line"))
      TemporalJoin.asofForward(ord, ship, Seq("o_orderkey"), "o_ts", "ship_ts")
        .select(col("o_orderkey"), col("o_ts"), col("ship_ts"),
          col("n_items"), col("max_line"))
    }),


    // Interval-overlap join with no equi-key: 30-day fulfilment windows of
    // two disjoint order subsets that overlap in time. Both sides bin onto
    // days; the pair survives only in the first shared bin, so each
    // overlapping pair is emitted exactly once with no dedup pass.
    "interval_join" -> ((s, dir) => {
      val d30 = 30L * 86400L * 1000000L // micros
      def wins(m: Long, k: String, s0: String, e0: String) =
        s.read.parquet(pq(dir, "orders"))
          .filter(col("o_orderkey") % 100 === m)
          .select(col("o_orderkey").as(k),
            unix_micros(col("o_orderdate").cast("timestamp")).as(s0))
          .withColumn(e0, col(s0) + lit(d30))
      val a = wins(0, "a_key", "a_s", "a_e")
      val b = wins(50, "b_key", "b_s", "b_e")
      RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 86400L * 1000000L)
        .groupBy(col("a_key"))
        .agg(count(lit(1)).as("n_overlap"), sum(col("b_key")).as("bkey_sum"))
    }),


    // Z-order clustering key as a first-class expression: Morton-interleave
    // (o_custkey, o_orderkey) and roll up per z-range bucket — the exact
    // integer bit math the layout writer sorts by ([[Layout.writeZOrdered]];
    // per-file stats-tightening is asserted in LayoutSpec), replayed
    // verbatim by the DuckDB oracle via [[Layout.zvalue2Sql]].
    "zorder_key" -> ((s, dir) => {
      s.read.parquet(pq(dir, "orders"))
        .select(Layout.zvalue2(col("o_custkey"), col("o_orderkey")).as("z"))
        .withColumn("zbucket", expr(s"z div ${1L << 22}"))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"), min(col("z")).as("min_z"), max(col("z")).as("max_z"))
    }),


    // Context-window chunking with stride overlap (RAG splitting / long-doc
    // training): chunk i covers tokens [i*stride, i*stride+size), short
    // tail kept. Narrow projection + posexplode; exact integer chunk count.
    "text_chunks" -> ((s, dir) => {
      val chunkSize = 40
      val chunkStride = 30
      s.read.parquet(pq(dir, "documents"))
        .filter(col("doc_id") < 50)
        // materialize tokens ONCE: chunkTokens' interpreted lambdas would
        // re-derive an embedded tokenizer expression per chunk
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          posexplode(TextOps.chunkTokens(col("toks"), chunkSize, chunkStride))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          size(col("chunk")).cast("long").as("n_toks"),
          element_at(col("chunk"), 1).as("head_tok"),
          element_at(col("chunk"), size(col("chunk"))).as("tail_tok"))
    }),


    // Sparse all-pairs similarity: inverted-index posting self-join over
    // word bigrams with a df-cap (Bayardo-style frequent-term pruning).
    // Per-term join fanout is bounded by maxDf^2 and pair partials by
    // maxDf x kept postings — linear in the corpus for a fixed cap, never
    // the O(n^2) brute force. Exact integer tf inner products; top-20 by
    // (dot desc, ids) is a total order, physically TakeOrderedAndProject.
    "sparse_pairs" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      SparseSim.topPairs(d, col("doc_id"), TextOps.wordNgrams(col("text"), 2),
        maxDf = 20L, k = 20)
    }),


    // Per-source redundancy report: what fraction of each source's
    // distinct-bigram postings also appear in at least one OTHER document
    // — the "how templated is this source" dashboard row that decides
    // where dedup budget goes. One posting shuffle (the inverted-index
    // build, corpus-token-sized once), a term-keyed window for df on that
    // same partitioning, then a counter-scale per-source aggregate; exact
    // integer micro-units.
    "corpus_redundancy" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val p = d.select(col("source"), col("doc_id"),
        explode(array_distinct(TextOps.wordNgrams(col("text"), 2))).as("g"))
      val withDf = p.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("g"))))
      withDf.groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_postings"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("shared_micro",
          expr("n_shared * 1000000L div n_postings"))
    }),


    // Winsorization through the histogram sketch: per-returnflag 5%/95%
    // quantile bounds from a counter-scale aggregate (never a sort of the
    // data), broadcast back, then a narrow clamp — the outlier-clipping
    // feature-pipeline step. Clip counts and the exact decimal sum of the
    // clipped column pin the whole construction.
    "winsorize_clip" -> ((s, dir) => {
      val l = s.read.parquet(pq(dir, "lineitem"))
      Sketches.winsorize(l, col("l_returnflag"), col("l_quantity"),
          width = 2L, nbins = 32, loMicro = 50000L, hiMicro = 950000L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("clipped") > col("l_quantity"), 1L).otherwise(0L)).as("n_raised"),
          sum(when(col("clipped") < col("l_quantity"), 1L).otherwise(0L)).as("n_lowered"),
          max(col("lo_bound")).as("lo_bound"), max(col("hi_bound")).as("hi_bound"),
          dsum(col("clipped")).as("sum_clipped"))
    }),


    // Character-collision (Rényi-2) repetitiveness: the log-free entropy
    // proxy — exact integer micro-units, one narrow codegen pass — ranking
    // the most degenerate (padding/separator-spam) documents first. The
    // quality-filter companion to text_quality's ratio features.
    "text_diversity" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      d.select(col("doc_id"), TextOps.charCollisionMicro(col("text")).as("coll_micro"))
        .orderBy(col("coll_micro").desc, col("doc_id"))
        .limit(20)
    }),


    // Content-defined chunking dedup: chunk boundaries from a rolling
    // 16-codepoint window hash (divisor 32), so a 2-char inserted prefix
    // ('zq' planted copies) re-synchronizes to identical chunks after the
    // first boundary — the shifted-duplicate case fixed-stride spans
    // structurally miss. Pairs = docs sharing >= 2 distinct chunks of
    // >= 20 chars; the oracle replays the SAME window hash
    // position-parallel in SQL (the rolling and direct forms are the same
    // mathematical function).
    "cdc_dedup" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      val corpus = d.filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
        .union(d.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"),
            concat(lit("zq"), col("text")).as("text")))
      Dedup.cdcSharedPairs(corpus, col("doc_id"), col("text"),
        window = 16, divisor = 32, minChunkLen = 20, minShared = 2)
    }),


    // Substring retrieval via a char q-gram inverted index: candidates
    // must contain EVERY q-gram of the pattern (zero false negatives),
    // then an exact contains() verify removes gram coincidences — the
    // candidates-then-verify contract, here over an index whose persisted
    // form ([[SubstrSearch.writeGramIndex]]) is gram-bucket-pruned at
    // probe time. Result equals the plain contains() scan, found without
    // one.
    "substr_search" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      SubstrSearch.search(d, "doc_id", "text", "fast merge", q = 8)
    }),


    // Corpus term statistics — the IDF-table / stopword-list / vocabulary
    // builder: two keyed aggregations with map-side partials, exact counts.
    "text_term_stats" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.termStats(d, col("doc_id"), TextOps.tokens(col("text")))
        .orderBy(col("df").desc, col("token"))
        .limit(20)
    }),


    // BM25 retrieval for one literal query: per-term dfs inlined driver-side
    // so scoring is a narrow codegen projection (CountIn term frequencies),
    // then the bounded-heap top-k. k1=1.0 / b=0.5 / ratio idf keep every
    // constant and operation IEEE-exact on both engines, so the DuckDB
    // oracle replays the score bit-identically (ln differs in the last ulp
    // across libm implementations; the ratio idf never does).
    "text_bm25" -> ((s, dir) => {
      val d = s.read.parquet(pq(dir, "documents"))
      Relevance.bm25TopK(d, "doc_id", TextOps.tokens(col("text")),
        Seq("window", "merge", "spark"), k = 15, k1 = 1.0, b = 0.5, logIdf = false)
        .select(col("rank"), col("doc_id"),
          floor(col("score") * lit(1000000.0d)).cast("long").as("score_micro"))
    }),


    // Batch BM25 retrieval — the termStats JOIN formulation: three query
    // term-sets scored in ONE corpus pass (postings restricted to the
    // broadcast query vocabulary before the tf aggregate), per-term
    // micro-floored scores (order-independent sums — bit-exact SQL
    // replay), bounded-heap top-5 per query.
    "bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val d = s.read.parquet(pq(dir, "documents"))
      val q = Seq(
        (0L, "window"), (0L, "merge"), (0L, "spark"),
        (1L, "hash"), (1L, "join"), (1L, "shuffle"),
        (2L, "parquet"), (2L, "footer"), (2L, "metadata"), (2L, "stream"))
        .toDF("q_id", "term")
      Relevance.bm25BatchTopK(d, "doc_id", TextOps.tokens(col("text")),
        q, "q_id", "term", k = 5, k1 = 1.0, b = 0.5, logIdf = false)
    }),


    // SimHash NEAR-dup retrieval (Hamming distance <= 3) via pigeonhole
    // banding — the retrieval dedup_simhash's equality join cannot do.
    // Planted exact copies have distance 0, and banding has guaranteed
    // recall at d <= maxDist, so the planted pair set is an exact oracle.
    "dedup_simhash_near" -> ((s, dir) => {
      val corpus = plantedCorpus(s, dir).withColumn("ws", TextOps.tokenSet(col("text")))
      val sh = Dedup.simhash64(corpus, col("doc_id"), col("ws"))
      Dedup.simhashHammingPairs(sh, 3)
        .filter(col("a_id") < 50 && col("b_id") === col("a_id") + 100000L)
        .select(col("a_id"), col("b_id"))
    })
  )

  val oracles: Map[String, String] = Map(

    "clustering_report" ->
      """SELECT path_in_schema AS col_name,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN stats_min_value IS NULL
        |      OR stats_max_value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unbounded,
        |  CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT) AS global_min,
        |  CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT) AS global_max,
        |  CAST(sum(CAST(stats_max_value AS BIGINT)
        |    - CAST(stats_min_value AS BIGINT)) AS BIGINT) AS span_sum,
        |  CAST(max(CAST(stats_max_value AS BIGINT)) AS BIGINT)
        |    - CAST(min(CAST(stats_min_value AS BIGINT)) AS BIGINT)
        |    AS global_span
        |FROM parquet_metadata('/tmp/graft_cluster_sf0.01/*.parquet')
        |WHERE path_in_schema IN ('k', 'r')
        |GROUP BY 1""".stripMargin,


    "zorder_clustering" ->
      """WITH layouts AS (
        |  SELECT 'linear' AS layout, path_in_schema AS col_name,
        |    stats_min_value AS mn, stats_max_value AS mx
        |  FROM parquet_metadata('/tmp/graft_zclin_sf0.01/*.parquet')
        |  WHERE path_in_schema IN ('k', 'r')
        |  UNION ALL
        |  SELECT 'zorder', path_in_schema, stats_min_value, stats_max_value
        |  FROM parquet_metadata('/tmp/graft_zczo_sf0.01/*.parquet')
        |  WHERE path_in_schema IN ('k', 'r')
        |)
        |SELECT col_name, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN mn IS NULL OR mx IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_unbounded,
        |  CAST(min(CAST(mn AS BIGINT)) AS BIGINT) AS global_min,
        |  CAST(max(CAST(mx AS BIGINT)) AS BIGINT) AS global_max,
        |  CAST(sum(CAST(mx AS BIGINT) - CAST(mn AS BIGINT)) AS BIGINT)
        |    AS span_sum,
        |  CAST(max(CAST(mx AS BIGINT)) AS BIGINT)
        |    - CAST(min(CAST(mn AS BIGINT)) AS BIGINT) AS global_span,
        |  layout
        |FROM layouts GROUP BY layout, col_name""".stripMargin,


    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,


    "q3_topk" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,


    "q5_join" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,


    "win_rank" ->
      """SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,


    "win_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |      OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM events))
        |GROUP BY user_id""".stripMargin,


    "q_corr_subquery" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_above
        |FROM orders o
        |WHERE (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) *
        |    CAST(o.o_totalprice AS DECIMAL(28,6)) * 2 >
        |  (SELECT sum(CAST(i.o_totalprice AS DECIMAL(28,6)))
        |   FROM orders i WHERE i.o_custkey = o.o_custkey) * 3""".stripMargin,


    "win_moving" ->
      """SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_rev
        |FROM lineitem WHERE l_suppkey < 20""".stripMargin,


    "cube_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,


    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin,


    "semi_join" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_customers_with_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,


    "set_except" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_customers_without_orders FROM (
        |  SELECT c_custkey AS k FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS k FROM orders)""".stripMargin,


    "distinct_agg" ->
      """SELECT n_name,
        |  CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,


    "dedup_exact" ->
      s"""$corpusCte
         |SELECT CAST(count(*) AS BIGINT) AS n_unique,
         |  CAST(sum(n_copies) AS BIGINT) AS n_total,
         |  CAST(sum(rep_id) AS BIGINT) AS rep_id_sum
         |FROM (
         |  SELECT text, min(doc_id) AS rep_id, count(*) AS n_copies
         |  FROM corpus GROUP BY text)""".stripMargin,


    "dedup_minhash" ->
      s"""$corpusCte,
         |sets AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
         |  FROM corpus)
         |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
         |  CAST(coalesce(sum(a.doc_id + b.doc_id), 0) AS BIGINT) AS id_sum
         |FROM sets a JOIN sets b ON a.ws = b.ws AND a.doc_id < b.doc_id""".stripMargin,


    "dedup_clusters" ->
      s"""$corpusCte,
         |clusters AS (
         |  SELECT list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws,
         |    count(*) AS cluster_size, min(doc_id) AS rep_id
         |  FROM corpus GROUP BY 1
         |  HAVING count(*) > 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(coalesce(sum(cluster_size), 0) AS BIGINT) AS n_dup_docs,
         |  CAST(coalesce(max(cluster_size), 0) AS BIGINT) AS max_cluster,
         |  CAST(coalesce(sum(rep_id), 0) AS BIGINT) AS rep_sum
         |FROM clusters""".stripMargin,


    "dedup_simhash" ->
      s"""$corpusCte
         |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
         |  CAST(coalesce(sum(a.doc_id + b.doc_id), 0) AS BIGINT) AS id_sum
         |FROM corpus a JOIN corpus b ON a.text = b.text AND a.doc_id < b.doc_id""".stripMargin,


    "dedup_cross" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id + 300000 AS doc_id, ws FROM sets WHERE doc_id < 30
        |  UNION ALL
        |  SELECT s.doc_id + 300000,
        |    list_sort(list_distinct(list_filter(
        |      string_split(d.text || ' uniquesuffix' || CAST(s.doc_id AS VARCHAR), ' '),
        |      t -> t <> '')))
        |  FROM sets s JOIN documents d USING (doc_id)
        |  WHERE s.doc_id >= 30 AND s.doc_id < 50),
        |bad AS (SELECT DISTINCT b.doc_id FROM b JOIN sets a ON b.ws = a.ws)
        |SELECT CAST(count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,


    "dedup_store_scrub" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |b AS (
        |  SELECT doc_id + 400000 AS doc_id, ws FROM sets WHERE doc_id < 20
        |  UNION ALL
        |  SELECT s.doc_id + 400000,
        |    list_sort(list_distinct(list_filter(
        |      string_split(d.text || ' storesuffix' || CAST(s.doc_id AS VARCHAR), ' '),
        |      t -> t <> '')))
        |  FROM sets s JOIN documents d USING (doc_id)
        |  WHERE s.doc_id >= 20 AND s.doc_id < 40),
        |bad AS (SELECT DISTINCT b.doc_id FROM b JOIN sets a ON b.ws = a.ws)
        |SELECT CAST(count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,


    // the ingest loop's semantics in closed form: duplicates are exactly
    // the increment docs whose token set equals some reference doc's
    // (equal sets => equal minhash signatures => every band matches, so
    // LSH candidate generation is guaranteed-recall for the exact-verify
    // filter); the store row count is (ref + survivors) x 16 bands
    "pipeline_ingest" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 600000 AS doc_id, ws FROM sets WHERE doc_id < 70),
        |dups AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ref r ON i.ws = r.ws),
        |surv AS (SELECT doc_id FROM inc
        |         WHERE doc_id NOT IN (SELECT doc_id FROM dups))
        |SELECT
        |  CAST((SELECT count(*) FROM dups) AS BIGINT) AS n_dups,
        |  CAST(coalesce((SELECT sum(doc_id) FROM dups), 0) AS BIGINT) AS dup_id_sum,
        |  CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_survivors,
        |  CAST(coalesce((SELECT sum(doc_id) FROM surv), 0) AS BIGINT) AS surv_id_sum,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv)) * 16
        |    AS BIGINT) AS store_band_rows""".stripMargin,


    // layout closed form: one file per bucket per write (the repartition
    // in writeBucketed aligns with the bucket hash), so write + absorb =
    // 2 x 8 files, compaction = 8; rows conserve; every literal store
    // member must still pair with its relabeled copy post-compact
    // (identical token set => identical signature => every band matches)
    "store_compact" ->
      """SELECT CAST(16 AS BIGINT) AS n_files_before,
        |  CAST(8 AS BIGINT) AS n_files_after,
        |  CAST(((SELECT count(*) FROM documents WHERE doc_id >= 50)
        |       + (SELECT count(*) FROM documents WHERE doc_id < 70)) * 16
        |    AS BIGINT) AS store_rows,
        |  CAST((SELECT count(*) FROM documents WHERE doc_id >= 50 AND doc_id < 70)
        |    AS BIGINT) AS n_literal_pairs""".stripMargin,


    // every duplicate paired with the smallest token-set-equal store id
    "dedup_provenance" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 850000 AS doc_id, ws FROM sets WHERE doc_id < 70)
        |SELECT i.doc_id, CAST(min(r.doc_id) AS BIGINT) AS matched_id
        |FROM inc i JOIN ref r ON i.ws = r.ws
        |GROUP BY i.doc_id""".stripMargin,


    // cross-modal closed form: text-side dedup decides both stores, so
    // every count derives from token-set equality vs the reference; the
    // retrieval hits are exactly the queries whose text survived (their
    // exact-copy embeddings were absorbed; dup'd queries' were not, and
    // a dropped embedding cannot be found)
    "pipeline_crossmodal" ->
      """WITH sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM documents),
        |ref AS (SELECT doc_id, ws FROM sets WHERE doc_id >= 50),
        |inc AS (SELECT doc_id + 950000 AS doc_id, doc_id AS orig, ws FROM sets
        |        WHERE doc_id < 70),
        |dups AS (SELECT DISTINCT i.doc_id FROM inc i JOIN ref r ON i.ws = r.ws),
        |surv AS (SELECT doc_id, orig FROM inc
        |         WHERE doc_id NOT IN (SELECT doc_id FROM dups))
        |SELECT
        |  CAST((SELECT count(*) FROM surv) AS BIGINT) AS n_survivors,
        |  CAST(coalesce((SELECT sum(doc_id) FROM surv), 0) AS BIGINT) AS surv_id_sum,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv)) * 16
        |    AS BIGINT) AS store_band_rows,
        |  CAST(((SELECT count(*) FROM ref) + (SELECT count(*) FROM surv))
        |    AS BIGINT) AS doc_store_rows,
        |  CAST(((SELECT count(*) FROM embeddings WHERE vec_id >= 50)
        |       + (SELECT count(*) FROM surv)) AS BIGINT) AS ivf_rows,
        |  CAST((SELECT count(*) FROM surv WHERE orig < 10) AS BIGINT) AS n_rank1_hits""".stripMargin,


    // components via min-reachable-node: the recursive CTE enumerates
    // (node, reachable node) pairs with UNION dedup — exact on the small
    // components this graph has, and engine-agnostic
    "dedup_cc" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
        |),
        |sets AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
        |  FROM corpus),
        |dup_edges AS (
        |  SELECT a.doc_id AS src, b.doc_id AS dst
        |  FROM sets a JOIN sets b ON a.ws = b.ws AND a.doc_id < b.doc_id),
        |chain_edges AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM corpus
        |  WHERE doc_id < 299 AND doc_id % 5 <> 4),
        |edges AS (SELECT src, dst FROM dup_edges UNION SELECT src, dst FROM chain_edges),
        |sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
        |reach(node, comp) AS (
        |  SELECT src AS node, src AS comp FROM sym
        |  UNION
        |  SELECT s.dst, r.comp FROM reach r JOIN sym s ON s.src = r.node
        |),
        |cc AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
        |comps AS (SELECT component, count(*) AS csize FROM cc GROUP BY component)
        |SELECT CAST(count(*) AS BIGINT) AS n_components,
        |  CAST(coalesce(sum(csize), 0) AS BIGINT) AS n_nodes,
        |  CAST(coalesce(max(csize), 0) AS BIGINT) AS max_size,
        |  CAST(coalesce(sum(component), 0) AS BIGINT) AS comp_id_sum
        |FROM comps""".stripMargin,


    "pagerank" ->
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey AS s, l_suppkey + 1000000 AS d
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT s, d FROM cs UNION ALL SELECT d, s FROM cs),
        |nodes AS (SELECT DISTINCT s AS node FROM e),
        |deg AS (SELECT s, count(*) AS outdeg FROM e GROUP BY s),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes CROSS JOIN nn),
        |c1 AS (SELECT e.d AS node, sum(r0.rank // deg.outdeg) AS m
        |       FROM e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r1 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c1.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.node = c1.node),
        |c2 AS (SELECT e.d AS node, sum(r1.rank // deg.outdeg) AS m
        |       FROM e JOIN r1 ON e.s = r1.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r2 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c2.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.node = c2.node),
        |c3 AS (SELECT e.d AS node, sum(r2.rank // deg.outdeg) AS m
        |       FROM e JOIN r2 ON e.s = r2.node JOIN deg ON e.s = deg.s GROUP BY e.d),
        |r3 AS (SELECT nodes.node, 1000000000000 * 15 // 100 // n
        |         + (85 * coalesce(c3.m, 0)) // 100 AS rank
        |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.node = c3.node)
        |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
        |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin,


    "kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT lang AS g,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM documents),
        |r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h),
        |s AS (
        |  SELECT g AS lang,
        |    CAST(least(count(*), 8) AS BIGINT) AS n_sketch,
        |    CAST(coalesce(max(CASE WHEN rn = 8 THEN h END), 0) AS BIGINT) AS kth_min
        |  FROM r GROUP BY g)
        |SELECT lang, n_sketch, kth_min,
        |  CAST(CASE WHEN n_sketch < 8 THEN n_sketch * 1000000
        |    ELSE 7000021000000 // kth_min END AS BIGINT) AS est_micro
        |FROM s""".stripMargin,


    "text_oov" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT unnest(t) AS w FROM toks)
        |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 16),
        |per AS (
        |  SELECT s.doc_id, count(*) AS n,
        |    sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS known
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks WHERE doc_id < 50) s
        |  LEFT JOIN vocab v USING (w)
        |  GROUP BY s.doc_id)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST((n - known) * 1000000 // n AS BIGINT) AS oov_micro
        |FROM per""".stripMargin,


    "corpus_report" ->
      """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  CAST(CAST(sum(n_chars) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS mean_chars_micro
        |FROM documents GROUP BY ROLLUP (source, lang)""".stripMargin,


    "text_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS ng
        |  FROM toks),
        |lm AS (
        |  SELECT ng, CAST(count(*) AS BIGINT) AS cnt
        |  FROM ng WHERE doc_id >= 50 GROUP BY ng),
        |sc AS (
        |  SELECT n.doc_id, count(*) AS n_ngrams,
        |    sum(CASE WHEN lm.cnt IS NULL THEN 1 ELSE 0 END) AS oov,
        |    sum(coalesce(lm.cnt, 0)) AS fam
        |  FROM ng n LEFT JOIN lm ON n.ng = lm.ng
        |  WHERE n.doc_id < 50 GROUP BY n.doc_id)
        |SELECT doc_id, CAST(n_ngrams AS BIGINT) AS n_ngrams,
        |  CAST(oov AS BIGINT) AS oov_ngrams,
        |  CAST(fam * 1000000 // n_ngrams AS BIGINT) AS fam_micro
        |FROM sc""".stripMargin,


    "corpus_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
        |nw AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM old WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM old WHERE doc_id < 30),
        |st AS (
        |  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |      WHEN n.doc_id IS NULL THEN 'removed'
        |      WHEN o.text <> n.text THEN 'changed'
        |      ELSE 'unchanged' END AS status
        |  FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM st GROUP BY status""".stripMargin,


    "mm_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 30)
        |SELECT sha256(text) AS digest,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(min(media_id) AS BIGINT) AS keep_id,
        |  CAST(sum(media_id) AS BIGINT) AS id_sum
        |FROM corpus GROUP BY digest HAVING count(*) > 1""".stripMargin,


    "shard_order" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS hv
        |  FROM documents)
        |SELECT doc_id, CAST(hv % 8 AS BIGINT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM h""".stripMargin,


    "span_dedup" ->
      s"""$corpusCte,
         |toks AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
         |  FROM corpus),
         |spans AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 6),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |      t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS g
         |  FROM toks),
         |occ AS (SELECT g, count(*) AS occ FROM spans GROUP BY g),
         |ds AS (
         |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |    CAST(coalesce(sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dup_spans
         |  FROM spans s JOIN occ o USING (g) GROUP BY s.doc_id)
         |SELECT doc_id, n_spans, n_dup_spans FROM ds WHERE n_dup_spans > 0""".stripMargin,


    // replays the EXACT grid-quantized Lloyd iterations of
    // Clustering.kmeansGridAssign: every step is exact-integer arithmetic
    // (see the unroller's scaladoc), so the SQL reproduces the identical
    // labels — a genuine cross-engine k-means oracle
    "cluster_kmeans" -> kmeansOracleSql(dim = 64, k = 8, iters = 2),


    "dedup_semantic" ->
      semanticDedupOracleSql(dim = 64, k = 8, iters = 2, plantLt = 25, threshold = 0.99d),


    "ngram_jaccard" ->
      """WITH ng AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(
        |      list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i + 1]))) AS ng
        |  FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents WHERE doc_id < 40))
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) AS j_micro
        |FROM ng a JOIN ng b ON a.doc_id < b.doc_id
        |WHERE CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) >= 100000""".stripMargin,


    "ngram_containment" ->
      """WITH t0 AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 40),
        |corpus AS (
        |  SELECT doc_id, toks FROM t0
        |  UNION ALL
        |  SELECT doc_id + 100000, toks[1:30] FROM t0 WHERE doc_id < 20),
        |ng AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]))) AS ng
        |  FROM corpus),
        |nz AS (SELECT * FROM ng WHERE len(ng) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(a.ng) * 1000000) AS BIGINT) AS c_micro,
        |  CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.ng, b.ng))) * 1000000) AS BIGINT) AS j_micro
        |FROM nz a JOIN nz b ON a.doc_id <> b.doc_id
        |WHERE CAST(floor(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)
        |    / len(a.ng) * 1000000) AS BIGINT) >= 900000""".stripMargin,


    "text_tokens" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |FROM documents
        |GROUP BY lang""".stripMargin,


    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CAST(floor((
        |    least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |    + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |        AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |      THEN 1.0 ELSE 0.5 END * 0.3
        |    + CASE WHEN length(text) = 0 THEN 0.0
        |      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |  ) * 1000000) AS BIGINT) AS q_micro
        |FROM documents WHERE doc_id < 50""".stripMargin,


    "text_langid" ->
      """WITH scored AS (
        |  SELECT
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['der','die','das','und','ist'], t))) AS s_de,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['the','a','of','and','to'], t))) AS s_en,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['el','la','de','y','que'], t))) AS s_es,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['le','la','de','et','les'], t))) AS s_fr,
        |    len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |      t -> list_contains(['的','是','了','在','我'], t))) AS s_zh
        |  FROM documents)
        |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM scored)
        |GROUP BY pred_lang""".stripMargin,


    "text_langid_ngram" ->
      """WITH tri AS (
        |  SELECT CASE WHEN length(text) < 3 THEN []::VARCHAR[]
        |    ELSE list_transform(range(1, length(text) - 1), i -> substr(text, i, 3)) END AS tg
        |  FROM documents),
        |scored AS (
        |  SELECT
        |    len(list_filter(tg, t -> list_contains(['der','ein','sch','ich','und','die'], t))) AS s_de,
        |    len(list_filter(tg, t -> list_contains(['the','ing','ion','and','he '], t))) AS s_en,
        |    len(list_filter(tg, t -> list_contains(['de ','la ','que','os ','ión'], t))) AS s_es,
        |    len(list_filter(tg, t -> list_contains(['le ','ent','les','de ','eur'], t))) AS s_fr,
        |    len(list_filter(tg, t -> list_contains(['我们的','是一个','不知道'], t))) AS s_zh
        |  FROM tri)
        |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM (
        |  SELECT CASE
        |    WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |    WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |    WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |    WHEN s_fr >= s_zh THEN 'fr'
        |    ELSE 'zh' END AS pred_lang
        |  FROM scored)
        |GROUP BY pred_lang""".stripMargin,


    "text_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |        c -> CAST(unicode(c) AS BIGINT))),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) AS fp
        |FROM documents WHERE doc_id < 100""".stripMargin,


    "quality_rules" ->
      """WITH p1 AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 17 = 0 THEN repeat('zz ', 40) ELSE text END AS t1
        |  FROM documents),
        |p2 AS (
        |  SELECT source,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN t1 || ' 0123456789 #### $$$$ %%%% ^^^^ &&&& 1111 2222 3333 4444 5555'
        |      ELSE t1 END AS text2
        |  FROM p1),
        |m AS (
        |  SELECT source,
        |    len(list_filter(string_split(text2, ' '), t -> t <> '')) AS ntok,
        |    length(text2) AS nchar,
        |    length(replace(text2, ' ', '')) AS wchars,
        |    length(regexp_replace(text2, '[^a-zA-Z]', '', 'g')) AS alpha,
        |    len(list_distinct(list_filter(string_split(text2, ' '), t -> t <> ''))) AS ndist,
        |    len(list_filter(string_split(text2, ' '),
        |      t -> list_contains(['the', 'a', 'of', 'and', 'to'], t))) AS stop
        |  FROM p2),
        |f AS (
        |  SELECT source,
        |    CASE WHEN ntok < 8 OR ntok > 1024 THEN 1 ELSE 0 END AS f1,
        |    CASE WHEN wchars < ntok * 2 OR wchars > ntok * 12 THEN 1 ELSE 0 END AS f2,
        |    CASE WHEN alpha * 10 < nchar * 6 THEN 1 ELSE 0 END AS f4,
        |    CASE WHEN stop = 0 THEN 1 ELSE 0 END AS f8,
        |    CASE WHEN ndist * 10 < ntok * 3 THEN 1 ELSE 0 END AS f16
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(CASE WHEN f1 + f2 + f4 + f8 + f16 = 0 THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(sum(f1) AS BIGINT) AS n_wordcount,
        |  CAST(sum(f2) AS BIGINT) AS n_wordlen,
        |  CAST(sum(f4) AS BIGINT) AS n_alpha,
        |  CAST(sum(f8) AS BIGINT) AS n_nostop,
        |  CAST(sum(f16) AS BIGINT) AS n_repetitive
        |FROM f GROUP BY source""".stripMargin,


    "text_redact" ->
      """WITH p1 AS (
        |  SELECT lang, doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
        |      ELSE text END AS t1
        |  FROM documents),
        |p2 AS (
        |  SELECT lang,
        |    CASE WHEN doc_id % 11 = 0
        |      THEN t1 || ' via 10.0.3.77 call 555-867-5309'
        |      ELSE t1 END AS text2
        |  FROM p1),
        |red AS (
        |  SELECT lang, text2,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text2,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM p2)
        |SELECT lang,
        |  CAST(count(*) FILTER (WHERE red <> text2) AS BIGINT) AS n_redacted_docs,
        |  CAST(coalesce(sum(length(text2) - length(red)), 0) AS BIGINT) AS chars_removed,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))), 0) AS BIGINT) AS n_emails,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))), 0) AS BIGINT) AS n_ips,
        |  CAST(coalesce(sum(len(regexp_extract_all(text2,
        |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))), 0) AS BIGINT) AS n_phones
        |FROM red GROUP BY lang""".stripMargin,


    "dedup_keep_best" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000, text || ' 1234 !!!! ####'
        |  FROM documents WHERE doc_id < 60),
        |scored AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(
        |      list_filter(string_split(text, ' '), t -> t <> ''), 1, 6), ' ') AS pfx,
        |    CAST(floor((
        |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |        THEN 1.0 ELSE 0.5 END * 0.3
        |      + CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |    ) * 1000000) AS BIGINT) AS q_micro
        |  FROM corpus),
        |ranked AS (
        |  SELECT pfx, doc_id, q_micro,
        |    row_number() OVER (PARTITION BY pfx ORDER BY q_micro DESC, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY pfx) AS n_copies
        |  FROM scored)
        |SELECT pfx AS dedup_key, CAST(n_copies AS BIGINT) AS n_copies,
        |  q_micro AS best_q_micro, doc_id AS rep_id
        |FROM ranked WHERE rn = 1 AND n_copies > 1""".stripMargin,


    "line_dedup" ->
      """WITH planted AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'shared navigation header menu' || chr(10) ELSE '' END
        |    || text
        |    || CASE WHEN doc_id % 4 = 0
        |      THEN chr(10) || 'copyright footer all rights reserved' ELSE '' END AS text2
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, source,
        |    unnest(string_split(text2, chr(10))) AS line,
        |    generate_subscripts(string_split(text2, chr(10)), 1) AS line_no
        |  FROM planted),
        |freq AS (
        |  SELECT line AS fline FROM lines GROUP BY line HAVING count(*) >= 100),
        |cleaned AS (
        |  SELECT doc_id, any_value(source) AS source,
        |    coalesce(string_agg(CASE WHEN fline IS NULL THEN line END,
        |      chr(10) ORDER BY line_no), '') AS clean_text,
        |    count(CASE WHEN fline IS NULL THEN 1 END) AS kept,
        |    count(fline) AS removed
        |  FROM lines l LEFT JOIN freq f ON l.line = f.fline
        |  GROUP BY doc_id)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(kept) AS BIGINT) AS lines_kept,
        |  CAST(sum(removed) AS BIGINT) AS lines_removed,
        |  CAST(sum(length(clean_text)) AS BIGINT) AS chars_after
        |FROM cleaned GROUP BY source""".stripMargin,


    "mix_sample" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END AS source,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 AS hv
        |  FROM documents),
        |kept AS (
        |  SELECT * FROM m
        |  WHERE hv % 100 <
        |    CASE source WHEN 'web' THEN 80 WHEN 'books' THEN 50 ELSE 20 END)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source""".stripMargin,


    "temp_mixture" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 < 6 THEN 'web'
        |         WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS source,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 1000 AS hv
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n FROM m GROUP BY 1),
        |-- isqrt via one correction step around floor(sqrt(n::DOUBLE)):
        |-- exact only while n < 2^52, where the double sqrt is within one
        |-- step of the true root. The Scala side loops to exactness at any
        |-- n; beyond 2^52 rows/source this oracle (not the engine) would
        |-- need an iterative isqrt.
        |w AS (
        |  SELECT source, n,
        |    CASE WHEN (x + 1) * (x + 1) <= n THEN x + 1
        |         WHEN x * x > n THEN x - 1 ELSE x END AS w
        |  FROM (SELECT source, n,
        |          CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS x FROM c)),
        |p AS (
        |  SELECT source,
        |    least(1000, (1000::HUGEINT * 250 * w) // ((SELECT sum(w) FROM w) * n)) AS permille
        |  FROM w),
        |kept AS (
        |  SELECT m.source, m.doc_id FROM m JOIN p USING (source)
        |  WHERE m.hv < p.permille)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY source""".stripMargin,


    // the band partition contract in closed form: exhaustive (every row in
    // exactly one band) and disjoint (no row twice), so all three counts
    // are the plain table count
    "hash_bands" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_in_bands,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents""".stripMargin,


    "sample_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
        |  FROM documents)
        |SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM b GROUP BY 1""".stripMargin,


    "group_split" ->
      s"""$corpusCte,
         |sets AS (
         |  SELECT doc_id,
         |    list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS ws
         |  FROM corpus),
         |fam AS (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY ws) AS rep_id FROM sets),
         |sp AS (
         |  SELECT doc_id, rep_id,
         |    ((rep_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
         |  FROM fam)
         |SELECT CASE WHEN hv < 80 THEN 'train' WHEN hv < 90 THEN 'val' ELSE 'test' END AS split,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT rep_id) AS BIGINT) AS n_families,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
         |FROM sp GROUP BY 1""".stripMargin,


    "budget_carve" ->
      """WITH c AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    SUM(n_chars) OVER (
        |      ORDER BY ((doc_id % 1000003) * 2654435761 + 104729) % 1000003,
        |               doc_id) AS cum
        |  FROM documents)
        |SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars
        |FROM c WHERE cum <= 75000""".stripMargin,


    "mass_carve" ->
      """WITH t AS (SELECT source, sum(n_chars) AS tot FROM documents GROUP BY source),
        |c AS (
        |  SELECT d.source, d.doc_id, d.n_chars, t.tot,
        |    SUM(d.n_chars) OVER (PARTITION BY d.source
        |      ORDER BY d.n_chars DESC, d.doc_id) AS cum
        |  FROM documents d JOIN t ON d.source = t.source)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM c WHERE cum <= tot * 800 // 1000 GROUP BY source""".stripMargin,


    "budget_mixture" ->
      """WITH b AS (
        |  SELECT source AS src, budget FROM (VALUES
        |    ('src0', 100000), ('src1', 4000), ('src2', 40000), ('src3', 12000))
        |    AS v(source, budget)),
        |c AS (
        |  SELECT d.source, d.doc_id, d.n_chars, b.budget,
        |    SUM(d.n_chars) OVER (PARTITION BY d.source
        |      ORDER BY ((d.doc_id % 1000003) * 2654435761 + 104729) % 1000003,
        |               d.doc_id) AS cum
        |  FROM documents d JOIN b ON d.source = b.src)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM c WHERE cum <= budget GROUP BY source""".stripMargin,


    "quantile_hist" ->
      """WITH b AS (
        |  SELECT l_returnflag AS g,
        |    least(greatest(CAST(floor(l_extendedprice) AS BIGINT), 0) // 5000, 23) AS bin
        |  FROM lineitem),
        |h AS (SELECT g, bin, count(*) AS cnt FROM b GROUP BY g, bin),
        |c AS (
        |  SELECT g, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM h)
        |SELECT g AS l_returnflag, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 500000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p50_ub,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 900000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p90_ub,
        |  CAST(min(CASE WHEN cum * 1000000 >= n * 990000 THEN (bin + 1) * 5000 END) AS BIGINT) AS p99_ub
        |FROM c GROUP BY g""".stripMargin,


    "drift_hist" ->
      """WITH c AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS w,
        |    least(greatest(CAST(floor(value) AS BIGINT), 0) // 10, 11) AS cat,
        |    count(*) AS cnt
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |s AS (
        |  SELECT w, cat, cnt * 1000000 // sum(cnt) OVER (PARTITION BY w) AS sh
        |  FROM c),
        |p AS (
        |  SELECT coalesce(a.w, b.w) AS w,
        |    coalesce(a.sh, 0) AS sa, coalesce(b.sh, 0) AS sb
        |  FROM s a
        |  FULL JOIN (SELECT w + 1 AS w, cat, sh FROM s) b
        |    ON a.w = b.w AND a.cat IS NOT DISTINCT FROM b.cat),
        |d AS (SELECT DISTINCT w FROM s)
        |SELECT p.w AS day, CAST(sum(abs(sa - sb)) AS BIGINT) AS l1_micro
        |FROM p
        |WHERE p.w IN (SELECT w FROM d) AND p.w - 1 IN (SELECT w FROM d)
        |GROUP BY p.w""".stripMargin,


    "drift_l1" ->
      """WITH c AS (
        |  SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS w,
        |    event_type AS cat, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT w, cat, cnt * 1000000 // sum(cnt) OVER (PARTITION BY w) AS sh
        |  FROM c),
        |p AS (
        |  SELECT coalesce(a.w, b.w) AS w,
        |    coalesce(a.sh, 0) AS sa, coalesce(b.sh, 0) AS sb
        |  FROM s a
        |  FULL JOIN (SELECT w + 1 AS w, cat, sh FROM s) b
        |    ON a.w = b.w AND a.cat IS NOT DISTINCT FROM b.cat),
        |d AS (SELECT DISTINCT w FROM s)
        |SELECT p.w AS day, CAST(sum(abs(sa - sb)) AS BIGINT) AS l1_micro
        |FROM p
        |WHERE p.w IN (SELECT w FROM d) AND p.w - 1 IN (SELECT w FROM d)
        |GROUP BY p.w""".stripMargin,


    "bpe_pairs" ->
      """WITH t AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |u AS (
        |  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
        |  FROM t WHERE len(t) >= 2),
        |c AS (
        |  SELECT z[1] AS "left", z[2] AS "right", CAST(count(*) AS BIGINT) AS cnt
        |  FROM u GROUP BY 1, 2)
        |SELECT "left", "right", cnt FROM c
        |ORDER BY cnt DESC, "left", "right" LIMIT 20""".stripMargin,


    "bpe_merges" -> bpeMergesOracleSql(8),


    "bpe_encode" -> bpeEncodeOracleSql(8),


    "drift_vector" ->
      """WITH qv AS (
        |  SELECT vec_id, CAST(label AS VARCHAR) AS g,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> greatest(least(CAST(floor(x * 64) AS BIGINT), 127), -128)) AS q8
        |  FROM embeddings),
        |dims AS (
        |  SELECT g, vec_id % 2 = 0 AS is_a, i, q8[i] AS qd
        |  FROM qv, unnest(range(1, len(q8) + 1)) AS r(i)),
        |sums AS (
        |  SELECT g, i,
        |    sum(CASE WHEN is_a THEN qd ELSE 0 END) AS sa,
        |    sum(CASE WHEN NOT is_a THEN qd ELSE 0 END) AS sb
        |  FROM dims GROUP BY 1, 2),
        |cnts AS (
        |  SELECT g,
        |    sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
        |  FROM qv GROUP BY 1)
        |SELECT g, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(sum(abs(sa * nb - sb * na)) AS BIGINT) AS l1_cross
        |FROM sums JOIN cnts USING (g)
        |GROUP BY g, na, nb""".stripMargin,


    "bpe_efficiency" ->
      s"""${bpeTrainCtes(8)}
         |SELECT d.source,
         |  CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(sum(length(d.word)) AS BIGINT) AS n_chars,
         |  CAST(sum(len(v.s)) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(length(d.word)) * 1000000 // sum(len(v.s)) AS BIGINT) AS chars_per_tok_micro
         |FROM (
         |  SELECT source,
         |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
         |  FROM documents) d
         |JOIN v8 v USING (word)
         |GROUP BY d.source""".stripMargin,


    "pipeline_tokenize" ->
      s"""${bpeTrainCtes(8)},
         |cnt AS (
         |  SELECT d.source, d.doc_id, CAST(sum(len(v.s)) AS BIGINT) AS n_tok
         |  FROM (
         |    SELECT source, doc_id,
         |      unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
         |    FROM documents) d
         |  JOIN v8 v USING (word)
         |  GROUP BY d.source, d.doc_id),
         |packed AS (
         |  SELECT source, doc_id, n_tok,
         |    CAST(coalesce(sum(n_tok) OVER (
         |      PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      // 2048 AS BIGINT) AS seq_id
         |  FROM cnt)
         |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM packed
         |GROUP BY source, seq_id""".stripMargin,


    "event_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, {'t': ts, 'i': event_id} AS k FROM events),
        |v AS (
        |  SELECT user_id, min(k) AS s1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.k) AS s2 FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.k > v.s1 GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.k) AS s3 FROM e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.k > c.s2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM c
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), CAST(count(*) AS BIGINT) FROM p""".stripMargin,


    "event_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
        |  FROM events),
        |fd AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT CAST(fd.cohort_day AS BIGINT) AS cohort_day,
        |  CAST(ud.day - fd.cohort_day AS BIGINT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM ud JOIN fd ON ud.user_id = fd.user_id
        |GROUP BY 1, 2""".stripMargin,


    // the salted join must equal the PLAIN join it replaces — the oracle
    // is the unsalted formulation
    "skew_join" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE o_custkey END AS cust,
        |    o_totalprice
        |  FROM orders)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS price_sum
        |FROM o JOIN customer ON cust = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,


    "profile_table" ->
      """WITH p AS (
        |  SELECT 'l_orderkey' AS "column", count(*) AS n, count(*) - count(l_orderkey) AS n_null,
        |    CAST(CAST(min(l_orderkey) AS DECIMAL(28,6)) AS VARCHAR) AS min_s,
        |    CAST(CAST(max(l_orderkey) AS DECIMAL(28,6)) AS VARCHAR) AS max_s,
        |    CAST(sum(CAST(l_orderkey AS DECIMAL(28,6))) AS DOUBLE) AS sum_d
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
        |    CAST(CAST(min(l_quantity) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(CAST(max(l_quantity) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |    CAST(CAST(min(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(CAST(max(l_extendedprice) AS DECIMAL(28,6)) AS VARCHAR),
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
        |    min(l_returnflag), max(l_returnflag), NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_shipdate', count(*), count(*) - count(l_shipdate),
        |    CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR), NULL
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus', count(*), count(*) - count(l_linestatus),
        |    min(l_linestatus), max(l_linestatus), NULL
        |  FROM lineitem)
        |SELECT "column", CAST(n AS BIGINT) AS n, CAST(n_null AS BIGINT) AS n_null,
        |  min_s, max_s, CAST(sum_d AS DOUBLE) AS sum_d
        |FROM p""".stripMargin,


    // capacity exceeds the distinct-token count, so the sketch holds exact
    // counts and both bounds equal the true count (see the query comment).
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |SELECT lang, token AS item,
        |  CAST(count(*) AS BIGINT) AS count_lb,
        |  CAST(count(*) AS BIGINT) AS count_ub
        |FROM toks GROUP BY lang, token""".stripMargin,


    "weighted_sample" ->
      """WITH p AS (
        |  SELECT doc_id AS id,
        |    (length(text) * 1000003) //
        |      (((doc_id % 1000003) * 2654435761 + 104729) % 1000003 + 1) AS priority
        |  FROM documents),
        |r AS (
        |  SELECT id, priority,
        |    row_number() OVER (ORDER BY priority DESC, id) AS rank
        |  FROM p)
        |SELECT CAST(rank AS BIGINT) AS rank, id, CAST(priority AS BIGINT) AS priority
        |FROM r WHERE rank <= 20""".stripMargin,


    "kmv_overlap" ->
      """WITH ha AS (
        |  SELECT DISTINCT ((c_custkey % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM customer),
        |hb AS (
        |  SELECT DISTINCT ((o_custkey % 1000003) * 2654435761 + 104729) % 1000003 AS h
        |  FROM orders),
        |a AS (SELECT list_sort(list(h)) AS ka FROM (SELECT h FROM ha ORDER BY h LIMIT 16)),
        |b AS (SELECT list_sort(list(h)) AS kb FROM (SELECT h FROM hb ORDER BY h LIMIT 16)),
        |m AS (SELECT ka, kb, (list_sort(list_distinct(ka || kb)))[1:16] AS mk FROM a, b)
        |SELECT CAST(len(ka) AS BIGINT) AS n_a, CAST(len(kb) AS BIGINT) AS n_b,
        |  CAST(len(list_intersect(list_intersect(mk, ka), kb)) AS BIGINT) AS inter_k,
        |  CAST(CASE WHEN len(mk) < 16 THEN len(mk) * 1000000
        |    ELSE 15000045000000 // mk[16] END AS BIGINT) AS union_est_micro,
        |  CAST(len(list_intersect(list_intersect(mk, ka), kb)) * 1000000 // len(mk) AS BIGINT)
        |    AS jaccard_micro
        |FROM m""".stripMargin,


    "quota_sample" ->
      """WITH h AS (
        |  SELECT lang, doc_id,
        |    ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 AS hv
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hv DESC, doc_id) AS rn
        |  FROM h)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM r WHERE rn <= 25 GROUP BY lang""".stripMargin,


    "text_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |df AS (
        |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM toks GROUP BY token),
        |tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE doc_id < 30 GROUP BY doc_id, token)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tf, df FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rank
        |  FROM tf JOIN df USING (token))
        |WHERE rank <= 3""".stripMargin,


    "text_vocab" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents)
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 20""".stripMargin,


    "dedup_embedding" ->
      """WITH corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 25)
        |SELECT CAST(count(*) AS BIGINT) AS dup_pairs,
        |  CAST(coalesce(sum(a.vec_id + b.vec_id), 0) AS BIGINT) AS id_sum
        |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |  CAST(b.embedding AS DOUBLE[])) > 0.99""".stripMargin,


    "text_bpe_tokens" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS n_subwords
        |FROM documents
        |GROUP BY source""".stripMargin,


    "pipeline_clean" ->
      s"""$corpusCte,
         |reps AS (SELECT text, min(doc_id) AS doc_id FROM corpus GROUP BY text),
         |scored AS (
         |  SELECT doc_id, text,
         |    CAST(floor((
         |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
         |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
         |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
         |        THEN 1.0 ELSE 0.5 END * 0.3
         |      + CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
         |    ) * 1000000) AS BIGINT) AS q_micro
         |  FROM reps)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(sum(q_micro), 0) AS BIGINT) AS q_micro_sum,
         |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
         |FROM scored WHERE q_micro >= 800000""".stripMargin,


    "pipeline_train" ->
      """WITH reps AS (
        |  SELECT text, min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang
        |  FROM documents GROUP BY text),
        |scored AS (
        |  SELECT doc_id, lang, text,
        |    CAST(floor((
        |      least(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) / 64.0, 1.0) * 0.4
        |      + CASE WHEN len(list_filter(string_split(text, ' '), t -> t <> '')) > 0
        |          AND CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), t -> t <> '')) BETWEEN 3.0 AND 10.0
        |        THEN 1.0 ELSE 0.5 END * 0.3
        |      + CASE WHEN length(text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE) / length(text) END * 0.3
        |    ) * 1000000) AS BIGINT) AS q_micro
        |  FROM reps),
        |kept AS (
        |  SELECT doc_id, lang, text,
        |    CASE WHEN ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 < 80 THEN 'train'
        |      WHEN ((doc_id % 1000003) * 2654435761 + 104729) % 1000003 % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM scored WHERE q_micro >= 800000)
        |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM kept GROUP BY lang, split""".stripMargin,


    "pack_sequences" ->
      """WITH toks AS (
        |  SELECT source, doc_id,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
        |  FROM documents),
        |packed AS (
        |  SELECT source, doc_id, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      // 4096 AS BIGINT) AS seq_id
        |  FROM toks)
        |SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM packed
        |GROUP BY source, seq_id""".stripMargin,


    "decontam" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |      t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS ng
        |  FROM toks),
        |bench AS (SELECT DISTINCT unnest(ng) AS g FROM grams WHERE doc_id < 20),
        |corpus AS (
        |  SELECT doc_id, ng FROM grams WHERE doc_id >= 20
        |  UNION ALL
        |  SELECT doc_id + 200000, ng FROM grams WHERE doc_id < 20),
        |bad AS (
        |  SELECT DISTINCT c.doc_id
        |  FROM (SELECT doc_id, unnest(ng) AS g FROM corpus) c
        |  JOIN bench USING (g))
        |SELECT CAST(count(*) AS BIGINT) AS n_contaminated,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
        |FROM bad""".stripMargin,


    "text_repetition" ->
      """WITH ng AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS ng
        |  FROM (
        |    SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents WHERE doc_id < 50))
        |SELECT doc_id,
        |  CASE WHEN len(ng) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor((1.0 - CAST(len(list_distinct(ng)) AS DOUBLE) / len(ng))
        |      * 1000000) AS BIGINT) END AS rep_micro
        |FROM ng""".stripMargin,


    "ann_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |  FROM embeddings WHERE vec_id < 10)
        |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |FROM (
        |  SELECT q.q_id, e.vec_id,
        |    row_number() OVER (PARTITION BY q.q_id
        |      ORDER BY list_cosine_similarity(q.q_vec, CAST(e.embedding AS DOUBLE[])) DESC,
        |        e.vec_id) AS rank
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id)
        |WHERE rank <= 3""".stripMargin,


    // Quantized scores are exact integers: the oracle replays the same
    // floor/clamp fixed-point arithmetic and integer dot product, and the
    // hash compare pins scores, not just ranks.
    "ann_quantized" ->
      """WITH qv AS (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> greatest(least(CAST(floor(x * 64) AS BIGINT), 127), -128)) AS q8
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, q8 AS qq FROM qv WHERE vec_id < 10),
        |s AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_sum(list_transform(list_zip(e.q8, q.qq), x -> x[1] * x[2])) AS score
        |  FROM qv e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rank
        |  FROM s)
        |SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
        |  CAST(score AS BIGINT) AS score
        |FROM r WHERE rank <= 3""".stripMargin,


    "ann_join_meta" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
        |  FROM embeddings WHERE vec_id < 5),
        |top AS (
        |  SELECT q_id AS query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |  FROM (
        |    SELECT q.q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY q.q_id
        |        ORDER BY list_cosine_similarity(q.q_vec, CAST(e.embedding AS DOUBLE[])) DESC,
        |          e.vec_id) AS rank
        |    FROM embeddings e CROSS JOIN q
        |    WHERE e.vec_id <> q.q_id)
        |  WHERE rank <= 3)
        |SELECT query_id, rank, neighbor_id, d.lang, d.source
        |FROM top JOIN documents d ON neighbor_id = d.doc_id""".stripMargin,


    // Planted-duplicate exact recall: rank 1 of query q is provably its
    // exact copy at id q + 100000 (see the query comments), so the oracle
    // is a closed-form integer relation.
    "ann_lsh" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_lsh_multi" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_project" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_ivf" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_ivf_quantized" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_rerank" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    "ann_ivf_store" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    // pre-filtered store search: rank 1 must be the matching-label copy
    // (+100000); the cosine-identical decoy (+200000, wrong label) cannot
    // appear because the filter runs BEFORE ranking (closed-form recall)
    "ann_filtered" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 100000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    // absorbed exact copies must be found at rank 1 through the grown
    // store (closed-form planted recall, same contract as ann_ivf_store)
    "ann_ivf_absorb" ->
      """SELECT vec_id AS query_id, CAST(1 AS BIGINT) AS rank,
        |  CAST(vec_id + 200000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    // the monitor MUST fire (the increment is a genuine distribution
    // shift) and the rebuilt index must serve the drifted copies at rank 1
    "ann_reindex_on_drift" ->
      """SELECT vec_id AS query_id, true AS reindexed,
        |  CAST(vec_id + 300000 AS BIGINT) AS neighbor_id
        |FROM embeddings WHERE vec_id < 10""".stripMargin,


    // the query encodes each row as a real PNG/JPEG with these exact
    // closed-form dimensions and then parses them back off the container
    // headers; the oracle recomputes the closed form independently
    "mm_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS kind,
        |  CAST(16 + doc_id % 37 AS BIGINT) AS width,
        |  CAST(16 + doc_id % 23 AS BIGINT) AS height,
        |  CAST((16 + doc_id % 37) * (16 + doc_id % 23) AS BIGINT) AS n_pixels
        |FROM documents WHERE doc_id < 50""".stripMargin,


    // independent re-derivation of the manifest from the written files
    // (hive partitioning + per-file row counts); the path is the fixed
    // export location the query writes (same-machine oracle, like the
    // meta_* oracles' fixed sf0.01 paths)
    "export_manifest" ->
      """SELECT CAST(lang AS VARCHAR) AS lang,
        |  CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM read_parquet('/tmp/graft_export_manifest_sf0.01/*/*.parquet',
        |  hive_partitioning = 1, filename = 1)
        |GROUP BY lang""".stripMargin,


    // independent re-derivation of the compaction manifest from the
    // written files themselves (same-machine fixed sf0.01 path)
    "sized_write" ->
      """SELECT CAST(count(DISTINCT filename) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM read_parquet('/tmp/graft_sized_write_sf0.01/*.parquet', filename = 1)""".stripMargin,


    "bucketed_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment""".stripMargin,


    // pairs predicted from the plant: each id < 10 has a copy at id+1000
    // flipped at exactly 3 hash bits (within the d=3 recall guarantee);
    // base patterns are splitmix-scrambled and pairwise far (spec-pinned)
    "mm_phash_near" ->
      """SELECT doc_id AS a_id, CAST(doc_id + 1000 AS BIGINT) AS b_id
        |FROM documents WHERE doc_id < 10""".stripMargin,


    // families predicted from the plant: ids < 10 get one exact pixel
    // copy at id+1000; distinct bases don't collide (spec-pinned)
    "mm_phash_dedup" ->
      """SELECT doc_id AS keep_id, CAST(2 AS BIGINT) AS n_copies,
        |  CAST(doc_id * 2 + 1000 AS BIGINT) AS id_sum
        |FROM documents WHERE doc_id < 10""".stripMargin,


    // fixture arithmetic replayed: rate 8000+1000*(id%4), channels
    // 1+id%2, frames 500+3*id, exact integer microsecond duration
    "mm_audio_probe" ->
      """SELECT doc_id AS media_id,
        |  CAST(8000 + 1000 * (doc_id % 4) AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(500 + doc_id * 3 AS BIGINT) AS n_frames,
        |  CAST((500 + doc_id * 3) * 1000000 // (8000 + 1000 * (doc_id % 4))
        |    AS BIGINT) AS dur_us
        |FROM documents WHERE doc_id < 40""".stripMargin,


    "mm_video_probe" ->
      """SELECT doc_id AS media_id, c.container,
        |  CAST(CASE WHEN c.container = 'mp4'
        |    THEN 1000 * (1 + doc_id % 3) ELSE 1000 END AS BIGINT) AS timescale,
        |  CAST(4000 + doc_id * 7 AS BIGINT) AS dur_ticks,
        |  CAST((4000 + doc_id * 7) * 1000000
        |    // (CASE WHEN c.container = 'mp4'
        |      THEN 1000 * (1 + doc_id % 3) ELSE 1000 END) AS BIGINT) AS dur_us,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
        |  CAST(320 + 16 * (doc_id % 5) AS BIGINT) AS width,
        |  CAST(180 + 9 * (doc_id % 5) AS BIGINT) AS height
        |FROM documents, (VALUES ('mp4'), ('mkv'), ('webm')) c(container)
        |WHERE doc_id < 40""".stripMargin,


    "mm_audio_formats" ->
      """SELECT doc_id AS media_id, c.container,
        |  CAST(8000 + 1000 * (doc_id % 4) AS BIGINT) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(400 + doc_id * 3 AS BIGINT) AS n_frames,
        |  CAST((400 + doc_id * 3) * 1000000 // (8000 + 1000 * (doc_id % 4))
        |    AS BIGINT) AS dur_us
        |FROM documents, (VALUES ('wav'), ('aiff'), ('au')) c(container)
        |WHERE doc_id < 30""".stripMargin,


    // the integer shrink arithmetic reproduced from doc_id alone:
    // fixture dims w=12+(id*7)%60, h=10+(id*5)%45; longer side capped at
    // 24 with floor scaling, passthrough when already within bounds
    "mm_resize" ->
      """WITH dims AS (
        |  SELECT doc_id AS media_id,
        |    12 + (doc_id * 7) % 60 AS w, 10 + (doc_id * 5) % 45 AS h
        |  FROM documents WHERE doc_id < 40)
        |SELECT media_id,
        |  CAST(CASE WHEN greatest(w, h) <= 24 THEN w
        |    ELSE greatest(1, w * 24 // greatest(w, h)) END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN greatest(w, h) <= 24 THEN h
        |    ELSE greatest(1, h * 24 // greatest(w, h)) END AS BIGINT) AS out_h
        |FROM dims""".stripMargin,


    "mm_frames" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_frames,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum,
        |  CAST(coalesce(sum(octet_length(encode(text))), 0) AS BIGINT) AS byte_sum
        |FROM documents WHERE doc_id < 100 AND doc_id % 4 = 0""".stripMargin,


    "asof_join" ->
      """SELECT e.user_id, e.e_ts, e.event_id, o.o_ts, o.o_key
        |FROM (SELECT user_id, epoch_us(ts) AS e_ts, event_id
        |      FROM events WHERE user_id < 30) e
        |ASOF JOIN (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_ts,
        |             max(o_orderkey) AS o_key
        |           FROM orders GROUP BY 1, 2) o
        |ON e.user_id = o.user_id AND e.e_ts >= o.o_ts""".stripMargin,


    // per-row argmin over |e_ts - o_ts|, earlier order on ties (backward
    // bias) — the relational definition of direction='nearest'
    "asof_nearest" ->
      """SELECT e.user_id, e.e_ts, e.event_id, o.o_ts, o.o_key
        |FROM (SELECT user_id, epoch_us(ts) AS e_ts, event_id
        |      FROM events WHERE user_id < 30) e
        |JOIN LATERAL (
        |  SELECT o_ts, o_key
        |  FROM (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_ts,
        |          max(o_orderkey) AS o_key
        |        FROM orders GROUP BY 1, 2) o
        |  WHERE o.user_id = e.user_id
        |  ORDER BY abs(e.e_ts - o.o_ts), o.o_ts
        |  LIMIT 1) o ON true""".stripMargin,


    "range_join" ->
      """WITH pts AS (
        |  SELECT l_orderkey, l_linenumber, epoch_ns(l_shipdate) AS ship_ns
        |  FROM lineitem WHERE l_orderkey % 10 = 0),
        |ivs AS (
        |  SELECT o_orderkey AS iv_order, epoch_ns(o_orderdate) AS w_start,
        |    epoch_ns(o_orderdate) + CAST(2592000000000000 AS BIGINT) AS w_end
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT iv_order, CAST(count(*) AS BIGINT) AS n_ship,
        |  CAST(sum(l_linenumber) AS BIGINT) AS ln_sum
        |FROM pts JOIN ivs ON ship_ns BETWEEN w_start AND w_end
        |GROUP BY iv_order""".stripMargin,


    "asof_fwd" ->
      """SELECT o.o_orderkey, o.o_ts, s.ship_ts, s.n_items, s.max_line
        |FROM (SELECT o_orderkey, epoch_us(o_orderdate) AS o_ts
        |      FROM orders WHERE o_orderkey % 20 = 0) o
        |ASOF JOIN (SELECT l_orderkey AS o_orderkey, epoch_us(l_shipdate) AS ship_ts,
        |             CAST(count(*) AS BIGINT) AS n_items,
        |             CAST(max(l_linenumber) AS BIGINT) AS max_line
        |           FROM lineitem GROUP BY 1, 2) s
        |ON o.o_orderkey = s.o_orderkey AND o.o_ts <= s.ship_ts""".stripMargin,


    "interval_join" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key, epoch_us(o_orderdate) AS a_s,
        |    epoch_us(o_orderdate) + CAST(2592000000000 AS BIGINT) AS a_e
        |  FROM orders WHERE o_orderkey % 100 = 0),
        |b AS (
        |  SELECT o_orderkey AS b_key, epoch_us(o_orderdate) AS b_s,
        |    epoch_us(o_orderdate) + CAST(2592000000000 AS BIGINT) AS b_e
        |  FROM orders WHERE o_orderkey % 100 = 50)
        |SELECT a_key, CAST(count(*) AS BIGINT) AS n_overlap,
        |  CAST(sum(b_key) AS BIGINT) AS bkey_sum
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |GROUP BY a_key""".stripMargin,


    "zorder_key" ->
      s"""WITH z AS (
         |  SELECT ${Layout.zvalue2Sql("o_custkey", "o_orderkey")} AS z FROM orders)
         |SELECT z // ${1L << 22} AS zbucket, CAST(count(*) AS BIGINT) AS n,
         |  min(z) AS min_z, max(z) AS max_z
         |FROM z GROUP BY 1""".stripMargin,


    "dedup_simhash_near" ->
      """SELECT doc_id AS a_id, doc_id + 100000 AS b_id
        |FROM documents WHERE doc_id < 50""".stripMargin,


    "text_chunks" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id < 50),
        |n AS (SELECT doc_id, toks,
        |        CASE WHEN len(toks) = 0 THEN 0
        |             WHEN len(toks) <= 40 THEN 1
        |             ELSE (len(toks) - 40 + 29) // 30 + 1 END AS n_chunks
        |      FROM d),
        |c AS (
        |  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_id
        |  FROM n WHERE n_chunks > 0),
        |s AS (
        |  SELECT doc_id, chunk_id,
        |    toks[(chunk_id * 30 + 1):least(chunk_id * 30 + 40, len(toks))] AS chunk
        |  FROM c)
        |SELECT doc_id, chunk_id, CAST(len(chunk) AS BIGINT) AS n_toks,
        |  chunk[1] AS head_tok, chunk[len(chunk)] AS tail_tok
        |FROM s""".stripMargin,


    "sparse_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS term
        |  FROM tok),
        |pt AS (SELECT term, doc_id, count(*) AS tf FROM ng GROUP BY 1, 2),
        |keep AS (SELECT term FROM pt GROUP BY term HAVING count(*) <= 20),
        |pr AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    sum(a.tf * b.tf) AS dot, count(*) AS shared_terms
        |  FROM pt a JOIN keep USING (term) JOIN pt b USING (term)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, CAST(dot AS BIGINT) AS dot,
        |  CAST(shared_terms AS BIGINT) AS shared_terms
        |FROM pr ORDER BY dot DESC, doc_a, doc_b LIMIT 20""".stripMargin,


    "corpus_redundancy" ->
      """WITH ng AS (
        |  SELECT source, doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i + 1]))) AS g
        |  FROM (
        |    SELECT source, doc_id,
        |      list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |    FROM documents)),
        |withdf AS (
        |  SELECT source, doc_id, g,
        |    count(*) OVER (PARTITION BY g) AS df
        |  FROM ng)
        |SELECT source,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_postings,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS shared_micro
        |FROM withdf GROUP BY source""".stripMargin,


    "winsorize_clip" ->
      """WITH h AS (
        |  SELECT l_returnflag AS g,
        |    least(greatest(CAST(floor(l_quantity) AS BIGINT), 0) // 2, 31) AS bin,
        |    count(*) AS cnt
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
        |c AS (
        |  SELECT g, bin, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS n
        |  FROM h),
        |b AS (
        |  SELECT g,
        |    min(CASE WHEN cum * 1000000 >= n * 50000 THEN (bin + 1) * 2 END) AS lo_bound,
        |    min(CASE WHEN cum * 1000000 >= n * 950000 THEN (bin + 1) * 2 END) AS hi_bound
        |  FROM c GROUP BY g),
        |clipped AS (
        |  SELECT l.l_returnflag, l.l_quantity,
        |    b.lo_bound, b.hi_bound,
        |    least(greatest(l.l_quantity, b.lo_bound), b.hi_bound) AS clipped
        |  FROM lineitem l JOIN b ON l.l_returnflag = b.g)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN clipped > l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS n_raised,
        |  CAST(sum(CASE WHEN clipped < l_quantity THEN 1 ELSE 0 END) AS BIGINT) AS n_lowered,
        |  CAST(max(lo_bound) AS BIGINT) AS lo_bound,
        |  CAST(max(hi_bound) AS BIGINT) AS hi_bound,
        |  CAST(sum(CAST(clipped AS DECIMAL(28,6))) AS DOUBLE) AS sum_clipped
        |FROM clipped GROUP BY l_returnflag""".stripMargin,


    "text_diversity" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1), i -> unicode(text[i:i]))) AS c
        |  FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM codes GROUP BY 1, 2),
        |agg AS (SELECT doc_id, sum(k * k) AS sq, sum(k) AS n FROM cnt GROUP BY 1)
        |SELECT doc_id, CAST((1000000::HUGEINT * sq) // (n * n) AS BIGINT) AS coll_micro
        |FROM agg WHERE n > 0
        |ORDER BY coll_micro DESC, doc_id LIMIT 20""".stripMargin,


    "cdc_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 200
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, 'zq' || text AS text
        |  FROM documents WHERE doc_id < 50),
        |codes AS (
        |  SELECT doc_id, text,
        |    list_transform(range(1, length(text) + 1), i -> unicode(text[i:i])) AS cs
        |  FROM corpus),
        |cuts AS (
        |  SELECT doc_id, text,
        |    list_filter(range(16, length(text) + 1),
        |      p -> list_reduce(cs[p-15:p], (a, c) -> (a * 31 + c) % 1000003) % 32 = 0) AS cut
        |  FROM codes),
        |bounds AS (
        |  SELECT doc_id, text,
        |    list_concat(list_concat([CAST(0 AS BIGINT)], cut),
        |      CASE WHEN len(cut) > 0 AND cut[-1] = length(text)
        |           THEN CAST([] AS BIGINT[]) ELSE [CAST(length(text) AS BIGINT)] END) AS b
        |  FROM cuts),
        |chunks AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(b)), k -> text[b[k]+1 : b[k+1]]))) AS chunk
        |  FROM bounds),
        |keep AS (SELECT doc_id, chunk FROM chunks WHERE length(chunk) >= 20),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS shared
        |  FROM keep a JOIN keep b USING (chunk) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 2""".stripMargin,


    "substr_search" ->
      """SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'fast merge', ''))) // 10 AS BIGINT) AS n_occ
        |FROM documents WHERE contains(text, 'fast merge')""".stripMargin,


    "text_term_stats" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
        |  FROM documents),
        |pt AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
        |SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
        |FROM pt GROUP BY token
        |ORDER BY df DESC, token LIMIT 20""".stripMargin,


    // the join-formulation BM25 replayed relationally: same IEEE ratio-idf
    // operation order as text_bm25's oracle, with the per-term
    // micro-floor BEFORE the per-(query, doc) sum mirroring the Spark
    // side's order-independent aggregation
    "bm25_batch" ->
      """WITH q(q_id, term) AS (VALUES
        |    (0, 'window'), (0, 'merge'), (0, 'spark'),
        |    (1, 'hash'), (1, 'join'), (1, 'shuffle'),
        |    (2, 'parquet'), (2, 'footer'), (2, 'metadata'), (2, 'stream')),
        |d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT count(*) AS n,
        |        CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen FROM d),
        |p AS (
        |  SELECT u.token, d.doc_id, CAST(count(*) AS DOUBLE) AS tf,
        |    any_value(CAST(len(d.toks) AS DOUBLE)) AS dl
        |  FROM d, unnest(d.toks) AS u(token)
        |  WHERE u.token IN (SELECT term FROM q)
        |  GROUP BY 1, 2),
        |f AS (SELECT token, count(*) AS df FROM p GROUP BY 1),
        |scored AS (
        |  SELECT q.q_id, p.doc_id,
        |    CAST(sum(CAST(floor(
        |      ((s.n + 1.0) / (f.df + 1.0)) *
        |      ((p.tf * (1.0 + 1.0)) /
        |       (p.tf + 1.0 * ((1.0 - 0.5) + 0.5 * (p.dl / s.avglen))))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS score_micro
        |  FROM p JOIN f USING (token) JOIN q ON p.token = q.term, s
        |  GROUP BY 1, 2)
        |SELECT CAST(q_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
        |  doc_id, score_micro
        |FROM (SELECT q_id, doc_id, score_micro,
        |        row_number() OVER (PARTITION BY q_id
        |          ORDER BY score_micro DESC, doc_id) AS rank
        |      FROM scored)
        |WHERE rank <= 5""".stripMargin,


    "text_bm25" -> {
      // one BM25 term, written to the letter of Relevance.bm25TopK's
      // IEEE operation order (ratio idf, k1=1.0, b=0.5)
      def term(t: String): String =
        s"""((s.n + 1.0) / (f.df_$t + 1.0)) *
           |  ((CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) * 2.0) /
           |   (CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) +
           |    1.0 * (0.5 + 0.5 * (CAST(len(toks) AS DOUBLE) / s.avglen))))""".stripMargin
      s"""WITH d AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |s AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avglen FROM d),
         |f AS (SELECT
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'window')) AS df_window,
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'merge')) AS df_merge,
         |  (SELECT count(*) FROM d WHERE list_contains(toks, 'spark')) AS df_spark),
         |scored AS (
         |  SELECT doc_id,
         |    ${term("window")}
         |  + ${term("merge")}
         |  + ${term("spark")} AS score
         |  FROM d, s, f),
         |top AS (SELECT doc_id, score FROM scored WHERE score > 0.0
         |        ORDER BY score DESC, doc_id LIMIT 15)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
         |  doc_id, CAST(floor(score * 1000000.0) AS BIGINT) AS score_micro
         |FROM top""".stripMargin
    }
  )
}
