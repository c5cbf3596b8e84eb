package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table layout: the storage-side half of shuffle elimination.
 *
 * A join between two tables bucketed into the same number of buckets on
 * the join key needs NO exchange — each task reads bucket i of both sides
 * and joins locally. (The sort-merge join still sorts WITHIN each task:
 * Spark 3+ ignores write-side `sortBy` order on read unless the legacy
 * `bucketedTableScan.outputOrdering` flag is set — the in-task sort of one
 * bucket is cheap; the cross-cluster exchange is what bucketing removes.)
 * For a fact table joined repeatedly on the same key (the
 * "enrich every batch by customer_id" pattern), bucketing converts every
 * future join's corpus-sized shuffle into a one-time write-side cost —
 * at 100 TB that is the difference between re-shuffling the lake per query
 * and never shuffling it again. The co-location is plan-asserted in
 * `BucketingSpec` (zero Exchange nodes in the bucketed join).
 *
 * Caveats encoded by the API: both sides must agree on bucket count (a
 * mismatch silently falls back to a shuffle on one side), and bucket count
 * is the parallelism floor for scans — size it like you would size shuffle
 * partitions at the target scale.
 */
object Bucketing {

  /**
   * Write `df` as parquet with files sized toward `targetBytes` each —
   * the output-compaction step every large pipeline needs (a 100 TB job
   * with default parallelism writes millions of KB-sized files that then
   * throttle every downstream listing and scan).
   *
   * File count comes from the PLANNED input size (the optimizer's
   * `sizeInBytes` statistic, which for file sources is the real on-disk
   * footprint scaled by filter estimates) divided by the target,
   * `repartition`ed exactly. Parquet compression usually beats the
   * source's, so files land under target — the right side to err on. The
   * estimate costs no extra Spark job (vs sampling rows) and no shuffle
   * beyond the one the compaction itself requires.
   */
  def writeSized(df: DataFrame, path: String, targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    val planned = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (planned / targetBytes).toLong.max(1L).min(Int.MaxValue.toLong).toInt
    df.repartition(parts).write.mode("overwrite").parquet(path)
  }

  /** Write `df` as a bucketed + bucket-sorted managed parquet table.
    *
    * The repartition on the bucket key is load-bearing: without it every
    * input task writes its own file per bucket it touches — up to
    * tasks x buckets files, a small-file storm at fact-table scale, and
    * the single-file-per-bucket layout is also what the (opt-in legacy)
    * read-side sort-order reuse requires. `mode` extends the same layout
    * body to appends (one file per bucket PER WRITE) so initial writes
    * and increments cannot drift. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String,
      mode: String = "overwrite"): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /**
   * Compact a [[writeBucketed]] table back to one file per bucket. Every
   * append lays down one file per bucket per write, so a store absorbing
   * daily increments accumulates `writes x buckets` files — at the
   * million-increment scale that is the small-file storm again, now
   * inside the store (listing cost, per-file open cost, tiny row groups).
   * Compaction rewrites the table through a staging table with the SAME
   * bucket spec (layout contract preserved — scrubs/joins stay
   * exchange-free, spec-asserted), then swaps it in via catalog rename.
   *
   * Spark cannot overwrite a table from a plan that reads it, hence the
   * staging + rename rather than an in-place rewrite. The swap is two
   * catalog operations (DROP + RENAME), not atomic: a crash between them
   * loses the NAME while both data directories survive — re-running the
   * rename (or the whole compaction) repairs it, and the staging name is
   * deterministic so the repair is mechanical. Same non-transactional-
   * catalog compromise as the ingest loop's store/log pair, documented
   * over hidden.
   */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String, key: String, buckets: Int): Unit = {
    require(spark.catalog.tableExists(table),
      s"cannot compact missing table '$table'")
    val staging = table + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    // a crashed prior compaction leaves the staging DIRECTORY behind with
    // no catalog entry (the metastore here is per-session); saveAsTable
    // refuses an existing managed location, so clear it — this is what
    // makes "re-run the compaction" a complete repair
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), staging.toLowerCase)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)
    // Force the BUCKETED scan for the rewrite. The optimizer elides the
    // writeBucketed repartition either way (the table's bucket spec
    // already satisfies the hash distribution), but by default the
    // planner also downgrades the read to a plain size-packed file scan
    // (nothing downstream "exploits" the partitioning), leaving each
    // write task a mix of buckets — one file per (task, bucket), i.e. a
    // compaction that doesn't compact. With the bucketed scan forced,
    // each task reads exactly one bucket's file set and writes its one
    // replacement file: the whole rewrite is NARROW — zero exchange,
    // which is also the right plan at store scale (I/O-bound rewrite,
    // no reshuffle of a corpus-sized table).
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try writeBucketed(spark.table(table), key, buckets, staging)
    finally spark.conf.set(auto, prev)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }
}
