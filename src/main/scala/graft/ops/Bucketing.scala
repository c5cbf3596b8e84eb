package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Bucketed-table layout: the storage-side half of shuffle elimination.
 *
 * A join between two tables bucketed into the same number of buckets on
 * the join key needs NO exchange — each task reads bucket i of both sides
 * and joins locally; with `sortBy` the sort-merge join also skips its
 * per-task sort. For a fact table joined repeatedly on the same key (the
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

  /** Write `df` as a bucketed + bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
