package graft.meta

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The writeSlices contract the lake fixture builders rest on: one part
  * file per slice, within-slice rows ascending by the frame's first
  * column (POSITION-critical for the iceberg MOR fixture), and an empty
  * slice yielding a valid empty parquet file instead of a crash (the
  * old per-slice path's behavior). */
class FixtureIOSpec extends SparkSpec {

  test("writeSlices keeps within-slice first-column order and survives an empty slice") {
    val base = new java.io.File("/tmp/graft_test_fixtureio")
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    try {
      // doc_id = id*37 mod 300 is a permutation of 0..299: arrival order is
      // scrambled, so any ascending output order must come from the sort
      val df = spark.range(0, 300, 1, 7)
        .select(((col("id") * 37) % 300).as("doc_id"),
          (col("id") % 5).as("payload"))
      // three slices; slice 1 deliberately EMPTY (partitionBy emits no dir)
      val slice = when(col("doc_id") < 100, 0).otherwise(2)
      val counts = FixtureIO.writeSlices(df, slice, 3,
        base.getPath + "/tmp", i => new java.io.File(base, s"f$i.parquet"))
      assert(counts === Map(0 -> 100L, 1 -> 0L, 2 -> 200L))
      for ((i, n) <- Seq((0, 100), (2, 200))) {
        val ids = spark.read
          .parquet(new java.io.File(base, s"f$i.parquet").getPath)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        assert(ids.length === n)
        assert(ids === ids.sorted, s"slice $i not ascending by first column")
      }
      val empty = spark.read
        .parquet(new java.io.File(base, "f1.parquet").getPath)
      assert(empty.columns.toSeq === Seq("doc_id", "payload"))
      assert(empty.count() === 0)
    } finally org.apache.commons.io.FileUtils.deleteQuietly(base)
  }
}
