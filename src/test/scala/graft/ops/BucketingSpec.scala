package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape proof that bucketing removes the join shuffle entirely. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("a same-bucket-count join runs with zero exchanges and matching rows") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0L until 1000L).map(i => (i % 97, i)).toDF("k", "v")
      val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "name")
      Bucketing.writeBucketed(facts, "k", 8, "graft_bkt_facts")
      Bucketing.writeBucketed(dims, "k", 8, "graft_bkt_dims")
      val joined = spark.table("graft_bkt_facts")
        .join(spark.table("graft_bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // per-task sorts remain (Spark 3+ ignores write-side sortBy order
      // without the legacy outputOrdering flag) — the exchange is the win
      assert(joined.count() === 1000L)
      // same answer as the shuffling join over the raw frames
      val expected = facts.join(dims, "k").agg(sum(col("v"))).collect()(0).getLong(0)
      assert(joined.agg(sum(col("v"))).collect()(0).getLong(0) === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }

  test("compactBucketed collapses append files to one per bucket, layout intact") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val names = Seq("graft_bkt_cpt", "graft_bkt_cpt__compacting", "graft_bkt_cpt_dim")
    try {
      names.foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS `$n`")
        val p = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), n)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        if (fs.exists(p)) fs.delete(p, true)
      }
      val facts = (0L until 500L).map(i => (i % 97, i)).toDF("k", "v")
      Bucketing.writeBucketed(facts, "k", 4, "graft_bkt_cpt")
      // three appends: 4 initial + 3 x 4 append files
      for (w <- 1 to 3)
        Bucketing.writeBucketed(
          (0L until 100L).map(i => (i % 97, 10000L * w + i)).toDF("k", "v"),
          "k", 4, "graft_bkt_cpt", mode = "append")
      assert(spark.table("graft_bkt_cpt").inputFiles.length === 16)
      val rowsBefore = spark.table("graft_bkt_cpt")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      Bucketing.compactBucketed(spark, "graft_bkt_cpt", "k", 4)

      assert(spark.table("graft_bkt_cpt").inputFiles.length === 4)
      val rowsAfter = spark.table("graft_bkt_cpt")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rowsAfter === rowsBefore)
      // the compacted table still joins without an exchange on its side
      val dims = (0L until 97L).map(i => (i, s"d_$i")).toDF("k", "name")
      Bucketing.writeBucketed(dims, "k", 4, "graft_bkt_cpt_dim")
      val plan = spark.table("graft_bkt_cpt")
        .join(spark.table("graft_bkt_cpt_dim"), "k")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"compacted table lost its bucket layout:\n$plan")
      // refuses a missing table rather than fabricating one
      val err = intercept[IllegalArgumentException] {
        Bucketing.compactBucketed(spark, "graft_bkt_nope", "k", 4)
      }
      assert(err.getMessage.contains("missing table"))
      // crash repair: an orphaned staging DIRECTORY (data on disk, no
      // catalog entry — what a crash between write and swap leaves with
      // this per-session metastore) must not block a re-run
      val orphan = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "graft_bkt_cpt__compacting")
      val ofs = orphan.getFileSystem(spark.sessionState.newHadoopConf())
      ofs.mkdirs(orphan)
      val marker = new org.apache.hadoop.fs.Path(orphan, "leftover.parquet")
      ofs.create(marker).close()
      Bucketing.compactBucketed(spark, "graft_bkt_cpt", "k", 4)
      assert(spark.table("graft_bkt_cpt").inputFiles.length === 4)
      assert(spark.table("graft_bkt_cpt")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet === rowsBefore)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS `$n`"))
    }
  }

  test("writeSized compacts many input partitions into size-targeted files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sized").toString
    // 200 input partitions of a ~2.9 MB table; target 1 MB per file
    val src = spark.read.parquet(sf("0.1") + "/orders.parquet").repartition(200)
    Bucketing.writeSized(src, s"$dir/out", targetBytes = 1L << 20)
    val files = new java.io.File(s"$dir/out").listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    assert(files.length < 20, s"expected few compacted files, got ${files.length}")
    assert(files.length >= 1)
    assert(spark.read.parquet(s"$dir/out").count() === src.count())
  }

  test("a bucket-count mismatch falls back to shuffling (the caveat the API documents)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0L until 100L).map(i => (i % 11, i)).toDF("k", "v")
      Bucketing.writeBucketed(a, "k", 8, "graft_bkt_a")
      Bucketing.writeBucketed(a, "k", 4, "graft_bkt_b")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), "mismatched bucket counts cannot co-locate")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
