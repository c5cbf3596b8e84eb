package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The `orc` source tier: file and stripe levels decode real
 * Spark-written ORC, source inference sniffs the ORC magic, the
 * validation matrix rejects wrong (source, level) pairs with
 * reference-style errors, and ignorecorrupt skips undecodable files.
 */
class OrcSourceSpec extends SparkSpec {

  private def meta(path: String, opts: (String, String)*) = {
    val r = spark.read.format("metadata")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_orc").toString
    spark.range(0, 50000)
      .select(col("id").as("k"), (col("id") % 5).cast("string").as("s"))
      .repartition(2)
      .write.mode("overwrite")
      .option("orc.stripe.size", "65536")
      .orc(d)
    d
  }

  test("orc file level: inferred source, tail summary equals the data") {
    val df = meta(dir) // NO source option: the ORC magic must infer
    assert(df.schema === MetaLevel.OrcFile.schema)
    val rows = df.collect()
    assert(rows.length === 2)
    val total = df.agg(sum("num_rows")).collect()(0).getLong(0)
    assert(total === 50000L)
    df.select("compression", "schema", "num_stripes").collect().foreach { r =>
      assert(r.getString(0).nonEmpty)
      assert(r.getString(1).contains("k:bigint"))
      assert(r.getInt(2) >= 1)
    }
  }

  test("orc stripe level: physical layout is consistent and complete") {
    val stripes = meta(dir, "level" -> "stripe")
    assert(stripes.schema === MetaLevel.OrcStripe.schema)
    // stripes per file roll up to the file row counts
    val perFile = stripes.groupBy("filepath")
      .agg(count(lit(1)).as("n"), sum("num_rows").as("rows"))
      .collect()
    assert(perFile.length === 2)
    perFile.foreach { r =>
      assert(r.getLong(2) === 25000L, "stripes must roll up to the file rows")
      assert(r.getLong(1) > 1, "small stripe size must produce several stripes")
    }
    // physical consistency: first stripe at offset 3 (past the magic),
    // stripes contiguous (next offset = offset + all three section
    // lengths), all strictly inside the file
    val byFile = stripes
      .select("filepath", "stripe_id", "offset", "index_length",
        "data_length", "footer_length")
      .collect()
      .groupBy(_.getString(0))
    val sizes = meta(dir).select("filepath", "size").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byFile.foreach { case (fp, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getLong(2) === 3L, "first stripe starts past the magic")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(2) + a.getLong(3) + a.getLong(4) + a.getLong(5)
            === b.getLong(2), "stripes must be contiguous")
        case _ => ()
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) + last.getLong(4) +
        last.getLong(5) < sizes(fp), "stripes end before the file tail")
    }
  }

  test("orc column level: typed footer stats equal the data") {
    val cols = meta(dir, "level" -> "column")
    assert(cols.schema === MetaLevel.OrcColumn.schema)
    val truth = spark.read.orc(dir)
      .agg(min(col("k")), max(col("k")), sum(col("k")),
        min(col("s")), max(col("s")), count(lit(1))).collect()(0)
    // two files: roll the per-file stats up before comparing
    val kRow = cols.filter(col("path") === "k")
      .agg(min("min_long"), max("max_long"), sum("sum_long"),
        sum("num_values")).collect()(0)
    assert(kRow.getLong(0) === truth.getLong(0), "min")
    assert(kRow.getLong(1) === truth.getLong(1), "max")
    assert(kRow.getLong(2) === truth.getLong(2), "sum")
    assert(kRow.getLong(3) === truth.getLong(5), "non-null count")
    val sRow = cols.filter(col("path") === "s")
      .agg(min("min_string"), max("max_string")).collect()(0)
    assert(sRow.getString(0) === truth.getString(3))
    assert(sRow.getString(1) === truth.getString(4))
    // typed slots stay null where inapplicable
    assert(cols.filter(col("path") === "s" && col("min_long").isNotNull)
      .count() === 0)
    assert(cols.filter(col("has_null")).count() === 0)
  }

  test("orc stats pruning drops certain-impossible files, keeps the rest") {
    val d = Files.createTempDirectory("graft_orc_prune").toString
    spark.range(0, 60000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(6, col("k"))
      .write.mode("overwrite").orc(d)
    val all = spark.read.orc(d).inputFiles.length
    assert(all === 6)
    val kept = OrcPrune.filesInRange(spark, d, "k", 10000L, 14999L)
    assert(kept.nonEmpty && kept.length < all,
      s"range-clustered layout must prune, kept ${kept.length}/$all")
    // the pruned read is EXACT under the composed predicate
    val got = OrcPrune.readPrunedLong(spark, d, "k", 10000L, 14999L)
      .filter(col("k").between(10000L, 14999L)).count()
    assert(got === 5000L)
    // a missing column keeps every file (sound)
    assert(OrcPrune.filesInRange(spark, d, "no_such_column", 0L, 1L)
      .length === all)
    // a disjoint range prunes everything
    assert(OrcPrune.readPrunedLong(spark, d, "k", 900000L, 900001L)
      .count() === 0L)
  }

  test("stripe-skip report is EXTERNALLY validated by Spark's ORC reader") {
    val d = Files.createTempDirectory("graft_orc_skip").toString
    // the stripe flush is driven by buffered memory: a fat string column
    // forces several stripes where two long columns would buffer whole
    spark.range(0, 120000).select(col("id").as("k"), (col("id") % 13).as("v"),
        concat(lit("pad_"), col("id"), lit("x" * 64)).as("pad"))
      .repartition(1).sortWithinPartitions("k")
      .write.mode("overwrite")
      .option("orc.stripe.size", "65536")
      .orc(d)
    val (lo, hi) = (30000L, 39999L)
    val rep = OrcPrune.stripeSkipReport(spark, d, "k", lo, hi).collect()
    val predicted = rep.map(_.getAs[Long]("rows_covered")).sum
    val total = rep.map(_.getAs[Long]("rows_total")).sum
    val stripesNeeded = rep.map(_.getAs[Int]("n_stripes_needed")).sum
    val stripesTotal = rep.map(_.getAs[Int]("n_stripes_total")).sum
    assert(total === 120000L)
    assert(predicted < total, "sorted layout must predict stripe skipping")
    assert(stripesNeeded < stripesTotal)
    assert(predicted >= hi - lo + 1, "prediction cannot undercut the matches")
    // ground truth: Spark's own ORC reader with pushdown (stripe +
    // row-group granular) cannot touch more rows than we predict, nor
    // fewer than match
    val q = spark.read.orc(d).filter(col("k") >= lo && col("k") <= hi)
      .select(col("v"))
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val emitted = scans.map(_.metrics("numOutputRows").value).sum
    assert(emitted >= hi - lo + 1)
    assert(emitted <= predicted,
      s"reader touched $emitted rows but the report predicted only $predicted")
    // missing column: every stripe stays needed (sound)
    val soundRep = OrcPrune.stripeSkipReport(spark, d, "nope", lo, hi).collect()
    assert(soundRep.map(_.getAs[Long]("rows_covered")).sum === total)
  }

  test("rowindex level: per-group stats roll up and bound the data") {
    val d = Files.createTempDirectory("graft_orc_ri").toString
    spark.range(0, 7500)
      .select(col("id").as("k"),
        when(col("id") % 10 === 0, lit(null)).otherwise(col("id") * 2).as("v"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("orc.row.index.stride", "1000")
      .orc(d)
    val idx = meta(d, "source" -> "orc", "level" -> "rowindex")
      .filter(col("path") === "k").orderBy("stripe_id", "entry_id").collect()
    // ceil(7500/1000) = 8 groups per stripe-sum; single small stripe
    assert(idx.map(_.getAs[Long]("num_rows")).sum === 7500L)
    assert(idx.last.getAs[Long]("num_rows") === 500L) // partial last group
    // sorted column: entry bounds tile the range monotonically
    assert(idx.head.getAs[Long]("min_long") === 0L)
    assert(idx.map(_.getAs[Long]("max_long")).max === 7499L)
    val mins = idx.map(_.getAs[Long]("min_long"))
    assert(mins.sameElements(mins.sorted))
    // the nullable column's entries SEE their nulls
    val vIdx = meta(d, "source" -> "orc", "level" -> "rowindex")
      .filter(col("path") === "v").collect()
    assert(vIdx.forall(_.getAs[Boolean]("has_null")))
    assert(vIdx.map(_.getAs[Long]("num_values")).sum === 6750L)
    // a file written WITHOUT the row index yields zero entries
    val noIdx = Files.createTempDirectory("graft_orc_nori").toString
    spark.range(100).coalesce(1).write.mode("overwrite")
      .option("orc.row.index.stride", "0").orc(noIdx)
    assert(meta(noIdx, "source" -> "orc", "level" -> "rowindex").count() === 0L)
  }

  test("row-group skip and bloom reports match the reader's own skipping") {
    val d = Files.createTempDirectory("graft_orc_skip").toString
    // sorted key for the stats report; pseudo-random high-card column
    // with blooms for the bloom report
    spark.range(0, 20000)
      .select(col("id").as("k"),
        ((col("id") * 2654435761L) % 1000003L).as("pk"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("orc.row.index.stride", "1000")
      .option("orc.bloom.filter.columns", "pk")
      .orc(d)
    // stats report: range covering 3 of 20 groups
    val rep = OrcPrune.rowIndexSkipReport(spark, d, "k", 5000L, 7999L)
      .collect()(0)
    assert(rep.getAs[Long]("n_groups_total") === 20L)
    assert(rep.getAs[Long]("n_groups_needed") === 3L)
    assert(rep.getAs[Long]("rows_covered") === 3000L)
    // external validation: the reader's scan outputs exactly the
    // covered rows under the same pushed range
    val probe = spark.read.orc(d).filter(col("k").between(5000, 7999))
    probe.collect()
    val scanRows = probe.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    assert(scanRows === 3000L)
    // bloom report: two present probes + one absent; unsorted pk means
    // stats admit almost everything — blooms must do the skipping
    val pks = spark.read.orc(d)
      .agg(min(col("pk")), max(col("pk"))).collect()(0)
    val probes = Seq(pks.getLong(0), pks.getLong(1), -7L)
    val brep = OrcPrune.bloomSkipReport(spark, d, "pk", probes).collect()(0)
    assert(brep.getAs[Long]("n_groups_needed") < brep.getAs[Long]("n_groups_total"))
    val bProbe = spark.read.orc(d).filter(col("pk").isin(probes: _*))
    bProbe.collect()
    val bScanRows = bProbe.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value
    assert(bScanRows === brep.getAs[Long]("rows_covered"))
    // soundness: covered rows bound the true matches from above
    val m = spark.read.orc(d).filter(col("pk").isin(probes: _*)).count()
    assert(brep.getAs[Long]("rows_covered") >= m && m >= 2L)
  }

  test("validation matrix and explicit source override") {
    val e1 = intercept[IllegalArgumentException](
      meta(dir, "source" -> "orc", "level" -> "page").collect())
    assert(e1.getMessage.contains("Source 'orc' does not support 'page' level"))
    val e2 = intercept[IllegalArgumentException](
      meta(dir, "source" -> "parquet", "level" -> "stripe").collect())
    assert(e2.getMessage.contains("Source 'parquet' does not support 'stripe' level"))
    val e3 = intercept[IllegalArgumentException](
      meta(dir, "source" -> "file", "level" -> "stripe").collect())
    assert(e3.getMessage.contains("Source 'file' does not support 'stripe' level"))
    // explicit source=file over an orc dir still lists plainly
    assert(meta(dir, "source" -> "file").count() === 2L)
  }

  test("ignorecorrupt skips an undecodable orc file") {
    val d = Files.createTempDirectory("graft_orc_corrupt").toString
    spark.range(0, 100).coalesce(1).write.mode("overwrite").orc(d)
    Files.write(java.nio.file.Paths.get(d, "bad.orc"),
      "ORCnot-actually-an-orc-file".getBytes)
    val strict = meta(d, "level" -> "stripe", "source" -> "orc")
    intercept[org.apache.spark.SparkException](strict.count())
    val lenient = meta(d, "level" -> "stripe", "source" -> "orc",
      "ignorecorrupt" -> "true")
    assert(lenient.agg(sum("num_rows")).collect()(0).getLong(0) === 100L)
  }

  test("orc file level streams newly arrived files") {
    import org.apache.spark.sql.streaming.Trigger
    val d = Files.createTempDirectory("graft_orc_stream").toString
    val ckpt = Files.createTempDirectory("graft_orc_stream_ck").toString
    val out = Files.createTempDirectory("graft_orc_stream_out").toString
    spark.range(0, 500).coalesce(1).write.mode("overwrite").orc(d)
    val src = spark.readStream.format("metadata")
      .option("level", "file").option("source", "orc")
      .option("streamlagms", "0").load(d)
    val q = src.select("filename", "num_rows").writeStream.format("parquet")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).option("path", out).start()
    q.awaitTermination(60000)
    q.stop()
    val got = spark.read.parquet(out).agg(sum("num_rows")).collect()(0)
    assert(got.getLong(0) === 500L)
  }
}
