package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hudi COW metadata tier on the hand-written fixture: timeline
  * parse, commit-metadata-driven live resolution (supersession, orphan
  * and dangling-instant invisibility), footer conformance, time
  * travel, and the refusal posture. */
class HudiSourceSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private def fresh(): (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft_hudi").toString + "/tbl"
    (d, HudiMeta.writeHudiFixtureTable(spark, d, docs))
  }

  test("timeline report lists every instant with action and state") {
    val (d, _) = fresh()
    val rows = HudiMeta.timelineReport(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows === Set(
      ("20240101000000000", "commit", "completed"),
      ("20240101000000000", "commit", "inflight"),
      ("20240101000000000", "commit", "requested"),
      ("20240102000000000", "commit", "completed"),
      ("20240102000000000", "commit", "inflight"),
      ("20240102000000000", "commit", "requested"),
      ("20240103000000000", "commit", "requested")))
  }

  test("live view: latest slice per file group; orphans invisible") {
    val (d, counts) = fresh()
    val live = HudiMeta.liveFiles(spark, d).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(live === Map(
      "fid0" -> "p=0/fid0_0-0-0_20240102000000000.parquet",
      "fid1" -> "p=0/fid1_0-0-0_20240101000000000.parquet",
      "fid2" -> "p=1/fid2_0-0-0_20240102000000000.parquet"))
    // the orphan base file exists on disk but never surfaces
    assert(new java.io.File(d,
      "p=1/fid3_0-0-0_20240103000000000.parquet").exists())
    // census conformance: the planted fid1 lie flags, others match
    val census = HudiMeta.liveCensus(spark, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    val n1 = counts("p=0/fid1_0-0-0_20240101000000000.parquet")
    assert(census("fid1") === ((n1 + 1, n1, false)))
    assert(census("fid0")._3 && census("fid2")._3)
  }

  test("time travel: the live view as of each completed instant") {
    val (d, counts) = fresh()
    val atC1 = HudiMeta.liveFiles(spark, d, Some("20240101000000000"))
      .collect().map(_.getString(3)).toSet
    assert(atC1 === Set(
      "p=0/fid0_0-0-0_20240101000000000.parquet",
      "p=0/fid1_0-0-0_20240101000000000.parquet"))
    val atC2 = HudiMeta.liveCensus(spark, d, Some("20240102000000000"))
      .agg(sum(col("footer_rows"))).head().getLong(0)
    assert(atC2 ===
      counts("p=0/fid0_0-0-0_20240102000000000.parquet") +
        counts("p=0/fid1_0-0-0_20240101000000000.parquet") +
        counts("p=1/fid2_0-0-0_20240102000000000.parquet"))
    // an instant with no completed commit refuses
    val eBad = intercept[IllegalArgumentException] {
      HudiMeta.liveFiles(spark, d, Some("20240103000000000")).collect()
    }
    assert(eBad.getMessage.contains("no completed commit"))
  }

  test("incremental pull windows commits exactly; bad anchors refuse") {
    val (d, counts) = fresh()
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    // bootstrap pull lands c1's two inserts
    val boot = HudiMeta.incrementalPull(spark, d, "0", c1)
      .collect().map(_.getString(3)).toSet
    assert(boot === Set(
      "p=0/fid0_0-0-0_20240101000000000.parquet",
      "p=0/fid1_0-0-0_20240101000000000.parquet"))
    // (c1, c2] lands exactly c2's rewrite + insert
    val inc = HudiMeta.incrementalPull(spark, d, c1, c2)
      .collect().map(r => r.getString(3) -> r.getLong(5)).toMap
    assert(inc === Map(
      "p=0/fid0_0-0-0_20240102000000000.parquet" ->
        counts("p=0/fid0_0-0-0_20240102000000000.parquet"),
      "p=1/fid2_0-0-0_20240102000000000.parquet" ->
        counts("p=1/fid2_0-0-0_20240102000000000.parquet")))
    // anchors that never completed, and empty windows, refuse
    val eAnchor = intercept[IllegalArgumentException] {
      HudiMeta.incrementalPull(spark, d, "20240103000000000", c2)
    }
    assert(eAnchor.getMessage.contains("not a completed commit"))
    val eEmpty = intercept[IllegalArgumentException] {
      HudiMeta.incrementalPull(spark, d, c2, c2)
    }
    assert(eEmpty.getMessage.contains("empty or reversed"))
  }

  test("uniform table census resolves the hudi root") {
    val (d, counts) = fresh()
    val r = MetaValues.tableCensus(spark, d).head()
    assert(r.getString(0) === "hudi")
    assert(r.getLong(1) === 3L) // live slices
    val liveDeclared =
      counts("p=0/fid0_0-0-0_20240102000000000.parquet") +
        counts("p=0/fid1_0-0-0_20240101000000000.parquet") + 1 +
        counts("p=1/fid2_0-0-0_20240102000000000.parquet")
    assert(r.getLong(2) === liveDeclared)
    assert(r.getLong(3) === 5L) // on disk: 4 slices + orphan
    assert(r.getLong(5) === 2L) // dead: superseded c1 slice + orphan
  }

  test("clean plan reclaims only superseded slices; orphans report") {
    val (d, counts) = fresh()
    val plan = HudiMeta.cleanPlan(spark, d, 1).collect()
      .map(r => r.getString(2) -> r.getLong(4))
    assert(plan.toSeq === Seq(
      "p=0/fid0_0-0-0_20240101000000000.parquet" ->
        counts("p=0/fid0_0-0-0_20240101000000000.parquet")))
    // retaining two versions reclaims nothing; retaining zero refuses
    assert(HudiMeta.cleanPlan(spark, d, 2).count() === 0L)
    val eZero = intercept[IllegalArgumentException] {
      HudiMeta.cleanPlan(spark, d, 0)
    }
    assert(eZero.getMessage.contains("live"))
    // the orphan report names exactly the undeclared leftover
    val orphans = HudiMeta.orphanReport(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(orphans.length === 1)
    assert(orphans.head._1 === "fid3_0-0-0_20240103000000000.parquet")
  }

  test("schema history and conformance track the declared evolution") {
    val (d, _) = fresh()
    val hist = HudiMeta.schemaHistory(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(hist("20240101000000000") === ((3, "doc_id,lang,n_chars")))
    assert(hist("20240102000000000") ===
      ((4, "doc_id,lang,n_chars,quality")))
    // every live slice predates +quality — all three report it missing
    val conf = HudiMeta.schemaConformance(spark, d).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(conf.length === 3)
    assert(conf.forall(_ === ((4, 3, "quality"))))
    // a commit without a declared schema refuses conformance loudly
    val (d2, _) = fresh()
    val c2 = new java.io.File(d2, ".hoodie/20240102000000000.commit")
    val txt = new String(java.nio.file.Files.readAllBytes(c2.toPath), "UTF-8")
    require(txt.contains(""","extraMetadata""""))
    java.nio.file.Files.write(c2.toPath,
      (txt.substring(0, txt.indexOf(""","extraMetadata"""")) + "}")
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      HudiMeta.schemaConformance(spark, d2)
    }
    assert(e.getMessage.contains("declares no"))
  }

  test("merge-on-read tables refuse up front") {
    val (d, _) = fresh()
    val props = new java.io.File(d, ".hoodie/hoodie.properties")
    java.nio.file.Files.write(props.toPath,
      ("hoodie.table.name=graft_hudi_fixture\n" +
        "hoodie.table.type=MERGE_ON_READ\n").getBytes("UTF-8"))
    val eMor = intercept[UnsupportedOperationException] {
      HudiMeta.liveFiles(spark, d).collect()
    }
    assert(eMor.getMessage.contains("MERGE_ON_READ"))
    // a deltacommit in an otherwise-COW timeline also refuses
    val (d2, _) = fresh()
    java.nio.file.Files.write(
      new java.io.File(d2, ".hoodie/20240104000000000.deltacommit").toPath,
      "{}".getBytes("UTF-8"))
    val eDc = intercept[UnsupportedOperationException] {
      HudiMeta.liveFiles(spark, d2).collect()
    }
    assert(eDc.getMessage.contains("deltacommit"))
  }

  test("datasource surface: auto-detected timeline level, validation") {
    val (d, _) = fresh()
    // a bare load auto-detects the .hoodie marker and lists the timeline
    val rows = spark.read.format("metadata").load(d)
      .select("instant_time", "action", "state").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length === 7)
    assert(rows.count(_._3 == "completed") === 2)
    // explicit source+level agrees; filename filters prune at the driver
    val explicit = spark.read.format("metadata")
      .option("source", "hudi").option("level", "timeline").load(d)
    assert(explicit.count() === 7L)
    assert(explicit.filter(col("filename").startsWith("20240101")).count() === 3L)
    // the source×level matrix refuses mismatches with the shared text
    val e = intercept[Exception] {
      spark.read.format("metadata")
        .option("source", "hudi").option("level", "file").load(d).collect()
    }
    assert(causeMessages(e).contains("Source 'hudi' does not support 'file' level"))
  }

  test("streaming increments store: each commit lands exactly once") {
    val (d, counts) = fresh()
    val store = Files.createTempDirectory("graft_hudi_sd").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_hudi_sc").toString
    // pass A: c2's completion marker staged aside — only c1 lands
    val c2 = new java.io.File(d, ".hoodie/20240102000000000.commit")
    val aside = new java.io.File(d, "aside_c2.commit")
    require(c2.renameTo(aside))
    HudiMeta.maintainIncrementsStore(spark, d, store, ckpt)
    assert(new java.io.File(store).listFiles().map(_.getName).toSet ===
      Set("inc_20240101000000000"))
    // pass B: c2 completes; EXACTLY its increment lands
    require(aside.renameTo(c2))
    c2.setLastModified(System.currentTimeMillis() + 1)
    HudiMeta.maintainIncrementsStore(spark, d, store, ckpt)
    val incs = HudiMeta.readIncrementsStore(spark, store)
      .select("instant_time", "path", "declared_rows").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(incs === Set(
      ("20240101000000000", "p=0/fid0_0-0-0_20240101000000000.parquet",
        counts("p=0/fid0_0-0-0_20240101000000000.parquet")),
      ("20240101000000000", "p=0/fid1_0-0-0_20240101000000000.parquet",
        counts("p=0/fid1_0-0-0_20240101000000000.parquet") + 1),
      ("20240102000000000", "p=0/fid0_0-0-0_20240102000000000.parquet",
        counts("p=0/fid0_0-0-0_20240102000000000.parquet")),
      ("20240102000000000", "p=1/fid2_0-0-0_20240102000000000.parquet",
        counts("p=1/fid2_0-0-0_20240102000000000.parquet"))))
    // a third pass with nothing new is a no-op
    HudiMeta.maintainIncrementsStore(spark, d, store, ckpt)
    assert(HudiMeta.readIncrementsStore(spark, store).count() === 4L)
  }

  test("partition-pruned read scans exactly the declared partition") {
    val (d, counts) = fresh()
    val pruned = HudiMeta.readPartitionPruned(spark, d, "p=1")
    // plan-assert: the scan's input is ONLY fid2's base file — the
    // superseded slice, the other partition, and the orphan are absent
    assert(pruned.inputFiles.map(_.replaceAll(".*/", "")).toSet ===
      Set("fid2_0-0-0_20240102000000000.parquet"))
    assert(pruned.count() ===
      counts("p=1/fid2_0-0-0_20240102000000000.parquet"))
    // a partition no commit wrote refuses, naming the declared ones
    val e = intercept[IllegalArgumentException] {
      HudiMeta.readPartitionPruned(spark, d, "p=9")
    }
    assert(e.getMessage.contains("no live partition") &&
      e.getMessage.contains("p=0, p=1"))
  }

  test("refusals: opaque replacecommit, non-table, unparseable names") {
    val (d, _) = fresh()
    // a completed replacecommit that HIDES what it replaced (no
    // partitionToReplaceFileIds) refuses — resolution must never
    // guess which groups died
    java.nio.file.Files.write(
      new java.io.File(d, ".hoodie/20240104000000000.replacecommit").toPath,
      "{}".getBytes("UTF-8"))
    val eRc = intercept[IllegalArgumentException] {
      HudiMeta.liveFiles(spark, d).collect()
    }
    assert(eRc.getMessage.contains("partitionToReplaceFileIds"))
    // timeline still LISTS it (reporting is not resolution)
    assert(HudiMeta.timelineReport(spark, d)
      .filter(col("action") === "replacecommit").count() === 1L)
    // not a hudi table
    val e2 = intercept[IllegalArgumentException] {
      HudiMeta.timelineReport(spark, sf("0.001"))
    }
    assert(e2.getMessage.contains("hoodie.properties"))
    // an instant-like name that does not parse refuses loudly
    val (d3, _) = fresh()
    java.nio.file.Files.write(
      new java.io.File(d3, ".hoodie/20240105000000000.commit.bogus").toPath,
      Array.empty[Byte])
    val e3 = intercept[IllegalArgumentException] {
      HudiMeta.timelineReport(spark, d3)
    }
    assert(e3.getMessage.contains("unparseable"))
  }
}
