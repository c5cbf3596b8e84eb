package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hudi CLUSTERING (replacecommit) modeling on the hand-written
  * clustered fixture: replaced groups die at the replacing instant,
  * the clustering output becomes the live base, time travel still
  * serves the pre-clustering view, and incremental pulls never report
  * the rewrite as an increment. */
class HudiClusteringSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (c1, c2, rc3) =
    ("20240101000000000", "20240102000000000", "20240103000000000")

  private def fresh(): (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft_hudicl").toString + "/tbl"
    (d, HudiMeta.writeHudiClusteredFixtureTable(spark, d, docs))
  }

  test("live view: replaced groups die, the clustered base serves") {
    val (d, counts) = fresh()
    val live = HudiMeta.liveFiles(spark, d).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(live === Map(
      "fid3" -> s"p=0/fid3_0-0-0_$rc3.parquet",
      "fid2" -> s"p=1/fid2_0-0-0_$c2.parquet"))
    // the replaced bases are still ON DISK (cleaner's job, not ours)
    assert(new java.io.File(d, s"p=0/fid0_0-0-0_$c1.parquet").exists())
    // census conformance: the clustered base holds exactly the union
    val census = HudiMeta.liveCensus(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("footer_rows")).toMap
    assert(census("fid3") ===
      counts(s"p=0/fid0_0-0-0_$c1.parquet") +
        counts(s"p=0/fid1_0-0-0_$c1.parquet"))
    // MOR surfaces resolve the same replacement
    val morLive = HudiMeta.morFileGroups(spark, d).collect()
      .map(_.getString(0)).toSet
    assert(morLive === Set("fid3", "fid2"))
  }

  test("time travel: the pre-clustering view survives") {
    val (d, _) = fresh()
    val atC2 = HudiMeta.liveFiles(spark, d, Some(c2)).collect()
      .map(_.getString(0)).toSet
    assert(atC2 === Set("fid0", "fid1", "fid2"))
    val atC1 = HudiMeta.liveFiles(spark, d, Some(c1)).collect()
      .map(_.getString(0)).toSet
    assert(atC1 === Set("fid0", "fid1"))
    val atRc3 = HudiMeta.liveFiles(spark, d, Some(rc3)).collect()
      .map(_.getString(0)).toSet
    assert(atRc3 === Set("fid3", "fid2"))
  }

  test("incremental pull: clustering output is never an increment") {
    val (d, _) = fresh()
    val pull = HudiMeta.incrementalPull(spark, d, "0", rc3).collect()
      .map(_.getAs[String]("file_id")).toSet
    assert(pull === Set("fid0", "fid1", "fid2")) // rc3's fid3 excluded
    assert(HudiMeta.incrementalPull(spark, d, c2, rc3).count() === 0L)
    val mor = HudiMeta.morIncrementalPull(spark, d, "0", rc3).collect()
      .map(_.getAs[String]("file_id")).toSet
    assert(mor === Set("fid0", "fid1", "fid2"))
  }

  test("replaced groups are declared, never orphans") {
    val (d, _) = fresh()
    assert(HudiMeta.orphanReport(spark, d).count() === 0L)
  }

  test("morCleanPlan: replaced groups reclaim outright; live groups " +
      "only past the retained versions; retain<1 refuses") {
    val (d, _) = fresh()
    val got = HudiMeta.morCleanPlan(spark, d, 1).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(6))).toSet
    // fid0+fid1 died to rc3's clustering — every slice reclaims as
    // 'replaced'; fid2 (single live slice) and fid3 (the clustering
    // output, newest of its group) are untouched
    assert(got.map(_._1) === Set("fid0", "fid1"))
    assert(got.forall(_._3 == "replaced"))
    intercept[IllegalArgumentException] {
      HudiMeta.morCleanPlan(spark, d, 0)
    }
    // a completed savepoint pins files this tier cannot enumerate —
    // BOTH clean planners refuse by name rather than violate the pin
    java.nio.file.Files.write(
      new java.io.File(d, ".hoodie/20240106000000000.savepoint").toPath,
      "{}".getBytes("UTF-8"))
    val e1 = intercept[UnsupportedOperationException] {
      HudiMeta.morCleanPlan(spark, d, 1)
    }
    assert(e1.getMessage.contains("savepoint"))
    val e2 = intercept[UnsupportedOperationException] {
      HudiMeta.cleanPlan(spark, d, 1)
    }
    assert(e2.getMessage.contains("savepoint"))
  }
}
