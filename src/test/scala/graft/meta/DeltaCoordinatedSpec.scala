package graft.meta

import java.nio.file.Files

import graft.SparkSpec

/** Delta coordinated / catalog-managed commits (r18): a table whose
  * commits route through a coordinator keeps ratified commits in
  * `_delta_log/_staged_commits/` until backfill — replaying only the
  * published log must refuse with the feature named, never read a
  * stale table; an all-backfilled (empty) staged dir resolves, and
  * the protocol posture reports the writer feature unsupported. */
class DeltaCoordinatedSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  test("unbackfilled staged commits refuse on every surface, named") {
    val d = Files.createTempDirectory("graft_delta_cc").toString + "/tbl"
    DeltaMeta.writeFixtureTable(spark, d, docs)
    val staged = new java.io.File(d, "_delta_log/_staged_commits")
    staged.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staged,
        "00000000000000000009.3a1f0e2d-aaaa-bbbb-cccc-000000000001.json")
        .toPath,
      """{"commitInfo":{"operation":"WRITE","timestamp":1}}"""
        .getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException] {
      DeltaMeta.snapshotFiles(spark, d).collect()
    }
    assert(e.getMessage.contains("coordinatedCommits") &&
      e.getMessage.contains("_staged_commits"))
    // the protocol report flows through the same gate — no surface
    // silently replays a possibly-gapped published log
    intercept[UnsupportedOperationException] {
      DeltaMeta.protocolInfo(spark, d).collect()
    }
  }

  test("an all-backfilled (empty) staged dir resolves normally") {
    val d = Files.createTempDirectory("graft_delta_cc2").toString + "/tbl"
    val rows = DeltaMeta.writeFixtureTable(spark, d, docs)
    new java.io.File(d, "_delta_log/_staged_commits").mkdirs()
    // a non-json temp artifact in the staged dir is not a commit
    java.nio.file.Files.write(
      new java.io.File(d,
        "_delta_log/_staged_commits/.tmp_backfill").toPath,
      Array[Byte](1))
    assert(DeltaMeta.snapshotFiles(spark, d).count() > 0)
  }

  test("a BACKFILLED staged commit (version <= newest published json) " +
      "lingers until log cleanup and must resolve, not refuse") {
    val d = Files.createTempDirectory("graft_delta_cc4").toString + "/tbl"
    DeltaMeta.writeFixtureTable(spark, d, docs) // publishes v0..v4
    val staged = new java.io.File(d, "_delta_log/_staged_commits")
    staged.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staged,
        "00000000000000000003.3a1f0e2d-aaaa-bbbb-cccc-000000000002.json")
        .toPath,
      """{"commitInfo":{"operation":"WRITE","timestamp":1}}"""
        .getBytes("UTF-8"))
    assert(DeltaMeta.snapshotFiles(spark, d).count() > 0)
  }

  test("a staged entry that does not parse as <version>.<uuid>.json " +
      "refuses by name (unknown coordinator layout)") {
    val d = Files.createTempDirectory("graft_delta_cc5").toString + "/tbl"
    DeltaMeta.writeFixtureTable(spark, d, docs)
    val staged = new java.io.File(d, "_delta_log/_staged_commits")
    staged.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(staged, "ratified-commit.json").toPath,
      """{"commitInfo":{}}""".getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException] {
      DeltaMeta.snapshotFiles(spark, d).collect()
    }
    assert(e.getMessage.contains("ratified-commit.json"))
  }

  test("the protocol posture names coordination writer features " +
      "unsupported even when nothing is currently staged") {
    val d = Files.createTempDirectory("graft_delta_cc3").toString + "/tbl"
    DeltaMeta.writeFixtureTable(spark, d, docs)
    // upgrade: the NEWEST commit declares the coordinatedCommits
    // writer feature (appended protocol action — wins max_by(version))
    val log = new java.io.File(d, "_delta_log")
    val newest = log.listFiles()
      .filter(_.getName.matches("\\d{20}\\.json")).maxBy(_.getName)
    java.nio.file.Files.write(newest.toPath,
      ("\n" + """{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"writerFeatures":["coordinatedCommits-preview"]}}""" + "\n")
        .getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val p = DeltaMeta.protocolInfo(spark, d).collect()(0)
    assert(p.getAs[Boolean]("supported") === false)
    assert(p.getAs[scala.collection.Seq[String]]("writer_features")
      .contains("coordinatedCommits-preview"))
  }
}
