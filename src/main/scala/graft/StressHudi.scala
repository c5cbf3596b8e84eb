package graft

import org.apache.spark.sql.SparkSession

import graft.meta.HudiMeta

/**
 * Hudi TIMELINE-SCALE stress — the posture check for the r17 MOR/COW
 * resolution tier: a synthetic `.hoodie` timeline of `nCommits`
 * completed deltacommits, each declaring `writesPerCommit` write stats
 * (a mix of base-file inserts, log appends, and group rewrites across
 * `nGroups` file groups), plus the usual requested/inflight markers —
 * tens of thousands of declared writes, the shape a busy streaming
 * ingest leaves after a week. No parquet is written: resolution
 * ([[HudiMeta.morFileGroups]], [[HudiMeta.timelineReport]],
 * [[HudiMeta.morIncrementalPull]]) is commit-METADATA-driven and must
 * never touch a data file, so the stress proves the claim at the
 * timeline scale itself — driver work bounded by instant count, one
 * executor task per commit JSON, file-group-sized shuffles.
 *
 * Prints one JSON line per phase with wall seconds and result counts;
 * a wrong group count exits non-zero.
 *
 * Usage: runMain graft.StressHudi [nCommits] [writesPerCommit] [dir]
 */
object StressHudi {
  def main(args: Array[String]): Unit = {
    val nCommits = args.headOption.map(_.toInt).getOrElse(500)
    val perCommit = args.lift(1).map(_.toInt).getOrElse(40)
    val dir = args.lift(2).getOrElse("/tmp/graft_stress_hudi")
    val nGroups = nCommits * perCommit / 10 // ~10 slices per group

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stress-hudi")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_stress\n" +
        "hoodie.table.type=MERGE_ON_READ\n").getBytes("UTF-8"))

    // deterministic synthetic timeline: commit i writes stats for
    // groups (i*perCommit .. ) mod nGroups — early writes are base
    // inserts, later ones alternate log appends / base rewrites
    def instant(i: Int): String = f"2024010100${i}%07d"
    val t0 = System.nanoTime()
    var logsPlanted = 0L
    val baseInstant = new Array[String](nGroups)
    (0 until nCommits).foreach { i =>
      val ts = instant(i)
      val stats = (0 until perCommit).map { j =>
        val g = (i * perCommit + j) % nGroups
        val fid = s"g$g"
        val part = s"p=${g % 64}"
        if (baseInstant(g) == null || (i + j) % 3 == 0) {
          baseInstant(g) = ts
          s"""{"fileId":"$fid","path":"$part/${fid}_0-0-0_$ts.parquet",
             |"numWrites":100,"totalWriteBytes":4096,
             |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
        } else {
          logsPlanted += 1
          val bi = baseInstant(g)
          s"""{"fileId":"$fid",
             |"path":"$part/.${fid}_$bi.log.${i % 7 + 1}_0-0-0",
             |"baseFile":"${fid}_0-0-0_$bi.parquet",
             |"numWrites":10,"totalWriteBytes":512,
             |"partitionPath":"$part"}""".stripMargin.replace("\n", "")
        }
      }
      val byPart = stats.groupBy(s =>
        s.split("\"partitionPath\":\"")(1).takeWhile(_ != '"'))
      val body = byPart.toSeq.sortBy(_._1).map { case (p, ss) =>
        s""""$p":[${ss.mkString(",")}]"""
      }.mkString("{\"partitionToWriteStats\":{", ",", "},\"operationType\":\"upsert\"}")
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$ts.deltacommit").toPath,
        body.getBytes("UTF-8"))
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$ts.deltacommit.requested").toPath,
        Array.empty[Byte])
      java.nio.file.Files.write(
        new java.io.File(hoodie, s"$ts.deltacommit.inflight").toPath,
        Array.empty[Byte])
    }
    val writeSec = (System.nanoTime() - t0) / 1e9

    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - s) / 1e9)
    }
    val (tlRows, tlSec) =
      timed(HudiMeta.timelineReport(spark, dir).count())
    val (groups, fgSec) =
      timed(HudiMeta.morFileGroups(spark, dir).count())
    val (logRows, _) = timed(
      HudiMeta.morFileGroups(spark, dir)
        .agg(org.apache.spark.sql.functions.sum("n_logs")).head().getLong(0))
    val (incRows, incSec) = timed(
      HudiMeta.morIncrementalPull(spark, dir,
        instant(nCommits / 2), instant(nCommits - 1)).count())
    println(
      s"""{"stress":"hudi_timeline","n_commits":$nCommits,""" +
        s""""declared_writes":${nCommits.toLong * perCommit},""" +
        s""""logs_planted":$logsPlanted,"fixture_write_sec":$writeSec,""" +
        s""""timeline_rows":$tlRows,"timeline_sec":$tlSec,""" +
        s""""file_groups":$groups,"file_groups_sec":$fgSec,""" +
        s""""live_logs":$logRows,""" +
        s""""incremental_rows":$incRows,"incremental_sec":$incSec}""")
    require(tlRows == nCommits * 3L,
      s"timeline rows $tlRows != ${nCommits * 3}")
    require(groups == nGroups.toLong, s"groups $groups != $nGroups")
    spark.stop()
  }
}
