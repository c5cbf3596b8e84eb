package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The `.hoodie/metadata/` files-partition audit: Hudi's own file
  * index cross-checked against the commit-declared live view — stale
  * and lagging entries flagged, deleted/type-1 records filtered, and
  * the scope refusals (no metadata table, un-compacted logs,
  * non-parquet base) named. */
class HudiMetadataTableSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (c1, c2) = ("20240101000000000", "20240102000000000")

  private def fresh(): (String, Map[String, Long]) = {
    val d = Files.createTempDirectory("graft_hudimd").toString + "/tbl"
    (d, HudiMeta.writeHudiMetadataFixtureTable(spark, d, docs))
  }

  test("audit: matches, the stale entry, and the lagging index flagged") {
    val (d, rows) = fresh()
    val got = HudiMeta.metadataFilesAudit(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2),
          if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3)),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got === Map(
      ("p=0", s"fid0_0-0-0_$c2.parquet") ->
        ((true, java.lang.Long.valueOf(rows(s"p=0/fid0_0-0-0_$c2.parquet")),
          true, true)),
      ("p=0", s"fid1_0-0-0_$c1.parquet") ->
        ((true, java.lang.Long.valueOf(rows(s"p=0/fid1_0-0-0_$c1.parquet")),
          true, true)),
      // stale: superseded slice still listed
      ("p=0", s"fid0_0-0-0_$c1.parquet") ->
        ((true, java.lang.Long.valueOf(77L), false, false)),
      // lagging: declared live but unlisted
      ("p=1", s"fid2_0-0-0_$c2.parquet") ->
        ((false, null, true, false))))
  }

  test("refusals: no metadata table; un-compacted metadata logs; " +
      "non-parquet base") {
    // a plain fixture has no metadata table
    val d0 = Files.createTempDirectory("graft_hudimd0").toString + "/tbl"
    HudiMeta.writeHudiFixtureTable(spark, d0, docs)
    val e0 = intercept[IllegalArgumentException](
      HudiMeta.metadataFilesAudit(spark, d0))
    assert(e0.getMessage.contains("no .hoodie/metadata"))
    // a declared log on the files partition refuses by encoding name
    val (d1, _) = fresh()
    val mdHoodie = new java.io.File(d1, ".hoodie/metadata/.hoodie")
    val dc = mdHoodie.listFiles().find(_.getName.endsWith(".deltacommit")).get
    val body = new String(java.nio.file.Files.readAllBytes(dc.toPath),
      "UTF-8")
    val logRel = "files/.files-0000_20240102000001000.log.1_0-0-0"
    val logFile = new java.io.File(d1, ".hoodie/metadata/" + logRel)
    java.nio.file.Files.write(logFile.toPath, "#HUDI#".getBytes("UTF-8"))
    java.nio.file.Files.write(dc.toPath, body.replace(
      """"partitionToWriteStats":{"files":[""",
      s""""partitionToWriteStats":{"files":[{"fileId":"files-0000",""" +
        s""""path":"$logRel","numWrites":1,"numDeletes":0,""" +
        s""""numInserts":0,"totalWriteBytes":6,"partitionPath":"files"},""")
      .getBytes("UTF-8"))
    val e1 = intercept[UnsupportedOperationException](
      HudiMeta.metadataFilesAudit(spark, d1))
    assert(e1.getMessage.contains("HFile"))
    // a non-parquet base refuses by format name
    val (d2, _) = fresh()
    val mdHoodie2 = new java.io.File(d2, ".hoodie/metadata/.hoodie")
    val dc2 = mdHoodie2.listFiles()
      .find(_.getName.endsWith(".deltacommit")).get
    java.nio.file.Files.write(dc2.toPath,
      new String(java.nio.file.Files.readAllBytes(dc2.toPath), "UTF-8")
        .replace(".parquet", ".hfile").getBytes("UTF-8"))
    val src = new java.io.File(d2,
      ".hoodie/metadata/files").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(src.renameTo(new java.io.File(src.getParentFile,
      src.getName.replace(".parquet", ".hfile"))))
    val e2 = intercept[UnsupportedOperationException](
      HudiMeta.metadataFilesAudit(spark, d2))
    assert(e2.getMessage.contains("not parquet"))
  }
}
