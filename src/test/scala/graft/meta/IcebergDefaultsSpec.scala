package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Iceberg v3 default values (r19): `initial-default` fields are
  * read-filled — never a backfill gap in
  * [[IcebergMeta.schemaConformance]]; `write-default`-only fields
  * still gap (old rows read null until backfilled). */
class IcebergDefaultsSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  test("initial-default fields never gap; write-default-only fields " +
      "still do") {
    val d = Files.createTempDirectory("graft_icev3d").toString + "/tbl"
    IcebergMeta.writeV3DefaultsFixtureTable(spark, d, docs)
    val got = IcebergMeta.schemaConformance(spark, d).collect()
      .map(r => (r.getString(0).substring(r.getString(0).lastIndexOf('/') + 1),
        r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got === Set(
      ("f0.parquet", 4, 2, "tag"),
      ("f1.parquet", 4, 2, "tag")))
  }

  test("a null initial-default (explicitly written) is NOT read-fill " +
      "evidence — the field still gaps") {
    val d = Files.createTempDirectory("graft_icev3dn").toString + "/tbl"
    IcebergMeta.writeV3DefaultsFixtureTable(spark, d, docs)
    val v1 = new java.io.File(d, "metadata/v1.metadata.json")
    val txt = new String(java.nio.file.Files.readAllBytes(v1.toPath),
      "UTF-8")
    java.nio.file.Files.write(v1.toPath,
      txt.replace("\"initial-default\":5,", "\"initial-default\":null,")
        .getBytes("UTF-8"))
    val got = IcebergMeta.schemaConformance(spark, d).collect()
      .map(_.getString(3)).toSet
    assert(got === Set("score,tag"))
  }
}
