package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hudi CDC log blocks (r19): cdc-data blocks decode into the writer's
  * own before/after images and feed [[HudiMeta.morIncrementalRows]] as
  * NATIVE change evidence — per file group, with the derived slice
  * path as the fallback for plain groups; the snapshot merge ignores
  * cdc blocks (payload blocks stay the merge truth); malformed cdc
  * records refuse by name. */
class HudiCdcSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (dc1, dc2) = ("20240101000000000", "20240102000000000")

  private def fresh(): String = {
    val d = Files.createTempDirectory("graft_hudicdc").toString + "/tbl"
    HudiMeta.writeHudiMorCdcFixtureTable(spark, d, docs)
    d
  }

  private def baseRows: Seq[(Long, String, java.lang.Long)] =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSeq

  private def plus(n: java.lang.Long, d: Long): java.lang.Long =
    if (n == null) null else java.lang.Long.valueOf(n + d)

  private def feedSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
      if (r.isNullAt(3)) null else r.getString(3),
      if (r.isNullAt(4)) null
      else java.lang.Long.valueOf(r.getLong(4)))).toSet

  test("the feed resolves cdc groups from native images and plain " +
      "groups from the derived path, in one answer") {
    val d = fresh()
    val got = feedSet(HudiMeta.morIncrementalRows(spark, d, dc1, dc2))
    val even = baseRows.filter(_._1 % 2 == 0)
    val odd = baseRows.filter(_._1 % 2 == 1)
    val expected =
      (even.filter(_._1 % 20 == 0).map { case (id, l, n) =>
        ("upsert", id.toString, java.lang.Long.valueOf(id), l, plus(n, 7L))
      } ++ even.filter(_._1 % 100 == 0).map { case (id, _, _) =>
        ("upsert", (id + 7000000L).toString,
          java.lang.Long.valueOf(id + 7000000L), "cc",
          java.lang.Long.valueOf(9L))
      } ++ even.filter(_._1 % 20 == 10).map { case (id, _, _) =>
        ("delete", id.toString, null, null, null)
      } ++ odd.filter(_._1 % 10 == 5).map { case (id, _, n) =>
        ("upsert", id.toString, java.lang.Long.valueOf(id), "dv",
          plus(n, 3L))
      }).toSet
    assert(got === expected)
  }

  test("the snapshot merge ignores cdc blocks — payload blocks stay " +
      "the merge truth") {
    val d = fresh()
    val got = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    val expected = baseRows.flatMap { case (id, l, n) =>
      if (id % 2 == 0) {
        if (id % 20 == 10) None
        else if (id % 20 == 0) Some((id, l, plus(n, 7L)))
        else Some((id, l, n))
      } else if (id % 10 == 5) Some((id, "dv", plus(n, 3L)))
      else Some((id, l, n))
    } ++ baseRows.filter(k => k._1 % 2 == 0 && k._1 % 100 == 0)
      .map(k => (k._1 + 7000000L, "cc", java.lang.Long.valueOf(9L)))
    assert(got === expected.toSet)
  }

  test("when images and payload DISAGREE, the feed reports the cdc " +
      "images (native evidence) and the merge the payload") {
    val d = fresh()
    // dc3 appends a discrepant pair to fid0: payload says n_chars=-777
    // on the %200==0 keys, the cdc image says +777
    val dc3 = "20240103000000000"
    val dataSchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"graft_morcdc","fields":[
        |{"name":"doc_id","type":"long"},
        |{"name":"lang","type":["null","string"],"default":null},
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    val keys = baseRows.filter(_._1 % 200 == 0)
    assume(keys.nonEmpty)
    val payload = keys.map { case (id, l, _) =>
      val r = new org.apache.avro.generic.GenericData.Record(dataSchema)
      r.put("doc_id", id); r.put("lang", l)
      r.put("n_chars", java.lang.Long.valueOf(-777L))
      r
    }
    val images = keys.map { case (id, l, n) =>
      HudiMeta.cdcRec("u", id.toString, Some((id, l, n)),
        Some((id, l, java.lang.Long.valueOf(777L))))
    }
    import HudiLogFormat._
    val log = frameBlock(AvroDataBlock,
        Map(InstantTime -> dc3, Schema -> dataSchema.toString),
        avroDataContent(dataSchema, payload.toSeq)) ++
      frameBlock(CdcDataBlock,
        Map(InstantTime -> dc3, Schema -> HudiMeta.CdcAvroSchema.toString),
        avroDataContent(HudiMeta.CdcAvroSchema, images.toSeq))
    val rel = s"p=0/.fid0_$dc1.log.2_0-0-0"
    java.nio.file.Files.write(new java.io.File(d, rel).toPath, log)
    Seq(s"$dc3.deltacommit.requested", s"$dc3.deltacommit.inflight")
      .foreach { n =>
        java.nio.file.Files.write(
          new java.io.File(d, s".hoodie/$n").toPath, Array.empty[Byte])
      }
    java.nio.file.Files.write(
      new java.io.File(d, s".hoodie/$dc3.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"p=0":[{"fileId":"fid0",""" +
        s""""path":"$rel","numWrites":${keys.size},"numDeletes":0,""" +
        s""""numInserts":0,"numUpdateWrites":${keys.size},""" +
        s""""totalWriteBytes":${log.length},""" +
        s""""partitionPath":"p=0"}]},"operationType":"upsert"}""")
        .getBytes("UTF-8"))
    val feed = feedSet(HudiMeta.morIncrementalRows(spark, d, dc2, dc3))
    assert(feed === keys.map { case (id, l, _) =>
      ("upsert", id.toString, java.lang.Long.valueOf(id), l,
        java.lang.Long.valueOf(777L))
    }.toSet)
    val merged = HudiMeta.morMergedRows(spark, d)
      .filter(col("n_chars") === -777L).count()
    assert(merged === keys.size.toLong)
  }

  test("malformed cdc records refuse by name: unknown op, missing " +
      "after image") {
    val d = fresh()
    val dc3 = "20240103000000000"
    def appendCdc(recs: Seq[org.apache.avro.generic.GenericRecord],
        rel: String): Unit = {
      import HudiLogFormat._
      val log = frameBlock(CdcDataBlock,
        Map(InstantTime -> dc3, Schema -> HudiMeta.CdcAvroSchema.toString),
        avroDataContent(HudiMeta.CdcAvroSchema, recs))
      java.nio.file.Files.write(new java.io.File(d, rel).toPath, log)
      Seq(s"$dc3.deltacommit.requested", s"$dc3.deltacommit.inflight")
        .foreach { n =>
          java.nio.file.Files.write(
            new java.io.File(d, s".hoodie/$n").toPath, Array.empty[Byte])
        }
      java.nio.file.Files.write(
        new java.io.File(d, s".hoodie/$dc3.deltacommit").toPath,
        (s"""{"partitionToWriteStats":{"p=0":[{"fileId":"fid0",""" +
          s""""path":"$rel","numWrites":1,"numDeletes":0,""" +
          s""""numInserts":0,"numUpdateWrites":1,""" +
          s""""totalWriteBytes":${log.length},""" +
          s""""partitionPath":"p=0"}]},"operationType":"upsert"}""")
          .getBytes("UTF-8"))
    }
    appendCdc(Seq(HudiMeta.cdcRec("x", "1", None,
      Some((1L, "en", java.lang.Long.valueOf(1L))))),
      s"p=0/.fid0_$dc1.log.2_0-0-0")
    val e = intercept[Exception] {
      HudiMeta.morIncrementalRows(spark, d, dc2, dc3).collect()
    }
    assert(e.getMessage.contains("unknown op 'x'"))
    // overwrite the same appended log with a u record lacking its
    // after image — the partial-image refusal
    appendCdc(Seq(HudiMeta.cdcRec("u", "2", None, None)),
      s"p=0/.fid0_$dc1.log.2_0-0-0")
    val e2 = intercept[Exception] {
      HudiMeta.morIncrementalRows(spark, d, dc2, dc3).collect()
    }
    assert(e2.getMessage.contains("after image"))
  }

  test("bootstrap from 0 carries the cdc groups' upserts and no " +
      "deletes") {
    val d = fresh()
    val boot = HudiMeta.morIncrementalRows(spark, d, "0", dc2)
    assert(boot.filter(col("change_type") === "delete").count() === 0)
    assert(boot.count() === HudiMeta.morMergedRows(spark, d).count())
  }
}
