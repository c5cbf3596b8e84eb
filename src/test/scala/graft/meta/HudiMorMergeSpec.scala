package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Hudi MOR PER-ROW log merge ([[HudiMeta.morMergedRows]]) on the
  * real-HoodieLogFormat fixture: last-event-wins semantics (update,
  * insert, delete, delete-then-resurrect), rollback/uncommitted/
  * corrupt-block invisibility, mid-file corrupt-region scan-past,
  * time travel, merged census, unsupported-block refusals, and the
  * base-never-shuffles plan posture. */
class HudiMorMergeSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (dc1, dc2, dc3) =
    ("20240101000000000", "20240102000000000", "20240103000000000")

  private def fresh(): String = {
    val d = Files.createTempDirectory("graft_hudimorlog").toString + "/tbl"
    HudiMeta.writeHudiMorLogFixtureTable(spark, d, docs)
    d
  }

  /** The fixture's base rows as (doc_id, lang, n_chars) triples. */
  private def baseRows: Seq[(Long, String, java.lang.Long)] =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSeq

  /** The expected merged live view, recomputed from the fixture's
    * deterministic event rules. */
  private def expectedMerged: Set[(Long, String, java.lang.Long)] = {
    val g = baseRows.filter(_._1 % 3 == 0)
    val survivors = g.flatMap { case (id, l, n) =>
      if (id % 60 == 0) Some((id, "zz", java.lang.Long.valueOf(-5L)))
      else if (id % 15 == 0) None
      else if (id % 30 == 0) {
        Some((id, l,
          if (n == null) null else java.lang.Long.valueOf(n + 100L)))
      } else Some((id, l, n))
    }
    val inserts = g.filter(_._1 % 150 == 0).map { case (id, _, _) =>
      (id + 9000000L, "xx", java.lang.Long.valueOf(7L))
    }
    (survivors ++ inserts).toSet ++
      baseRows.filter(r => r._1 % 3 == 1 || r._1 % 3 == 2).toSet
  }

  private def mergedSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, String, java.lang.Long)] =
    df.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet

  test("merged live rows: updates, inserts, deletes, resurrection — " +
      "last event wins; rolled-back/uncommitted/corrupt blocks invisible") {
    val d = fresh()
    val merged = HudiMeta.morMergedRows(spark, d)
    val got = mergedSet(merged)
    assert(got === expectedMerged)
    // the rolled-back (-999) and in-flight (-888) payloads never leak
    assert(!got.exists(r => r._3 != null &&
      (r._3 == -999L || r._3 == -888L)))
    // the mid-file corrupt region did not eat the block after it: the
    // inserts (only present in the post-garbage block) are there
    assert(got.exists(_._1 >= 9000000L))
  }

  test("merged census: per-group merged_rows vs the declared claims") {
    val d = fresh()
    val got = HudiMeta.morMergedCensus(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    val g = baseRows.filter(_._1 % 3 == 0)
    val nU1 = g.count(_._1 % 30 == 0).toLong
    val nIns = g.count(_._1 % 150 == 0).toLong
    val nDel = g.count(_._1 % 15 == 0).toLong
    val nU2 = g.count(_._1 % 60 == 0).toLong
    val fid0Merged = g.size - (nDel - nU2) + nIns
    assert(got("fid0") ===
      ((g.size.toLong, 2L, nU1 + nIns + nDel + nU2, fid0Merged)))
    assert(got("fid1") === ((baseRows.count(_._1 % 3 == 1).toLong, 0L, 0L,
      baseRows.count(_._1 % 3 == 1).toLong)))
    assert(got("fid2") === ((baseRows.count(_._1 % 3 == 2).toLong, 0L, 0L,
      baseRows.count(_._1 % 3 == 2).toLong)))
  }

  test("time travel: asOf dc2 applies only dc2's log events") {
    val d = fresh()
    val got = HudiMeta.morMergedRows(spark, d, Some(dc2))
    val g = baseRows.filter(_._1 % 3 == 0)
    val expected = g.map { case (id, l, n) =>
      if (id % 30 == 0)
        (id, l, if (n == null) null else java.lang.Long.valueOf(n + 100L))
      else (id, l, n)
    } ++ g.filter(_._1 % 150 == 0).map { case (id, _, _) =>
      (id + 9000000L, "xx", java.lang.Long.valueOf(7L))
    }
    // fid2's base arrives at dc2 too; fid1 from dc1
    assert(mergedSet(got) === (expected ++
      baseRows.filter(r => r._1 % 3 == 1 || r._1 % 3 == 2)).toSet)
  }

  test("an unsupported data-block encoding refuses by name") {
    val d = fresh()
    // append a completed-instant HFILE block to the chain
    val log2 = new java.io.File(d,
      s"p=0/.fid0_$dc1.log.2_0-0-0")
    val hfile = HudiLogFormat.frameBlock(HudiLogFormat.HfileDataBlock,
      Map(HudiLogFormat.InstantTime -> dc3), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(log2.toPath, hfile,
      java.nio.file.StandardOpenOption.APPEND)
    val e = intercept[Exception] {
      HudiMeta.morMergedRows(spark, d).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("hfile")))
  }

  test("a log block of a completed instant with a garbled body " +
      "refuses classified, never an unclassified crash") {
    val d = fresh()
    // a well-framed avro data block whose record bytes are garbage
    val junk = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(1); out.writeInt(1) // version, 1 record
      out.writeInt(5); out.write(Array[Byte](-1, -1, -1, -1, -1))
      out.flush(); bos.toByteArray
    }
    val blk = HudiLogFormat.frameBlock(HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.InstantTime -> dc3,
        HudiLogFormat.Schema ->
          """{"type":"record","name":"graft_mor","fields":[
            |{"name":"doc_id","type":"long"},
            |{"name":"lang","type":["null","string"],"default":null},
            |{"name":"n_chars","type":["null","long"],"default":null}]}"""
            .stripMargin.replace("\n", "")), junk)
    val log2 = new java.io.File(d, s"p=0/.fid0_$dc1.log.2_0-0-0")
    java.nio.file.Files.write(log2.toPath, blk,
      java.nio.file.StandardOpenOption.APPEND)
    val e = intercept[Exception] {
      HudiMeta.morMergedRows(spark, d).collect()
    }
    def classes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: classes(x.getCause))
    assert(classes(e).exists(x =>
      x.isInstanceOf[IllegalArgumentException] ||
        x.isInstanceOf[UnsupportedOperationException]))
  }

  test("a wholly-corrupt declared log chain refuses — declared rows " +
      "must never silently drop") {
    val d = fresh()
    // zero out BOTH log files: nothing but corrupt regions remain,
    // while the deltacommits still declare their log rows
    Seq(s"p=0/.fid0_$dc1.log.1_0-0-0", s"p=0/.fid0_$dc1.log.2_0-0-0")
      .foreach { rel =>
        java.nio.file.Files.write(new java.io.File(d, rel).toPath,
          Array.fill[Byte](64)(0x2A))
      }
    val e = intercept[Exception] {
      HudiMeta.morMergedRows(spark, d).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("no valid block")))
  }

  test("row-level incremental feed: merged values of window-touched " +
      "keys, new-base rows, and final-event deletes") {
    val d = fresh()
    val got = HudiMeta.morIncrementalRows(spark, d, dc1, dc3).collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null
        else java.lang.Long.valueOf(r.getLong(4)))).toSet
    val g = baseRows.filter(_._1 % 3 == 0)
    val expected: Set[(String, String, java.lang.Long, String,
        java.lang.Long)] =
      (baseRows.filter(_._1 % 3 == 2).map { case (id, l, n) =>
        ("upsert", id.toString, java.lang.Long.valueOf(id), l, n)
      } ++
        g.filter(_._1 % 60 == 0).map { case (id, _, _) =>
          ("upsert", id.toString, java.lang.Long.valueOf(id), "zz",
            java.lang.Long.valueOf(-5L))
        } ++
        g.filter(_._1 % 150 == 0).map { case (id, _, _) =>
          ("upsert", (id + 9000000L).toString,
            java.lang.Long.valueOf(id + 9000000L), "xx",
            java.lang.Long.valueOf(7L))
        } ++
        g.filter(k => k._1 % 15 == 0 && k._1 % 60 != 0).map {
          case (id, _, _) =>
            ("delete", id.toString, null, null, null)
        }).toSet
    assert(got === expected)
    // bootstrap window ("0", dc3] = the full merged view as upserts
    val boot = HudiMeta.morIncrementalRows(spark, d, "0", dc3)
    assert(boot.filter(col("change_type") === "delete").count() === 0)
    assert(boot.count() ===
      HudiMeta.morMergedRows(spark, d).count())
  }

  test("streaming change store: per-instant attribution across a " +
      "batch jump, and redelivery re-lands nothing") {
    val d = fresh()
    val store = Files.createTempDirectory("graft_morchg_s").toString +
      "/store"
    val ckpt = Files.createTempDirectory("graft_morchg_c").toString
    // one pass sees ALL THREE instants in a single micro-batch — each
    // still lands its own increment with its own window
    HudiMeta.maintainMorChangesStore(spark, d, store, ckpt)
    val byInstant = HudiMeta.readMorChangesStore(spark, store)
      .groupBy(col("instant_time"), col("change_type")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val g = baseRows.filter(_._1 % 3 == 0)
    assert(byInstant === Map(
      (dc1, "upsert") -> baseRows.count(_._1 % 3 < 2).toLong,
      (dc2, "upsert") -> (g.count(_._1 % 30 == 0).toLong +
        g.count(_._1 % 150 == 0) + baseRows.count(_._1 % 3 == 2)),
      (dc3, "upsert") -> g.count(_._1 % 60 == 0).toLong,
      (dc3, "delete") ->
        g.count(k => k._1 % 15 == 0 && k._1 % 60 != 0).toLong))
    // redelivery: a second pass re-lands nothing
    val total = HudiMeta.readMorChangesStore(spark, store).count()
    HudiMeta.maintainMorChangesStore(spark, d, store, ckpt)
    assert(HudiMeta.readMorChangesStore(spark, store).count() === total)
  }

  test("a LOG-ONLY file group refuses by name — never silently " +
      "omitted from census or merge") {
    val d = fresh()
    // dc7 declares a log write for a brand-new file group with no base
    val dc7 = "20240107000000000"
    val rel = s"p=0/.fidX_$dc7.log.1_0-0-0"
    val logFile = new java.io.File(d, rel)
    java.nio.file.Files.write(logFile.toPath,
      "#HUDI#".getBytes("UTF-8"))
    val hoodie = new java.io.File(d, ".hoodie")
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$dc7.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"p=0":[{"fileId":"fidX",""" +
        s""""path":"$rel","numWrites":3,"numDeletes":0,"numInserts":3,""" +
        s""""totalWriteBytes":6,"partitionPath":"p=0"}]},""" +
        """"operationType":"upsert"}""").getBytes("UTF-8"))
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$dc7.deltacommit.requested").toPath,
      Array.empty[Byte])
    java.nio.file.Files.write(
      new java.io.File(hoodie, s"$dc7.deltacommit.inflight").toPath,
      Array.empty[Byte])
    val e = intercept[UnsupportedOperationException] {
      HudiMeta.morFileGroups(spark, d).collect()
    }
    assert(e.getMessage.contains("LOG-ONLY") &&
      e.getMessage.contains("fidX"))
  }

  test("plan posture: base rows never shuffle — the touched-key " +
      "anti-join broadcasts") {
    val d = fresh()
    val plan = HudiMeta.morMergedRows(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"),
      s"expected a broadcast left-anti join, got:\n$plan")
  }

  test("walkBlocks frames its own writer's blocks back, and collapses " +
      "garbage regions without crashing") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |{"name":"k","type":"long"}]}""".stripMargin.replace("\n", ""))
    val r = new org.apache.avro.generic.GenericData.Record(schema)
    r.put("k", 7L)
    val block = HudiLogFormat.frameBlock(HudiLogFormat.AvroDataBlock,
      Map(HudiLogFormat.InstantTime -> "1",
        HudiLogFormat.Schema -> schema.toString),
      HudiLogFormat.avroDataContent(schema, Seq(r)))
    val bytes = Array[Byte](9, 9) ++ block ++
      HudiLogFormat.Magic ++ Array[Byte](0, 0, 0) // truncated tail
    val walked = HudiLogFormat.walkBlocks(bytes, "/t")
    assert(walked.count(!_.corrupt) === 1)
    assert(walked.count(_.corrupt) === 2)
    val recs = HudiLogFormat.dataRecords(
      walked.find(!_.corrupt).get, "/t")
    assert(recs.map(_.get("k")) === Seq(7L))
  }

  test("a declared size below the 32-byte framing minimum is corrupt " +
      "at the gate, never re-classified downstream") {
    // magic + size=31: one byte short of version+type+empty header+
    // contentLen+empty footer+trailer — the r19 ADVICE floor
    def sized(n: Long): Array[Byte] =
      HudiLogFormat.Magic ++
        java.nio.ByteBuffer.allocate(8).putLong(n).array() ++
        Array.fill[Byte](40)(0)
    Seq(24L, 31L).foreach { n =>
      val walked = HudiLogFormat.walkBlocks(sized(n), "/t")
      assert(walked.nonEmpty && walked.forall(_.corrupt),
        s"size=$n must be corrupt at the framing gate")
    }
  }

  test("a completed replacecommit inside the feed window refuses — " +
      "clustering outputs are not row changes") {
    val d = fresh()
    java.nio.file.Files.write(
      new java.io.File(d,
        ".hoodie/20240107000000000.replacecommit").toPath,
      "{}".getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException] {
      HudiMeta.morIncrementalRows(spark, d, dc1, "20240107000000000")
    }
    assert(e.getMessage.contains("replacecommit"))
    // a window that CLOSES before the replacecommit still feeds
    assert(HudiMeta.morIncrementalRows(spark, d, dc1, dc3).count() > 0)
  }
}
