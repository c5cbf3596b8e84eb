package graft.meta

import java.nio.file.Files

import graft.SparkSpec

/** The scan-only HFile reader (r19): v2 and v3 round-trips through
  * the fixture writer, checksum verification, classified refusals on
  * every scope boundary, a seeded corruption fuzz (no crash class
  * ever escapes), and the metadata-table audit over an HFILE base. */
class HFileSpec extends SparkSpec {

  private def cells(n: Int): Seq[(String, Array[Byte])] =
    (0 until n).map(i => (f"row-$i%04d", s"value-$i-${"x" * i}".getBytes("UTF-8")))

  test("v2 round-trip: trailer, root index, checksummed blocks, cells") {
    val cs = cells(7)
    val bytes = HFile.write(cs, perBlock = 2)
    val t = HFile.readTrailer(bytes, "/t")
    assert(t.major === 2 && t.minor === 3)
    assert(t.dataIndexCount === 4) // ceil(7/2)
    assert(t.entryCount === 7L)
    assert(t.compressionCodec === HFile.CodecNone)
    assert(t.comparatorClassName.contains("CellComparator"))
    val got = HFile.scanCells(bytes, "/t")
    assert(got.map(_._1) === cs.map(_._1))
    assert(got.map(c => new String(c._2, "UTF-8")) ===
      cs.map(c => new String(c._2, "UTF-8")))
  }

  test("v3 round-trip: the protobuf trailer resolves the same scan") {
    val cs = cells(5)
    val bytes = HFile.write(cs, perBlock = 2, majorVersion = 3)
    val t = HFile.readTrailer(bytes, "/t")
    assert(t.major === 3)
    assert(t.dataIndexCount === 3 && t.entryCount === 5L)
    val got = HFile.scanCells(bytes, "/t")
    assert(got.map(_._1) === cs.map(_._1))
  }

  test("scope refusals by name: future major version, compressed " +
      "blocks, multi-level index") {
    val bytes = HFile.write(cells(3), perBlock = 2)
    // future major version
    val v4 = bytes.clone()
    v4(v4.length - 1) = 4
    val e1 = intercept[UnsupportedOperationException](
      HFile.readTrailer(v4, "/t"))
    assert(e1.getMessage.contains("major version 4"))
    // compressed: patch the v2 trailer's codec field (offset from the
    // trailer start: magic 8 + 8 + 8 + 4 + 8 + 4 + 8 + 8 = 56)
    val gz = bytes.clone()
    val tStart = gz.length - HFile.V2TrailerSize
    gz(tStart + 56 + 3) = 1 // GZ ordinal
    val e2 = intercept[UnsupportedOperationException](
      HFile.scanCells(gz, "/t"))
    assert(e2.getMessage.contains("compressed"))
    // multi-level index: numDataIndexLevels at offset 56+4
    val ml = bytes.clone()
    ml(tStart + 60 + 3) = 2
    val e3 = intercept[UnsupportedOperationException](
      HFile.scanCells(ml, "/t"))
    assert(e3.getMessage.contains("multi-level"))
  }

  test("a flipped data byte fails its CRC32C checksum classified") {
    val bytes = HFile.write(cells(4), perBlock = 2)
    val bad = bytes.clone()
    bad(40) = (bad(40) ^ 0x7f).toByte // inside the first data block
    val e = intercept[IllegalArgumentException](
      HFile.scanCells(bad, "/t"))
    assert(e.getMessage.contains("checksum"))
  }

  test("corruption fuzz: 400 seeded single-byte flips refuse " +
      "classified or scan clean — no crash class ever escapes") {
    val bytes = HFile.write(cells(9), perBlock = 3)
    val rnd = new scala.util.Random(19L)
    var refused = 0
    (1 to 400).foreach { i =>
      val bad = bytes.clone()
      val pos = rnd.nextInt(bad.length)
      bad(pos) = (bad(pos) ^ (1 + rnd.nextInt(255))).toByte
      try {
        HFile.scanCells(bad, s"/fuzz-$i")
      } catch {
        case _: IllegalArgumentException |
            _: UnsupportedOperationException => refused += 1
        case e: Throwable =>
          fail(s"flip at $pos escaped the classified contract: $e")
      }
    }
    assert(refused > 0)
  }

  test("corruption fuzz, v3 protobuf trailer: 400 seeded flips in the " +
      "trailer region refuse classified or scan clean") {
    val bytes = HFile.write(cells(6), perBlock = 2, majorVersion = 3)
    val rnd = new scala.util.Random(23L)
    var refused = 0
    (1 to 400).foreach { i =>
      val bad = bytes.clone()
      // bias the flips into the trailer region (the PB parser's
      // attack surface), but let a third land anywhere
      val pos =
        if (i % 3 == 0) rnd.nextInt(bad.length)
        else bad.length - HFile.V3TrailerSize + rnd.nextInt(
          HFile.V3TrailerSize)
      bad(pos) = (bad(pos) ^ (1 + rnd.nextInt(255))).toByte
      try {
        HFile.scanCells(bad, s"/fuzz3-$i")
      } catch {
        case _: IllegalArgumentException |
            _: UnsupportedOperationException => refused += 1
        case e: Throwable =>
          fail(s"flip at $pos escaped the classified contract: $e")
      }
    }
    assert(refused > 0)
  }

  test("un-compacted metadata logs MERGE: the hfile-data block's " +
      "image tombstones the stale entry and adds the lagging one") {
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
    val d = Files.createTempDirectory("graft_hudimdhlog").toString + "/tbl"
    val rows = HudiMeta.writeHudiMetadataHFileLogFixtureTable(
      spark, d, docs)
    val (c1, c2) = ("20240101000000000", "20240102000000000")
    val got = HudiMeta.metadataFilesAudit(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(2),
          if (r.isNullAt(3)) null
          else java.lang.Long.valueOf(r.getLong(3)),
          r.getBoolean(4), r.getBoolean(5)))).toMap
    // fully clean: the stale fid0-c1 row is GONE (tombstoned and
    // undeclared), fid2 now listed — three matched rows
    assert(got === Map(
      ("p=0", s"fid0_0-0-0_$c2.parquet") ->
        ((true,
          java.lang.Long.valueOf(rows(s"p=0/fid0_0-0-0_$c2.parquet")),
          true, true)),
      ("p=0", s"fid1_0-0-0_$c1.parquet") ->
        ((true,
          java.lang.Long.valueOf(rows(s"p=0/fid1_0-0-0_$c1.parquet")),
          true, true)),
      ("p=1", s"fid2_0-0-0_$c2.parquet") ->
        ((true,
          java.lang.Long.valueOf(rows(s"p=1/fid2_0-0-0_$c2.parquet")),
          true, true))), got.toString)
    // a non-hfile log block refuses by name (the metadata table's
    // files partition is hfile-data encoded)
    val logRel = "files/.files-0000_20240102000001000.log.2_0-0-0"
    import HudiLogFormat._
    java.nio.file.Files.write(
      new java.io.File(d, ".hoodie/metadata/" + logRel).toPath,
      frameBlock(DeleteBlock,
        Map(InstantTime -> "20240102000003000"),
        deleteContent(Seq("p=0"))))
    val mdHoodie = new java.io.File(d, ".hoodie/metadata/.hoodie")
    Seq("20240102000003000.deltacommit.requested",
      "20240102000003000.deltacommit.inflight").foreach { n =>
      java.nio.file.Files.write(new java.io.File(mdHoodie, n).toPath,
        Array.empty[Byte])
    }
    java.nio.file.Files.write(
      new java.io.File(mdHoodie, "20240102000003000.deltacommit").toPath,
      (s"""{"partitionToWriteStats":{"files":[{"fileId":"files-0000",""" +
        s""""path":"$logRel","numWrites":1,"numDeletes":1,""" +
        s""""numInserts":0,"totalWriteBytes":1,""" +
        s""""partitionPath":"files"}]},"operationType":"upsert"}""")
        .getBytes("UTF-8"))
    val e = intercept[Exception](
      HudiMeta.metadataFilesAudit(spark, d).collect())
    var root: Throwable = e
    while (root.getCause != null) root = root.getCause
    assert(root.getMessage.contains("hfile-data encoded"), root.toString)
  }

  test("the metadata-table audit reads an HFILE files partition: " +
      "matches, the stale entry and the lagging index flagged") {
    val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")
    Seq(2, 3).foreach { major =>
      val d = Files.createTempDirectory(s"graft_hudimdh$major")
        .toString + "/tbl"
      val rows = HudiMeta.writeHudiMetadataHFileFixtureTable(
        spark, d, docs, hfileMajor = major)
      val (c1, c2) = ("20240101000000000", "20240102000000000")
      val got = HudiMeta.metadataFilesAudit(spark, d).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getBoolean(2),
            if (r.isNullAt(3)) null
            else java.lang.Long.valueOf(r.getLong(3)),
            r.getBoolean(4), r.getBoolean(5)))).toMap
      assert(got === Map(
        ("p=0", s"fid0_0-0-0_$c2.parquet") ->
          ((true,
            java.lang.Long.valueOf(rows(s"p=0/fid0_0-0-0_$c2.parquet")),
            true, true)),
        ("p=0", s"fid1_0-0-0_$c1.parquet") ->
          ((true,
            java.lang.Long.valueOf(rows(s"p=0/fid1_0-0-0_$c1.parquet")),
            true, true)),
        ("p=0", s"fid0_0-0-0_$c1.parquet") ->
          ((true, java.lang.Long.valueOf(77L), false, false)),
        ("p=1", s"fid2_0-0-0_$c2.parquet") ->
          ((false, null, true, false))), s"major=$major: $got")
    }
  }
}
