package graft.meta

import java.nio.file.Files

import org.apache.parquet.column.values.bloomfilter.BlockSplitBloomFilter

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Split-block bloom filter decode + probe: bit-parity with parquet-mr's
  * own implementation, the no-false-negative guarantee on real written
  * files, and sound point-lookup file pruning built on both. */
class BloomFilterSpec extends SparkSpec {

  /** documents-like fixture: 4 hash-scattered files (every file spans the
    * full id range, so min/max stats cannot prune a point probe), bloom
    * filters on both the INT64 id and the UTF8 tag column. Dictionary
    * encoding is disabled for the filtered columns: parquet-mr skips the
    * bloom filter for fully dictionary-encoded chunks (the dictionary
    * already is an exact filter), which is exactly the case the
    * missing-filter soundness guard covers — tested separately below. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_bloom").toString
    spark.range(0, 2000)
      .withColumn("tag", concat(lit("tag"), (col("id") % 500).cast("string")))
      .repartition(4, col("id")) // hash-scatter: all files cover [0, 2000)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.bloom.filter.expected.ndv#id", "600")
      .option("parquet.bloom.filter.enabled#tag", "true")
      .option("parquet.bloom.filter.expected.ndv#tag", "600")
      .option("parquet.enable.dictionary#id", "false")
      .option("parquet.enable.dictionary#tag", "false")
      .parquet(d)
    d
  }

  private lazy val plainDir: String = {
    val d = Files.createTempDirectory("graft_bloom_plain").toString
    spark.range(0, 100).write.mode("overwrite").parquet(d)
    d
  }

  test("Sbbf probe is bit-exact against parquet-mr's BlockSplitBloomFilter") {
    val filter = new BlockSplitBloomFilter(1024)
    val rnd = new scala.util.Random(42)
    val inserted = Array.fill(300)(rnd.nextLong())
    inserted.foreach(filter.insertHash)
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    val bitset = out.toByteArray
    assert(bitset.length === filter.getBitsetSize)
    // every inserted hash hits through our probe
    inserted.foreach(h => assert(Sbbf.mightContain(bitset, h)))
    // exact parity (INCLUDING false positives) on random probes
    var misses = 0
    (0 until 20000).foreach { _ =>
      val h = rnd.nextLong()
      val ours = Sbbf.mightContain(bitset, h)
      assert(ours === filter.findHash(h), s"parity break on hash $h")
      if (!ours) misses += 1
    }
    assert(misses > 0, "probe never returned certain-absence")
  }

  test("value hashing matches parquet-mr for longs, ints and strings") {
    val filter = new BlockSplitBloomFilter(64)
    Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(Sbbf.hashLong(v) === filter.hash(v))
    }
    Seq(0, 1, -1, 42, Int.MaxValue, Int.MinValue).foreach { v =>
      assert(Sbbf.hashInt(v) === filter.hash(v), s"INT32 hash parity on $v")
    }
    Seq("", "a", "tag17", "éléphant").foreach { s =>
      assert(Sbbf.hashBytes(s.getBytes("UTF-8")) ===
        filter.hash(org.apache.parquet.io.api.Binary.fromString(s)))
    }
    Seq(0.0d, -0.0d, 1.5d, -273.15d, Double.MaxValue, Double.MinPositiveValue,
      Double.NegativeInfinity, Double.NaN).foreach { v =>
      assert(Sbbf.hashDouble(v) === filter.hash(v), s"DOUBLE hash parity on $v")
    }
    Seq(0.0f, -0.0f, 2.5f, Float.MaxValue, Float.NaN).foreach { v =>
      assert(Sbbf.hashFloat(v) === filter.hash(v), s"FLOAT hash parity on $v")
    }
    // ±0.0 are distinct plain encodings: the probes MUST differ, which is
    // exactly why the zero-probe expansion in MetaPrune exists
    assert(Sbbf.hashDouble(0.0d) !== Sbbf.hashDouble(-0.0d))
    assert(Sbbf.hashFloat(0.0f) !== Sbbf.hashFloat(-0.0f))
    // DECIMAL/FLBA: the unscaled value's fixed-width big-endian bytes
    // hash exactly like parquet-mr's Binary hashing of the same encoding
    for (typeLen <- Seq(9, 16);
        v <- Seq(0L, 1L, -1L, 20225L, Long.MaxValue, Long.MinValue)) {
      val be = new Array[Byte](typeLen)
      val sign: Byte = if (v < 0) -1 else 0
      java.util.Arrays.fill(be, sign)
      for (i <- 0 until 8) be(typeLen - 1 - i) = ((v >> (8 * i)) & 0xffL).toByte
      assert(Sbbf.hashUnscaled(v, typeLen) ===
        filter.hash(org.apache.parquet.io.api.Binary.fromConstantByteArray(be)),
        s"FLBA hash parity on $v width $typeLen")
    }
  }

  test("decimal (FLBA) blooms prune hash-scattered files end-to-end") {
    import org.apache.spark.sql.functions._
    val d = Files.createTempDirectory("graft_bloom_dec").toString
    spark.range(0, 20000)
      .select((col("id").cast("decimal(18,2)") +
          lit(java.math.BigDecimal.valueOf(0.25)))
        .cast("decimal(20,2)").as("k"), col("id"))
      .repartition(6, col("id")).drop("id")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "20000")
      .parquet(d)
    val all = spark.read.parquet(d).inputFiles.length
    assert(all === 6)
    // a present value keeps its file(s); an absent one prunes hard (the
    // hash-scattered layout makes min/max useless — blooms do the work)
    val present = MetaPrune.filesMayContainDecimal(spark, d, "k", 123L * 100 + 25, 9)
    assert(present.nonEmpty)
    val absent = MetaPrune.filesMayContainDecimal(spark, d, "k", 999999L * 100 + 25, 9)
    assert(absent.length < all, "bloom pruned nothing for an absent decimal")
    // end-to-end: the pruned read still returns exactly the matching rows
    val got = MetaPrune.readPrunedInDecimal(spark, d, "k",
        Seq(123L * 100 + 25, 4567L * 100 + 25), 9)
      .filter(col("k").isin(java.math.BigDecimal.valueOf(123.25),
        java.math.BigDecimal.valueOf(4567.25)))
      .count()
    assert(got === 2L)
    assert(MetaPrune.readPrunedInDecimal(spark, d, "k",
      Seq(999999L * 100 + 25), 9).inputFiles.length < all)
  }

  /** INT32 sibling of the INT64 fixture: same hash-scatter, id as INT32
    * plus a quarter-step DOUBLE derived from it, blooms on both. */
  private lazy val dir32: String = {
    val d = Files.createTempDirectory("graft_bloom32").toString
    spark.range(0, 2000)
      .select(col("id").cast("int").as("k"),
        // -0.0 rows: prove a `= 0.0` probe keeps the file that has only
        // negative zero (distinct plain encoding, equal SQL value)
        when(col("id") === 7L, lit(-0.0d))
          .otherwise(col("id") * lit(0.25d)).as("v"),
        col("id").as("payload"))
      .repartition(4, col("k"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#k", "true")
      .option("parquet.bloom.filter.expected.ndv#k", "600")
      .option("parquet.bloom.filter.enabled#v", "true")
      .option("parquet.bloom.filter.expected.ndv#v", "600")
      .option("parquet.enable.dictionary#k", "false")
      .option("parquet.enable.dictionary#v", "false")
      .parquet(d)
    d
  }

  test("INT32 point-lookup pruning drops files and stays sound") {
    assert(MetaPrune.filesInRange(spark, dir32, "k", 1234L, 1234L).length === 4,
      "hash-scatter premise broken: stats pruned")
    val byBloom = MetaPrune.filesMayContainInt(spark, dir32, "k", 1234)
    assert(byBloom.length < 4, "bloom pruning dropped nothing")
    assert(MetaPrune.readPrunedEqInt(spark, dir32, "k", 1234)
      .filter(col("k") === 1234).count() === 1L)
    assert(MetaPrune.readPrunedEqInt(spark, dir32, "k", 999999)
      .filter(col("k") === 999999).count() === 0L)
    // IN-list: every probed key survives
    val keys = Seq(3, 777, 1500)
    val got = MetaPrune.readPrunedInInt(spark, dir32, "k", keys)
      .filter(col("k").isin(keys: _*)).collect().map(_.getInt(0)).toSet
    assert(got === keys.toSet)
  }

  test("DOUBLE point-lookup pruning stays sound including negative zero") {
    val byBloom = MetaPrune.filesMayContainDouble(spark, dir32, "v", 308.5d)
    assert(byBloom.length < 4, "bloom pruning dropped nothing")
    assert(MetaPrune.readPrunedEqDouble(spark, dir32, "v", 308.5d)
      .filter(col("v") === 308.5d).count() === 1L) // id 1234
    assert(MetaPrune.readPrunedEqDouble(spark, dir32, "v", 1.0e9d)
      .filter(col("v") === 1.0e9d).count() === 0L)
    // the -0.0 row answers a +0.0 equality (ids 0 and 7 both equal 0.0)
    assert(MetaPrune.readPrunedEqDouble(spark, dir32, "v", 0.0d)
      .filter(col("v") === 0.0d).count() === 2L)
    // IN-list with a zero among the probes
    val vals = Seq(0.0d, 308.5d, 499.75d)
    assert(MetaPrune.readPrunedInDouble(spark, dir32, "v", vals)
      .filter(col("v").isin(vals: _*)).count() === 4L)
    // NaN probe degrades to the full listing, never drops a file
    assert(MetaPrune.filesMayContainDouble(spark, dir32, "v", Double.NaN)
      .length === 4)
  }

  test("a header claiming a huge bitset fails before allocating") {
    import org.apache.parquet.format.{BloomFilterAlgorithm, BloomFilterCompression,
      BloomFilterHash, BloomFilterHeader, SplitBlockAlgorithm, Uncompressed, XxHash}
    def headerBytes(numBytes: Int): Array[Byte] = {
      val h = new BloomFilterHeader(numBytes,
        BloomFilterAlgorithm.BLOCK(new SplitBlockAlgorithm()),
        BloomFilterHash.XXHASH(new XxHash()),
        BloomFilterCompression.UNCOMPRESSED(new Uncompressed()))
      val out = new java.io.ByteArrayOutputStream()
      org.apache.parquet.format.Util.writeBloomFilterHeader(h, out)
      out.toByteArray
    }
    def chunk(len: Option[Int]): ChunkInfo = ChunkInfo(
      rowGroupId = 0, columnId = 0, startOffset = 0L,
      totalCompressedSize = 0L, totalUncompressedSize = 0L,
      path = Some("id"), physicalType = Some("INT64"), encodings = None,
      codec = None, numValues = 0L, stats = None, dataPageOffset = None,
      dictionaryPageOffset = None, indexPageOffset = None,
      offsetIndexOffset = None, offsetIndexLength = None,
      columnIndexOffset = None, columnIndexLength = None,
      bloomFilterOffset = Some(0L), bloomFilterLength = len, sizeStats = None,
      encodingStats = None)
    // claims ~2 GB in a tiny "file": must throw on the bound, not allocate
    val big = headerBytes(Int.MaxValue - 100)
    val e1 = intercept[RuntimeException] {
      BloomFilters.bloomFilters(Seq(chunk(None)),
        new ForwardSeekStream(new SeekableBytes(big), 64),
        fileLen = big.length.toLong).toList
    }
    assert(e1.getMessage.contains("exceeds available"))
    // footer's bloom_filter_length budget also caps a lying header
    val lie = headerBytes(4096) ++ new Array[Byte](64) // only 64 real bytes
    val e2 = intercept[RuntimeException] {
      BloomFilters.bloomFilters(Seq(chunk(Some(headerBytes(4096).length + 64))),
        new ForwardSeekStream(new SeekableBytes(lie), 64),
        fileLen = Long.MaxValue).toList
    }
    assert(e2.getMessage.contains("exceeds available"))
    // a truthful header within both budgets still decodes
    val okBytes = headerBytes(64) ++ Array.tabulate[Byte](64)(_.toByte)
    val ok = BloomFilters.bloomFilters(Seq(chunk(Some(okBytes.length))),
      new ForwardSeekStream(new SeekableBytes(okBytes), 64),
      fileLen = okBytes.length.toLong).toList
    assert(ok.head.bitset.length === 64)
  }

  test("bloomfilter level decodes headers and bitsets from written files") {
    val rows = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir)
      .select("filepath", "path", "type", "algorithm", "hash", "compression",
        "num_bytes", "header_size", "bitset")
      .collect()
    assert(rows.nonEmpty, "no bloom filters decoded")
    val byCol = rows.groupBy(_.getString(1))
    assert(byCol.keySet === Set("id", "tag"))
    rows.foreach { r =>
      assert(r.getString(3) === "BLOCK")
      assert(r.getString(4) === "XXHASH")
      assert(r.getString(5) === "UNCOMPRESSED")
      assert(r.getInt(6) > 0)
      assert(r.getInt(7) > 0)
      assert(r.getAs[Array[Byte]](8).length === r.getInt(6))
      assert(r.getInt(6) % 32 === 0, "bitset not block-aligned")
    }
    // id chunks are INT64, tag chunks BYTE_ARRAY
    assert(byCol("id").forall(_.getString(2) === "INT64"))
    assert(byCol("tag").forall(_.getString(2) === "BYTE_ARRAY"))
  }

  test("no false negatives: every value present in a file probes true") {
    // key by file NAME: input_file_name renders file:///, the metadata
    // source file:/ — same files, different URI normalizations
    val base = (p: String) => p.substring(p.lastIndexOf('/') + 1)
    val blooms = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir).filter(col("path") === "id")
      .select("filepath", "bitset").collect()
      .map(r => base(r.getString(0)) -> r.getAs[Array[Byte]](1)).toMap
    assert(blooms.size === 4)
    val present = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("id")).collect()
      .map(r => (base(r.getString(0)), r.getLong(1)))
    assert(present.length === 2000)
    present.foreach { case (f, v) =>
      assert(Sbbf.mightContain(blooms(f), Sbbf.hashLong(v)),
        s"false negative for id=$v in $f")
    }
  }

  test("point-lookup pruning drops files and stays sound") {
    // stats cannot prune a hash-scattered layout; blooms can
    val byStats = MetaPrune.filesInRange(spark, dir, "id", 1234L, 1234L)
    assert(byStats.length === 4, "hash-scatter premise broken: stats pruned")
    val byBloom = MetaPrune.filesMayContainLong(spark, dir, "id", 1234L)
    assert(byBloom.length < 4, "bloom pruning dropped nothing")
    val pruned = MetaPrune.readPrunedEqLong(spark, dir, "id", 1234L)
      .filter(col("id") === 1234L).count()
    assert(pruned === 1L)
    // absent probe value: certain absence everywhere is legal (0 files)
    val absent = MetaPrune.readPrunedEqLong(spark, dir, "id", 999999L)
      .filter(col("id") === 999999L).count()
    assert(absent === 0L)
  }

  test("IN-list batch lookup prunes in one metadata pass and stays sound") {
    val vals = Seq(10L, 777L, 1500L)
    val byBloom = MetaPrune.filesMayContainAnyLong(spark, dir, "id", vals)
    assert(byBloom.nonEmpty && byBloom.length <= 4)
    val got = MetaPrune.readPrunedInLong(spark, dir, "id", vals)
      .filter(col("id").isin(vals: _*)).collect().map(_.getLong(0)).toSet
    assert(got === vals.toSet)
    // every probe absent: certain absence everywhere is legal (0 files)
    val absent = MetaPrune.readPrunedInLong(spark, dir, "id", Seq(99999L, 88888L))
      .filter(col("id").isin(99999L, 88888L)).count()
    assert(absent === 0L)
    // a batch spread across every file keeps every file (sound, no loss)
    val wide = (0L until 4L).map(_ * 500L + 3L)
    val wideRows = MetaPrune.readPrunedInLong(spark, dir, "id", wide)
      .filter(col("id").isin(wide: _*)).count()
    assert(wideRows === wide.length.toLong)
  }

  test("string IN-list batch lookup prunes and stays sound") {
    val vals = Seq("tag17", "tag303", "tagnope")
    val byBloom = MetaPrune.filesMayContainAnyString(spark, dir, "tag", vals)
    assert(byBloom.nonEmpty && byBloom.length <= 4)
    val full = spark.read.parquet(dir)
      .filter(col("tag").isin(vals: _*)).agg(sum("id")).collect()(0).getLong(0)
    val pruned = MetaPrune.readPrunedInString(spark, dir, "tag", vals)
      .filter(col("tag").isin(vals: _*)).agg(sum("id")).collect()(0).getLong(0)
    assert(pruned === full)
    // an all-absent batch may legally prune everything
    assert(MetaPrune.readPrunedInString(spark, dir, "tag", Seq("zzz", "yyy"))
      .filter(col("tag").isin("zzz", "yyy")).count() === 0L)
  }

  test("string point-lookup pruning is sound on the tag column") {
    val full = spark.read.parquet(dir)
      .filter(col("tag") === "tag17").agg(sum("id")).collect()(0).getLong(0)
    val pruned = MetaPrune.readPrunedEqString(spark, dir, "tag", "tag17")
      .filter(col("tag") === "tag17").agg(sum("id")).collect()(0).getLong(0)
    assert(pruned === full)
  }

  test("files without bloom filters are kept, never pruned") {
    val rows = spark.read.format("metadata").option("level", "bloomfilter")
      .load(plainDir).count()
    assert(rows === 0L)
    val kept = MetaPrune.filesMayContainLong(spark, plainDir, "id", 12345L)
    val all = spark.read.format("metadata").option("level", "file")
      .load(plainDir).count()
    assert(kept.length.toLong === all)
  }

  test("path predicate becomes an advisory chunk-skip hint in the plan") {
    val df = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir).filter(col("path") === "id")
    val desc = df.queryExecution.executedPlan.toString
    assert(desc.contains("bloompaths=[id]"), s"hint missing from plan:\n$desc")
    // the hint only skips rows the residual filter drops anyway
    val hinted = df.select("filepath", "num_bytes").collect().toSet
    val unhinted = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir).select("filepath", "path", "num_bytes")
      .collect().filter(_.getString(1) == "id")
      .map(r => org.apache.spark.sql.Row(r.getString(0), r.getInt(2))).toSet
    assert(hinted === unhinted)
  }

  test("corrupt bloom region: fails by default, skipped under ignorecorrupt") {
    val d = Files.createTempDirectory("graft_bloom_corrupt").toString
    spark.range(0, 500).coalesce(1).write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#id", "true")
      .option("parquet.enable.dictionary#id", "false")
      .parquet(d)
    val off = spark.read.format("metadata").option("level", "bloomfilter")
      .load(d).select("bloom_offset").collect()(0).getLong(0)
    val file = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val raf = new java.io.RandomAccessFile(file, "rw")
    try {
      raf.seek(off)
      raf.write(Array.fill[Byte](16)(-1)) // garbage over the thrift header
    } finally raf.close()
    // the footer cache still holds the pre-corruption decode; a fresh
    // uncached read must hit the broken bloom region
    val fresh = () => spark.read.format("metadata").option("level", "bloomfilter")
      .option("footercache", "false")
    intercept[Exception](fresh().load(d).collect())
    val skipped = fresh().option("ignorecorrupt", "true").load(d).collect()
    assert(skipped.isEmpty) // the one corrupt file contributed nothing
  }

  test("header-only projection skips bitset reads") {
    val noBitset = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir).select("filepath", "path", "num_bytes").collect()
    assert(noBitset.nonEmpty)
    val withBitset = spark.read.format("metadata").option("level", "bloomfilter")
      .load(dir).select("filepath", "path", "num_bytes", "bitset").collect()
    assert(noBitset.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet ===
      withBitset.map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet)
  }
}
