package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The `avro` source tier: file and block levels decode containers
 * written by avro's OWN DataFileWriter (cross-implementation parity for
 * the hand-rolled block walk), source inference sniffs the Obj magic,
 * the validation matrix rejects wrong pairs, and ignorecorrupt skips
 * undecodable files.
 */
class AvroSourceSpec extends SparkSpec {

  private def meta(path: String, opts: (String, String)*) = {
    val r = spark.read.format("metadata")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_avro").toString
    AvroMeta.writeFixture(new java.io.File(d, "a.avro"),
      (0L until 5000L).map(i => i -> s"v${i % 7}"), syncInterval = 1024)
    AvroMeta.writeFixture(new java.io.File(d, "b.avro"),
      (5000L until 8000L).map(i => i -> s"v${i % 7}"),
      codec = "deflate", syncInterval = 1024)
    d
  }

  test("avro file level: inferred source, header + block-walk totals") {
    val df = meta(dir) // NO source option: the Obj magic must infer
    assert(df.schema === MetaLevel.AvroFile.schema)
    val rows = df.orderBy("filename").collect()
    assert(rows.length === 2)
    val byName = rows.map(r => r.getAs[String]("filename") -> r).toMap
    assert(byName("a.avro").getAs[Long]("num_rows") === 5000L)
    assert(byName("a.avro").getAs[String]("codec") === "null")
    assert(byName("b.avro").getAs[Long]("num_rows") === 3000L)
    assert(byName("b.avro").getAs[String]("codec") === "deflate")
    rows.foreach { r =>
      assert(r.getAs[Int]("num_blocks") > 1, "small sync interval → several blocks")
      assert(r.getAs[String]("schema").contains("\"k\""))
      assert(r.getAs[Map[String, String]]("metadata").contains("avro.schema"))
    }
  }

  test("avro block level: layout is contiguous and rolls up") {
    val blocks = meta(dir, "level" -> "block")
    assert(blocks.schema === MetaLevel.AvroBlock.schema)
    val perFile = blocks.groupBy("filepath")
      .agg(sum("num_rows").as("rows"), sum("data_size").as("bytes"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r).toMap
    val files = meta(dir).select("filepath", "num_rows", "data_bytes", "num_blocks")
      .collect()
    files.foreach { f =>
      val b = perFile(f.getString(0))
      assert(b.getLong(1) === f.getLong(1), "block rows roll up")
      assert(b.getLong(2) === f.getLong(2), "block bytes roll up")
      assert(b.getLong(3) === f.getInt(3).toLong, "block counts agree")
    }
    // offsets strictly increase within a file
    blocks.select("filepath", "block_id", "offset").collect()
      .groupBy(_.getString(0)).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getInt(1)).map(_.getLong(2))
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a < b })
      }
  }

  test("validation matrix, ignorecorrupt, and streaming") {
    val e1 = intercept[IllegalArgumentException](
      meta(dir, "source" -> "avro", "level" -> "page").collect())
    assert(e1.getMessage.contains("Source 'avro' does not support 'page' level"))
    val e2 = intercept[IllegalArgumentException](
      meta(dir, "source" -> "parquet", "level" -> "block").collect())
    assert(e2.getMessage.contains("Source 'parquet' does not support 'block' level"))
    // corrupt container: strict fails, lenient keeps the good files
    val d = Files.createTempDirectory("graft_avro_corrupt").toString
    AvroMeta.writeFixture(new java.io.File(d, "ok.avro"),
      (0L until 100L).map(i => i -> "x"))
    Files.write(java.nio.file.Paths.get(d, "bad.avro"),
      ("Obj" + "\u0001" + "garbage-not-a-container").getBytes("ISO-8859-1"))
    val strict = meta(d, "source" -> "avro", "level" -> "block")
    intercept[org.apache.spark.SparkException](strict.count())
    val lenient = meta(d, "source" -> "avro", "level" -> "block",
      "ignorecorrupt" -> "true")
    assert(lenient.agg(sum("num_rows")).collect()(0).getLong(0) === 100L)
    // an 11-byte varint (shift reaches 70 on the FINAL byte) must refuse
    // with the classified overflow, not silently wrap shift mod 64
    val evil = new java.io.ByteArrayOutputStream()
    evil.write(Array[Byte]('O', 'b', 'j', 1))
    (0 until 10).foreach(_ => evil.write(0xFF)) // 10 continuation bytes
    evil.write(0x01) // final byte lands at shift 70
    val evilPath = java.nio.file.Paths.get(d, "evil.avro")
    Files.write(evilPath, evil.toByteArray)
    val ex = intercept[RuntimeException](AvroMeta.read(
      new org.apache.hadoop.fs.Path(evilPath.toString),
      spark.sessionState.newHadoopConf()))
    assert(ex.getMessage.contains("varint overflow"))
    Files.delete(evilPath) // keep the lenient-count fixture stable
    // streaming arrival at the avro file level
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Files.createTempDirectory("graft_avro_ck").toString
    val out = Files.createTempDirectory("graft_avro_out").toString
    val src = spark.readStream.format("metadata")
      .option("level", "file").option("source", "avro")
      .option("ignorecorrupt", "true")
      .option("streamlagms", "0").load(d)
    val q = src.select("filename", "num_rows").writeStream.format("parquet")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).option("path", out).start()
    q.awaitTermination(60000)
    q.stop()
    assert(spark.read.parquet(out).count() >= 1L)
  }
}
