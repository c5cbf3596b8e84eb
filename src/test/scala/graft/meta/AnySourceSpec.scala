package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * The `source=any` mixed-lake file level: one magic probe classifies
 * every file, rows decode through the matching format's reader, foreign
 * files surface as `other` instead of failing a homogeneity sniff, and
 * encrypted parquet classifies with null rows. The level behind the
 * one-scan [[MetaValues.lakeCensus]].
 */
class AnySourceSpec extends SparkSpec {

  private def meta(path: String, opts: (String, String)*) = {
    val r = spark.read.format("metadata")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(path)
  }

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_any").toString
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(d + "_pq")
    spark.range(0, 700).coalesce(1).write.mode("overwrite").orc(d + "_orc")
    for ((src, ext) <- Seq(d + "_pq" -> ".parquet", d + "_orc" -> ".orc")) {
      val part = new java.io.File(src).listFiles()
        .filter(_.getName.endsWith(ext)).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(d, "part" + ext).toPath)
    }
    AvroMeta.writeFixture(new java.io.File(d, "part.avro"),
      (0L until 300L).map(i => i -> "x"))
    Files.write(java.nio.file.Paths.get(d, "notes.txt"),
      "not a table".getBytes)
    // an ENCRYPTED-parquet lookalike: PARE head, plausible bulk
    Files.write(java.nio.file.Paths.get(d, "enc.parquet"),
      ("PARE" + "x" * 64 + "PARE").getBytes("ISO-8859-1"))
    d
  }

  test("any file level classifies every file and decodes rows per format") {
    val rows = meta(dir, "source" -> "any", "level" -> "file")
      .select(col("filename"), col("format"), col("num_rows"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(rows("part.parquet") === (("parquet", 1000L)))
    assert(rows("part.orc") === (("orc", 700L)))
    assert(rows("part.avro") === (("avro", 300L)))
    assert(rows("notes.txt") === (("other", -1L)))
    // PARE classifies as parquet; the footer is ciphertext → no evidence
    assert(rows("enc.parquet") === (("parquet", -1L)))
    assert(rows.size === 5)
  }

  test("rows agree with the per-format file levels") {
    val any = meta(dir, "source" -> "any", "level" -> "file",
        "ignorecorrupt" -> "true")
      .filter(col("format") =!= "other" && col("num_rows").isNotNull)
      .agg(sum(col("num_rows"))).collect()(0).getLong(0)
    val perFormat = Seq("parquet", "orc", "avro").map { src =>
      meta(dir, "source" -> src, "level" -> "file", "ignorecorrupt" -> "true")
        .agg(sum(col("num_rows"))).collect()(0).getLong(0)
    }.sum
    assert(any === perFormat)
  }

  test("format-only projection prunes num_rows from the scan") {
    val df = meta(dir, "source" -> "any", "level" -> "file")
      .select("filename", "format")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("format") && !plan.contains("num_rows"))
    assert(df.collect().length === 5)
  }

  test("count pushdown, limit, and validation") {
    val cnt = meta(dir, "source" -> "any", "level" -> "file").count()
    assert(cnt === 5L)
    // only the file level exists for `any`
    val e = intercept[Exception](
      meta(dir, "source" -> "any", "level" -> "rowgroup").collect())
    def msg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null && !c.getMessage.contains("level")) c = c.getCause
      c.getMessage
    }
    assert(msg(e).contains("Source 'any' does not support 'rowgroup' level"))
  }
}
