package graft.meta

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/**
 * Streaming metadata source: readStream over a directory emits metadata
 * rows for newly arrived files, incrementally across restarts of an
 * AvailableNow query sharing one checkpoint.
 */
class MetaStreamSpec extends SparkSpec {

  test("offset json round-trips") {
    val o = FileKeyOffset(1234L, "file:/a/b \"quoted\"\\path.parquet")
    assert(FileKeyOffset.fromJson(o.json()) === o)
    assert(FileKeyOffset.fromJson(FileKeyOffset.Initial.json()) === FileKeyOffset.Initial)
  }

  test("streaming file level emits only newly arrived files per run") {
    val dir = Files.createTempDirectory("graft_meta_stream").toString
    val ckpt = Files.createTempDirectory("graft_meta_ckpt").toString
    val out = Files.createTempDirectory("graft_meta_out").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)

    // parquet sink: the memory sink cannot recover from a checkpoint, and
    // incremental restart is exactly what this test exercises
    def runOnce(): Seq[String] = {
      val src = spark.readStream.format("metadata")
        .option("level", "file").option("source", "parquet")
        .option("streamlagms", "0").load(dir)
      val q = src.select("filename").writeStream.format("parquet")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).option("path", out).start()
      q.awaitTermination(60000)
      q.stop()
      spark.read.parquet(out).collect().map(_.getString(0)).toSeq
    }

    val first = runOnce()
    assert(first.count(_.endsWith(".parquet")) >= 1)

    // second wave: a new file with a strictly later mtime
    val extra = Paths.get(dir, "zz_extra.parquet")
    Files.copy(
      Files.list(Paths.get(dir)).filter(_.toString.endsWith(".parquet")).findFirst.get,
      extra)
    // strictly later than the first wave, but NOT in the future — the
    // settle-lag cutoff would (correctly) hold back a future mtime
    extra.toFile.setLastModified(System.currentTimeMillis())

    val second = runOnce()
    val newOnes = second.diff(first)
    assert(newOnes === Seq("zz_extra.parquet"),
      s"expected only the new file, got $newOnes (all: $second)")
  }

  test("spanify caps span count but still covers the whole file") {
    val huge = FileSlice("file:/x/huge.parquet", "huge.parquet", 3L * 1024 * 1024 * 1024, 0L, Map.empty)
    val spans = MetaScan.spanify(Seq(huge), MetaLevel.ParquetPage, spanBytes = 1L)
    assert(spans.length === (1 << 20)) // capped, not overflowed to zero
    assert(spans.head.lo === 0L)
    assert(spans.last.hi === Long.MaxValue) // final span covers the tail
    // non-page levels never split
    assert(MetaScan.spanify(Seq(huge), MetaLevel.ParquetColumn, 1L).length === 1)
  }

  test("latestOffset never rewinds when the listing shrinks") {
    val dir = Files.createTempDirectory("graft_stream_mono").toString
    spark.range(0, 5).coalesce(1).write.mode("overwrite").parquet(dir)
    val table = MetaTable.resolve(Map("path" -> dir, "level" -> "file",
      "source" -> "parquet", "streamlagms" -> "0"))
    val stream = new MetaMicroBatchStream(table, table.schema())
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val all = ReadLimit.allAvailable()
    val first = stream.latestOffset(FileKeyOffset.Initial, all).asInstanceOf[FileKeyOffset]
    assert(FileKeyOffset.Initial.lessThan(first))
    // empty the directory: a transiently empty listing must not rewind
    Files.list(Paths.get(dir)).forEach(p => Files.delete(p))
    val second = stream.latestOffset(first, all).asInstanceOf[FileKeyOffset]
    assert(second === first)
  }

  test("maxfilespertrigger paces the backfill across batches") {
    val dir = Files.createTempDirectory("graft_stream_paced").toString
    val ckpt = Files.createTempDirectory("graft_paced_ckpt").toString
    val out = Files.createTempDirectory("graft_paced_out").toString
    spark.range(0, 40, 1, 4).write.mode("overwrite").parquet(dir) // 4 files
    val src = spark.readStream.format("metadata")
      .option("level", "file").option("source", "parquet")
      .option("streamlagms", "0").option("maxfilespertrigger", "1").load(dir)
    val q = src.select("filename").writeStream.format("parquet")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).option("path", out).start()
    q.awaitTermination(120000)
    q.stop()
    // all 4 files drained (across 4 rate-limited batches), none duplicated
    val names = spark.read.parquet(out).collect().map(_.getString(0)).sorted
    assert(names.length === 4, names.mkString(","))
    assert(names.distinct.length === 4)
  }

  test("streaming rowgroup level decodes footers of new files") {
    val dir = Files.createTempDirectory("graft_meta_stream_rg").toString
    val ckpt = Files.createTempDirectory("graft_meta_ckpt_rg").toString
    spark.range(0, 50).coalesce(1).write.mode("overwrite").parquet(dir)
    val src = spark.readStream.format("metadata")
      .option("level", "rowgroup").option("source", "parquet")
      .option("streamlagms", "0").load(dir)
    val q = src.writeStream.format("memory").queryName("meta_stream_rg")
      .outputMode("append").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt).start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("meta_stream_rg").select("num_rows").collect().map(_.getLong(0))
    assert(rows.sum === 50L)
  }
}
