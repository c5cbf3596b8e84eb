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

  test("streaming bloomfilter level emits bloom rows for newly arrived files") {
    val dir = Files.createTempDirectory("graft_bloom_stream").toString
    val ckpt = Files.createTempDirectory("graft_bloom_stream_c").toString
    val out = Files.createTempDirectory("graft_bloom_stream_o").toString
    def writeWave(path: String): Unit =
      spark.range(0, 300).coalesce(1).write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#id", "true")
        .option("parquet.enable.dictionary#id", "false")
        .parquet(path)
    writeWave(dir)

    def runOnce(): Seq[(String, String)] = {
      val src = spark.readStream.format("metadata")
        .option("level", "bloomfilter").option("source", "parquet")
        .option("streamlagms", "0").load(dir)
      val q = src.select("filepath", "path").writeStream.format("parquet")
        .outputMode("append").trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt).option("path", out).start()
      q.awaitTermination(60000)
      q.stop()
      spark.read.parquet(out).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    }

    val first = runOnce()
    assert(first.nonEmpty && first.forall(_._2 == "id"),
      s"expected bloom rows for 'id', got $first")

    val extra = Paths.get(dir, "zz_wave2.parquet")
    Files.copy(
      Files.list(Paths.get(dir)).filter(_.toString.endsWith(".parquet")).findFirst.get,
      extra)
    extra.toFile.setLastModified(System.currentTimeMillis())
    val second = runOnce()
    val newOnes = second.diff(first)
    assert(newOnes.map(_._1).forall(_.endsWith("zz_wave2.parquet")) && newOnes.nonEmpty,
      s"expected only the new file's bloom rows, got $newOnes")
  }

  test("restart from checkpoint never re-emits at or below the committed offset") {
    // the documented append-only caveat (MetaMicroBatchStream snapshot
    // comment): after a restart recovers the committed offset from the
    // checkpoint, files whose (mtime, path) key is at or below it must not
    // be replayed — including a file that ARRIVES backdated after the first
    // run — while strictly-later arrivals still flow.
    val dir = Files.createTempDirectory("graft_stream_ckpt").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt_c").toString
    val out = Files.createTempDirectory("graft_stream_ckpt_o").toString
    spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)

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
    val dataFile = Files.list(Paths.get(dir))
      .filter(_.toString.endsWith(".parquet")).findFirst.get
    val committedMtime = dataFile.toFile.lastModified()

    // an identical restart with nothing new emits nothing
    val idle = runOnce()
    assert(idle.sorted === first.sorted,
      s"restart with no new files re-emitted: ${idle.diff(first)}")

    // a BACKDATED arrival (key below the committed offset) is not replayed
    val backdated = Paths.get(dir, "aa_backdated.parquet")
    Files.copy(dataFile, backdated)
    assert(backdated.toFile.setLastModified(committedMtime - 60000L))
    val afterBackdate = runOnce()
    assert(afterBackdate.sorted === first.sorted,
      s"backdated file was replayed: ${afterBackdate.diff(first)}")

    // a strictly later arrival still flows, exactly once
    val fresh = Paths.get(dir, "zz_fresh.parquet")
    Files.copy(dataFile, fresh)
    assert(fresh.toFile.setLastModified(System.currentTimeMillis()))
    val afterFresh = runOnce()
    assert(afterFresh.diff(first) === Seq("zz_fresh.parquet"),
      s"expected exactly the fresh file, got ${afterFresh.diff(first)}")
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
