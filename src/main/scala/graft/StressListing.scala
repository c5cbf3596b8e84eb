package graft

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

import graft.meta.MetaTable

/**
 * Many-file LISTING stress — the million-file posture check: N tiny
 * files (default 100,000) across 500 hive-style `shard=<i>/`
 * partition directories, listed through BOTH modes:
 *
 *   1. `listmode=sharded` — the iterator walk (no InMemoryFileIndex,
 *      no FileStatusCache)
 *   2. `listmode=index`   — the default InMemoryFileIndex path
 *
 * each timed with RETAINED driver heap measured around it (GC-settled
 * used-heap delta while the result — and, for index mode, the session
 * file-status cache — is still alive). Both modes must agree on an
 * order-insensitive digest of (path, size, partition values); the
 * sharded listing then drives a real end-to-end metadata scan whose
 * row count must equal N. A digest mismatch or count mismatch exits
 * non-zero.
 *
 * Usage: runMain graft.StressListing [nFiles] [dir]
 */
object StressListing {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(100000)
    val dir = if (args.length > 1) args(1) else "/tmp/graft_stress_listing"
    val nShards = 500

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-stress-listing")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = new java.io.File(dir)
    val perShard = nFiles / nShards
    if (!root.exists() || root.listFiles() == null ||
        root.listFiles().count(_.getName.startsWith("shard=")) != nShards) {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
      // listing cost is about file COUNT, not content: 8 raw bytes per
      // file (sniffs as source=file; the file level reads no content)
      val payload = "GRFTDATA".getBytes("UTF-8")
      var s = 0
      while (s < nShards) {
        val d = new java.io.File(root, s"shard=$s")
        d.mkdirs()
        var i = 0
        while (i < perShard) {
          java.nio.file.Files.write(
            new java.io.File(d, s"f$i.bin").toPath, payload)
          i += 1
        }
        s += 1
      }
    }

    val rt = Runtime.getRuntime
    def usedHeap(): Long = {
      var i = 0
      while (i < 3) { System.gc(); Thread.sleep(150); i += 1 }
      rt.totalMemory() - rt.freeMemory()
    }
    /** Order-insensitive digest + count + byte total of a listing. */
    def summarize(files: Seq[graft.meta.FileSlice]): (Long, Long, Long) = {
      var digest = 0L
      var bytes = 0L
      files.foreach { f =>
        digest ^= (f.path + "|" + f.size + "|" +
          f.partition.toSeq.sorted.mkString(",")).hashCode.toLong
        bytes += f.size
      }
      (files.size.toLong, bytes, digest)
    }

    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root.getAbsolutePath)
      .getFileSystem(hconf).makeQualified(new Path(root.getAbsolutePath))

    // --- sharded: iterator walk, no index, no cache
    val h0 = usedHeap()
    val t0 = System.nanoTime()
    var sharded = MetaTable.listSlicesSharded(rootPath, hconf)
    val shardedSec = (System.nanoTime() - t0) / 1e9
    val shardedRetainedMb = (usedHeap() - h0) / (1024 * 1024)
    val shardedSummary = summarize(sharded)
    sharded = null

    // --- index: the default InMemoryFileIndex + FileStatusCache path
    val h1 = usedHeap()
    val t1 = System.nanoTime()
    var indexed = MetaTable.listSlices(spark, rootPath, Map.empty, fresh = false)
    val indexSec = (System.nanoTime() - t1) / 1e9
    // the session file-status cache is part of what the index path
    // RETAINS — measured alive, exactly as a long-lived driver holds it
    val indexRetainedMb = (usedHeap() - h1) / (1024 * 1024)
    val indexSummary = summarize(indexed)
    indexed = null

    val agree = shardedSummary == indexSummary

    // --- end-to-end: the sharded listing planning a real scan
    val t2 = System.nanoTime()
    val scanned = spark.read.format("metadata")
      .option("level", "file").option("source", "file")
      .option("listmode", "sharded").load(dir).count()
    val scanSec = (System.nanoTime() - t2) / 1e9

    println(
      s"""{"files":$nFiles,"shards":$nShards,""" +
        s""""sharded_sec":$shardedSec,"sharded_retained_mb":$shardedRetainedMb,""" +
        s""""index_sec":$indexSec,"index_retained_mb":$indexRetainedMb,""" +
        s""""modes_agree":$agree,"scan_rows":$scanned,"scan_sec":$scanSec}""")
    spark.stop()
    if (!agree || scanned != nFiles) sys.exit(1)
  }
}
