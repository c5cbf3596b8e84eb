package graft.meta

import org.apache.spark.sql.DataFrame

/** Shared fixture plumbing: writing one deterministic single-file
  * parquet is a six-step dance (coalesce(1) to a temp dir, find the
  * part file, copy to the named destination, clean up) that every
  * fixture writer needs — one home so a writer gotcha is fixed once. */
private[meta] object FixtureIO {

  /** Write `df` as exactly ONE parquet file at `dst`; returns the row
    * count. `tmpDir` must be caller-unique (fixture dirs derive it from
    * their own root so concurrent fixtures never collide).
    *
    * The count comes from the written file's own footer, not a second
    * `df.count()` job: the count action re-ran the slice's whole plan
    * from source — one extra Spark job per fixture slice, ~40 call
    * sites across the lake builders — for a number the footer already
    * states about exactly the bytes the fixture will serve. */
  def writeSingleParquet(
      df: DataFrame, dst: java.io.File, tmpDir: String): Long = {
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val part = new java.io.File(tmpDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpDir))
    parquetRowCount(dst)
  }

  /** Write `sliceExpr`-keyed slices 0..n-1 of `df` in ONE Spark job —
    * each slice exactly one parquet file, moved to `dst(i)` — and
    * return (i -> row count) from the written footers. Rows within a
    * slice come out ascending by the frame's FIRST column (the
    * builders' slice key order); `partitionBy` requires the slice id
    * as a column, `repartition(n, key)` pins each slice to one task
    * so each slice directory holds exactly one part file. */
  def writeSlices(
      df: DataFrame, sliceExpr: org.apache.spark.sql.Column, n: Int,
      tmpBase: String, dst: Int => java.io.File,
      dropCols: Seq[String] = Nil): Map[Int, Long] = {
    import org.apache.spark.sql.functions.col
    val tmp = tmpBase + "_slices"
    val firstCol = df.columns.head
    // Sort by the FULL required ordering of the dynamic-partition write
    // (partition columns first): sorting by firstCol alone does not
    // satisfy it, so Spark would insert its own sort by __slice(+dropCols)
    // on top, and within-slice firstCol order would then rest on that
    // sort staying in-memory/stable — it can scramble on spill. With the
    // partition columns leading, this sort IS the required ordering and
    // within-slice firstCol order is guaranteed (POSITION-critical for
    // the iceberg MOR fixture's f0).
    df.withColumn("__slice", sliceExpr)
      .repartition(n, col("__slice"))
      .sortWithinPartitions(
        (col("__slice") +: dropCols.map(col)) :+ col(firstCol): _*)
      .write.partitionBy("__slice" +: dropCols: _*)
      .mode("overwrite").parquet(tmp)
    def partsUnder(d: java.io.File): Array[java.io.File] = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
      fs.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        fs.filter(_.isDirectory).flatMap(partsUnder)
    }
    val counts = (0 until n).map { i =>
      val parts = partsUnder(new java.io.File(tmp, s"__slice=$i"))
      if (parts.isEmpty) {
        // an empty slice emits NO __slice=i directory under partitionBy;
        // the old per-slice path wrote a valid empty parquet file — keep
        // that contract instead of crashing on sparse slice keys
        val empty = df.filter(org.apache.spark.sql.functions.lit(false))
          .drop(dropCols: _*)
        i -> writeSingleParquet(empty, dst(i), tmpBase + s"_empty$i")
      } else {
        require(parts.length == 1,
          s"slice $i: expected exactly one part file, got ${parts.length}")
        java.nio.file.Files.copy(parts.head.toPath, dst(i).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        i -> parquetRowCount(dst(i))
      }
    }.toMap
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    counts
  }

  /** Total row count from a local parquet file's footer (driver-side,
    * no Spark job). */
  def parquetRowCount(file: java.io.File): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.getPath),
      new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** Delete a fixture root if present and REFUSE loudly when residue
    * survives: a fixture written over leftovers from a prior run can
    * rows-match but hash-mismatch its oracle — the one failure shape
    * indistinguishable from engine wrongness in the artifact. */
  def freshDir(dir: java.io.File): Unit = {
    if (dir.exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      require(!dir.exists(),
        s"fixture dir $dir survived cleanup; refusing to write over residue")
    }
  }
}
