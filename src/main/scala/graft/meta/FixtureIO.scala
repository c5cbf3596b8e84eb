package graft.meta

import org.apache.spark.sql.DataFrame

/** Shared fixture plumbing: writing one deterministic single-file
  * parquet is a six-step dance (coalesce(1) to a temp dir, find the
  * part file, copy to the named destination, clean up) that every
  * fixture writer needs — one home so a writer gotcha is fixed once. */
private[meta] object FixtureIO {

  /** Write `df` as exactly ONE parquet file at `dst`; returns the row
    * count. `tmpDir` must be caller-unique (fixture dirs derive it from
    * their own root so concurrent fixtures never collide). */
  def writeSingleParquet(
      df: DataFrame, dst: java.io.File, tmpDir: String): Long = {
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir)
    val part = new java.io.File(tmpDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmpDir))
    df.count()
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
