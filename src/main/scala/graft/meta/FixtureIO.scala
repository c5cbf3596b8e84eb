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
}
