package graft.meta

import java.io.File

import org.apache.spark.sql.DataFrame

/**
 * Crash-safe increment publishing for the streaming row-level stores
 * (delta change feed, iceberg changelog, hudi increments). The stores
 * derive their progress from directory NAMES (`feed_<from>_<to>`,
 * `inc_<ts>_<snap>`, `inc_<instant>`), so a crash mid-write must never
 * leave a directory whose name claims a completed increment — the
 * reader and the next maintenance pass both trust names, and a
 * partially-written increment would silently drop change rows forever.
 * Increments therefore write to a dot-prefixed temp dir and RENAME
 * into place; stale temp dirs from crashed attempts are swept on the
 * next pass. Rename atomicity is the store contract: a local or
 * HDFS-like rename-capable filesystem (object stores without atomic
 * rename need a manifest-commit layer instead).
 */
object StoreIO {

  /** Write `df` as one parquet increment under `store/name`, via a
    * temp dir + rename. Idempotent: a re-delivered increment replaces
    * the prior same-named one whole — and crash-safe even ON
    * redelivery (r17 ADVICE): the existing destination is renamed
    * ASIDE (a dot-prefixed `.old_` name, invisible to the `inc_*`
    * globs and swept later), not deleted, before the new rename — so
    * no crash point leaves the already-published increment name
    * missing; a crash between the two renames is repaired by
    * [[sweepTemp]] on the next pass, which restores the aside when no
    * replacement landed. */
  /** Run the given per-increment publishes CONCURRENTLY (independent
    * Spark jobs overlap instead of queuing behind each other's task
    * tails). Only for increments whose content derives from the TABLE
    * alone (the hudi windowed increments): each lands in its own keyed
    * subdir via temp+rename, and a crash that published a later instant
    * before an earlier one is repaired by the store-side seen-filter on
    * redelivery — the missing instant's window does not depend on the
    * store. NOT for walks whose resume point is the last PUBLISHED
    * increment (the iceberg changelog walk stays sequential). */
  def publishConcurrently[T](items: Seq[T])(publish: T => Unit): Unit =
    items match {
      case Seq() => ()
      case Seq(one) => publish(one)
      case many =>
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        val fs = many.tail.map(i =>
          Future(publish(i))(scala.concurrent.ExecutionContext.global))
        publish(many.head)
        fs.foreach(Await.result(_, Duration.Inf))
    }

  def publishIncrement(df: DataFrame, store: File, name: String): Unit = {
    store.mkdirs()
    val tmp = new File(store, s".tmp_$name")
    org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val dst = new File(store, name)
    val aside = new File(store, s".old_$name")
    org.apache.commons.io.FileUtils.deleteQuietly(aside)
    if (dst.exists() && !dst.renameTo(aside)) {
      throw new IllegalStateException(
        s"$store: could not stage prior increment '$name' aside — " +
          "rename failed; the store filesystem must support atomic rename")
    }
    if (!tmp.renameTo(dst)) {
      // restore the prior increment rather than leaving a gap
      if (aside.exists()) aside.renameTo(dst)
      throw new IllegalStateException(
        s"$store: could not publish increment '$name' — rename failed; " +
          "the store filesystem must support atomic rename")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(aside)
  }

  /** Remove crashed-attempt temp dirs, and REPAIR a crash that fell
    * between [[publishIncrement]]'s two renames: a `.old_<name>`
    * aside whose `<name>` is missing is the still-valid prior
    * increment — restore it; an aside whose replacement landed is
    * garbage — drop it. (Safe concurrently with reads: dot-prefixed
    * names are invisible to the `feed_*`/`inc_*` globs.) */
  def sweepTemp(store: File): Unit = {
    val all = Option(store.listFiles()).getOrElse(Array.empty)
    all.filter(f => f.isDirectory && f.getName.startsWith(".tmp_"))
      .foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    all.filter(f => f.isDirectory && f.getName.startsWith(".old_"))
      .foreach { aside =>
        val dst = new File(store, aside.getName.stripPrefix(".old_"))
        if (dst.exists()) org.apache.commons.io.FileUtils.deleteQuietly(aside)
        else if (!aside.renameTo(dst)) {
          throw new IllegalStateException(
            s"$store: could not restore increment '${dst.getName}' from " +
              "its crash-staged aside — rename failed")
        }
      }
  }

  /** The `(a, b)` pairs of every `<prefix>_<a>_<b>` increment dir.
    * STRICT: a dir that starts with the prefix but does not parse
    * refuses loudly — a foreign or garbled name must not silently
    * change what "already fed" means (and must not crash an unguarded
    * split either). Hidden (dot-prefixed) names are skipped. */
  def parsePairs(store: File, prefix: String): Seq[(Long, Long)] = {
    val re = ("^" + java.util.regex.Pattern.quote(prefix) +
      "_(\\d+)_(\\d+)$").r
    names(store, prefix).map {
      case re(a, b) => (a.toLong, b.toLong)
      case other => throw new IllegalStateException(
        s"$store: unparseable increment dir '$other' — refusing " +
          "rather than mis-reading the feed state")
    }
  }

  /** The single-value ids of every `<prefix>_<id>` increment dir,
    * same strictness as [[parsePairs]]. */
  def parseIds(store: File, prefix: String): Seq[String] = {
    val re = ("^" + java.util.regex.Pattern.quote(prefix) + "_(\\d+)$").r
    names(store, prefix).map {
      case re(id) => id
      case other => throw new IllegalStateException(
        s"$store: unparseable increment dir '$other' — refusing " +
          "rather than mis-reading the feed state")
    }
  }

  private def names(store: File, prefix: String): Seq[String] =
    Option(store.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .map(_.getName)
      .filter(n => !n.startsWith(".") && n.startsWith(prefix + "_"))
      .toSeq
}
