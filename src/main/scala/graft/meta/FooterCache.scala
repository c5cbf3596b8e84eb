package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * Executor-local decoded-footer cache, keyed by (path, size, mtime) so any
 * rewrite of a file invalidates its entry naturally. Metadata exploration
 * hits the same footers repeatedly (file level, then rowgroup, then column,
 * then page — four decodes of identical bytes per file); with the cache the
 * first query pays the 2 targeted reads + Thrift decode and the rest are
 * memory lookups. Bounded LRU (footers are small — a few KB to ~100 KB for
 * very wide tables), JVM-wide so all tasks of all queries share it.
 *
 * The reference engine deliberately re-reads footers every query; this is a
 * strict improvement enabled by default and disabled with
 * `.option("footercache", "false")` (e.g. for measuring raw decode cost).
 *
 * Coherence window: the key cannot distinguish a file REWRITTEN IN PLACE
 * with identical byte size within one mtime granule (coarse-mtime
 * filesystems report second granularity), so such a rewrite can serve the
 * stale decoded footer until eviction. That combination — same path, same
 * size, same mtime, different bytes — does not occur under the append-only
 * table layouts this source targets; callers who rewrite in place can
 * `.option("footercache", "false")` or call [[invalidate]]. A content
 * fingerprint (etag/checksum) would close the window exactly, but Hadoop's
 * `FileStatus` does not carry one portably.
 */
object FooterCache {
  private val MaxEntries = 256

  private case class Key(path: String, size: Long, mtime: Long)

  private val cache =
    new java.util.LinkedHashMap[Key, FooterInfo](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Key, FooterInfo]): Boolean = size() > MaxEntries
    }

  def get(f: FileSlice, conf: Configuration, enabled: Boolean): FooterInfo = {
    if (!enabled) return Footers.read(new Path(f.path), conf, Some(f.size))
    val key = Key(f.path, f.size, f.mtime)
    val hit = cache.synchronized(cache.get(key))
    if (hit != null) {
      hit
    } else {
      val footer = Footers.read(new Path(f.path), conf, Some(f.size))
      cache.synchronized(cache.put(key, footer))
      footer
    }
  }

  /** Drop every cached footer for `path` (any size/mtime): the escape hatch
    * for in-place rewrites inside the mtime coherence window. */
  def invalidate(path: String): Unit = cache.synchronized {
    cache.keySet.removeIf(_.path == path)
  }

  /** Test hook. */
  private[meta] def clear(): Unit = cache.synchronized(cache.clear())
  private[meta] def entries: Int = cache.synchronized(cache.size())
}
