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

  /** Test hook. */
  private[meta] def clear(): Unit = cache.synchronized(cache.clear())
  private[meta] def entries: Int = cache.synchronized(cache.size())
}
