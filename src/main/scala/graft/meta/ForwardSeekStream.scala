package graft.meta

import java.io.{EOFException, IOException, InputStream}

import org.apache.hadoop.fs.Seekable

/**
 * Read-ahead buffer over a seekable input stream, designed for remote object
 * stores where each positioned read is a round trip: reads are served from a
 * large in-memory window, seeks are forward-only and *lazy* — a seek only
 * moves a logical cursor, so a seek that lands inside the buffered window
 * costs nothing and a seek past it is folded into the next refill.
 *
 * Counters `underlyingReads` / `underlyingSeeks` expose how many calls
 * actually reached the wrapped stream (for tests and I/O accounting).
 *
 * Equivalent role to the reference's buffered remote stream
 * (reference: src/main/scala/com/github/sadikovi/metadata/RemoteInputStream.scala:16-168),
 * re-designed around a lazy cursor instead of eager seeks.
 */
class ForwardSeekStream(underlying: InputStream with Seekable, capacity: Int)
    extends InputStream with Seekable {
  require(capacity > 0, s"Buffer capacity must be positive, got $capacity")

  private val window = new Array[Byte](capacity)
  // File offset of window(0) and number of valid bytes in the window.
  private var windowStart: Long = 0L
  private var windowLen: Int = 0
  // Logical cursor (what getPos reports); may be ahead of the window.
  private var cursor: Long = 0L
  private var closed = false

  private var reads: Long = 0L
  private var seeks: Long = 0L

  /** Number of read calls issued to the wrapped stream. */
  def underlyingReads: Long = reads

  /** Number of seek calls issued to the wrapped stream. */
  def underlyingSeeks: Long = seeks

  private def ensureOpen(): Unit =
    if (closed) throw new IOException("Stream is closed")

  /** True if the cursor currently points inside the buffered window. */
  private def inWindow: Boolean =
    cursor >= windowStart && cursor < windowStart + windowLen

  /**
   * Refill the window starting at the cursor. Returns false on EOF.
   * Only here do we touch the wrapped stream; if the wrapped stream's
   * position already equals the cursor the seek is skipped.
   */
  private def refill(): Boolean = {
    val wrappedPos = windowStart + windowLen
    if (wrappedPos != cursor) {
      underlying.seek(cursor)
      seeks += 1
    }
    windowStart = cursor
    windowLen = 0
    val n = underlying.read(window, 0, capacity)
    reads += 1
    if (n <= 0) false
    else {
      windowLen = n
      true
    }
  }

  override def read(): Int = {
    ensureOpen()
    if (!inWindow && !refill()) return -1
    val b = window((cursor - windowStart).toInt) & 0xff
    cursor += 1
    b
  }

  override def read(dst: Array[Byte], off: Int, len: Int): Int = {
    ensureOpen()
    if (len == 0) return 0
    if (!inWindow && !refill()) return -1
    val avail = (windowStart + windowLen - cursor).toInt
    val n = math.min(avail, len)
    System.arraycopy(window, (cursor - windowStart).toInt, dst, off, n)
    cursor += n
    n
  }

  /** Read exactly `len` bytes or throw [[EOFException]]. */
  def readFully(dst: Array[Byte], off: Int, len: Int): Unit = {
    var done = 0
    while (done < len) {
      val n = read(dst, off + done, len - done)
      if (n < 0) {
        throw new EOFException(s"Reached EOF after $done of $len bytes")
      }
      done += n
    }
  }

  override def seek(target: Long): Unit = {
    ensureOpen()
    if (target < cursor) {
      throw new IOException(s"Backward seek not supported: $target < $cursor")
    }
    // Lazy: in-window seeks are free, past-window seeks are deferred to refill
    cursor = target
  }

  override def getPos: Long = cursor

  override def seekToNewSource(targetPos: Long): Boolean = false

  override def available(): Int = {
    ensureOpen()
    if (inWindow) (windowStart + windowLen - cursor).toInt else 0
  }

  override def close(): Unit = {
    if (!closed) {
      closed = true
      underlying.close()
    }
  }
}
