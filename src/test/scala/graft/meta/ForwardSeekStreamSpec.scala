package graft.meta

import java.io.{ByteArrayInputStream, EOFException, IOException, InputStream}

import org.apache.hadoop.fs.Seekable
import org.scalatest.funsuite.AnyFunSuite

/** In-memory seekable stream for unit-testing the buffered wrapper. */
class SeekableBytes(data: Array[Byte]) extends InputStream with Seekable {
  var pos = 0
  var readCalls = 0
  var seekCalls = 0
  override def read(): Int = {
    readCalls += 1
    if (pos >= data.length) -1 else { val b = data(pos) & 0xff; pos += 1; b }
  }
  override def read(dst: Array[Byte], off: Int, len: Int): Int = {
    readCalls += 1
    if (pos >= data.length) return -1
    val n = math.min(len, data.length - pos)
    System.arraycopy(data, pos, dst, off, n)
    pos += n
    n
  }
  override def seek(target: Long): Unit = { seekCalls += 1; pos = target.toInt }
  override def getPos: Long = pos
  override def seekToNewSource(t: Long): Boolean = false
}

class ForwardSeekStreamSpec extends AnyFunSuite {
  private def bytes(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)

  test("sequential read across buffer boundaries preserves content") {
    val data = bytes(10000)
    for (cap <- Seq(1, 3, 7, 64, 1000, 10000, 20000)) {
      val in = new ForwardSeekStream(new SeekableBytes(data), cap)
      val out = new Array[Byte](10000)
      in.readFully(out, 0, 10000)
      assert(out.toSeq === data.toSeq, s"capacity $cap")
      assert(in.read() === -1)
    }
  }

  test("single-byte reads match") {
    val data = bytes(100)
    val in = new ForwardSeekStream(new SeekableBytes(data), 7)
    val got = Iterator.continually(in.read()).takeWhile(_ >= 0).map(_.toByte).toSeq
    assert(got === data.toSeq)
  }

  test("in-buffer seek costs no underlying calls") {
    val data = bytes(1000)
    val raw = new SeekableBytes(data)
    val in = new ForwardSeekStream(raw, 1000)
    in.read()
    val readsAfterFill = in.underlyingReads
    in.seek(500)
    assert(in.read() === (data(500) & 0xff))
    assert(in.underlyingReads === readsAfterFill)
    assert(in.underlyingSeeks === 0)
  }

  test("far forward seek is folded into the next refill") {
    val data = bytes(10000)
    val in = new ForwardSeekStream(new SeekableBytes(data), 10)
    in.seek(9000)
    assert(in.getPos === 9000)
    assert(in.read() === (data(9000) & 0xff))
    assert(in.underlyingSeeks === 1)
  }

  test("backward seek fails") {
    val in = new ForwardSeekStream(new SeekableBytes(bytes(100)), 10)
    in.seek(50)
    in.read()
    intercept[IOException](in.seek(10))
  }

  test("seek to current position is a no-op") {
    val in = new ForwardSeekStream(new SeekableBytes(bytes(100)), 10)
    in.seek(20)
    in.seek(20)
    assert(in.getPos === 20)
  }

  test("readFully past EOF throws") {
    val in = new ForwardSeekStream(new SeekableBytes(bytes(10)), 4)
    val out = new Array[Byte](20)
    intercept[EOFException](in.readFully(out, 0, 20))
  }

  test("use after close fails") {
    val in = new ForwardSeekStream(new SeekableBytes(bytes(10)), 4)
    in.close()
    intercept[IOException](in.read())
    intercept[IOException](in.seek(5))
  }

  test("close is idempotent and closes underlying") {
    var closed = 0
    val raw = new SeekableBytes(bytes(10)) {
      override def close(): Unit = { closed += 1; super.close() }
    }
    val in = new ForwardSeekStream(raw, 4)
    in.close(); in.close()
    assert(closed === 1)
  }

  test("large sequential read uses few underlying reads") {
    val data = bytes(1 << 20)
    val raw = new SeekableBytes(data)
    val in = new ForwardSeekStream(raw, 1 << 18)
    val out = new Array[Byte](1 << 20)
    in.readFully(out, 0, out.length)
    assert(out.toSeq === data.toSeq)
    assert(in.underlyingReads <= 5)
    assert(in.underlyingSeeks === 0)
  }
}
