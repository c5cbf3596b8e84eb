package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import org.scalatest.funsuite.AnyFunSuite

/**
 * The Puffin codec against the PUBLIC spec: footer framing (magics,
 * payload size, compression flag), the deletion-vector-v1 blob (BE
 * length word + DV magic + roaring64 vector + CRC-32), and the 64-bit
 * sparse-bucket roaring serialization. Every corruption class must
 * REFUSE — a half-read deletion vector resurrects deleted rows.
 */
class PuffinCodecSpec extends AnyFunSuite {

  private val conf = new Configuration()

  private def tmpFile(name: String): java.io.File =
    new java.io.File(Files.createTempDirectory("graft_puffin").toFile, name)

  test("roaring64 portable roundtrip: sparse buckets, high positions") {
    // three buckets: 0, 7, and a genuinely 64-bit one (pos >= 2^33) —
    // the sparse-key framing Iceberg uses where Delta's is dense
    val positions = Array(0L, 1L, 65535L, 65536L, 131072L,
      (7L << 32) + 5L, (7L << 32) + 100000L,
      (1L << 33) + 42L).sorted
    val bytes = PuffinCodec.encodeRoaring64Portable(positions)
    assert(PuffinCodec.decodeRoaring64Portable(bytes).toSeq === positions.toSeq)
  }

  test("roaring64 refuses non-increasing bucket keys and truncation") {
    val bytes = PuffinCodec.encodeRoaring64Portable(
      Array(1L, (1L << 32) + 2L))
    // flip the second bucket key to equal the first (both 0 → not
    // strictly increasing); the key of bucket 2 sits right after
    // bucket 1's container bytes — easier: corrupt the count upward
    val grown = ByteBuffer.wrap(bytes.clone()).order(ByteOrder.LITTLE_ENDIAN)
    grown.putLong(0, 3L) // claims 3 buckets, payload has 2
    val e1 = intercept[IllegalArgumentException](
      PuffinCodec.decodeRoaring64Portable(grown.array()))
    assert(e1.getMessage.contains("truncated"))
    val e2 = intercept[IllegalArgumentException](
      PuffinCodec.decodeRoaring64Portable(Array[Byte](1, 2, 3)))
    assert(e2.getMessage.contains("too short"))
  }

  test("puffin file roundtrip: footer blobs, DV blob decode") {
    val f = tmpFile("t.puffin")
    val dv0 = Array(1L, 3L, 5L)
    val dv1 = Array(0L, 2L, 65536L)
    val spans = PuffinCodec.writePuffinFile(f, Seq(
      (PuffinCodec.DeletionVectorV1, Map("cardinality" -> "3"),
        PuffinCodec.encodeDvBlob(dv0)),
      (PuffinCodec.DeletionVectorV1, Map("cardinality" -> "3"),
        PuffinCodec.encodeDvBlob(dv1))))
    assert(spans.length === 2)
    val p = new Path(f.getAbsolutePath)
    val (blobs, props) = PuffinCodec.readFooter(p, conf)
    assert(blobs.length === 2)
    assert(blobs.forall(_.blobType === PuffinCodec.DeletionVectorV1))
    assert(blobs.map(b => (b.offset, b.length)) === spans)
    assert(props.get("created-by").contains("graft-fixture"))
    assert(PuffinCodec.readDvBlob(p, conf, spans(0)._1, spans(0)._2).toSeq
      === dv0.toSeq)
    assert(PuffinCodec.readDvBlob(p, conf, spans(1)._1, spans(1)._2).toSeq
      === dv1.toSeq)
  }

  test("DV blob refuses CRC mismatch, magic mismatch, bad length word") {
    val f = tmpFile("c.puffin")
    val dv = Array(1L, 3L, 5L)
    val spans = PuffinCodec.writePuffinFile(f, Seq(
      (PuffinCodec.DeletionVectorV1, Map.empty[String, String],
        PuffinCodec.encodeDvBlob(dv))))
    val (off, len) = spans.head
    val p = new Path(f.getAbsolutePath)
    // corrupt one vector byte inside the blob → CRC disagreement
    val bytes = Files.readAllBytes(f.toPath)
    val corrupted = bytes.clone()
    corrupted((off + 10).toInt) = (corrupted((off + 10).toInt) ^ 0x7F).toByte
    Files.write(f.toPath, corrupted)
    val e1 = intercept[IllegalArgumentException](
      PuffinCodec.readDvBlob(p, conf, off, len))
    assert(e1.getMessage.contains("checksum"))
    // magic bytes corrupted
    val badMagic = bytes.clone()
    badMagic((off + 4).toInt) = 0x00
    Files.write(f.toPath, badMagic)
    val e2 = intercept[IllegalArgumentException](
      PuffinCodec.readDvBlob(p, conf, off, len))
    assert(e2.getMessage.contains("magic"))
    // a wrong span length disagrees with the blob's own length word
    Files.write(f.toPath, bytes)
    val e3 = intercept[IllegalArgumentException](
      PuffinCodec.readDvBlob(p, conf, off, len + 4))
    assert(e3.getMessage.contains("length word"))
  }

  test("footer refuses malformed frames and foreign magics") {
    val f = tmpFile("z.puffin")
    PuffinCodec.writePuffinFile(f, Seq(
      (PuffinCodec.DeletionVectorV1, Map.empty[String, String],
        PuffinCodec.encodeDvBlob(Array(1L)))))
    val bytes = Files.readAllBytes(f.toPath)
    val p = new Path(f.getAbsolutePath)
    // footer flag bit 0 claims an LZ4 payload over plain JSON bytes —
    // the decode must refuse the malformed frame, never misread offsets
    val flagged = bytes.clone()
    flagged(bytes.length - 8) = 0x1
    Files.write(f.toPath, flagged)
    val e1 = intercept[IllegalArgumentException](
      PuffinCodec.readFooter(p, conf))
    assert(e1.getMessage.contains("malformed lz4"))
    // head magic broken
    val badHead = bytes.clone()
    badHead(0) = 0x00
    Files.write(f.toPath, badHead)
    val e2 = intercept[IllegalArgumentException](
      PuffinCodec.readFooter(p, conf))
    assert(e2.getMessage.contains("head magic"))
    // trailing magic broken
    val badTail = bytes.clone()
    badTail(bytes.length - 1) = 0x00
    Files.write(f.toPath, badTail)
    val e3 = intercept[IllegalArgumentException](
      PuffinCodec.readFooter(p, conf))
    assert(e3.getMessage.contains("trailing magic"))
    // too short to be a Puffin file at all
    Files.write(f.toPath, Array[Byte](0x50, 0x46, 0x41, 0x31, 0, 0))
    val e4 = intercept[IllegalArgumentException](
      PuffinCodec.readFooter(p, conf))
    assert(e4.getMessage.contains("too short"))
    // RESERVED flag bits (anything beyond byte0/bit0) refuse — a
    // future flag may change the payload framing and misplace blobs
    val reserved = bytes.clone()
    reserved(bytes.length - 7) = 0x4 // flags byte 1
    Files.write(f.toPath, reserved)
    val e5 = intercept[UnsupportedOperationException](
      PuffinCodec.readFooter(p, conf))
    assert(e5.getMessage.contains("reserved flag bits"))
  }

  test("compressed blobs and lz4 footers decode; bombs and junk refuse") {
    val p = new Path("/x")
    val body = PuffinCodec.encodeThetaSketchExact(123L)
    // zstd + lz4 blob roundtrip through the public codec names
    Seq("zstd", "lz4").foreach { c =>
      val stored = PuffinCodec.compressBlob(Some(c), body)
      assert(!stored.sameElements(body))
      assert(PuffinCodec.decompressBlob(p, Some(c), stored)
        .sameElements(body))
    }
    // absent codec = verbatim; unknown codec refuses
    assert(PuffinCodec.decompressBlob(p, None, body).sameElements(body))
    val eUnk = intercept[UnsupportedOperationException](
      PuffinCodec.decompressBlob(p, Some("brotli"), body))
    assert(eUnk.getMessage.contains("not a spec codec"))
    // junk bytes under a real codec name refuse as malformed
    intercept[IllegalArgumentException](
      PuffinCodec.decompressBlob(p, Some("zstd"), Array[Byte](1, 2, 3)))
    // a decompression bomb (256 MB of zeros) hits the size cap
    val bomb = PuffinCodec.compressBlob(
      Some("zstd"), Array.fill[Byte](256 << 20)(0))
    assert(bomb.length < (1 << 20)) // it really is a bomb
    val eBomb = intercept[IllegalArgumentException](
      PuffinCodec.decompressBlob(p, Some("zstd"), bomb))
    assert(eBomb.getMessage.contains("bomb"))
    // full-file roundtrip: zstd blobs + lz4-frame footer
    val f = tmpFile("zc.puffin")
    val spans = PuffinCodec.writePuffinFile(f, Seq(
      (PuffinCodec.ThetaV1, Map("ndv" -> "123"), body)),
      codecPerBlob = Seq(Some("zstd")), lz4Footer = true)
    val (blobs, _) = PuffinCodec.readFooter(new Path(f.getAbsolutePath), conf)
    assert(blobs.head.compressionCodec === Some("zstd"))
    assert(blobs.head.length === spans.head._2)
    val est = PuffinCodec.thetaEstimate(
      PuffinCodec.decompressBlob(new Path(f.getAbsolutePath),
        blobs.head.compressionCodec,
        PuffinCodec.readBlobBytes(new Path(f.getAbsolutePath), conf,
          blobs.head.offset, blobs.head.length)))
    assert(math.round(est) === 123L)
  }

  test("compact-theta estimate: empty, exact, single-item, estimation, refusals") {
    import java.nio.{ByteBuffer, ByteOrder}
    // empty -> 0
    assert(PuffinCodec.thetaEstimate(PuffinCodec.encodeThetaSketchExact(0L)) === 0.0)
    // exact mode: estimate IS the retained count
    assert(PuffinCodec.thetaEstimate(PuffinCodec.encodeThetaSketchExact(1L)) === 1.0)
    assert(PuffinCodec.thetaEstimate(PuffinCodec.encodeThetaSketchExact(437L)) === 437.0)
    // the library's single-item form: preLongs=1, not empty, the
    // SINGLEITEM flag (0x20) set, 16 bytes
    val single = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    single.put(1.toByte).put(3.toByte).put(3.toByte).put(20.toByte)
      .put(0.toByte).put((2 | 8 | 16 | 32).toByte).putShort(0x93CC.toShort)
    single.putLong(12345L)
    assert(PuffinCodec.thetaEstimate(single.array()) === 1.0)
    // a preLongs-1, non-empty buffer WITHOUT the SINGLEITEM flag is
    // not a form this decoder knows — refuse, never guess 1.0
    val notSingle = single.array().clone()
    notSingle(5) = (2 | 8 | 16).toByte
    val eSingle = intercept[UnsupportedOperationException](
      PuffinCodec.thetaEstimate(notSingle))
    assert(eSingle.getMessage.contains("SINGLEITEM"))
    // estimation mode: preLongs=3, theta = 1/2 -> estimate doubles
    val est = ByteBuffer.allocate(24 + 16).order(ByteOrder.LITTLE_ENDIAN)
    est.put(3.toByte).put(3.toByte).put(3.toByte).put(12.toByte)
      .put(0.toByte).put((2 | 8 | 16).toByte).putShort(0x93CC.toShort)
    est.putInt(2).putFloat(1.0f)
    est.putLong(Long.MaxValue / 2 + 1) // thetaLong = 2^62 -> theta 0.5
    est.putLong(11L).putLong(22L)
    assert(math.abs(PuffinCodec.thetaEstimate(est.array()) - 4.0) < 1e-9)
    // wrong serial version / family / truncation refuse
    val badVer = PuffinCodec.encodeThetaSketchExact(3L); badVer(1) = 2
    val e1 = intercept[UnsupportedOperationException](
      PuffinCodec.thetaEstimate(badVer))
    assert(e1.getMessage.contains("serial version"))
    val badFam = PuffinCodec.encodeThetaSketchExact(3L); badFam(2) = 2
    val e2 = intercept[UnsupportedOperationException](
      PuffinCodec.thetaEstimate(badFam))
    assert(e2.getMessage.contains("family"))
    val e3 = intercept[IllegalArgumentException](
      PuffinCodec.thetaEstimate(Array[Byte](1, 3, 3)))
    assert(e3.getMessage.contains("truncated"))
    // non-positive theta refuses
    val badTheta = est.array().clone()
    ByteBuffer.wrap(badTheta).order(ByteOrder.LITTLE_ENDIAN).putLong(16, 0L)
    val e4 = intercept[IllegalArgumentException](
      PuffinCodec.thetaEstimate(badTheta))
    assert(e4.getMessage.contains("thetaLong"))
  }
}
