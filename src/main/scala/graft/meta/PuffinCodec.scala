package graft.meta

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** One blob descriptor from a Puffin footer. Offsets are file-absolute;
  * `length` is the blob's stored byte length (after compression, were
  * any applied). */
case class PuffinBlobInfo(
    blobType: String,
    fields: Seq[Int],
    snapshotId: Option[Long],
    sequenceNumber: Option[Long],
    offset: Long,
    length: Long,
    compressionCodec: Option[String],
    properties: Map[String, String])

/**
 * PUFFIN codec — the Iceberg auxiliary-file format (public Puffin spec)
 * that format-v3 tables use to carry DELETION VECTORS (and statistics
 * sketches). Structure:
 *
 *  - file: `Magic("PFA1")  Blob*  Footer`
 *  - footer: `Magic  FooterPayload(JSON)  PayloadSize(4 LE)
 *    Flags(4)  Magic` — flag bit 0 of byte 0 marks an LZ4-FRAME
 *    compressed payload (decoded here, r17; `PayloadSize` counts the
 *    STORED bytes). Blob bodies may carry the spec's `lz4`/`zstd`
 *    `compression-codec` — [[decompressBlob]] undoes it with a
 *    size-capped streaming read (a crafted frame must refuse, not
 *    OOM).
 *  - `deletion-vector-v1` blob: `len(4 BE, = magic+vector bytes)
 *    Magic(D1 D3 39 64)  vector  CRC-32(4 BE, over magic+vector)` —
 *    the magic bytes are BY DESIGN the little-endian rendering of the
 *    Delta RoaringBitmapArray magic (1681511377), so Delta-written DVs
 *    are bit-compatible; the vector itself is the 64-bit roaring
 *    "portable" serialization: `u64 LE bucket count`, then per bucket
 *    `u32 LE high key` + one standard 32-bit roaring bitmap (decoded
 *    by the same container walk [[DvCodec]] uses — Iceberg's buckets
 *    carry EXPLICIT sparse keys where Delta's are dense/implicit,
 *    which is the one structural difference between the two formats).
 *
 * Every mismatch REFUSES (wrong magic, compressed footer, truncated
 * payload, CRC disagreement, foreign compression codec): a half-read
 * deletion vector silently resurrects deleted rows in every downstream
 * census. The reference engine stops at the parquet footer (reference:
 * src/main/scala/com/github/sadikovi/metadata/DefaultSource.scala);
 * this codec exists so the v3 Iceberg tier can subtract DV-deleted
 * rows instead of refusing the whole table.
 */
object PuffinCodec {

  val Magic: Array[Byte] = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  /** The DV blob framing magic — LE bytes of [[DvCodec.Magic]]. */
  val DvMagic: Array[Byte] =
    Array[Byte](0xD1.toByte, 0xD3.toByte, 0x39, 0x64)

  val DeletionVectorV1 = "deletion-vector-v1"

  private def jsonMapper = {
    // Jackson rides in with Spark; the footer payload is plain JSON
    new com.fasterxml.jackson.databind.ObjectMapper()
  }

  /** Read the footer: `(blobs, file properties)`. Verifies both file
    * magics and the footer's own; refuses a compressed footer payload. */
  def readFooter(path: Path, conf: Configuration): (Seq[PuffinBlobInfo], Map[String, String]) = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    if (len < 24) { // head magic + empty footer is already 4+4+0+4+4+4
      throw new IllegalArgumentException(
        s"$path: too short for a Puffin file ($len bytes)")
    }
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      if (!head.sameElements(Magic)) {
        throw new IllegalArgumentException(
          s"$path: not a Puffin file (head magic mismatch)")
      }
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val tb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = tb.getInt
      val flags = new Array[Byte](4)
      tb.get(flags)
      val trailMagic = new Array[Byte](4)
      tb.get(trailMagic)
      if (!trailMagic.sameElements(Magic)) {
        throw new IllegalArgumentException(
          s"$path: not a Puffin file (trailing magic mismatch)")
      }
      // flag bit 0 of byte 0: LZ4-FRAME-compressed footer payload (the
      // one codec the spec allows for footers) — decoded below
      val footerLz4 = (flags(0) & 0x1) != 0
      // every other flag bit is RESERVED: a future flag may change how
      // the payload is framed, and ignoring it misplaces every blob —
      // the exact hazard this codec exists to refuse
      if ((flags(0) & 0xFE) != 0 || flags(1) != 0 || flags(2) != 0 ||
          flags(3) != 0) {
        throw new UnsupportedOperationException(
          s"$path: Puffin footer sets reserved flag bits " +
            flags.map(b => f"$b%02x").mkString("[", " ", "]") +
            " — unknown semantics; refusing rather than misreading")
      }
      if (payloadSize < 0 || 12L + 4L + payloadSize + 4L > len) {
        throw new IllegalArgumentException(
          s"$path: Puffin footer payload size $payloadSize out of range")
      }
      val payloadStart = len - 12 - payloadSize
      val fmagic = new Array[Byte](4)
      in.readFully(payloadStart - 4, fmagic)
      if (!fmagic.sameElements(Magic)) {
        throw new IllegalArgumentException(
          s"$path: Puffin footer start magic mismatch")
      }
      val stored = new Array[Byte](payloadSize)
      in.readFully(payloadStart, stored)
      val payload =
        if (footerLz4) decompressBlob(path, Some("lz4"), stored)
        else stored
      parseFooterPayload(path, new String(payload, StandardCharsets.UTF_8))
    } finally {
      in.close()
    }
  }

  private def parseFooterPayload(
      path: Path, json: String): (Seq[PuffinBlobInfo], Map[String, String]) = {
    import scala.jdk.CollectionConverters._
    val node = jsonMapper.readTree(json)
    val blobsNode = node.get("blobs")
    if (blobsNode == null || !blobsNode.isArray) {
      throw new IllegalArgumentException(
        s"$path: Puffin footer payload has no blobs array")
    }
    def propsOf(n: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
      Option(n).filter(_.isObject).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap)
        .getOrElse(Map.empty)
    val blobs = blobsNode.elements().asScala.map { b =>
      def reqField(name: String) = {
        val v = b.get(name)
        if (v == null) throw new IllegalArgumentException(
          s"$path: Puffin blob missing required field '$name'")
        v
      }
      PuffinBlobInfo(
        blobType = reqField("type").asText(),
        fields = Option(b.get("fields")).filter(_.isArray)
          .map(_.elements().asScala.map(_.asInt()).toSeq).getOrElse(Nil),
        snapshotId = Option(b.get("snapshot-id")).map(_.asLong()),
        sequenceNumber = Option(b.get("sequence-number")).map(_.asLong()),
        offset = reqField("offset").asLong(),
        length = reqField("length").asLong(),
        compressionCodec = Option(b.get("compression-codec")).map(_.asText()),
        properties = propsOf(b.get("properties")))
    }.toSeq
    (blobs, propsOf(node.get("properties")))
  }

  /** Decode the 64-bit roaring "portable" serialization (sparse
    * explicit buckets) to sorted row positions. */
  def decodeRoaring64Portable(bytes: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.remaining() < 8) {
      throw new IllegalArgumentException(
        s"roaring64 vector too short: ${bytes.length} bytes")
    }
    val nBuckets = buf.getLong
    if (nBuckets < 0 || nBuckets > Int.MaxValue) {
      throw new IllegalArgumentException(
        s"roaring64 bucket count out of range: $nBuckets")
    }
    val out = Array.newBuilder[Long]
    var prevKey = -1L
    var i = 0L
    while (i < nBuckets) {
      if (buf.remaining() < 4) {
        throw new IllegalArgumentException(
          s"roaring64 vector truncated at bucket $i")
      }
      val key = buf.getInt.toLong & 0xFFFFFFFFL
      if (key <= prevKey) {
        throw new IllegalArgumentException(
          s"roaring64 bucket keys not strictly increasing at bucket $i")
      }
      prevKey = key
      DvCodec.decodeOnePortableRoaring(buf, key << 32, out)
      i += 1
    }
    out.result()
  }

  /** Encode sorted positions to the 64-bit roaring portable form
    * (fixture/test twin of [[decodeRoaring64Portable]]). */
  def encodeRoaring64Portable(positions: Array[Long]): Array[Byte] = {
    require(positions.sameElements(positions.sorted), "positions must be sorted")
    val byBucket = positions.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val parts = byBucket.map { case (key, vs) =>
      key -> DvCodec.encodeOnePortableRoaring(
        vs.map(v => (v & 0xFFFFFFFFL).toInt))
    }
    val total = 8 + parts.map(4 + _._2.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(byBucket.size.toLong)
    parts.foreach { case (key, body) =>
      buf.putInt(key.toInt)
      buf.put(body)
    }
    buf.array()
  }

  /** Read + decode one `deletion-vector-v1` blob at `(offset, length)`
    * (the manifest entry's `content_offset` / `content_size_in_bytes`):
    * verifies the BE length word, the DV magic, and the CRC-32 over
    * magic+vector, then decodes to sorted row positions. */
  def readDvBlob(
      path: Path, conf: Configuration, offset: Long, length: Long): Array[Long] = {
    if (length < 12 || length > Int.MaxValue) {
      throw new IllegalArgumentException(
        s"$path: DV blob length $length out of range")
    }
    val fs = path.getFileSystem(conf)
    val blob = new Array[Byte](length.toInt)
    val in = fs.open(path)
    try in.readFully(offset, blob) finally in.close()
    val buf = ByteBuffer.wrap(blob).order(ByteOrder.BIG_ENDIAN)
    val storedLen = buf.getInt
    // the length word covers magic + vector (not itself, not the CRC)
    if (storedLen != length - 8) {
      throw new IllegalArgumentException(
        s"$path: DV blob length word says $storedLen, " +
          s"blob frame implies ${length - 8}")
    }
    val magicAndVector = new Array[Byte](storedLen)
    buf.get(magicAndVector)
    if (!magicAndVector.take(4).sameElements(DvMagic)) {
      throw new IllegalArgumentException(
        s"$path: DV blob magic mismatch at offset $offset")
    }
    val storedCrc = buf.getInt
    val crc = new java.util.zip.CRC32
    crc.update(magicAndVector)
    if (crc.getValue.toInt != storedCrc) {
      throw new IllegalArgumentException(
        s"$path: DV blob checksum mismatch at offset $offset")
    }
    decodeRoaring64Portable(magicAndVector.drop(4))
  }

  val ThetaV1 = "apache-datasketches-theta-v1"

  /** The largest DECOMPRESSED blob this codec will materialize —
    * statistics-sketch scale, far above any real theta/DV payload; a
    * zstd/lz4 bomb must refuse here, never OOM the executor. */
  private val MaxBlobBytes: Int = 64 << 20

  /**
   * Undo a blob's `compression-codec` (Puffin spec: `lz4` = LZ4 frame,
   * `zstd` = Zstandard frame; absent = stored verbatim). Decoding
   * STREAMS with a size cap — the decompressed size is not declared in
   * the footer, so the cap is what stands between a crafted frame and
   * an executor OOM. Unknown codecs and malformed frames REFUSE
   * (classified): a misread sketch corrupts every NDV downstream.
   */
  def decompressBlob(
      path: Path, codec: Option[String], bytes: Array[Byte]): Array[Byte] =
    codec.map(_.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty) match {
      case None => bytes
      case Some("zstd") =>
        bounded(path, "zstd", new com.github.luben.zstd.ZstdInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      case Some("lz4") =>
        bounded(path, "lz4", new net.jpountz.lz4.LZ4FrameInputStream(
          new java.io.ByteArrayInputStream(bytes)))
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"$path: Puffin compression-codec '$other' is not a spec " +
            "codec (lz4, zstd) — refusing rather than misreading")
    }

  private def bounded(
      path: Path, codec: String, in: java.io.InputStream): Array[Byte] =
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](65536)
      var n = in.read(chunk)
      while (n > 0) {
        buf.write(chunk, 0, n)
        if (buf.size() > MaxBlobBytes) {
          throw new IllegalArgumentException(
            s"$path: $codec blob decompresses past the $MaxBlobBytes-byte " +
              "cap — refusing a decompression bomb")
        }
        n = in.read(chunk)
      }
      buf.toByteArray
    } catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"$path: malformed $codec frame — ${e.getMessage}")
    } finally in.close()

  /** Compress a blob body for [[writePuffinFile]] (fixture twin of
    * [[decompressBlob]]). */
  def compressBlob(codec: Option[String], bytes: Array[Byte]): Array[Byte] =
    codec.map(_.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty) match {
      case None => bytes
      case Some("zstd") => com.github.luben.zstd.Zstd.compress(bytes)
      case Some("lz4") =>
        val bos = new java.io.ByteArrayOutputStream()
        val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
        out.write(bytes)
        out.close()
        bos.toByteArray
      case Some(other) =>
        throw new IllegalArgumentException(s"unknown codec '$other'")
    }

  /** Read one blob's stored bytes verbatim (type-agnostic span read;
    * the typed decoders sit on top). */
  def readBlobBytes(
      path: Path, conf: Configuration, offset: Long, length: Long): Array[Byte] = {
    if (length < 0 || length > Int.MaxValue) {
      throw new IllegalArgumentException(
        s"$path: blob length $length out of range")
    }
    val fs = path.getFileSystem(conf)
    val blob = new Array[Byte](length.toInt)
    val in = fs.open(path)
    try in.readFully(offset, blob) finally in.close()
    blob
  }

  // DataSketches compact-theta serialization, version 3 (the PUBLIC
  // format `apache-datasketches-theta-v1` blobs carry; layout per the
  // library's PreambleUtil): LITTLE-endian; byte 0 = preamble longs,
  // 1 = serial version (3), 2 = family (3 COMPACT), 5 = flags
  // (1 bigEndian, 2 readOnly, 4 empty, 8 compact, 16 ordered),
  // 6-7 = seed hash; preLongs>=2 add curCount @8 + p @12; preLongs=3
  // adds thetaLong @16; then curCount retained hash longs.
  private val ThetaSerVer = 3
  private val ThetaFamilyCompact = 3
  private val ThetaFlagEmpty = 4
  private val ThetaFlagSingleItem = 32
  // the library's precomputed seed-hash of its default update seed
  // 9001; the decoder deliberately does not validate it (cross-engine
  // reads resolve the seed from the table, not the blob)
  private val ThetaDefaultSeedHash: Short = 0x93CC.toShort

  /** Encode an EXACT-mode (theta = 1.0) compact ordered theta sketch
    * over `n` distinct items — the shape stats writers produce when
    * the column's cardinality is below the sketch's nominal size. The
    * retained "hashes" are synthetic increasing longs: the estimate
    * depends only on the count in exact mode, and both codec ends here
    * are span-faithful to the public layout, not to any hash seed. */
  def encodeThetaSketchExact(n: Long): Array[Byte] = {
    require(n >= 0 && n <= 100000, s"fixture-scale sketch only, got $n")
    if (n == 0) {
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).put(ThetaSerVer.toByte)
        .put(ThetaFamilyCompact.toByte).put(12.toByte).put(0.toByte)
        .put((ThetaFlagEmpty | 2 | 8 | 16).toByte)
        .putShort(ThetaDefaultSeedHash)
      return buf.array()
    }
    val buf = ByteBuffer.allocate(16 + 8 * n.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    // lgNomLongs 20 (nominal 1M): exact mode is legitimate for every
    // fixture-scale cardinality
    buf.put(2.toByte).put(ThetaSerVer.toByte)
      .put(ThetaFamilyCompact.toByte).put(20.toByte).put(0.toByte)
      .put((2 | 8 | 16).toByte) // readOnly | compact | ordered
      .putShort(ThetaDefaultSeedHash)
    buf.putInt(n.toInt)
    buf.putFloat(1.0f)
    var i = 0L
    while (i < n) { buf.putLong(i + 1L); i += 1 }
    buf.array()
  }

  /** The DISTINCT-count estimate of a serialized compact theta sketch
    * (serial version 3): empty → 0; exact mode (preLongs 2) →
    * curCount; estimation mode (preLongs 3) → curCount / theta with
    * theta = thetaLong / 2^63. Wrong version/family or a truncated
    * buffer REFUSES — a misread sketch silently corrupts every NDV
    * downstream. */
  def thetaEstimate(bytes: Array[Byte]): Double = {
    if (bytes.length < 8) {
      throw new IllegalArgumentException(
        s"theta sketch truncated: ${bytes.length} bytes, need >= 8")
    }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val preLongs = buf.get(0) & 0x3F
    val serVer = buf.get(1).toInt
    val family = buf.get(2).toInt
    val flags = buf.get(5).toInt
    if (serVer != ThetaSerVer) {
      throw new UnsupportedOperationException(
        s"theta sketch serial version $serVer is not the supported $ThetaSerVer")
    }
    if (family != ThetaFamilyCompact) {
      throw new UnsupportedOperationException(
        s"theta sketch family $family is not COMPACT ($ThetaFamilyCompact)")
    }
    if ((flags & ThetaFlagEmpty) != 0) return 0.0
    if (preLongs == 1) {
      // the library's single-item form: one retained hash, theta = 1 —
      // but ONLY when the preamble's SINGLEITEM flag says so; any
      // other non-empty preLongs-1 buffer is a misread, and guessing
      // 1.0 would corrupt the NDV as silently as any other misdecode
      if ((flags & ThetaFlagSingleItem) == 0) {
        throw new UnsupportedOperationException(
          s"theta sketch: preLongs 1, non-empty, but flags 0x" +
            f"$flags%02x lack SINGLEITEM (0x20) — not a form this " +
            "decoder understands, refusing")
      }
      if (bytes.length < 16) {
        throw new IllegalArgumentException(
          "theta sketch: preamble claims a single-item sketch but the " +
            s"buffer is ${bytes.length} bytes, need 16")
      }
      return 1.0
    }
    if (bytes.length < preLongs * 8) {
      throw new IllegalArgumentException(
        s"theta sketch truncated: ${bytes.length} bytes, preamble " +
          s"needs ${preLongs * 8}")
    }
    val curCount = buf.getInt(8).toLong
    if (preLongs == 2) return curCount.toDouble
    val thetaLong = buf.getLong(16)
    if (thetaLong <= 0) {
      throw new IllegalArgumentException(
        s"theta sketch: non-positive thetaLong $thetaLong")
    }
    curCount.toDouble / (thetaLong.toDouble / math.pow(2.0, 63))
  }

  /** Frame sorted positions as a `deletion-vector-v1` blob body
    * (fixture twin of [[readDvBlob]]). */
  def encodeDvBlob(positions: Array[Long]): Array[Byte] = {
    val vector = encodeRoaring64Portable(positions)
    val magicAndVector = DvMagic ++ vector
    val crc = new java.util.zip.CRC32
    crc.update(magicAndVector)
    val buf = ByteBuffer.allocate(4 + magicAndVector.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    buf.putInt(magicAndVector.length)
    buf.put(magicAndVector)
    buf.putInt(crc.getValue.toInt)
    buf.array()
  }

  /** Write a Puffin file of `(blobType, properties, body)` blobs and
    * return each blob's `(offset, length)` in order — the numbers a
    * manifest DV entry carries as `content_offset` /
    * `content_size_in_bytes`. `snapshotId`/`sequenceNumber` stamp every
    * blob's footer entry (one Puffin file serves one snapshot in both
    * the DV and the statistics layouts). */
  def writePuffinFile(
      file: java.io.File,
      blobs: Seq[(String, Map[String, String], Array[Byte])],
      snapshotId: Long = 1L,
      sequenceNumber: Long = 1L,
      fieldsPerBlob: Seq[Seq[Int]] = Seq.empty,
      codecPerBlob: Seq[Option[String]] = Seq.empty,
      lz4Footer: Boolean = false): Seq[(Long, Long)] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    val spans = blobs.zipWithIndex.map { case ((_, _, body), i) =>
      val stored = compressBlob(codecPerBlob.lift(i).flatten, body)
      val off = out.size().toLong
      out.write(stored)
      (off, stored.length.toLong)
    }
    val blobJson = blobs.zip(spans).zipWithIndex.map {
      case (((tpe, props, _), (off, blen)), i) =>
        val propJson = props.toSeq.sortBy(_._1)
          .map { case (k, v) => s"""${q(k)}:${q(v)}""" }
          .mkString("{", ",", "}")
        val fieldsJson = fieldsPerBlob.lift(i).getOrElse(Seq.empty)
          .mkString("[", ",", "]")
        val codecJson = codecPerBlob.lift(i).flatten
          .map(c => s""","compression-codec":${q(c)}""").getOrElse("")
        s"""{"type":${q(tpe)},"fields":$fieldsJson,"snapshot-id":$snapshotId,""" +
          s""""sequence-number":$sequenceNumber,"offset":$off,"length":$blen""" +
          codecJson + s""","properties":$propJson}"""
    }.mkString("[", ",", "]")
    val payload0 =
      s"""{"blobs":$blobJson,"properties":{"created-by":"graft-fixture"}}"""
        .getBytes(StandardCharsets.UTF_8)
    val payload =
      if (lz4Footer) compressBlob(Some("lz4"), payload0) else payload0
    out.write(Magic)
    out.write(payload)
    val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    tail.putInt(payload.length)
    tail.put(Array[Byte](if (lz4Footer) 1 else 0, 0, 0, 0))
    out.write(tail.array())
    out.write(Magic)
    java.nio.file.Files.write(file.toPath, out.toByteArray)
    spans
  }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
