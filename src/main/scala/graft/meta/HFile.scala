package graft.meta

/**
 * Scan-only HFile v2/v3 reader + deterministic fixture writer — the
 * public HBase file format Hudi's metadata table uses for its base
 * files (`.hfile`). No HBase dependency: the byte layout is restated
 * from the public format docs (hbase.apache.org, "Appendix: HFile
 * format"):
 *
 *  - every BLOCK is `magic (8B) | onDiskSizeWithoutHeader (4B) |
 *    uncompressedSizeWithoutHeader (4B) | prevBlockOffset (8B) |
 *    checksumType (1B) | bytesPerChecksum (4B) |
 *    onDiskDataSizeWithHeader (4B)` — the 33-byte v2 header — then
 *    the payload, then the checksum region (4 bytes per
 *    `bytesPerChecksum` chunk of header+payload; absent when
 *    checksumType is NULL/0);
 *  - DATA blocks (`DATABLK*`) hold cells: `keyLen (4B) | valueLen
 *    (4B) | key | value`, where key is `rowLen (2B) | row | famLen
 *    (1B) | family | qualifier | timestamp (8B) | keyType (1B)`;
 *  - the ROOT INDEX block (`IDXROOT2`, at `loadOnOpenDataOffset`)
 *    holds `dataIndexCount` entries of `blockOffset (8B) |
 *    onDiskSize (4B) | vint keyLen | key`;
 *  - the FIXED FILE TRAILER ends the file; its last 4 bytes encode
 *    `major | minor << 24`. Major 2 is a 212-byte binary struct
 *    (magic `TRABLK"$` + the fields below + a 128-byte padded
 *    comparator name + the version int); major 3 is a 4096-byte
 *    region: magic + a protobuf `FileTrailerProto` + zero padding +
 *    the version int.
 *
 * SCOPE (each boundary a named refusal, never a wrong scan):
 * uncompressed blocks only (`compressionCodec` NONE); single-level
 * data index; no encryption; cells without per-cell memstore
 * timestamps or tags (a block whose payload does not parse exactly
 * into cells refuses). Checksums VERIFY (CRC32 and CRC32C) — a
 * corrupt block refuses classified, never yields garbage cells.
 *
 * Untrusted-input contract: every length is bounds-checked before
 * allocation; malformed bytes refuse classified (IllegalArgument /
 * UnsupportedOperation), never an index/NPE/negative-size crash.
 */
object HFile {

  private val DataMagic = "DATABLK*".getBytes("UTF-8")
  private val RootIndexMagic = "IDXROOT2".getBytes("UTF-8")
  private val FileInfoMagic = "FILEINF2".getBytes("UTF-8")
  private val TrailerMagic = "TRABLK\"$".getBytes("UTF-8")

  /** Compression ordinals (public HBase Compression.Algorithm order:
    * LZO, GZ, NONE, SNAPPY, LZ4, BZIP2, ZSTD). */
  val CodecNone = 2

  val V2TrailerSize = 212
  val V3TrailerSize = 4096

  case class Trailer(
      major: Int, minor: Int, fileInfoOffset: Long,
      loadOnOpenDataOffset: Long, dataIndexCount: Int,
      metaIndexCount: Int, entryCount: Long, compressionCodec: Int,
      numDataIndexLevels: Int, firstDataBlockOffset: Long,
      lastDataBlockOffset: Long, comparatorClassName: String)

  private def fail(where: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$where: $msg")

  private def refuse(where: String, msg: String): Nothing =
    throw new UnsupportedOperationException(s"$where: $msg")

  private class Cursor(val bytes: Array[Byte], val where: String,
      var pos: Int) {
    def remaining: Int = bytes.length - pos
    def i8(): Int = {
      if (remaining < 1) fail(where, s"truncated byte at offset $pos")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def i16(): Int = {
      if (remaining < 2) fail(where, s"truncated short at offset $pos")
      val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
      pos += 2; v
    }
    def i32(): Int = {
      if (remaining < 4) fail(where, s"truncated int at offset $pos")
      val v = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4; v
    }
    def i64(): Long = {
      if (remaining < 8) fail(where, s"truncated long at offset $pos")
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (bytes(pos + i) & 0xffL); i += 1 }
      pos += 8; v
    }
    def take(n: Int): Array[Byte] = {
      if (n < 0 || n > remaining) {
        fail(where, s"length $n at offset $pos runs past the end")
      }
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; out
    }
    /** Hadoop WritableUtils vint (the root-index key length coding). */
    def vint(): Int = {
      val first = i8().toByte
      val len =
        if (first >= -112) 1
        else if (first >= -120) -111 - first
        else -119 - first
      if (len == 1) return first.toInt
      var v = 0L
      var i = 0
      while (i < len - 1) { v = (v << 8) | i8(); i += 1 }
      val neg = first < -120 || (first >= -112 && first < 0)
      val out = if (neg) ~v else v
      if (out < 0 || out > Int.MaxValue) {
        fail(where, s"implausible vint $out at offset $pos")
      }
      out.toInt
    }
    /** Protobuf varint. */
    def pvarint(): Long = {
      var shift = 0; var v = 0L
      while (shift < 64) {
        val b = i8()
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      fail(where, s"unterminated protobuf varint at offset $pos")
    }
  }

  // -------------------------------------------------------------------
  // Trailer
  // -------------------------------------------------------------------

  def readTrailer(bytes: Array[Byte], where: String): Trailer = {
    if (bytes.length < V2TrailerSize) {
      fail(where, s"file of ${bytes.length} bytes is shorter than any " +
        "HFile trailer — not an HFile")
    }
    val c0 = new Cursor(bytes, where, bytes.length - 4)
    val versionWord = c0.i32()
    val major = versionWord & 0xffffff
    val minor = versionWord >>> 24
    major match {
      case 2 =>
        val c = new Cursor(bytes, where, bytes.length - V2TrailerSize)
        if (!java.util.Arrays.equals(c.take(8), TrailerMagic)) {
          fail(where, "v2 trailer magic mismatch — not an HFile v2 " +
            "trailer at the expected offset")
        }
        val fileInfoOffset = c.i64()
        val loadOnOpen = c.i64()
        val dataIndexCount = c.i32()
        val _uncompressedDataIndexSize = c.i64()
        val metaIndexCount = c.i32()
        val _totalUncompressed = c.i64()
        val entryCount = c.i64()
        val codec = c.i32()
        val levels = c.i32()
        val firstData = c.i64()
        val lastData = c.i64()
        val cmp = new String(c.take(128), "UTF-8").takeWhile(_ != '\u0000')
        Trailer(major, minor, fileInfoOffset, loadOnOpen, dataIndexCount,
          metaIndexCount, entryCount, codec, levels, firstData, lastData,
          cmp)
      case 3 =>
        val start = math.max(0, bytes.length - V3TrailerSize)
        val c = new Cursor(bytes, where, start)
        if (!java.util.Arrays.equals(c.take(8), TrailerMagic)) {
          fail(where, "v3 trailer magic mismatch — not an HFile v3 " +
            "trailer at the expected offset")
        }
        // protobuf FileTrailerProto (public hbase.pb): 1 file_info_
        // offset, 2 load_on_open_data_offset, 3 uncompressed_data_
        // index_size, 4 total_uncompressed_bytes, 5 data_index_count,
        // 6 meta_index_count, 7 entry_count, 8 num_data_index_levels,
        // 9 first_data_block_offset, 10 last_data_block_offset,
        // 11 comparator_class_name, 12 compression_codec,
        // 13 encryption_key
        val pbLen = c.pvarint()
        if (pbLen < 0 || pbLen > c.remaining - 4) {
          fail(where, s"v3 trailer protobuf length $pbLen runs past " +
            "the trailer region")
        }
        val end = c.pos + pbLen.toInt
        var fileInfoOffset = 0L; var loadOnOpen = 0L
        var dataIndexCount = 0; var metaIndexCount = 0
        var entryCount = 0L; var codec = CodecNone; var levels = 1
        var firstData = -1L; var lastData = -1L; var cmp = ""
        while (c.pos < end) {
          val tag = c.pvarint()
          val field = (tag >>> 3).toInt
          val wire = (tag & 7).toInt
          (field, wire) match {
            case (1, 0) => fileInfoOffset = c.pvarint()
            case (2, 0) => loadOnOpen = c.pvarint()
            case (5, 0) => dataIndexCount = c.pvarint().toInt
            case (6, 0) => metaIndexCount = c.pvarint().toInt
            case (7, 0) => entryCount = c.pvarint()
            case (8, 0) => levels = c.pvarint().toInt
            case (9, 0) => firstData = c.pvarint()
            case (10, 0) => lastData = c.pvarint()
            case (11, 2) =>
              cmp = new String(c.take(c.pvarint().toInt), "UTF-8")
            case (12, 0) => codec = c.pvarint().toInt
            case (13, 2) =>
              val k = c.take(c.pvarint().toInt)
              if (k.nonEmpty) {
                refuse(where, "HFile v3 trailer carries an encryption " +
                  "key — encrypted HFiles are not modeled")
              }
            case (_, 0) => c.pvarint()
            case (_, 2) => c.take(c.pvarint().toInt)
            case (f, w) => fail(where,
              s"v3 trailer protobuf field $f has unsupported wire type $w")
          }
        }
        Trailer(major, minor, fileInfoOffset, loadOnOpen, dataIndexCount,
          metaIndexCount, entryCount, codec, levels, firstData, lastData,
          cmp)
      case other =>
        refuse(where, s"HFile major version $other — only the public " +
          "v2/v3 formats are modeled")
    }
  }

  // -------------------------------------------------------------------
  // Blocks
  // -------------------------------------------------------------------

  private case class Block(magic: Array[Byte], payload: Array[Byte],
      onDiskSizeWithHeader: Int)

  /** Read + checksum-verify one block at `offset`. */
  private def readBlock(bytes: Array[Byte], offset: Long,
      expectMagic: Array[Byte], where: String): Block = {
    if (offset < 0 || offset + 33 > bytes.length) {
      fail(where, s"block offset $offset has no room for a 33-byte " +
        "header")
    }
    val c = new Cursor(bytes, where, offset.toInt)
    val magic = c.take(8)
    if (!java.util.Arrays.equals(magic, expectMagic)) {
      fail(where, s"block at offset $offset is " +
        s"'${new String(magic, "UTF-8")}', expected " +
        s"'${new String(expectMagic, "UTF-8")}'")
    }
    val onDiskSizeWithoutHeader = c.i32()
    val _uncompressedSizeWithoutHeader = c.i32()
    val _prevBlockOffset = c.i64()
    val checksumType = c.i8()
    val bytesPerChecksum = c.i32()
    val onDiskDataSizeWithHeader = c.i32()
    val total = 33L + onDiskSizeWithoutHeader
    if (onDiskSizeWithoutHeader < 0 || offset + total > bytes.length) {
      fail(where, s"block at offset $offset declares " +
        s"$onDiskSizeWithoutHeader on-disk bytes, past EOF")
    }
    if (onDiskDataSizeWithHeader < 33 ||
        onDiskDataSizeWithHeader > total) {
      fail(where, s"block at offset $offset declares implausible " +
        s"data size $onDiskDataSizeWithHeader")
    }
    val dataEnd = offset.toInt + onDiskDataSizeWithHeader
    // checksum region: 4 bytes per bytesPerChecksum chunk of
    // header+data; type 0 (NULL) has none
    if (checksumType != 0) {
      if (bytesPerChecksum <= 0) {
        fail(where, s"block at offset $offset declares checksum type " +
          s"$checksumType with bytesPerChecksum $bytesPerChecksum")
      }
      val nChunks =
        (onDiskDataSizeWithHeader + bytesPerChecksum - 1) / bytesPerChecksum
      if (offset + onDiskDataSizeWithHeader + 4L * nChunks > offset + total) {
        fail(where, s"block at offset $offset has no room for its " +
          s"$nChunks checksums")
      }
      var i = 0
      while (i < nChunks) {
        val from = offset.toInt + i * bytesPerChecksum
        val to = math.min(from + bytesPerChecksum, dataEnd)
        val crc = checksumType match {
          case 1 => new java.util.zip.CRC32()
          case 2 => new java.util.zip.CRC32C()
          case other => refuse(where, s"block at offset $offset uses " +
            s"checksum type $other — only NULL/CRC32/CRC32C are public")
        }
        crc.update(bytes, from, to - from)
        val stored = new Cursor(bytes, where, dataEnd + i * 4).i32()
        if ((crc.getValue & 0xffffffffL) != (stored & 0xffffffffL)) {
          fail(where, s"block at offset $offset fails its " +
            s"chunk-$i checksum — corrupt block")
        }
        i += 1
      }
    }
    Block(magic,
      java.util.Arrays.copyOfRange(bytes, offset.toInt + 33, dataEnd),
      total.toInt)
  }

  /** One root-index entry. */
  case class IndexEntry(offset: Long, onDiskSize: Int, firstKeyRow: String)

  private def parseRootIndex(payload: Array[Byte], n: Int,
      where: String): Seq[IndexEntry] = {
    val c = new Cursor(payload, where, 0)
    (0 until n).map { _ =>
      val off = c.i64()
      val size = c.i32()
      val keyLen = c.vint()
      val key = c.take(keyLen)
      IndexEntry(off, size, rowOfKey(key, where))
    }
  }

  /** The ROW portion of an HFile key struct. */
  private def rowOfKey(key: Array[Byte], where: String): String = {
    val c = new Cursor(key, where, 0)
    val rowLen = c.i16()
    new String(c.take(rowLen), "UTF-8")
  }

  /** Every cell of the file, in file order, as (row, value) pairs —
    * the scan a metadata-table reader needs. */
  def scanCells(bytes: Array[Byte], where: String): Seq[(String, Array[Byte])] = {
    val t = readTrailer(bytes, where)
    if (t.compressionCodec != CodecNone) {
      refuse(where, s"HFile blocks are compressed (codec ordinal " +
        s"${t.compressionCodec}) — only uncompressed (NONE) blocks " +
        "are modeled")
    }
    if (t.numDataIndexLevels > 1) {
      refuse(where, s"HFile has a ${t.numDataIndexLevels}-level data " +
        "index — multi-level (intermediate/leaf) indexes are not " +
        "modeled")
    }
    if (t.dataIndexCount == 0) return Seq.empty
    val root = readBlock(bytes, t.loadOnOpenDataOffset, RootIndexMagic,
      where)
    val entries = parseRootIndex(root.payload, t.dataIndexCount, where)
    val cells = entries.flatMap { e =>
      val b = readBlock(bytes, e.offset, DataMagic, where)
      val c = new Cursor(b.payload, where, 0)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
      while (c.remaining > 0) {
        val keyLen = c.i32()
        val valueLen = c.i32()
        if (keyLen < 0 || valueLen < 0) {
          fail(where, s"cell in block at offset ${e.offset} declares " +
            s"negative lengths ($keyLen/$valueLen) — per-cell " +
            "memstore timestamps / tags are not modeled if this was " +
            "a valid HBase cell")
        }
        val key = c.take(keyLen)
        val value = c.take(valueLen)
        out += ((rowOfKey(key, where), value))
      }
      out
    }
    if (t.entryCount != cells.size) {
      fail(where, s"trailer declares ${t.entryCount} cells but the " +
        s"data blocks hold ${cells.size} — per-cell memstore " +
        "timestamps / tags are not modeled if this is a valid HBase " +
        "file")
    }
    cells
  }

  // -------------------------------------------------------------------
  // Fixture writer
  // -------------------------------------------------------------------

  private def blockBytes(magic: Array[Byte], payload: Array[Byte],
      prevOffset: Long): Array[Byte] = {
    // CRC32C checksums, one 16 KiB chunk (fixture blocks are small)
    val bytesPerChecksum = 16384
    val dataWithHeader = 33 + payload.length
    val nChunks = (dataWithHeader + bytesPerChecksum - 1) / bytesPerChecksum
    val onDiskWithoutHeader = payload.length + 4 * nChunks
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(magic)
    out.writeInt(onDiskWithoutHeader)
    out.writeInt(payload.length)
    out.writeLong(prevOffset)
    out.writeByte(2) // CRC32C
    out.writeInt(bytesPerChecksum)
    out.writeInt(dataWithHeader)
    out.write(payload)
    out.flush()
    val headAndData = bos.toByteArray
    val full = new java.io.ByteArrayOutputStream()
    full.write(headAndData)
    var i = 0
    while (i < nChunks) {
      val from = i * bytesPerChecksum
      val to = math.min(from + bytesPerChecksum, dataWithHeader)
      val crc = new java.util.zip.CRC32C()
      crc.update(headAndData, from, to - from)
      val w = new java.io.DataOutputStream(full)
      w.writeInt((crc.getValue & 0xffffffffL).toInt)
      i += 1
    }
    full.toByteArray
  }

  /** An HFile key struct for `row` (empty family/qualifier, ts 0,
    * type 4 = Put). */
  private def keyBytes(row: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeShort(row.length)
    out.write(row)
    out.writeByte(0) // family length
    out.writeLong(0L) // timestamp
    out.writeByte(4) // Put
    out.flush(); bos.toByteArray
  }

  private def writeVint(out: java.io.DataOutputStream, v: Int): Unit = {
    // Hadoop WritableUtils.writeVInt
    if (v >= -112 && v <= 127) { out.writeByte(v); return }
    var value = v.toLong
    var base = -113
    if (value < 0) { value = ~value; base = -121 }
    var tmp = value
    var len = 0
    while (tmp != 0) { tmp >>>= 8; len += 1 }
    out.writeByte(base - len + 1 + (if (base == -121) 0 else 0))
    // the line above simplifies to base - len + 1; kept explicit
    var i = (len - 1) * 8
    while (i >= 0) { out.writeByte(((value >> i) & 0xff).toInt); i -= 8 }
  }

  /**
   * Write a v2 (or v3, `majorVersion = 3`) HFile of `cells` (row →
   * value, pre-sorted), `perBlock` cells per data block — real
   * CRC32C-checksummed blocks, a real root index, a (minimal) file
   * info block and the version's own trailer encoding.
   */
  def write(cells: Seq[(String, Array[Byte])], perBlock: Int,
      majorVersion: Int = 2): Array[Byte] = {
    require(majorVersion == 2 || majorVersion == 3,
      s"fixture major version $majorVersion")
    val out = new java.io.ByteArrayOutputStream()
    var prev = -1L
    val index = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Array[Byte])]
    var firstData = -1L
    var lastData = -1L
    cells.grouped(math.max(1, perBlock)).foreach { group =>
      val payload = new java.io.ByteArrayOutputStream()
      val p = new java.io.DataOutputStream(payload)
      group.foreach { case (row, value) =>
        val k = keyBytes(row.getBytes("UTF-8"))
        p.writeInt(k.length)
        p.writeInt(value.length)
        p.write(k)
        p.write(value)
      }
      p.flush()
      val offset = out.size().toLong
      if (firstData < 0) firstData = offset
      lastData = offset
      val block = blockBytes(DataMagic, payload.toByteArray, prev)
      out.write(block)
      index += ((offset, block.length,
        keyBytes(group.head._1.getBytes("UTF-8"))))
      prev = offset
    }
    // file info block (payload: an empty v2 map — entry count 0)
    val fileInfoOffset = out.size().toLong
    out.write(blockBytes(FileInfoMagic, Array[Byte](0, 0, 0, 0), prev))
    // root index block
    val loadOnOpen = out.size().toLong
    val idxPayload = new java.io.ByteArrayOutputStream()
    val ip = new java.io.DataOutputStream(idxPayload)
    index.foreach { case (off, size, firstKey) =>
      ip.writeLong(off)
      ip.writeInt(size)
      writeVint(ip, firstKey.length)
      ip.write(firstKey)
    }
    ip.flush()
    out.write(blockBytes(RootIndexMagic, idxPayload.toByteArray,
      fileInfoOffset))
    // trailer
    val t = new java.io.ByteArrayOutputStream()
    val to = new java.io.DataOutputStream(t)
    to.write(TrailerMagic)
    if (majorVersion == 2) {
      to.writeLong(fileInfoOffset)
      to.writeLong(loadOnOpen)
      to.writeInt(index.size)
      to.writeLong(idxPayload.size().toLong)
      to.writeInt(0) // meta index count
      to.writeLong(out.size().toLong)
      to.writeLong(cells.size.toLong)
      to.writeInt(CodecNone)
      to.writeInt(1) // numDataIndexLevels
      to.writeLong(firstData)
      to.writeLong(lastData)
      val cmp = "org.apache.hadoop.hbase.CellComparatorImpl"
        .getBytes("UTF-8")
      to.write(java.util.Arrays.copyOf(cmp, 128))
      to.writeInt(2 | (3 << 24)) // major 2, minor 3 (with checksums)
      to.flush()
      require(t.size() == V2TrailerSize,
        s"v2 trailer must be $V2TrailerSize bytes, built ${t.size()}")
    } else {
      val pb = new java.io.ByteArrayOutputStream()
      def varint(v: Long): Unit = {
        var x = v
        while ((x & ~0x7fL) != 0) { pb.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
        pb.write(x.toInt)
      }
      def field(n: Int, v: Long): Unit = { varint((n << 3).toLong); varint(v) }
      field(1, fileInfoOffset)
      field(2, loadOnOpen)
      field(5, index.size.toLong)
      field(6, 0L)
      field(7, cells.size.toLong)
      field(8, 1L)
      field(9, firstData)
      field(10, lastData)
      val cmp = "org.apache.hadoop.hbase.CellComparatorImpl"
        .getBytes("UTF-8")
      varint((11L << 3) | 2); varint(cmp.length.toLong); pb.write(cmp)
      field(12, CodecNone.toLong)
      val body = pb.toByteArray
      val lenPrefix = new java.io.ByteArrayOutputStream()
      var x = body.length.toLong
      while ((x & ~0x7fL) != 0) { lenPrefix.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      lenPrefix.write(x.toInt)
      to.write(lenPrefix.toByteArray)
      to.write(body)
      val pad = V3TrailerSize - 8 - lenPrefix.size() - body.length - 4
      require(pad >= 0, "v3 trailer protobuf overflows the region")
      to.write(new Array[Byte](pad))
      to.writeInt(3 | (3 << 24))
      to.flush()
      require(t.size() == V3TrailerSize,
        s"v3 trailer must be $V3TrailerSize bytes, built ${t.size()}")
    }
    out.write(t.toByteArray)
    out.toByteArray
  }
}
