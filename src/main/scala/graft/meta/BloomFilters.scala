package graft.meta

import java.io.EOFException

import org.apache.parquet.format.Util

/** One decoded bloom filter: the split-block bitset guarding one
  * (row group, column) chunk, plus its thrift header fields. */
case class BloomFilterInfo(
    rowGroupId: Int,
    columnId: Int,
    path: Option[String],
    physicalType: Option[String],
    offset: Long,
    headerSize: Int,
    numBytes: Int,
    algorithm: String,
    hashAlgo: String,
    compression: String,
    bitset: Array[Byte])

/**
 * Parquet bloom-filter decoding (BloomFilterHeader thrift struct + raw
 * split-block bitset), read with `org.apache.parquet.format.Util` like the
 * footer, page headers and page indexes. Bloom filters sit between the row
 * group data and the page indexes; decoding sorts chunks by bloom offset
 * and walks ONE forward-only stream, the same single-pass discipline as
 * [[PageScan]] / [[PageIndexes]]. The header size is not stored anywhere in
 * the file, so — like page headers — it is derived from the stream-position
 * delta around the thrift read.
 *
 * A post-reference extension: bloom filters postdate the reference engine's
 * data model (its column level stops at the page-index offsets, reference:
 * src/main/scala/com/github/sadikovi/metadata/MetadataLevel.scala:48-77).
 * Chunks without a bloom filter offset contribute zero rows (writers
 * default them off, and parquet-mr skips them for fully
 * dictionary-encoded chunks, whose dictionary already is an exact filter).
 */
object BloomFilters {

  /** Decode every present bloom filter among `chunks` through `in`.
    * With `wantBitset = false` the bitset bytes are never read (a lazy
    * forward seek skips them) — the projection-pruned path for queries
    * that inspect headers only, mirroring the page level's
    * `pagecontent` discipline. */
  def bloomFilters(
      chunks: Seq[ChunkInfo], in: ForwardSeekStream,
      wantBitset: Boolean = true,
      fileLen: Long = Long.MaxValue): Iterator[BloomFilterInfo] = {
    val withBloom = chunks.filter(_.bloomFilterOffset.isDefined)
      .sortBy(_.bloomFilterOffset.get)
    withBloom.iterator.map { c =>
      val off = c.bloomFilterOffset.get
      in.seek(off)
      val header = Util.readBloomFilterHeader(in)
      val headerSize = (in.getPos - off).toInt
      val numBytes = header.getNumBytes
      // Bound the claimed bitset size BEFORE allocating: an adversarial
      // header can claim up to Int.MaxValue (~2 GB per chunk). The footer's
      // bloom_filter_length (header + bitset, format ≥ 2.10) is the exact
      // budget when present; the bytes remaining in the file bound it
      // always — either violation is a corrupt header, not an OOM.
      val budget = c.bloomFilterLength match {
        case Some(len) => math.min(len.toLong - headerSize, fileLen - in.getPos)
        case None => fileLen - in.getPos
      }
      if (numBytes < 0 || numBytes > budget) {
        throw new RuntimeException(
          s"Corrupt bloom filter header at offset $off: numBytes $numBytes" +
            s" exceeds available bytes ($budget)")
      }
      val bitset = if (!wantBitset) {
        in.seek(in.getPos + numBytes) // lazy: costs nothing until next read
        null
      } else {
        val bs = new Array[Byte](numBytes)
        var done = 0
        while (done < numBytes) {
          val n = in.read(bs, done, numBytes - done)
          if (n < 0) {
            throw new EOFException(
              s"EOF reading bloom filter bitset at offset $off ($done/$numBytes bytes)")
          }
          done += n
        }
        bs
      }
      BloomFilterInfo(
        rowGroupId = c.rowGroupId,
        columnId = c.columnId,
        path = c.path,
        physicalType = c.physicalType,
        offset = off,
        headerSize = headerSize,
        numBytes = numBytes,
        // the header enums are thrift unions whose toString is noisy;
        // render the spec names (format spec BloomFilter.md) directly
        algorithm = if (header.getAlgorithm.isSetBLOCK) "BLOCK"
          else header.getAlgorithm.toString,
        hashAlgo = if (header.getHash.isSetXXHASH) "XXHASH"
          else header.getHash.toString,
        compression = if (header.getCompression.isSetUNCOMPRESSED) "UNCOMPRESSED"
          else header.getCompression.toString,
        bitset = bitset)
    }
  }
}

/**
 * The split-block bloom filter (SBBF) probe, per the parquet format spec
 * (`BloomFilter.md`): the bitset is a sequence of 256-bit blocks of eight
 * little-endian 32-bit words; a 64-bit xxhash selects the block with its
 * high 32 bits (multiply-shift, no modulo) and sets/checks one bit per
 * word with its low 32 bits times eight odd salt constants.
 *
 * Value hashing delegates to parquet's own `XxHash` over the value's plain
 * encoding — byte-for-byte the writer's hash, so a probe here agrees with
 * the filter parquet-mr serialized (parity is spec-pinned against
 * `BlockSplitBloomFilter.findHash`).
 */
object Sbbf {
  // format spec BloomFilter.md: the eight per-word salt constants
  private val SALT = Array(
    0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
    0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31)

  private val BYTES_PER_BLOCK = 32

  private val xx = new org.apache.parquet.column.values.bloomfilter.XxHash()

  /** xxhash64 of a plain-encoded INT64 value (8 bytes little-endian). */
  def hashLong(v: Long): Long = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v).flip()
    xx.hashByteBuffer(bb)
  }

  /** xxhash64 of a plain-encoded INT32 value (4 bytes little-endian). */
  def hashInt(v: Int): Long = {
    val bb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(v).flip()
    xx.hashByteBuffer(bb)
  }

  /** xxhash64 of a plain-encoded DOUBLE value (8 bytes little-endian
    * IEEE 754). NOTE: +0.0 and -0.0 are DIFFERENT bit patterns and hash
    * differently even though SQL equality treats them as equal — callers
    * probing for zero must probe both (see [[MetaPrune]]). */
  def hashDouble(v: Double): Long = {
    val bb = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putDouble(v).flip()
    xx.hashByteBuffer(bb)
  }

  /** xxhash64 of a plain-encoded FLOAT value (4 bytes little-endian
    * IEEE 754); the same ±0.0 caveat as [[hashDouble]]. */
  def hashFloat(v: Float): Long = {
    val bb = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(v).flip()
    xx.hashByteBuffer(bb)
  }

  /** xxhash64 of a BYTE_ARRAY value (UTF-8 bytes for strings). */
  def hashBytes(v: Array[Byte]): Long = xx.hashBytes(v)

  /** xxhash64 of a FIXED_LEN_BYTE_ARRAY decimal value: the unscaled
    * value as `typeLen` BIG-endian two's complement bytes — exactly the
    * fixed-width encoding the writer stores and hashes (point lookups on
    * decimal ids are the finance-shaped bloom use case). `typeLen` past 8
    * pads with sign extension; a value that would not fit `typeLen`
    * bytes cannot have been written by a correct writer, so callers
    * should size probes from the column's declared precision. */
  def hashUnscaled(unscaled: Long, typeLen: Int): Long = {
    require(typeLen > 0 && typeLen <= 64, s"implausible type_length $typeLen")
    val b = new Array[Byte](typeLen)
    val sign: Byte = if (unscaled < 0) -1 else 0
    var i = 0
    while (i < typeLen) {
      b(typeLen - 1 - i) =
        if (i < 8) ((unscaled >> (8 * i)) & 0xffL).toByte else sign
      i += 1
    }
    xx.hashBytes(b)
  }

  /** True when the bitset MAY contain the hashed value; false is certain
    * absence (the guarantee pruning relies on: no false negatives). */
  def mightContain(bitset: Array[Byte], hash: Long): Boolean = {
    val numBlocks = bitset.length / BYTES_PER_BLOCK
    if (numBlocks == 0) return true // degenerate filter: no evidence
    // top 32 hash bits scaled into [0, numBlocks) without modulo
    val blockIdx = (((hash >>> 32) * numBlocks) >>> 32).toInt
    val base = blockIdx * BYTES_PER_BLOCK
    val key = hash.toInt // low 32 bits
    var i = 0
    while (i < 8) {
      // one bit per 32-bit word: multiply by an odd salt, take the top
      // five bits as the bit index (all 32-bit arithmetic, as the spec)
      val bit = (key * SALT(i)) >>> 27
      val wordBase = base + i * 4
      val word =
        (bitset(wordBase) & 0xff) |
        ((bitset(wordBase + 1) & 0xff) << 8) |
        ((bitset(wordBase + 2) & 0xff) << 16) |
        ((bitset(wordBase + 3) & 0xff) << 24)
      if (((word >>> bit) & 1) == 0) return false
      i += 1
    }
    true
  }
}
