package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** One Avro data block's physical layout, by position. */
case class AvroBlockInfo(
    id: Int, offset: Long, count: Long, dataSize: Long)

/** Decoded Avro object-container header + block walk. */
case class AvroInfo(
    schemaJson: String,
    codec: String,
    metadata: Map[String, String],
    numBlocks: Int,
    numRows: Long,
    dataBytes: Long,
    blocks: Seq[AvroBlockInfo])

/**
 * Avro object-container decode for the metadata source's `avro` tier —
 * the third common lake format next to parquet and ORC. Avro has NO
 * footer: the header carries the schema/codec metadata map and a
 * 16-byte sync marker, and every data block is `[row count: zigzag
 * varlong][byte size: zigzag varlong][data][sync]` — so row counts
 * require a BLOCK WALK, which this does with forward seeks only (one
 * varint pair read per block, the payload skipped, the sync verified;
 * a desynchronized or crafted block size refuses). Hand-rolled against
 * the container spec like the WAV/MP4 walks, cross-validated in specs
 * against files avro's own writer produced.
 */
object AvroMeta {

  private val MAGIC = Array[Byte]('O', 'b', 'j', 1)

  /** Deterministic Avro fixture through avro's OWN `DataFileWriter` (so
    * decode parity against it is a cross-implementation check, not a
    * round trip): `(k long, s string)` records, optional deflate codec,
    * small sync intervals force multiple blocks. */
  def writeFixture(
      file: java.io.File, rows: Seq[(Long, String)],
      codec: String = "null", syncInterval: Int = 4096): Unit = {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"k","type":"long"},{"name":"s","type":"string"}]}""".stripMargin)
    val w = new org.apache.avro.generic.GenericDatumWriter[
      org.apache.avro.generic.GenericRecord](schema)
    val fw = new org.apache.avro.file.DataFileWriter(w)
    try {
      if (codec == "deflate") {
        fw.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      }
      fw.setSyncInterval(syncInterval)
      fw.create(schema, file)
      rows.foreach { case (k, s) =>
        val r = new org.apache.avro.generic.GenericData.Record(schema)
        r.put("k", k)
        r.put("s", s)
        fw.append(r)
      }
    } finally {
      fw.close()
    }
  }

  /** True if the file starts with the Avro object-container magic. */
  def isAvro(fs: FileSystem, path: Path): Boolean = {
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(head)
      java.util.Arrays.equals(head, MAGIC)
    } catch {
      case _: java.io.EOFException => false
    } finally {
      in.close()
    }
  }

  /** Read and fully decode one Avro container's header + block layout. */
  def read(path: Path, conf: Configuration, knownSize: Option[Long] = None): AvroInfo = {
    val fs = path.getFileSystem(conf)
    val fileLen = knownSize.getOrElse(fs.getFileStatus(path).getLen)
    val in = fs.open(path)
    try {
      val stream = new java.io.BufferedInputStream(in, 1 << 16)
      var pos = 0L
      def u8(): Int = {
        val b = stream.read()
        if (b < 0) throw new RuntimeException(s"$path: EOF in Avro container at $pos")
        pos += 1
        b
      }
      def zigzagLong(): Long = {
        var v = 0L
        var shift = 0
        var b = u8()
        while ((b & 0x80) != 0) {
          if (shift > 63) throw new RuntimeException(s"$path: varint overflow")
          v |= (b & 0x7FL) << shift
          shift += 7
          b = u8()
        }
        // the final byte needs the same guard as the loop: an 11-byte
        // varint reaches shift 70 here, and the JVM's shift-mod-64 would
        // silently fold it into garbage instead of the refusal contract
        if (shift > 63) throw new RuntimeException(s"$path: varint overflow")
        v |= (b & 0x7FL) << shift
        (v >>> 1) ^ -(v & 1L)
      }
      def bytesOf(n: Long): Array[Byte] = {
        if (n < 0 || n > (64 << 20)) {
          throw new RuntimeException(s"$path: implausible length $n")
        }
        val arr = new Array[Byte](n.toInt)
        var off = 0
        while (off < arr.length) {
          val r = stream.read(arr, off, arr.length - off)
          if (r < 0) throw new RuntimeException(s"$path: EOF in Avro container")
          off += r
        }
        pos += n
        arr
      }
      def skipFully(n: Long): Unit = {
        var left = n
        while (left > 0) {
          val s = stream.skip(left)
          if (s <= 0) {
            if (stream.read() < 0) {
              throw new RuntimeException(s"$path: EOF skipping Avro block")
            }
            left -= 1
            pos += 1
          } else {
            left -= s
            pos += s
          }
        }
      }

      val head = bytesOf(4)
      if (!java.util.Arrays.equals(head, MAGIC)) {
        throw new RuntimeException(s"$path is not an Avro object container")
      }
      // header metadata: repeated map blocks (count, then key/value byte
      // strings), terminated by a zero count; negative counts carry a
      // byte-size hint per the spec
      val meta = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var count = zigzagLong()
      while (count != 0) {
        val n = if (count < 0) { zigzagLong(); -count } else count
        var i = 0L
        while (i < n) {
          val key = new String(bytesOf(zigzagLong()),
            java.nio.charset.StandardCharsets.UTF_8)
          val value = new String(bytesOf(zigzagLong()),
            java.nio.charset.StandardCharsets.UTF_8)
          meta(key) = value
          i += 1
        }
        count = zigzagLong()
      }
      val sync = bytesOf(16)

      val blocks = scala.collection.mutable.ArrayBuffer.empty[AvroBlockInfo]
      var rows = 0L
      var dataBytes = 0L
      while (pos < fileLen) {
        val off = pos
        val n = zigzagLong()
        val size = zigzagLong()
        if (n < 0 || size < 0 || pos + size + 16 > fileLen) {
          throw new RuntimeException(
            s"$path: corrupt Avro block at $off (count=$n size=$size)")
        }
        skipFully(size)
        val s = bytesOf(16)
        if (!java.util.Arrays.equals(s, sync)) {
          throw new RuntimeException(s"$path: Avro sync mismatch after block at $off")
        }
        blocks += AvroBlockInfo(blocks.length, off, n, size)
        rows += n
        dataBytes += size
      }
      AvroInfo(
        schemaJson = meta.getOrElse("avro.schema", ""),
        codec = meta.getOrElse("avro.codec", "null"),
        metadata = meta.toMap,
        numBlocks = blocks.length,
        numRows = rows,
        dataBytes = dataBytes,
        blocks = blocks.toSeq)
    } finally {
      in.close()
    }
  }
}
