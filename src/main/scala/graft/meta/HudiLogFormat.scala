package graft.meta

import java.io.{ByteArrayOutputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/**
 * HoodieLogFormat block framing against the PUBLIC Hudi table spec
 * (hudi.apache.org/tech-specs, "Log File Format") — the byte layer
 * under the MOR tier's per-row merge ([[HudiMeta.morMergedRows]]).
 * One log block is framed
 *
 *   magic "#HUDI#" (6B) | block size (8B) | format version (4B) |
 *   block type ordinal (4B) | header map | content length (8B) |
 *   content | footer map | total block length (8B)
 *
 * where `block size` counts every byte AFTER itself through the
 * trailing total-length long, the trailing long repeats the whole
 * block's size including magic (the spec's reverse-traversal pointer),
 * and a header/footer map is `count (4B)` then per entry
 * `key ordinal (4B) | value length (4B) | UTF-8 value`. Block type
 * ordinals follow the spec's enum order (command, delete, corrupt,
 * avro-data, hfile-data, parquet-data, cdc-data); header key ordinals
 * follow the spec's HeaderMetadataType order (instant time, target
 * instant time, schema, command block type, ...).
 *
 * Content encodings implemented here (both sides of this repo's
 * writer/reader pair, each documented where the public spec leaves
 * the byte encoding to the implementation):
 *  - AVRO DATA block: `content version (4B) | record count (4B)` then
 *    per record `size (4B) | avro-binary record` — decoded with the
 *    block's own SCHEMA header (the commit's writer schema), exactly
 *    the spec's data-block shape.
 *  - DELETE block: `content version (4B) | key count (4B)` then per
 *    key `length (4B) | UTF-8 record key` (the spec defines the
 *    delete block as the ordered record keys to delete; the Java
 *    implementation's avro-list encoding is not byte-mirrored here —
 *    this repo's fixtures and reader share this documented shape).
 *  - COMMAND block: empty content; COMMAND_BLOCK_TYPE header "0" is
 *    ROLLBACK (the spec's only command), TARGET_INSTANT_TIME names
 *    the instant whose earlier blocks the rollback invalidates.
 *
 * READER RULES (the spec's log-reader contract, all implemented by
 * [[walkBlocks]] + [[HudiLogFormat.validBlocks]]):
 *  - a non-magic byte run is a CORRUPT region: scan forward to the
 *    next magic and resume (partial/failed appends must not poison
 *    the chain);
 *  - a block whose declared sizes run past EOF or whose trailing
 *    length disagrees is CORRUPT from its magic on: scan forward;
 *  - a rollback COMMAND block invalidates every earlier-read block of
 *    its target instant across the file group's chain;
 *  - blocks of instants the timeline never completed are invisible
 *    (the reader trusts the timeline, not the log tail).
 *
 * Untrusted-input contract: every length field is bounds-checked
 * before any allocation (the same overflow-safe subtraction form as
 * the page decoders); garbage refuses classified or skips as corrupt,
 * never an index/NPE/negative-size crash.
 *
 * Reference scope note: the reference explores parquet metadata only
 * (`/root/reference/src/main/scala/com/github/sadikovi/metadata/
 * DefaultSource.scala:20-60`); the log walk extends this repo's Hudi
 * tier to the row-level depth its r17 census explicitly refused.
 */
object HudiLogFormat extends Serializable {

  val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  val FormatVersion = 1

  // block type ordinals (spec enum order)
  val CommandBlock = 0
  val DeleteBlock = 1
  val CorruptBlock = 2
  val AvroDataBlock = 3
  val HfileDataBlock = 4
  val ParquetDataBlock = 5
  val CdcDataBlock = 6

  // header key ordinals (spec HeaderMetadataType order)
  val InstantTime = 0
  val TargetInstantTime = 1
  val Schema = 2
  val CommandBlockType = 3

  /** One decoded (or corrupt-skipped) log block. */
  case class LogBlock(
      offset: Long, typeOrd: Int, header: Map[Int, String],
      content: Array[Byte], corrupt: Boolean)

  // -------------------------------------------------------------------
  // Writer (fixtures + tests)
  // -------------------------------------------------------------------

  private def mapBytes(m: Map[Int, String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(k); out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  /** Frame one block (any type) into its on-disk bytes. */
  def frameBlock(
      typeOrd: Int, header: Map[Int, String],
      content: Array[Byte]): Array[Byte] = {
    val h = mapBytes(header)
    val f = mapBytes(Map.empty)
    // version(4) + type(4) + header + contentLen(8) + content + footer
    // + trailer(8)
    val size = 4L + 4L + h.length + 8L + content.length + f.length + 8L
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(Magic)
    out.writeLong(size)
    out.writeInt(FormatVersion)
    out.writeInt(typeOrd)
    out.write(h)
    out.writeLong(content.length.toLong)
    out.write(content)
    out.write(f)
    out.writeLong(size + Magic.length + 8L) // whole block incl. magic
    out.flush(); bos.toByteArray
  }

  /** Avro data-block content: records binary-encoded with `schema`. */
  def avroDataContent(
      schema: org.apache.avro.Schema,
      records: Seq[org.apache.avro.generic.GenericRecord]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(1) // content format version
    out.writeInt(records.size)
    val writer =
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema)
    records.foreach { r =>
      val rb = new ByteArrayOutputStream()
      val enc = org.apache.avro.io.EncoderFactory.get()
        .binaryEncoder(rb, null)
      writer.write(r, enc)
      enc.flush()
      val bytes = rb.toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  /** Delete-block content: the record keys to delete, in order. */
  def deleteContent(keys: Seq[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(1) // content format version
    out.writeInt(keys.size)
    keys.foreach { k =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
    }
    out.flush(); bos.toByteArray
  }

  // -------------------------------------------------------------------
  // Reader
  // -------------------------------------------------------------------

  private def fail(where: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$where: $msg")

  private class Cursor(val bytes: Array[Byte], val where: String) {
    var pos: Int = 0
    def remaining: Int = bytes.length - pos
    def i32(): Int = {
      if (remaining < 4) fail(where, s"truncated int at offset $pos")
      val v = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4; v
    }
    def i64(): Long = {
      if (remaining < 8) fail(where, s"truncated long at offset $pos")
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (bytes(pos + i) & 0xffL); i += 1 }
      pos += 8; v
    }
    def take(n: Int): Array[Byte] = {
      // overflow-safe bounds form: n validated against remaining
      if (n < 0 || n > remaining) {
        fail(where, s"length $n at offset $pos runs past the block end")
      }
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; out
    }
  }

  private def readMap(c: Cursor): Map[Int, String] = {
    val n = c.i32()
    if (n < 0 || n > 1024) {
      fail(c.where, s"implausible metadata-map entry count $n")
    }
    (0 until n).map { _ =>
      val k = c.i32()
      val len = c.i32()
      k -> new String(c.take(len), "UTF-8")
    }.toMap
  }

  /**
   * Forward block walk of one log file's bytes: every well-formed
   * block decoded, every corrupt region collapsed into one
   * `corrupt=true` descriptor (scan-forward to the next magic, the
   * spec's reader rule for partial appends). Never throws on garbage
   * framing — a log tail an engine was killed mid-append over is the
   * EXPECTED input here; only implausible metadata inside an
   * otherwise well-framed block refuses classified.
   */
  def walkBlocks(bytes: Array[Byte], where: String): Seq[LogBlock] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[LogBlock]
    var pos = 0
    def nextMagic(from: Int): Int = {
      var i = from
      while (i <= bytes.length - Magic.length) {
        if (bytes(i) == '#' &&
            java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(bytes, i, i + Magic.length),
              Magic)) {
          return i
        }
        i += 1
      }
      bytes.length
    }
    while (pos < bytes.length) {
      val start = nextMagic(pos)
      if (start > pos) {
        out += LogBlock(pos.toLong, CorruptBlock, Map.empty,
          Array.empty, corrupt = true)
      }
      if (start >= bytes.length) {
        pos = bytes.length
      } else {
        // try to frame one block at `start`; any inconsistency marks
        // the region corrupt and resumes at the next magic
        val framed: Option[(LogBlock, Int)] =
          try {
            val c = new Cursor(bytes, where)
            c.pos = start + Magic.length
            val size = c.i64()
            // size spans version..trailer; bounds first, then trailer.
            // The minimum well-formed block is 32 bytes: version (4) +
            // type (4) + empty header map (4) + contentLen (8) + empty
            // footer map (4) + trailer (8) — anything shorter cannot
            // frame, so it is corrupt here rather than downstream (r19).
            if (size < 32 || size > c.remaining) None
            else {
              val blockEnd = c.pos + size.toInt
              val version = c.i32()
              if (version != FormatVersion) None
              else {
                val typeOrd = c.i32()
                val header = readMap(c)
                val contentLen = c.i64()
                // after content, at least an empty footer map (4B)
                // and the trailer (8B) must still fit
                if (contentLen < 0 || contentLen > blockEnd - c.pos - 12) {
                  None
                } else {
                  val content = c.take(contentLen.toInt)
                  val footer = readMap(c)
                  val trailer = c.i64()
                  if (c.pos != blockEnd ||
                      trailer != size + Magic.length + 8) {
                    None
                  } else {
                    Some((LogBlock(start.toLong, typeOrd, header, content,
                      corrupt = false), c.pos))
                  }
                }
              }
            }
          } catch {
            case _: IllegalArgumentException => None
          }
        framed match {
          case Some((blk, end)) =>
            out += blk
            pos = end
          case None =>
            out += LogBlock(start.toLong, CorruptBlock, Map.empty,
              Array.empty, corrupt = true)
            pos = nextMagic(start + Magic.length)
        }
      }
    }
    out.toSeq
  }

  /** Read and walk one log file. */
  def walkFile(path: Path, conf: Configuration): Seq[LogBlock] = {
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    if (len > (1L << 31) - 16) {
      throw new UnsupportedOperationException(
        s"$path: log file is ${len} bytes — larger than this walker's " +
          "single-buffer bound; refusing rather than truncating the walk")
    }
    val in = fs.open(path)
    val bytes = new Array[Byte](len.toInt)
    try in.readFully(0L, bytes) finally in.close()
    walkBlocks(bytes, path.toString)
  }

  /**
   * The VALID blocks of one file group's log chain (files already in
   * version order, blocks in file order): corrupt regions dropped,
   * rollback COMMAND blocks applied (every earlier block of the
   * TARGET_INSTANT_TIME is invalidated — the spec's rollback rule),
   * and blocks of instants outside `completedInstants` dropped (the
   * reader trusts the timeline, not the log tail — an in-flight
   * write's blocks are invisible until its deltacommit completes).
   * A data/delete block carrying no INSTANT_TIME header refuses: its
   * visibility is undecidable.
   */
  def validBlocks(
      chain: Seq[LogBlock], completedInstants: Set[String],
      where: String): Seq[LogBlock] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[LogBlock]
    chain.foreach { b =>
      if (b.corrupt) {
        // skipped (spec rule: partial appends are invisible)
      } else if (b.typeOrd == CommandBlock) {
        val target = b.header.getOrElse(TargetInstantTime,
          fail(where, "rollback command block carries no target instant"))
        buf.filterInPlace(x => !x.header.get(InstantTime).contains(target))
      } else if (b.typeOrd == CorruptBlock) {
        // a block explicitly typed corrupt never contributes
      } else {
        buf += b
      }
    }
    buf.toSeq.filter { b =>
      val it = b.header.getOrElse(InstantTime,
        fail(where, s"${blockTypeName(b.typeOrd)} block at offset " +
          s"${b.offset} carries no instant time — visibility undecidable"))
      completedInstants.contains(it)
    }
  }

  def blockTypeName(ord: Int): String = ord match {
    case CommandBlock => "command"
    case DeleteBlock => "delete"
    case CorruptBlock => "corrupt"
    case AvroDataBlock => "avro-data"
    case HfileDataBlock => "hfile-data"
    case ParquetDataBlock => "parquet-data"
    case CdcDataBlock => "cdc-data"
    case other => s"unknown($other)"
  }

  /** Decode one avro data block's records with its SCHEMA header. */
  def dataRecords(
      b: LogBlock, where: String): Seq[org.apache.avro.generic.GenericRecord] = {
    val schemaJson = b.header.getOrElse(Schema,
      fail(where, s"avro data block at offset ${b.offset} carries no " +
        "writer schema — rows undecodable"))
    val schema =
      try new org.apache.avro.Schema.Parser().parse(schemaJson)
      catch {
        case e: org.apache.avro.SchemaParseException =>
          fail(where, s"avro data block at offset ${b.offset} carries " +
            s"an unparseable writer schema (${e.getMessage})")
      }
    val c = new Cursor(b.content, where)
    val contentVersion = c.i32()
    if (contentVersion < 1 || contentVersion > 3) {
      fail(where, s"avro data block at offset ${b.offset} declares " +
        s"content version $contentVersion — outside the spec's range")
    }
    val n = c.i32()
    if (n < 0 || n > b.content.length) {
      fail(where, s"avro data block at offset ${b.offset} declares " +
        s"implausible record count $n")
    }
    val reader = new org.apache.avro.generic.GenericDatumReader[
      org.apache.avro.generic.GenericRecord](schema)
    (0 until n).map { _ =>
      val size = c.i32()
      val bytes = c.take(size)
      val dec = org.apache.avro.io.DecoderFactory.get()
        .binaryDecoder(bytes, null)
      try reader.read(null, dec)
      catch {
        case e @ (_: java.io.IOException | _: RuntimeException) =>
          fail(where, s"avro data block at offset ${b.offset}: record " +
            s"bytes do not decode with the declared writer schema " +
            s"(${e.getMessage})")
      }
    }
  }

  /** Decode one delete block's record keys. */
  def deleteKeys(b: LogBlock, where: String): Seq[String] = {
    val c = new Cursor(b.content, where)
    val contentVersion = c.i32()
    if (contentVersion < 1 || contentVersion > 3) {
      fail(where, s"delete block at offset ${b.offset} declares " +
        s"content version $contentVersion — outside the spec's range")
    }
    val n = c.i32()
    if (n < 0 || n > b.content.length) {
      fail(where, s"delete block at offset ${b.offset} declares " +
        s"implausible key count $n")
    }
    (0 until n).map { _ =>
      val len = c.i32()
      new String(c.take(len), "UTF-8")
    }
  }
}
