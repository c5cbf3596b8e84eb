package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** One ORC stripe's physical layout, by position. */
case class OrcStripeInfo(
    id: Int, offset: Long, indexLength: Long, dataLength: Long,
    footerLength: Long, numRows: Long)

/** Decoded ORC file tail (postscript + footer + metadata). */
case class OrcInfo(
    numRows: Long,
    numStripes: Int,
    compression: String,
    compressionBlockSize: Int,
    fileVersion: String,
    writerVersion: String,
    schemaString: String,
    userMetadata: Option[Map[String, String]],
    stripes: Seq[OrcStripeInfo])

/**
 * ORC file-tail decode for the metadata source's `orc` tier — the ORC
 * sibling of [[Footers]]: one targeted tail read (the ORC reader seeks
 * to the postscript, like the parquet footer walk), decoded through the
 * orc-core library Spark already ships rather than a hand-rolled
 * protobuf walk (the reference never decodes ORC at all; parity is the
 * SHAPE — file + sub-file-unit levels — re-expressed for the second
 * major columnar format a lake audit meets).
 */
object OrcMeta {

  private val MAGIC = Array[Byte]('O', 'R', 'C')

  /** True if the file starts with the ORC magic bytes. */
  def isOrc(fs: FileSystem, path: Path): Boolean = {
    val in = fs.open(path)
    try {
      val head = new Array[Byte](3)
      in.readFully(head)
      java.util.Arrays.equals(head, MAGIC)
    } catch {
      case _: java.io.EOFException => false
    } finally {
      in.close()
    }
  }

  /** Read and fully decode one ORC file's tail. */
  def read(path: Path, conf: Configuration): OrcInfo = {
    val reader = org.apache.orc.OrcFile.createReader(
      path, org.apache.orc.OrcFile.readerOptions(conf))
    try {
      import scala.jdk.CollectionConverters._
      val stripes = reader.getStripes.asScala.toSeq.zipWithIndex.map {
        case (s, i) => OrcStripeInfo(i, s.getOffset, s.getIndexLength,
          s.getDataLength, s.getFooterLength, s.getNumberOfRows)
      }
      val keys = reader.getMetadataKeys.asScala.toSeq
      val userMeta =
        if (keys.isEmpty) None
        else Some(keys.map { k =>
          val bb = reader.getMetadataValue(k)
          val arr = new Array[Byte](bb.remaining())
          bb.get(arr)
          k -> new String(arr, java.nio.charset.StandardCharsets.UTF_8)
        }.toMap)
      OrcInfo(
        numRows = reader.getNumberOfRows,
        numStripes = stripes.length,
        compression = String.valueOf(reader.getCompressionKind),
        compressionBlockSize = reader.getCompressionSize,
        fileVersion = reader.getFileVersion.getName,
        writerVersion = String.valueOf(reader.getWriterVersion),
        schemaString = reader.getSchema.toString,
        userMetadata = userMeta,
        stripes = stripes)
    } finally {
      reader.close()
    }
  }
}
