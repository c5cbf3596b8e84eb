package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** One ORC stripe's physical layout, by position. */
case class OrcStripeInfo(
    id: Int, offset: Long, indexLength: Long, dataLength: Long,
    footerLength: Long, numRows: Long)

/** One leaf column's footer statistics: typed min/max/sum slots are
  * null when the column's type doesn't carry them. */
case class OrcColumnInfo(
    columnId: Int,
    path: String,
    typeName: String,
    numValues: Long,
    hasNull: Boolean,
    minLong: Option[Long], maxLong: Option[Long], sumLong: Option[Long],
    minDouble: Option[Double], maxDouble: Option[Double], sumDouble: Option[Double],
    minString: Option[String], maxString: Option[String])

/** One ORC row-group index entry: per (stripe × column × 10k-row group)
  * statistics — the structure ORC's reader consults for its finest-grain
  * skipping, the ORC sibling of the parquet page index. */
case class OrcRowIndexInfo(
    stripeId: Int,
    columnId: Int,
    path: String,
    entryId: Int,
    numRows: Long,
    numValues: Long,
    hasNull: Boolean,
    minLong: Option[Long], maxLong: Option[Long],
    minDouble: Option[Double], maxDouble: Option[Double],
    minString: Option[String], maxString: Option[String])

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
    stripes: Seq[OrcStripeInfo],
    columns: Seq[OrcColumnInfo])

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

  /** Dotted path + category name per schema column id (the same walk
    * the column level uses). */
  private def columnPaths(
      schema: org.apache.orc.TypeDescription): Map[Int, (String, String)] = {
    import scala.jdk.CollectionConverters._
    val out = scala.collection.mutable.Map.empty[Int, (String, String)]
    def visit(t: org.apache.orc.TypeDescription, prefix: String): Unit = {
      out(t.getId) = (if (prefix.isEmpty) "<root>" else prefix,
        t.getCategory.getName)
      val kids = Option(t.getChildren).map(_.asScala.toSeq).getOrElse(Seq.empty)
      val names =
        if (t.getCategory == org.apache.orc.TypeDescription.Category.STRUCT)
          t.getFieldNames.asScala.toSeq
        else kids.indices.map(i => s"_child$i")
      kids.zip(names).foreach { case (k, n) =>
        visit(k, if (prefix.isEmpty) n else s"$prefix.$n")
      }
    }
    visit(schema, "")
    out.toMap
  }

  /** Lift a (deserialized) typed ColumnStatistics into the flat slots. */
  private def liftStats(
      base: OrcRowIndexInfo,
      st: org.apache.orc.ColumnStatistics): OrcRowIndexInfo = st match {
    case i: org.apache.orc.IntegerColumnStatistics =>
      base.copy(minLong = Some(i.getMinimum), maxLong = Some(i.getMaximum))
    case d: org.apache.orc.DoubleColumnStatistics =>
      base.copy(minDouble = Some(d.getMinimum), maxDouble = Some(d.getMaximum))
    case s: org.apache.orc.StringColumnStatistics =>
      base.copy(minString = Option(s.getMinimum), maxString = Option(s.getMaximum))
    case _ => base
  }

  /**
   * Decode every ROW-GROUP INDEX entry of an ORC file: per (stripe ×
   * column × row group of `orc.row.index.stride` rows, default 10k) the
   * typed min/max/null statistics ORC's own reader consults for its
   * finest-grain skipping — read from the stripes' index streams through
   * orc-core's index reader (`RecordReaderImpl.readRowIndex`), the
   * per-entry protobuf statistics deserialized through the same
   * `ColumnStatisticsImpl` path the reader itself uses. Files written
   * with the row index disabled (stride 0) contribute zero entries, the
   * page-index convention. Entry row counts derive from the stride and
   * the stripe's row count (the last group is partial).
   */
  def readRowIndexes(path: Path, conf: Configuration): Seq[OrcRowIndexInfo] = {
    val reader = org.apache.orc.OrcFile.createReader(
      path, org.apache.orc.OrcFile.readerOptions(conf))
    try {
      import scala.jdk.CollectionConverters._
      val stride = reader.getRowIndexStride
      if (stride <= 0) return Seq.empty
      val schema = reader.getSchema
      val paths = columnPaths(schema)
      val rr = reader.rows().asInstanceOf[org.apache.orc.impl.RecordReaderImpl]
      try {
        // sargColumns must be a real (all-false) array: the index planner
        // indexes into it whenever the file carries bloom streams
        val noBlooms = new Array[Boolean](schema.getMaximumId + 1)
        reader.getStripes.asScala.toSeq.zipWithIndex.flatMap { case (s, si) =>
          val idx = rr.readRowIndex(si, null, noBlooms)
          idx.getRowGroupIndex.toSeq.zipWithIndex.flatMap { case (ri, colId) =>
            if (ri == null) Seq.empty
            else {
              val n = ri.getEntryCount
              (0 until n).map { e =>
                val entry = ri.getEntry(e)
                val rows =
                  if (e == n - 1) s.getNumberOfRows - e.toLong * stride
                  else stride.toLong
                val (p, tpe) = paths.getOrElse(colId, (s"<col$colId>", "unknown"))
                val st = org.apache.orc.impl.ColumnStatisticsImpl.deserialize(
                  schema.findSubtype(colId), entry.getStatistics)
                liftStats(OrcRowIndexInfo(si, colId, p, e, rows,
                  st.getNumberOfValues, st.hasNull,
                  None, None, None, None, None, None), st)
              }
            }
          }
        }
      } finally {
        rr.close()
      }
    } finally {
      reader.close()
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
      // file-footer column statistics, one per schema column id; paths
      // come from the TypeDescription walk (dotted like the parquet tier)
      val schema = reader.getSchema
      val paths = columnPaths(schema)
      val columns = reader.getStatistics.zipWithIndex.map { case (st, id) =>
        val (path, tpe) = paths.getOrElse(id, (s"<col$id>", "unknown"))
        val base = OrcColumnInfo(id, path, tpe, st.getNumberOfValues,
          st.hasNull, None, None, None, None, None, None, None, None)
        st match {
          case i: org.apache.orc.IntegerColumnStatistics =>
            base.copy(minLong = Some(i.getMinimum), maxLong = Some(i.getMaximum),
              sumLong = if (i.isSumDefined) Some(i.getSum) else None)
          case d: org.apache.orc.DoubleColumnStatistics =>
            base.copy(minDouble = Some(d.getMinimum),
              maxDouble = Some(d.getMaximum), sumDouble = Some(d.getSum))
          case s: org.apache.orc.StringColumnStatistics =>
            base.copy(minString = Option(s.getMinimum),
              maxString = Option(s.getMaximum))
          case _ => base
        }
      }.toSeq
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
        stripes = stripes,
        columns = columns)
    } finally {
      reader.close()
    }
  }
}
