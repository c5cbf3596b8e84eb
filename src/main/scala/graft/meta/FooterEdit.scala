package graft.meta

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File, RandomAccessFile}

import scala.jdk.CollectionConverters._

import org.apache.parquet.format.{SortingColumn, Util}

/**
 * In-place parquet FOOTER editing for metadata only the footer carries.
 *
 * The concrete itch: `RowGroup.sorting_columns` — the format's declaration
 * that a row group's rows are sorted — has NO writer API in parquet-mr
 * 1.16 (Spark cannot set it at all), yet layout-aware readers key on it.
 * A parquet file is `[PAR1][data][footer thrift][u32 LE length][PAR1]`,
 * so declaring sort metadata after a sorted write is a pure footer
 * rewrite: decode the thrift tail, set the field, serialize, patch the
 * tail in place. Data pages are never touched — byte-identical before the
 * footer start, which the spec pins.
 *
 * Local-file tool by design (the post-write step of a sorted export);
 * object stores would rewrite-on-copy instead. The Hadoop local
 * filesystem's `.file.crc` sidecar is refreshed for the new bytes so
 * checksum-verified re-reads keep working.
 *
 * CAVEAT — pinned-version thrift round-trip: the footer is decoded and
 * re-serialized through the compiled parquet-format structs (1.16), so a
 * footer field added by a NEWER format revision than these structs know
 * would be dropped by the rewrite (thrift skips unknown fields on read).
 * Fine for files this pipeline wrote (same parquet-mr), but do not point
 * the editor at files from a writer newer than the linked parquet jars.
 */
object FooterEdit {
  private val MAGIC = Array[Byte]('P', 'A', 'R', '1')

  /** Shared footer rewrite: decode the thrift tail, apply `edit`, patch
    * the tail in place, refresh the checksum sidecar. */
  private def rewriteFooter(file: File)(
      edit: org.apache.parquet.format.FileMetaData => Unit): Unit = {
    val raf = new RandomAccessFile(file, "rw")
    try {
      val len = raf.length()
      require(len >= 12, s"not a parquet file (too short): $file")
      val tail = new Array[Byte](8)
      raf.seek(len - 8)
      raf.readFully(tail)
      require(java.util.Arrays.equals(tail.drop(4), MAGIC),
        s"not a parquet file (bad magic): $file")
      val footerLen =
        (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      require(footerLen > 0 && footerLen <= len - 12,
        s"corrupt footer length $footerLen in $file")
      val footerStart = len - 8 - footerLen
      val footer = new Array[Byte](footerLen)
      raf.seek(footerStart)
      raf.readFully(footer)
      val md = Util.readFileMetaData(new ByteArrayInputStream(footer))
      edit(md)
      val out = new ByteArrayOutputStream()
      Util.writeFileMetaData(md, out)
      val newFooter = out.toByteArray
      raf.seek(footerStart)
      raf.write(newFooter)
      raf.write(Array[Byte](
        (newFooter.length & 0xff).toByte, ((newFooter.length >> 8) & 0xff).toByte,
        ((newFooter.length >> 16) & 0xff).toByte, ((newFooter.length >> 24) & 0xff).toByte))
      raf.write(MAGIC)
      raf.setLength(footerStart + newFooter.length + 8)
    } finally raf.close()
    refreshCrcSidecar(file)
  }

  /** Declare `specs` as the sort order of EVERY row group of a local
    * parquet file (the caller asserts the data is actually sorted — this
    * writes the declaration, it cannot conjure sortedness). */
  def declareSortingColumns(file: File, specs: Seq[SortingColumnInfo]): Unit = {
    require(specs.nonEmpty, "empty sorting declaration")
    rewriteFooter(file) { md =>
      md.getRow_groups.asScala.foreach { rg =>
        require(specs.forall(s => s.columnIdx >= 0 &&
          s.columnIdx < rg.getColumnsSize),
          s"sorting column index out of range for $file")
        rg.setSorting_columns(specs.map(s =>
          new SortingColumn(s.columnIdx, s.descending, s.nullsFirst)).asJava)
      }
    }
  }

  /**
   * Merge `entries` into a file's key-value footer metadata (existing
   * keys overwritten, others preserved) — post-write provenance stamping
   * (pipeline version, snapshot id, audit state) without touching a data
   * byte, for the same reason sorting declarations need the footer
   * editor: parquet-mr offers no after-the-fact metadata API.
   */
  def setKeyValue(file: File, entries: Map[String, String]): Unit = {
    require(entries.nonEmpty, "empty key-value entries")
    rewriteFooter(file) { md =>
      val existing =
        if (md.isSetKey_value_metadata) md.getKey_value_metadata.asScala.toSeq
        else Seq.empty
      val kept = existing.filterNot(p => entries.contains(p.getKey))
      val added = entries.toSeq.sortBy(_._1).map { case (k, v) =>
        val p = new org.apache.parquet.format.KeyValue(k)
        p.setValue(v)
        p
      }
      md.setKey_value_metadata((kept ++ added).asJava)
    }
  }

  /** [[setKeyValue]] over every `.parquet` file under `dir`. */
  def setKeyValueDir(dir: String, entries: Map[String, String]): Unit = {
    val files = new File(dir).listFiles()
    require(files != null, s"not a directory: $dir")
    files.filter(_.getName.endsWith(".parquet")).foreach(setKeyValue(_, entries))
  }

  /** [[declareSortingColumns]] over every `.parquet` file under `dir`. */
  def declareSortingColumnsDir(dir: String, specs: Seq[SortingColumnInfo]): Unit = {
    val files = new File(dir).listFiles()
    require(files != null, s"not a directory: $dir")
    files.filter(_.getName.endsWith(".parquet"))
      .foreach(declareSortingColumns(_, specs))
  }

  /** Recompute the Hadoop local-fs checksum sidecar (`.name.crc`) so
    * checksum-verified reads survive the rewrite; files written without a
    * sidecar are left without one. Crash-safe: the data file is never
    * deleted — the fresh copy is renamed OVER it atomically, so a crash
    * at any point leaves the (already-rewritten) file in place, at worst
    * without a sidecar (the stale one must go first regardless: the
    * checksummed read the copy performs would reject it). */
  private def refreshCrcSidecar(file: File): Unit = {
    val sidecar = new File(file.getParentFile, "." + file.getName + ".crc")
    if (!sidecar.exists()) return
    val conf = new org.apache.hadoop.conf.Configuration()
    val localFs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    // the stale sidecar no longer matches the rewritten bytes; remove it
    // so the checksummed copy below reads the data file cleanly
    sidecar.delete()
    val src = new org.apache.hadoop.fs.Path(file.getAbsolutePath)
    val tmpFile = new File(file.getParentFile, file.getName + ".crctmp")
    val tmp = new org.apache.hadoop.fs.Path(tmpFile.getAbsolutePath)
    // round-trip through the checksummed fs: the copy to tmp writes a
    // fresh `.name.crctmp.crc` sidecar for byte-identical content
    org.apache.hadoop.fs.FileUtil.copy(localFs, src, localFs, tmp, false, conf)
    val tmpCrc = new File(file.getParentFile, "." + tmpFile.getName + ".crc")
    // same-directory atomic renames, sidecar first: between the two moves
    // the data file still exists and its new sidecar already matches it
    // (tmp is a byte-identical copy)
    java.nio.file.Files.move(tmpCrc.toPath, sidecar.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(tmpFile.toPath, file.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
