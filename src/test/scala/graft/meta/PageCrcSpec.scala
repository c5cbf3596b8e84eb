package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec
import graft.functions.BytesCrc32

/** Page CRC verification: every header CRC of a freshly written file
  * verifies against a recompute over the page bytes, and a flipped byte in
  * a page body is DETECTED as a mismatch (with Hadoop's own local-fs
  * checksum sidecars removed, so it is OUR audit doing the detecting). */
class PageCrcSpec extends SparkSpec {

  private def crcOk = ColumnBridge.column(BytesCrc32(
      ColumnBridge.expression(col("page_content")))) ===
    col("crc").cast("long").bitwiseAND(lit(0xFFFFFFFFL))

  private def pageAudit(dir: String) =
    spark.read.format("metadata").option("level", "page")
      .option("pagecontent", "true").option("footercache", "false").load(dir)
      .agg(count(lit(1)).as("n_pages"),
        sum(when(col("crc").isNotNull, 1L).otherwise(0L)).as("n_with_crc"),
        sum(when(col("crc").isNotNull && crcOk, 1L).otherwise(0L)).as("n_ok"))
      .collect()(0)

  test("freshly written pages all carry a verifying CRC; corruption is detected") {
    val d = Files.createTempDirectory("graft_pagecrc").toString
    spark.range(0, 5000, 1, 1)
      .write.mode("overwrite")
      .option("parquet.enable.dictionary", "false")
      .option("parquet.page.row.count.limit", "500")
      .parquet(d)
    val clean = pageAudit(d)
    assert(clean.getLong(0) === 10L)
    assert(clean.getLong(1) === 10L, "writer did not populate page CRCs")
    assert(clean.getLong(2) === 10L, "a clean file failed CRC verification")

    // flip one byte INSIDE a page body (not a header): pick the second
    // page's midpoint from the decoded offsets, then drop Hadoop's .crc
    // sidecars so the local filesystem does not pre-empt our audit
    val page1 = spark.read.format("metadata").option("level", "page")
      .option("footercache", "false").load(d)
      .filter(col("page_id") === 1)
      .select(col("page_header_offset"), col("page_header_size"),
        col("page_compressed_size"))
      .collect()(0)
    val target = page1.getLong(0) + page1.getInt(1) + page1.getInt(2) / 2
    val dd = new java.io.File(d)
    val file = dd.listFiles().filter(_.getName.endsWith(".parquet")).head
    val raf = new java.io.RandomAccessFile(file, "rw")
    try {
      raf.seek(target)
      val b = raf.read()
      raf.seek(target)
      raf.write(b ^ 0x5A)
    } finally raf.close()
    dd.listFiles().filter(_.getName.endsWith(".crc")).foreach(_.delete())

    val dirty = pageAudit(d)
    assert(dirty.getLong(0) === 10L, "corruption broke the header walk itself")
    assert(dirty.getLong(1) === 10L)
    assert(dirty.getLong(2) === 9L,
      s"flipped byte not detected: ${dirty.getLong(2)} of 10 pages verified")
  }

  test("compressed pages verify too: the CRC covers the stored bytes") {
    val d = Files.createTempDirectory("graft_pagecrc_sz").toString
    spark.range(0, 3000, 1, 1)
      .select(col("id"), concat(lit("text"), col("id") % 17).as("s"))
      .write.mode("overwrite")
      .option("compression", "snappy")
      .option("parquet.page.row.count.limit", "1000")
      .parquet(d)
    val r = pageAudit(d)
    assert(r.getLong(0) > 0)
    assert(r.getLong(2) === r.getLong(1),
      "a stored-byte CRC failed: checksum does not cover compressed form")
  }
}
