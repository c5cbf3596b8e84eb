package graft.meta

import org.apache.hadoop.fs.Path

import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.MessageTypeParser

/**
 * Controlled-layout parquet writer: exact row-group boundaries via
 * parquet-mr's `withRowGroupRowCountLimit` (the record writer flushes the
 * moment the count is hit, so boundaries land exactly where declared —
 * something Spark's size-triggered writer cannot promise). Exists because
 * multi-column pruning ([[MetaPrune.readPrunedWhere]]) is only
 * demonstrable on layouts where per-row-group column alignment is exact:
 * its oracle fixture needs "row group 0 is (Jan, low ids), row group 1 is
 * (Feb, high ids)" to the row.
 */
object RowGroupWriter {

  /** Write `(dateDays, k)` rows as `{required int32 od (DATE); required
    * int64 k;}` with row groups of exactly `rowGroupRows` rows. */
  def writeDateLongFile(
      file: String, rows: Seq[(Int, Long)], rowGroupRows: Int): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      "message m { required int32 od (DATE); required int64 k; }")
    val writer = ExampleParquetWriter.builder(new Path(file))
      .withType(schema)
      .withRowGroupRowCountLimit(rowGroupRows)
      .withDictionaryEncoding(false)
      .build()
    try {
      val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      rows.foreach { case (od, k) =>
        writer.write(gf.newGroup().append("od", od).append("k", k))
      }
    } finally writer.close()
  }

  /** Write an optional-double column (None = null), optionally under
    * BYTE_STREAM_SPLIT — the FP encoding parquet-mr 1.16 only exposes
    * through the writer builder, never through Spark's options. */
  def writeDoubleFile(
      file: String, values: Seq[Option[Double]],
      byteStreamSplit: Boolean): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      "message m { optional double v; }")
    val writer = ExampleParquetWriter.builder(new Path(file))
      .withType(schema)
      .withDictionaryEncoding(false)
      .withByteStreamSplitEncoding(byteStreamSplit)
      .build()
    try {
      val gf = new org.apache.parquet.example.data.simple.SimpleGroupFactory(schema)
      values.foreach { v =>
        val g = gf.newGroup()
        v.foreach(g.append("v", _))
        writer.write(g)
      }
    } finally writer.close()
  }
}
