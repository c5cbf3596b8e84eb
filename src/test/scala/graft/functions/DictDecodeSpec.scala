package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSpec

/** PLAIN BYTE_ARRAY dictionary payload decode: well-formed round trips,
  * malformed payloads stay distinguishable as null, both input renderings
  * (binary and the page level's array<byte>) decode identically. */
class DictDecodeSpec extends SparkSpec {

  private def enc(vals: String*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach { v =>
      val b = v.getBytes("UTF-8")
      out.write(b.length); out.write(b.length >> 8)
      out.write(b.length >> 16); out.write(b.length >> 24)
      out.write(b)
    }
    out.toByteArray
  }

  test("driver-side compute round-trips values incl. empties and UTF-8") {
    val got = PlainDictStrings.compute(enc("a", "", "naïve", "tag17"))
    assert(got != null)
    assert(got.toArray[org.apache.spark.unsafe.types.UTF8String](
      org.apache.spark.sql.types.StringType).map(_.toString).toSeq ===
      Seq("a", "", "naïve", "tag17"))
    assert(PlainDictStrings.compute(Array.emptyByteArray)
      .numElements() === 0)
  }

  test("malformed payloads decode to null, not garbage") {
    // truncated length prefix
    assert(PlainDictStrings.compute(Array[Byte](3, 0)) == null)
    // length overruns the buffer
    assert(PlainDictStrings.compute(Array[Byte](5, 0, 0, 0, 'a')) == null)
    // negative length
    assert(PlainDictStrings.compute(Array[Byte](-1, -1, -1, -1)) == null)
    // REGRESSION (DecodeFuzzSpec seed 777023): a length prefix near
    // Int.MaxValue made `i + len` wrap negative, sneaking a ~2 GB
    // copyOfRange allocation past the additive bounds check — the
    // decode must refuse, never allocate from an untrusted length
    assert(PlainDictStrings.compute(
      Array[Byte](-1, -1, -1, 0x7F)) == null) // len = Int.MaxValue
    assert(PlainDictStrings.compute(
      Array[Byte](0x7A, -1, -1, 0x7F, 1, 2, 3)) == null)
  }

  test("plain int64 payload sum: round trip, wrap-around, malformed") {
    val bb = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(5L).putLong(-2L).putLong(Long.MaxValue)
    val expect = 5L + -2L + Long.MaxValue // wrap-around, same as the oracle's BIGINT
    assert(PlainInt64Sum.compute(bb.array()) === java.lang.Long.valueOf(expect))
    assert(PlainInt64Sum.compute(Array.emptyByteArray) === java.lang.Long.valueOf(0L))
    // not a multiple of 8: must be null, not a partial sum
    assert(PlainInt64Sum.compute(Array[Byte](1, 2, 3)) == null)
  }

  test("codegen expression matches driver compute on binary and array<byte>") {
    import spark.implicits._
    val payload = enc("x", "yy", "zzz")
    val decode = (c: org.apache.spark.sql.Column) => ColumnBridge.column(
      PlainDictStrings(ColumnBridge.expression(c)))
    val viaBinary = Seq(payload).toDF("b")
      .select(decode(col("b")).as("v")).collect()(0).getSeq[String](0)
    val viaByteArray = Seq(payload.toSeq).toDF("b") // array<byte> column
      .select(decode(col("b")).as("v")).collect()(0).getSeq[String](0)
    assert(viaBinary === Seq("x", "yy", "zzz"))
    assert(viaByteArray === viaBinary)
  }
}
