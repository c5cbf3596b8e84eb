package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stats-driven data-file pruning: footer min/max statistics select the
  * files a range predicate needs; the pruned read is sound (equal rows)
  * and actually skips files. */
class MetaPruneSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_metaprune").toString
    // 4 files with disjoint, sorted id ranges: [0,25), [25,50), [50,75), [75,100)
    spark.range(0, 100).withColumn("part", col("id") / 25)
      .repartitionByRange(4, col("part"))
      .drop("part")
      .sortWithinPartitions(col("id"))
      .write.mode("overwrite").parquet(d)
    d
  }

  test("decodeLong reads plain little-endian int32/int64 stats") {
    assert(MetaPrune.decodeLong(Array[Byte](7, 0, 0, 0), "INT32") === Some(7L))
    assert(MetaPrune.decodeLong(Array[Byte](-1, -1, -1, -1), "INT32") === Some(-1L))
    assert(MetaPrune.decodeLong(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), "INT64") === Some(1L))
    assert(MetaPrune.decodeLong(Array[Byte](1, 2), "INT64") === None) // short
    assert(MetaPrune.decodeLong(Array[Byte](1, 2, 3, 4), "BYTE_ARRAY") === None)
  }

  test("PlainStatLong codegen expression matches the driver-side decode") {
    import spark.implicits._
    val rows = Seq(
      (Array[Byte](7, 0, 0, 0), "INT32"),
      (Array[Byte](-1, -1, -1, -1), "INT32"),
      (Array[Byte](1, 0, 0, 0, 0, 0, 0, 0), "INT64"),
      (Array[Byte](1, 2), "INT64"),
      (Array[Byte](1, 2, 3, 4), "BYTE_ARRAY"),
      (null.asInstanceOf[Array[Byte]], "INT32"))
    import org.apache.spark.sql.graft.ColumnBridge
    val out = rows.toDF("b", "t")
      .select(ColumnBridge.column(graft.functions.PlainStatLong(
        ColumnBridge.expression(col("b")), ColumnBridge.expression(col("t")))))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq === Seq(Some(7L), Some(-1L), Some(1L), None, None, None))
  }

  test("range pruning selects only the files whose stats admit the range") {
    val all = spark.read.format("metadata").option("level", "file")
      .load(dir).count()
    assert(all === 4)
    val hit = MetaPrune.filesInRange(spark, dir, "id", 30, 40)
    assert(hit.length === 1, s"expected 1 file for [30,40], got $hit")
    val spanning = MetaPrune.filesInRange(spark, dir, "id", 20, 60)
    assert(spanning.length === 3, s"expected 3 files for [20,60], got $spanning")
    val none = MetaPrune.filesInRange(spark, dir, "id", 1000, 2000)
    assert(none.isEmpty)
  }

  test("pruned read plus predicate equals the full scan plus predicate") {
    val full = spark.read.parquet(dir)
      .filter(col("id") >= 30 && col("id") <= 40)
      .collect().map(_.getLong(0)).toSet
    val pruned = MetaPrune.readPruned(spark, dir, "id", 30, 40)
      .filter(col("id") >= 30 && col("id") <= 40)
      .collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(full === (30L to 40L).toSet)
    // empty range keeps the schema
    val empty = MetaPrune.readPruned(spark, dir, "id", 1000, 2000)
    assert(empty.schema.fieldNames.contains("id"))
    assert(empty.count() === 0)
  }

  test("a column absent from the footers keeps every file (soundness)") {
    val kept = MetaPrune.filesInRange(spark, dir, "no_such_column", 0, 1)
    assert(kept.length === 4)
  }

  test("unsigned schema declarations disable pruning (soundness)") {
    assert(MetaPrune.hasUnsigned("optional int32 x (UINT_32);"))
    assert(MetaPrune.hasUnsigned("optional int64 x (INTEGER(64,false));"))
    assert(MetaPrune.hasUnsigned("required int32 y (INTEGER(32, false));"))
    assert(!MetaPrune.hasUnsigned("optional int32 x (INTEGER(32,true));"))
    assert(!MetaPrune.hasUnsigned("optional int64 x; optional binary t (STRING);"))
  }

  test("pruned read preserves Hive partition columns") {
    val d = Files.createTempDirectory("graft_metaprune_part").toString
    spark.range(0, 40)
      .withColumn("ds", when(col("id") < 20, "a").otherwise("b"))
      .write.partitionBy("ds").mode("overwrite").parquet(d)
    val pruned = MetaPrune.readPruned(spark, d, "id", 0, 100)
    assert(pruned.schema.fieldNames.contains("ds"))
    val full = spark.read.parquet(d)
      .select("id", "ds").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = pruned.select("id", "ds").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === full)
  }
}
