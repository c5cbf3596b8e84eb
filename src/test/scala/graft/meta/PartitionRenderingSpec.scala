package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/**
 * Pins the stringified partition-value renderings across partition-column
 * types, matching the reference's documented forms (reference:
 * DefaultSourceSuite.scala:61-94 — e.g. timestamps as
 * `2020-02-02 01:02:03.0`, dates as `2020-02-02`). The Spark-4 risk is that
 * internal values (micros/days) leak through; rendering must go through the
 * external Scala types.
 */
class PartitionRenderingSpec extends SparkSpec {

  test("partition values of every type render in canonical external form") {
    val dir = Files.createTempDirectory("graft_ptypes").toString
    spark.range(0, 4, 1, 1)
      .withColumn("p_int", lit(7))
      .withColumn("p_long", lit(1234567890123L))
      .withColumn("p_double", lit(1.5d))
      .withColumn("p_bool", lit(true))
      .withColumn("p_string", lit("str"))
      .withColumn("p_date", to_date(lit("2020-02-02")))
      .withColumn("p_ts", to_timestamp(lit("2020-02-02 01:02:03")))
      .write.mode("overwrite")
      .partitionBy("p_int", "p_long", "p_double", "p_bool", "p_string", "p_date", "p_ts")
      .parquet(dir)

    val parts = spark.read.format("metadata").option("level", "file").load(dir)
      .select("partition").collect().map(_.getAs[Map[String, String]](0))
    assert(parts.nonEmpty)
    parts.foreach { m =>
      assert(m("p_int") === "7")
      assert(m("p_long") === "1234567890123")
      assert(m("p_double") === "1.5")
      assert(m("p_bool") === "true")
      assert(m("p_string") === "str")
      assert(m("p_date") === "2020-02-02")
      assert(m("p_ts") === "2020-02-02 01:02:03.0")
    }
  }
}
