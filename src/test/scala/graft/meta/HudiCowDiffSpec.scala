package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COW row-level changes by slice diff ([[HudiMeta.cowIncrementalRows]]):
  * update/insert/delete classification from content, unchanged rows
  * silent, untouched groups unread, bootstrap semantics, and the
  * refusal posture (clustering in window, cleaned baseline). */
class HudiCowDiffSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (c1, c2) = ("20240101000000000", "20240102000000000")

  private def fresh(): String = {
    val d = Files.createTempDirectory("graft_hudicd").toString + "/tbl"
    HudiMeta.writeHudiCowDiffFixtureTable(spark, d, docs)
    d
  }

  private def rows: Seq[(Long, String, java.lang.Long)] =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSeq

  private def gotSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1),
      if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)),
      if (r.isNullAt(3)) null else r.getString(3),
      if (r.isNullAt(4)) null
      else java.lang.Long.valueOf(r.getLong(4)))).toSet

  test("slice diff: updates, inserts, old-value deletes; unchanged " +
      "and untouched rows silent") {
    val d = fresh()
    val got = gotSet(HudiMeta.cowIncrementalRows(spark, d, c1, c2))
    val expected = (rows.filter(r =>
        r._1 % 12 == 0 && r._1 % 15 != 0).map { case (id, l, n) =>
        ("upsert", id.toString, java.lang.Long.valueOf(id), l,
          if (n == null) null else java.lang.Long.valueOf(n + 100L))
      } ++
      rows.filter(_._1 % 3 == 2).map { case (id, l, n) =>
        ("upsert", id.toString, java.lang.Long.valueOf(id), l, n)
      } ++
      rows.filter(_._1 % 15 == 0).map { case (id, l, n) =>
        ("delete", id.toString, java.lang.Long.valueOf(id), l, n)
      }).toSet
    assert(got === expected)
    // fid1's untouched rows (doc_id%3==1) never surface
    assert(!got.exists(r => r._3 != null && r._3 % 3 == 1))
    // bootstrap: everything at c1 as upserts, no deletes
    val boot = HudiMeta.cowIncrementalRows(spark, d, "0", c1)
    assert(boot.filter(col("change_type") === "delete").count() === 0)
    assert(boot.count() === rows.count(_._1 % 3 < 2).toLong)
  }

  test("a base column colliding with the machinery's internals " +
      "refuses classified, never an ambiguous-plan error") {
    val d = fresh()
    // rewrite the window's slices with a conflicting 'file_id' column
    Seq(("p=0/fid0_0-0-0_", 0), ("p=1/fid2_0-0-0_", 2)).foreach {
      case (prefix, m) =>
        val slice = docs.select(col("doc_id"), col("lang"),
            col("n_chars"))
          .filter(pmod(col("doc_id"), lit(3)) === m)
          .withColumn("file_id", lit(1L))
        FixtureIO.writeSingleParquet(slice,
          new java.io.File(d, s"$prefix$c2.parquet"),
          d + s"_colfix$m")
    }
    val e = intercept[UnsupportedOperationException] {
      HudiMeta.cowIncrementalRows(spark, d, c1, c2)
    }
    assert(e.getMessage.contains("file_id"))
  }

  test("refusals: clustering in window; cleaned diff baseline") {
    val d = fresh()
    // a completed replacecommit inside the window
    val hoodie = new java.io.File(d, ".hoodie")
    java.nio.file.Files.write(
      new java.io.File(hoodie, "20240103000000000.replacecommit").toPath,
      "{}".getBytes("UTF-8"))
    val e = intercept[UnsupportedOperationException] {
      HudiMeta.cowIncrementalRows(spark, d, c1, "20240103000000000")
    }
    assert(e.getMessage.contains("clustering") ||
      e.getMessage.contains("replacecommit"))
    // cleaned baseline: the prior slice file is gone from disk
    val d2 = fresh()
    val prior = new java.io.File(d2, s"p=0/fid0_0-0-0_$c1.parquet")
    assert(prior.delete())
    val e2 = intercept[UnsupportedOperationException] {
      HudiMeta.cowIncrementalRows(spark, d2, c1, c2)
    }
    assert(e2.getMessage.contains("gone from disk"))
  }
}
