package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Composite record keys (r19 — the r18 refusal at recordKeyFields
  * lifted): the MOR per-row merge, the merged census and the row-level
  * change feed on a two-field key, with base rows and log events
  * meeting on the complex key generator's public
  * `field1:val1,field2:val2` rendering (null → `__null__`). */
class HudiMorCompositeSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private val (dc1, dc2) = ("20240101000000000", "20240102000000000")

  private def fresh(): String = {
    val d = Files.createTempDirectory("graft_hudimorck").toString + "/tbl"
    HudiMeta.writeHudiMorCompositeFixtureTable(spark, d, docs)
    d
  }

  private def baseRows: Seq[(Long, String, java.lang.Long)] =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSeq

  private def render(id: Long, lang: String): String =
    s"doc_id:$id,lang:${
      if (lang == null) "__null__"
      else if (lang.isEmpty) "__empty__" else lang}"

  test("merged live rows on a composite key: updates land, the delete " +
      "block's rendered keys kill exactly their rows") {
    val d = fresh()
    val got = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    val expected = baseRows.flatMap { case (id, l, n) =>
      if (id % 2 == 1) Some((id, l, n))          // fid1 untouched
      else if (id % 50 == 0) None                 // deleted (last wins)
      else if (id % 20 == 0) {
        Some((id, l,
          if (n == null) null else java.lang.Long.valueOf(n + 1000L)))
      } else Some((id, l, n))
    }.toSet
    assert(got === expected)
  }

  test("the change feed surfaces the composite rendering as " +
      "record_key — null lang renders __null__") {
    val d = fresh()
    val got = HudiMeta.morIncrementalRows(spark, d, dc1, dc2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val g = baseRows.filter(_._1 % 2 == 0)
    val expected =
      (g.filter(k => k._1 % 20 == 0 && k._1 % 50 != 0).map {
        case (id, l, _) => ("upsert", render(id, l))
      } ++ g.filter(_._1 % 50 == 0).map { case (id, l, _) =>
        ("delete", render(id, l))
      }).toSet
    assert(got === expected)
    // every key carries both field names in generator order
    assert(got.forall(_._2.matches("^doc_id:-?\\d+,lang:.+$")))
    // the fixture data has null langs — the placeholder must appear
    if (g.exists(k => k._2 == null &&
        (k._1 % 20 == 0 || k._1 % 50 == 0))) {
      assert(got.exists(_._2.endsWith("lang:__null__")))
    }
  }

  test("merged census on the composite key agrees with the event " +
      "arithmetic") {
    val d = fresh()
    val got = HudiMeta.morMergedCensus(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(6)).toMap
    val g = baseRows.filter(_._1 % 2 == 0)
    assert(got === Map(
      "fid0" -> (g.size - g.count(_._1 % 50 == 0)).toLong,
      "fid1" -> baseRows.count(_._1 % 2 == 1).toLong))
  }

  test("composite keys COMPOSE with precombine ordering: the ordered " +
      "update beats the later delete on the same composite key") {
    val d = fresh()
    val props = new java.io.File(d, ".hoodie/hoodie.properties")
    java.nio.file.Files.write(props.toPath,
      (new String(java.nio.file.Files.readAllBytes(props.toPath),
        "UTF-8") + "hoodie.table.precombine.field=n_chars\n")
        .getBytes("UTF-8"))
    val got = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    val expected = baseRows.flatMap { case (id, l, n) =>
      if (id % 2 == 1) Some((id, l, n))
      else if (id % 20 == 0) {
        // the update's ordering value is n+1000 (null stays null);
        // a non-null ordering beats the delete's null one even on
        // the %100 overlap keys — they RESURRECT under precombine
        if (n != null) {
          Some((id, l, java.lang.Long.valueOf(n + 1000L)))
        } else if (id % 50 == 0) None // null-vs-null: later delete wins
        else Some((id, l, null: java.lang.Long))
      }
      else if (id % 50 == 0) None
      else Some((id, l, n))
    }.toSet
    assert(got === expected)
  }

  test("a key field missing from the base columns refuses by name") {
    val d = fresh()
    val props = new java.io.File(d, ".hoodie/hoodie.properties")
    val body = new String(
      java.nio.file.Files.readAllBytes(props.toPath), "UTF-8")
    java.nio.file.Files.write(props.toPath,
      body.replace("doc_id,lang", "doc_id,nope").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      HudiMeta.morMergedRows(spark, d).collect()
    }
    assert(e.getMessage.contains("'nope'"))
  }
}
