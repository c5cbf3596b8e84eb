package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Precombine-ordered payload resolution (r19): with
  * `hoodie.table.precombine.field` declared, same-key events resolve
  * by (ordering value, arrival) — arrival order only breaks ties, a
  * null ordering (deletes) sorts lowest; without the property the
  * contract stays pure last-wins. Pinned on the disagreeing-order
  * fixture and property-checked against a reference fold. */
class HudiMorPrecombineSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(sf("0.001") + "/documents.parquet")

  private def fresh(): String = {
    val d = Files.createTempDirectory("graft_hudimorpc").toString + "/tbl"
    HudiMeta.writeHudiMorPrecombineFixtureTable(spark, d, docs)
    d
  }

  private def baseRows: Seq[(Long, String, java.lang.Long)] =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSeq

  test("the high-ordering update beats the later low-ordering one AND " +
      "the delete; delete-only keys still die — differs from last-wins") {
    val d = fresh()
    val got = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    val expected = baseRows.flatMap { case (id, l, n) =>
      if (id % 10 == 0) Some((id, "hi", java.lang.Long.valueOf(500L)))
      else if (id % 25 == 0) None
      else Some((id, l, n))
    }.toSet
    assert(got === expected)
    // the answer genuinely differs from last-wins: last-wins would
    // hold ('lo', 100) on the updated keys and kill the %50 keys
    assert(baseRows.exists(_._1 % 10 == 0))
    assert(!got.exists(_._2 == "lo"))
    assert(baseRows.filter(_._1 % 50 == 0)
      .forall(k => got.contains((k._1, "hi", java.lang.Long.valueOf(500L)))))
  }

  test("property: resolveLatestEvents matches a reference fold across " +
      "random event mixes, with and without a precombine field") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val rnd = new scala.util.Random(20260816L)
    val schema = StructType(Seq(
      StructField("file_id", StringType),
      StructField("__seq", LongType),
      StructField("__key", StringType),
      StructField("__del", BooleanType),
      StructField("pc", LongType),
      StructField("payload", StringType)))
    (1 to 6).foreach { round =>
      // random events: ~5 keys, deletes carry null pc (as the walk
      // emits them), updates a random ordering value with forced ties
      val events = (1 to 40).map { seq =>
        val del = rnd.nextInt(4) == 0
        Row("f0", seq.toLong, s"k${rnd.nextInt(5)}", del,
          if (del) null else java.lang.Long.valueOf(rnd.nextInt(4).toLong),
          if (del) null else s"v$seq")
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(events, 3), schema)
      def reference(pc: Boolean): Map[String, (Boolean, String)] =
        events.groupBy(_.getString(2)).map { case (k, es) =>
          val win = es.maxBy { r =>
            val ord = if (!pc) 0L
              else if (r.isNullAt(4)) Long.MinValue
              else r.getLong(4)
            (ord, r.getLong(1))
          }
          k -> ((win.getBoolean(3), win.getString(5)))
        }
      Seq(Some("pc"), None).foreach { pcField =>
        val got = HudiMeta.resolveLatestEvents(df,
            Seq("__del", "pc", "payload"), pcField)
          .collect().map(r => r.getString(1) ->
            ((r.getBoolean(2), r.getString(4)))).toMap
        assert(got === reference(pcField.isDefined),
          s"round $round, pcField=$pcField")
      }
    }
  }

  test("without the property the same event stream resolves pure " +
      "last-wins (the fixture's log replayed on a no-precombine table)") {
    val d = fresh()
    val props = new java.io.File(d, ".hoodie/hoodie.properties")
    val body = new String(
      java.nio.file.Files.readAllBytes(props.toPath), "UTF-8")
    java.nio.file.Files.write(props.toPath,
      body.replace("hoodie.table.precombine.field=n_chars\n", "")
        .getBytes("UTF-8"))
    val got = HudiMeta.morMergedRows(spark, d).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null
        else java.lang.Long.valueOf(r.getLong(2)))).toSet
    // last event wins: the LATE 'lo' block lands on every %10 key —
    // including the %50 keys the mid-stream delete killed (they
    // resurrect); only delete-final keys (%25 ∧ ¬%10) die
    val expected = baseRows.flatMap { case (id, l, n) =>
      if (id % 10 == 0) Some((id, "lo", java.lang.Long.valueOf(100L)))
      else if (id % 25 == 0) None
      else Some((id, l, n))
    }.toSet
    assert(got === expected)
  }

  test("a precombine field that is not a base column refuses by name") {
    val d = fresh()
    val props = new java.io.File(d, ".hoodie/hoodie.properties")
    val body = new String(
      java.nio.file.Files.readAllBytes(props.toPath), "UTF-8")
    java.nio.file.Files.write(props.toPath,
      body.replace("precombine.field=n_chars", "precombine.field=ts")
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      HudiMeta.morMergedRows(spark, d).collect()
    }
    assert(e.getMessage.contains("precombine field 'ts'"))
  }
}
