package graft.meta

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.IcebergTransformHash

/** The Iceberg spec's 32-bit hash (Appendix B) pinned to the spec's own
  * published test vectors, plus the transform-prune tier end-to-end on
  * the hand-written bucket/truncate/day fixtures. */
class IcebergTransformSpec extends SparkSpec {

  test("Appendix-B hash vectors pin the murmur3 implementation") {
    // int and long PROMOTE to the same 8-byte little-endian value
    assert(IcebergTransformHash.hashLong(34L) === 2017239379)
    // string = murmur3 of the UTF-8 bytes
    assert(IcebergTransformHash.hashString("iceberg") === 1210000089)
    // date = epoch days as the long family (2017-11-16 = day 17486)
    assert(java.time.LocalDate.parse("2017-11-16").toEpochDay === 17486L)
    assert(IcebergTransformHash.hashLong(17486L) === -653330422)
    // timestamp = epoch MICROS as the long family (2017-11-16T22:31:08)
    val micros = java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L
    assert(IcebergTransformHash.hashLong(micros) === -2047944441)
    // raw bytes vector: \x00\x01\x02\x03
    assert(IcebergTransformHash.murmur3(
      Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("bucket and truncate transform semantics") {
    // bucket = (hash & Int.MaxValue) % N — never negative
    for (v <- Seq(Long.MinValue, -7L, 0L, 7L, Long.MaxValue); n <- Seq(1, 4, 16)) {
      val b = IcebergTransformHash.bucketLong(v, n)
      assert(b >= 0 && b < n)
    }
    // truncate floors toward -inf (the spec's width multiple), not 0
    assert(IcebergTransformHash.truncateLong(250L, 100L) === 200L)
    assert(IcebergTransformHash.truncateLong(-1L, 10L) === -10L)
    assert(IcebergTransformHash.truncateLong(-10L, 10L) === -10L)
    // string truncation counts CODEPOINTS, never bytes
    assert(IcebergTransformHash.truncateString("abcdef", 3) === "abc")
    assert(IcebergTransformHash.truncateString("ab", 3) === "ab")
    assert(IcebergTransformHash.truncateString("😀xy", 2) ===
      "😀x")
  }

  test("iceberg_bucket expression matches the driver-side hash and SQL") {
    import spark.implicits._
    val df = Seq(34L, 7L, 0L, -5L).toDF("v")
      .selectExpr("v", "iceberg_bucket(v, 4) AS b")
    df.collect().foreach { r =>
      assert(r.getInt(1) ===
        IcebergTransformHash.bucketLong(r.getLong(0), 4))
    }
    // string input hashes UTF-8 bytes
    val s = Seq("iceberg").toDF("s")
      .selectExpr("iceberg_bucket(s, 16) AS b").head().getInt(0)
    assert(s === IcebergTransformHash.bucketString("iceberg", 16))
  }

  private lazy val docs = spark.read.parquet(sf("0.001") + "/documents.parquet")

  test("bucketPrune keeps exactly the probe's bucket; pruned files lack the id") {
    val dir = "/tmp/graft_test_icebkt"
    IcebergMeta.writeBucketFixtureTable(spark, dir, docs)
    val probe = 7L
    val rows = IcebergMeta.bucketPrune(spark, dir, "doc_id", probe).collect()
    assert(rows.nonEmpty)
    val survivors = rows.filter(_.getBoolean(2)).map(_.getString(0))
    assert(survivors.length === 1)
    // the surviving file holds the probe row; every pruned file does not
    assert(spark.read.parquet(survivors.head)
      .filter(col("doc_id") === probe).count() === 1L)
    rows.filterNot(_.getBoolean(2)).foreach { r =>
      assert(spark.read.parquet(r.getString(0))
        .filter(col("doc_id") === probe).count() === 0L)
    }
    // executable form agrees with a direct filter over all files
    val got = IcebergMeta.readBucketPruned(spark, dir, "doc_id", probe)
      .filter(col("doc_id") === probe).count()
    assert(got === 1L)
  }

  test("truncatePrune is conservative and prunes provably-disjoint files") {
    val dir = "/tmp/graft_test_icetrn"
    IcebergMeta.writeTruncateFixtureTable(spark, dir, docs)
    val rows = IcebergMeta.truncatePrune(spark, dir, "k", 120L, 250L)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val inRange = spark.read.parquet(r.getString(0))
        .filter(col("k").between(120L, 250L)).count()
      if (!r.getBoolean(2)) {
        assert(inRange === 0L, s"pruned ${r.getString(0)} held $inRange rows")
      }
    }
    // the survivor set covers every in-range row
    val surviving = rows.filter(_.getBoolean(2)).map(_.getString(0))
    val all = rows.map(_.getString(0))
    assert(spark.read.parquet(surviving: _*)
      .filter(col("k").between(120L, 250L)).count() ===
      spark.read.parquet(all: _*)
        .filter(col("k").between(120L, 250L)).count())
  }

  test("daysPrune resolves epoch-day tuples to dates and prunes by range") {
    val dir = "/tmp/graft_test_icedays"
    val events = spark.read.parquet(sf("0.001") + "/events.parquet")
    IcebergMeta.writeDaysFixtureTable(spark, dir, events)
    val rows = IcebergMeta.daysPrune(
      spark, dir, "ts", "2024-01-10", "2024-01-14").collect()
    assert(rows.length === 30)
    assert(rows.count(_.getBoolean(2)) === 5)
    rows.foreach { r =>
      val day = r.getDate(1).toLocalDate
      val want = !day.isBefore(java.time.LocalDate.parse("2024-01-10")) &&
        !day.isAfter(java.time.LocalDate.parse("2024-01-14"))
      assert(r.getBoolean(2) === want)
      // the tuple day matches the file's own rows
      val dataDay = spark.read.parquet(r.getString(0))
        .select(to_date(col("ts"))).distinct().collect()
      assert(dataDay.length === 1 &&
        dataDay.head.getDate(0).toLocalDate === day)
    }
  }

  test("monthsPrune and yearsPrune window by calendar unit") {
    val dm = "/tmp/graft_test_icemon"
    IcebergMeta.writeTimeTransformFixtureTable(spark, dm, docs, "month")
    val months = IcebergMeta.monthsPrune(
      spark, dm, "ts", "2023-08-15", "2023-11-02").collect()
    assert(months.length === 10) // 2023-06 .. 2024-03
    val kept = months.filter(_.getBoolean(2))
      .map(_.getDate(1).toLocalDate.toString).sorted
    assert(kept.toSeq === Seq(
      "2023-08-01", "2023-09-01", "2023-10-01", "2023-11-01"))
    // conservatism: every pruned file holds zero rows in the window
    months.filterNot(_.getBoolean(2)).foreach { r =>
      val n = spark.read.parquet(r.getString(0))
        .filter(col("ts").between("2023-08-15", "2023-11-02 23:59:59"))
        .count()
      assert(n === 0L, s"pruned ${r.getString(0)} held $n in-window rows")
    }
    val dy = "/tmp/graft_test_iceyr"
    IcebergMeta.writeTimeTransformFixtureTable(spark, dy, docs, "year")
    val years = IcebergMeta.yearsPrune(spark, dy, "ts", 2024, 2024)
      .collect().map(r => r.getInt(1) -> r.getBoolean(2)).toMap
    assert(years === Map(2023 -> false, 2024 -> true))
  }

  test("hoursPrune windows by epoch hour, conservative on pruned files") {
    val dh = "/tmp/graft_test_icehr"
    IcebergMeta.writeTimeTransformFixtureTable(spark, dh, docs, "hour")
    val hours = IcebergMeta.hoursPrune(
      spark, dh, "ts", "2024-03-01T06:00:00", "2024-03-02T03:00:00")
      .collect()
    assert(hours.length === 48) // two full days of exact-hour partitions
    // the window keeps hours 06Z..23Z day one + 00Z..03Z day two = 22
    assert(hours.count(_.getBoolean(2)) === 22)
    val kept = hours.filter(_.getBoolean(2))
      .map(_.getTimestamp(1).toInstant.toString).sorted
    assert(kept.head === "2024-03-01T06:00:00Z")
    assert(kept.last === "2024-03-02T03:00:00Z")
    // conservatism: every pruned file holds zero rows in the window
    val (lo, hi) = (java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T06:00:00Z")),
      java.sql.Timestamp.from(
        java.time.Instant.parse("2024-03-02T03:59:59Z")))
    hours.filterNot(_.getBoolean(2)).foreach { r =>
      val n = spark.read.parquet(r.getString(0))
        .filter(col("ts").between(lit(lo), lit(hi))).count()
      assert(n === 0L, s"pruned ${r.getString(0)} held $n in-window rows")
    }
  }

  test("transform pruning refuses vacuous and mistyped probes") {
    val dir = "/tmp/graft_test_icebkt"
    IcebergMeta.writeBucketFixtureTable(spark, dir, docs)
    // no truncate field in the spec → refuse, never all-survives
    val e1 = intercept[IllegalArgumentException] {
      IcebergMeta.truncatePrune(spark, dir, "doc_id", 0L, 10L)
    }
    assert(e1.getMessage.contains("truncate"))
    // unknown column
    val e2 = intercept[IllegalArgumentException] {
      IcebergMeta.bucketPrune(spark, dir, "nope", 1L)
    }
    assert(e2.getMessage.contains("no field"))
    // string probe against a long column
    val e3 = intercept[IllegalArgumentException] {
      IcebergMeta.bucketPrune(spark, dir, "doc_id", "seven")
    }
    assert(e3.getMessage.contains("probe with a Long"))
    // bucket on a type the transform does not hash here
    val dir2 = "/tmp/graft_test_icedays"
    IcebergMeta.writeDaysFixtureTable(
      spark, dir2, spark.read.parquet(sf("0.001") + "/events.parquet"))
    val e4 = intercept[UnsupportedOperationException] {
      IcebergMeta.bucketPrune(spark, dir2, "ts", 1L)
    }
    assert(e4.getMessage.contains("bucket"))
  }
}
