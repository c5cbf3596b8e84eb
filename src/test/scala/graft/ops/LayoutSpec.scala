package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** Independent bit-by-bit Morton reference for the test only. */
  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue2 equals a bit-by-bit Morton interleave") {
    val vals = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (5L, 3L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (123456789L, 987654321L))
    val got = vals.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zvalue2(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z === mortonRef(a, b), s"zvalue2($a, $b)")
    }
  }

  test("zvalue2Sql is a literal mirror of zvalue2") {
    val df = spark.range(0, 2000, 7)
      .select(col("id").as("a"), (col("id") * 31 % 100000).as("b"))
    val mismatches = df
      .withColumn("z_col", Layout.zvalue2(col("a"), col("b")))
      .withColumn("z_sql", expr(Layout.zvalue2Sql("a", "b")))
      .filter(col("z_col") =!= col("z_sql"))
      .count()
    assert(mismatches === 0)
  }

  test("z-ordered layout tightens per-file min/max of BOTH columns") {
    val dim = 64
    val rows = for (x <- 0 until dim; y <- 0 until dim) yield (x.toLong, y.toLong)
    // seed-shuffled so neither layout gets accidental pre-clustering
    val shuffled = new scala.util.Random(42).shuffle(rows)
    val df = shuffled.toDF("x", "y").repartition(8)

    def perFileSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select(avg("sx"), avg("sy")).as[(Double, Double)].head()
      spans
    }

    val zDir = Files.createTempDirectory("graft-zorder").toString
    val sDir = Files.createTempDirectory("graft-xsort").toString
    Layout.writeZOrdered(df, "x", "y", zDir, numFiles = 16)
    // the contrast layout: globally sorted by x alone across 16 files
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(sDir)

    val (zx, zy) = perFileSpans(zDir)
    val (sx, sy) = perFileSpans(sDir)
    // x-sorted: x is tight but y covers the whole domain in every file
    assert(sy > dim * 0.9, s"x-sorted layout should not cluster y (avg span $sy)")
    // z-ordered: BOTH dimensions tighten well below the full domain
    assert(zx < dim * 0.6, s"z-order should tighten x (avg span $zx)")
    assert(zy < dim * 0.6, s"z-order should tighten y (avg span $zy)")
    // and the whole point: y-pruning becomes possible at a modest x cost
    assert(zy < sy / 2, s"z-order y span $zy should halve the x-sorted $sy")
    assert(sx < zx, "x-only sort remains the tightest on x alone")
  }

  test("z-ordered files are prunable by footer stats on BOTH dimensions") {
    // the end-to-end skipping story: writeZOrdered tightens footer min/max
    // (write side), MetaPrune consumes exactly those stats (read side) —
    // a narrow range filter on EITHER column must skip most files
    import graft.meta.MetaPrune
    val dim = 64
    val rows = for (x <- 0 until dim; y <- 0 until dim) yield (x.toLong, y.toLong)
    val df = new scala.util.Random(7).shuffle(rows).toDF("x", "y").repartition(8)
    val zDir = Files.createTempDirectory("graft-zprune").toString
    Layout.writeZOrdered(df, "x", "y", zDir, numFiles = 16)

    for (c <- Seq("x", "y")) {
      val hit = MetaPrune.filesInRange(spark, zDir, c, 3, 6).length
      assert(hit < 16, s"range filter on $c should prune z-ordered files (hit $hit/16)")
      // and the pruned read stays exact
      val full = spark.read.parquet(zDir)
        .filter(col(c) >= 3 && col(c) <= 6).count()
      val pruned = MetaPrune.readPruned(spark, zDir, c, 3, 6)
        .filter(col(c) >= 3 && col(c) <= 6).count()
      assert(pruned === full)
      assert(full === 4L * dim)
    }
  }

  test("out-of-domain values fail loudly instead of wrapping") {
    val dir = Files.createTempDirectory("graft-zdomain").toString
    val bad = Seq((1L << 31, 1L), (1L, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      Layout.writeZOrdered(bad, "x", "y", dir, numFiles = 2)
    }
    assert(causeMessages(e).contains("z-order"))
    val neg = Seq((-1L, 1L)).toDF("x", "y")
    intercept[Exception] {
      Layout.writeZOrdered(neg, "x", "y", dir, numFiles = 2)
    }
    // null values must also raise WITH the operator-naming message (concat
    // over a null cast would otherwise produce a null message)
    val withNull = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("x", "y")
    val ne = intercept[Exception] {
      Layout.writeZOrdered(withNull, "x", "y", dir, numFiles = 1)
    }
    assert(causeMessages(ne).contains("z-order"),
      s"null input lost the z-order message: ${causeMessages(ne).take(300)}")
  }

  test("a user column named __z survives the write") {
    val dir = Files.createTempDirectory("graft-zfresh").toString
    val df = Seq((1L, 2L, 77L), (3L, 4L, 88L)).toDF("x", "y", "__z")
    Layout.writeZOrdered(df, "x", "y", dir, numFiles = 1)
    val back = spark.read.parquet(dir)
    assert(back.columns.contains("__z"))
    assert(back.select("__z").as[Long].collect().sorted === Array(77L, 88L))
  }
}
