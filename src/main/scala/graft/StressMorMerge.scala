package graft.meta

import org.apache.spark.sql.SparkSession

/**
 * MOR PER-ROW MERGE scale stress — the posture check for the r18 log
 * walk: `nGroups` file groups, each a `baseRows`-row base slice plus
 * `nBlocks` real HoodieLogFormat avro/delete blocks of `recsPerBlock`
 * records (updates, inserts of new keys, deletes interleaved), merged
 * by [[HudiMeta.morMergedRows]]. The claim under test: merge cost is
 * bounded by BASE SCAN + LOG BYTES (one walk task per file group,
 * log-event-sized shuffle, zero base shuffle) — so doubling the log
 * volume should roughly double the walk term and leave the base term
 * alone, and the merged row count must equal the reference fold's.
 *
 * Prints one JSON line per phase; a wrong merged count exits non-zero.
 *
 * MODES (r19): `simple` (single-field key, arrival-order resolution —
 * the r18 shape), `composite` (two-field key — the complex key
 * generator's `doc_id:<v>,tag:<v>` rendering on both the base and the
 * delete-block side; measures the rendering's scale cost), and
 * `precombine` (ordering-value resolution — updates carry pc = -block,
 * so the EARLIEST update wins per key and deletes' null ordering loses
 * to any update; measures the (pc, seq) struct aggregate vs the bare
 * long). Same posture claim in every mode.
 *
 * Usage: runMain graft.meta.StressMorMerge [nGroups] [baseRows] [nBlocks] [recsPerBlock] [dir] [mode]
 */
object StressMorMerge {
  def main(args: Array[String]): Unit = {
    val nGroups = args.headOption.map(_.toInt).getOrElse(8)
    val baseRows = args.lift(1).map(_.toInt).getOrElse(20000)
    val nBlocks = args.lift(2).map(_.toInt).getOrElse(200)
    val recsPerBlock = args.lift(3).map(_.toInt).getOrElse(50)
    val dir = args.lift(4).getOrElse("/tmp/graft_stress_mormerge")
    val mode = args.lift(5).getOrElse("simple")
    require(Set("simple", "composite", "precombine").contains(mode),
      s"unknown mode '$mode'")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- build ----
    val root = new java.io.File(dir)
    FixtureIO.freshDir(root)
    val hoodie = new java.io.File(root, ".hoodie")
    hoodie.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(hoodie, "hoodie.properties").toPath,
      ("hoodie.table.name=graft_stress_mormerge\n" +
        "hoodie.table.type=MERGE_ON_READ\n" +
        "hoodie.table.version=6\n" +
        (mode match {
          case "composite" =>
            "hoodie.table.recordkey.fields=doc_id,tag\n"
          case "precombine" =>
            "hoodie.table.recordkey.fields=doc_id\n" +
              "hoodie.table.precombine.field=n_chars\n"
          case _ => "hoodie.table.recordkey.fields=doc_id\n"
        })).getBytes("UTF-8"))
    val (dc1, dc2) = ("20240101000000000", "20240102000000000")
    val tagFields =
      if (mode == "composite") """{"name":"tag","type":"long"},""" else ""
    val avroSchema = new org.apache.avro.Schema.Parser().parse(
      s"""{"type":"record","name":"g","fields":[
        |{"name":"doc_id","type":"long"},$tagFields
        |{"name":"n_chars","type":["null","long"],"default":null}]}"""
        .stripMargin.replace("\n", ""))
    val (_, buildS) = t {
      val stats = (0 until nGroups).map { g =>
        val lo = g.toLong * 10000000L
        val baseRel = s"p=0/fid$g" + s"_0-0-0_$dc1.parquet"
        val f = new java.io.File(root, baseRel)
        f.getParentFile.mkdirs()
        val base0 = spark.range(lo, lo + baseRows).toDF("doc_id")
        val base =
          (if (mode == "composite") {
            base0.withColumn("tag",
              org.apache.spark.sql.functions.pmod(
                org.apache.spark.sql.functions.col("doc_id"),
                org.apache.spark.sql.functions.lit(100L)))
          } else base0)
            .withColumn("n_chars",
              org.apache.spark.sql.functions.col("doc_id") * 2)
        val n = FixtureIO.writeSingleParquet(base, f, dir + s"_g$g")
        // the log chain: updates of existing keys, inserts of new
        // keys, deletes — deterministic per (group, block, record)
        val bos = new java.io.ByteArrayOutputStream()
        (0 until nBlocks).foreach { b =>
          if (b % 5 == 4) {
            val keys = (0 until recsPerBlock).map { r =>
              val id = lo + (b * 131L + r * 7L) % baseRows
              if (mode == "composite") s"doc_id:$id,tag:${id % 100}"
              else id.toString
            }
            bos.write(HudiLogFormat.frameBlock(HudiLogFormat.DeleteBlock,
              Map(HudiLogFormat.InstantTime -> dc2),
              HudiLogFormat.deleteContent(keys)))
          } else {
            val recs = (0 until recsPerBlock).map { r =>
              val rec = new org.apache.avro.generic.GenericData.Record(
                avroSchema)
              val upd = (b * 173L + r * 11L) % (baseRows * 2)
              val id = lo + upd
              rec.put("doc_id", id) // half updates, half inserts
              if (mode == "composite") {
                rec.put("tag", java.lang.Long.valueOf(id % 100))
              }
              rec.put("n_chars", java.lang.Long.valueOf(-b.toLong))
              rec
            }
            bos.write(HudiLogFormat.frameBlock(HudiLogFormat.AvroDataBlock,
              Map(HudiLogFormat.InstantTime -> dc2,
                HudiLogFormat.Schema -> avroSchema.toString),
              HudiLogFormat.avroDataContent(avroSchema, recs)))
          }
        }
        val logRel = s"p=0/.fid$g" + s"_$dc1.log.1_0-0-0"
        java.nio.file.Files.write(
          new java.io.File(root, logRel).toPath, bos.toByteArray)
        (baseRel, n, logRel)
      }
      def stat(fid: Int, rel: String, rows: Long, log: Boolean): String =
        s"""{"fileId":"fid$fid","path":"$rel","numWrites":$rows,
           |"numDeletes":0,"numInserts":${if (log) 0 else rows},
           |"totalWriteBytes":${new java.io.File(root, rel).length()},
           |"partitionPath":"p=0"}""".stripMargin.replace("\n", "")
      def commit(inst: String, body: Seq[String]): Unit = {
        java.nio.file.Files.write(
          new java.io.File(hoodie, s"$inst.deltacommit").toPath,
          s"""{"partitionToWriteStats":{"p=0":[${body.mkString(",")}]},
             |"operationType":"upsert"}""".stripMargin.replace("\n", "")
            .getBytes("UTF-8"))
        java.nio.file.Files.write(
          new java.io.File(hoodie, s"$inst.deltacommit.requested").toPath,
          Array.empty[Byte])
        java.nio.file.Files.write(
          new java.io.File(hoodie, s"$inst.deltacommit.inflight").toPath,
          Array.empty[Byte])
      }
      commit(dc1, stats.zipWithIndex.map { case ((b, n, _), g) =>
        stat(g, b, n, log = false) })
      commit(dc2, stats.zipWithIndex.map { case ((_, _, l), g) =>
        stat(g, l, nBlocks.toLong * recsPerBlock, log = true) })
    }
    val logBytes = (0 until nGroups).map(g =>
      new java.io.File(root, s"p=0/.fid$g" + s"_$dc1.log.1_0-0-0").length).sum
    println(s"""{"phase":"build","mode":"$mode","sec":${f"$buildS%.2f"},""" +
      s""""groups":$nGroups,"base_rows":${nGroups.toLong * baseRows},""" +
      s""""log_blocks":${nGroups * nBlocks},""" +
      s""""log_records":${nGroups.toLong * nBlocks * recsPerBlock},""" +
      s""""log_bytes":$logBytes}""")

    // ---- reference count (one group, scaled) ----
    def refCount: Long = mode match {
      case "precombine" =>
        // (ordering value, arrival) resolution: updates carry pc=-b,
        // deletes a null ordering (lowest); highest wins, seq breaks
        // ties — the resolveLatestEvents contract restated
        val best = scala.collection.mutable.HashMap
          .empty[Long, (Long, Long, Boolean)]
        var seq = 0L
        (0 until nBlocks).foreach { b =>
          (0 until recsPerBlock).foreach { r =>
            seq += 1
            val (k, cand) =
              if (b % 5 == 4) {
                ((b * 131L + r * 7L) % baseRows,
                  (Long.MinValue, seq, true))
              } else {
                ((b * 173L + r * 11L) % (baseRows * 2),
                  (-b.toLong, seq, false))
              }
            val better = best.get(k).forall(cur =>
              cand._1 > cur._1 || (cand._1 == cur._1 && cand._2 > cur._2))
            if (better) best(k) = cand
          }
        }
        val baseSurvivors =
          (0L until baseRows).count(k => best.get(k).forall(!_._3))
        val inserts = best.count { case (k, v) => k >= baseRows && !v._3 }
        baseSurvivors.toLong + inserts
      case _ =>
        // last-arrival-wins (composite keys are 1:1 with doc_id —
        // tag derives from it — so the fold is the simple one)
        val m = scala.collection.mutable.HashMap.empty[Long, Boolean]
        (0L until baseRows).foreach(k => m(k) = true)
        (0 until nBlocks).foreach { b =>
          (0 until recsPerBlock).foreach { r =>
            if (b % 5 == 4) m((b * 131L + r * 7L) % baseRows) = false
            else m((b * 173L + r * 11L) % (baseRows * 2)) = true
          }
        }
        m.count(_._2).toLong
    }
    val expected = refCount * nGroups

    // ---- merge ----
    val (n1, mergeS) = t(HudiMeta.morMergedRows(spark, dir).count())
    println(s"""{"phase":"merge","sec":${f"$mergeS%.2f"},""" +
      s""""merged_rows":$n1,"expected":$expected}""")
    val (_, censusS) = t(HudiMeta.morMergedCensus(spark, dir).count())
    println(s"""{"phase":"merged_census","sec":${f"$censusS%.2f"}}""")
    spark.stop()
    if (n1 != expected) {
      System.err.println(s"merged=$n1 expected=$expected")
      sys.exit(1)
    }
  }
}
