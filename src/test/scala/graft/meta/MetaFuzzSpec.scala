package graft.meta

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Adversarial-input property for the LAKE-METADATA decoders — the
 * same contract [[graft.functions.DecodeFuzzSpec]] pins for page
 * bytes: Puffin footers/blobs, deletion-vector payloads, roaring
 * bitmaps, theta sketches, compressed frames, and timeline names are
 * UNTRUSTED input the moment a table written by another engine is
 * opened. Every decoder must REFUSE garbage with a CLASSIFIED
 * exception (IllegalArgument / UnsupportedOperation) — never an
 * index/NPE/negative-size crash and never an allocation driven by an
 * unvalidated length field. Seeds are pinned and logged exactly as in
 * DecodeFuzzSpec (GRAFT_FUZZ_SEED/SEEDS/CASES).
 */
class MetaFuzzSpec extends AnyFunSuite {

  private val baseSeed: Long =
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(20260816L)
  private val nSeeds: Int =
    sys.env.get("GRAFT_FUZZ_SEEDS").map(_.toInt).getOrElse(5)
  private val totalCases: Int =
    sys.env.get("GRAFT_FUZZ_CASES").map(_.toInt).getOrElse(500)

  private def check(p: Prop): Unit = {
    val perSeed = math.max(1, totalCases / nSeeds)
    (0 until nSeeds).foreach { i =>
      val seed = baseSeed + i
      val params = SCTest.Parameters.default
        .withMinSuccessfulTests(perSeed)
        .withInitialSeed(org.scalacheck.rng.Seed(seed))
      val res = SCTest.check(params, p)
      assert(res.passed,
        s"seed=$seed cases=$perSeed: ${res.status.toString}")
    }
  }

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 512).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-128, 127))
      .map(_.map(_.toByte).toArray))

  /** A refusal is CLASSIFIED; anything else is the crash class this
    * spec exists to exclude. */
  private def classified(f: => Any): Boolean =
    try { f; true } catch {
      case _: IllegalArgumentException => true
      case _: UnsupportedOperationException => true
    }

  test("roaring/DV/theta decoders refuse arbitrary bytes, classified") {
    check(Prop.forAll(genBytes) { b =>
      classified(PuffinCodec.decodeRoaring64Portable(b)) &&
        classified(PuffinCodec.thetaEstimate(b)) &&
        classified(DvCodec.decodeBitmap(b))
    })
  }

  test("compressed-frame decoders refuse garbage and never over-allocate") {
    val p = new Path("/fuzz")
    check(Prop.forAll(genBytes) { b =>
      classified(PuffinCodec.decompressBlob(p, Some("zstd"), b)) &&
        classified(PuffinCodec.decompressBlob(p, Some("lz4"), b)) &&
        classified(PuffinCodec.decompressBlob(p, Some("junk"), b))
    })
  }

  test("puffin footer and DV blob reads refuse arbitrary file bytes") {
    val conf = new Configuration()
    val magic = PuffinCodec.Magic
    check(Prop.forAll(genBytes) { b =>
      val tmp = java.io.File.createTempFile("fuzz_puffin", ".puffin")
      try {
        // magic-prefixed garbage is the adversarial case (the footer
        // walk actually runs); readDvBlob probes an arbitrary span
        java.nio.file.Files.write(tmp.toPath, magic ++ b ++ magic)
        val path = new Path(tmp.getAbsolutePath)
        classified(PuffinCodec.readFooter(path, conf)) &&
          classified(PuffinCodec.readDvBlob(path, conf, 0L,
            math.min(12L + (b.length % 64), tmp.length()))) &&
          classified({
            // EOF-truncated spans must refuse too, never loop
            PuffinCodec.readBlobBytes(path, conf, tmp.length() - 2,
              4L)
          })
      } catch {
        case _: java.io.IOException => true // EOF refusal class
      } finally { tmp.delete(); () }
    })
  }

  test("hudi commit-metadata BODIES refuse arbitrary bytes, classified") {
    // the r17 gap: timeline NAMES were fuzzed but commit JSON bodies
    // were not — a corrupt <instant>.commit must refuse with the file
    // named, never escape as a raw Jackson exception
    val conf = new Configuration()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    check(Prop.forAll(genBytes) { b =>
      val tmp = java.io.File.createTempFile("fuzz_commit", ".commit")
      try {
        java.nio.file.Files.write(tmp.toPath, b)
        try {
          val node = HudiMeta.readCommitNode(
            fs, new Path(tmp.getAbsolutePath))
          // bytes that happen to parse as a JSON object are fine —
          // the stats-shape refusals downstream are already classified
          node.isObject
        } catch {
          case _: IllegalArgumentException => true
          case _: UnsupportedOperationException => true
        }
      } finally { tmp.delete(); () }
    })
  }

  test("hudi log-format walk never crashes on arbitrary bytes: blocks " +
      "frame or collapse to corrupt; block decodes refuse classified") {
    check(Prop.forAll(genBytes) { b =>
      // the walk itself must TOLERATE garbage (killed-mid-append logs
      // are expected input) — corrupt regions, never crashes
      val blocks = HudiLogFormat.walkBlocks(b, "/fuzz")
      // magic-prefixed garbage is the adversarial framing case
      val blocks2 = HudiLogFormat.walkBlocks(
        HudiLogFormat.Magic ++ b, "/fuzz")
      // any block that framed must decode classified-or-fine
      (blocks ++ blocks2).filterNot(_.corrupt).forall { blk =>
        classified(HudiLogFormat.dataRecords(blk, "/fuzz")) &&
          classified(HudiLogFormat.deleteKeys(blk, "/fuzz"))
      }
    })
  }

  test("z85 and timeline-name parses refuse garbage, classified") {
    val genStr = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))
    check(Prop.forAll(genStr) { s =>
      classified(DvCodec.z85Decode(s)) &&
        classified(HudiMeta.parseInstantName(s, "/fuzz"))
    })
  }
}
