package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

/**
 * Adversarial-input property: the ENTIRE page-decode surface — level
 * walks, per-type decoders, and the unified dispatcher — must REFUSE
 * (null) arbitrary garbage, never throw and never allocate its way into
 * an OOM. Page bytes are untrusted input the moment `pagecontent=true`
 * reads foreign files; this is the contract every example-based spec
 * relies on, checked over random payloads and adversarially-random
 * header fields.
 */
class DecodeFuzzSpec extends AnyFunSuite {

  // Seeds are PINNED and LOGGED: an unseeded ScalaCheck failure loses its
  // counterexample forever (a full-suite run failed exactly once on
  // 2026-08-16 and the input was unrecoverable). Every property runs over
  // `nSeeds` fixed seeds; a failure names the seed that found it, so
  // `GRAFT_FUZZ_SEED=<seed> GRAFT_FUZZ_SEEDS=1` reproduces it exactly.
  // GRAFT_FUZZ_CASES raises the per-property case count for deep runs.
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

  // adversarial ints: boundary values mixed with small plausible ones
  private val genInt: Gen[Int] = Gen.oneOf(
    Gen.chooseNum(-4, 64), Gen.oneOf(Int.MaxValue, Int.MinValue, 1 << 30))

  test("level walks never throw on arbitrary bytes") {
    check(Prop.forAll(genBytes, genInt, genInt, genInt) { (b, mr, md, n) =>
      LevelWalk.walkV1(b, mr, md, n); true
    })
    check(Prop.forAll(genBytes, genInt, genInt, genInt, genInt, genInt) {
      (b, rl, dl, mr, md, n) => LevelWalk.walkV2(b, rl, dl, mr, md, n); true
    })
  }

  test("per-type decoders never throw on arbitrary bytes") {
    val types = Seq("BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
      "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY", "JUNK").map(UTF8String.fromString)
    val genType = Gen.oneOf(types)
    check(Prop.forAll(genBytes, genInt, genInt) { (b, md, n) =>
      DictIndexes.compute(b, md, n); true
    })
    check(Prop.forAll(genBytes, genInt, genInt, genType) { (b, md, n, t) =>
      PlainFpStats.compute(b, md, n, t)
      BssFpStats.compute(b, md, n, t)
      BoolTrueCount.compute(b, md, n, t); true
    })
    check(Prop.forAll(genBytes, genInt, genInt, genInt) { (b, md, n, w) =>
      PlainFlbaSum.compute(b, md, n, w); true
    })
    check(Prop.forAll(genBytes, genInt, genInt) { (b, md, n) =>
      PlainInt96Stats.compute(b, md, n); true
    })
    check(Prop.forAll(genBytes) { b =>
      PlainInt64Longs.compute(b)
      PlainInt64Sum.compute(b)
      PlainDictStrings.compute(b)
      DeltaBp.decodeLongs(b)
      DeltaBp.decodeDeltaByteArray(b)
      DeltaBp.decodeDeltaLengthByteArray(b); true
    })
  }

  test("container probes never throw on arbitrary bytes") {
    // video walks refuse garbage with None; magic-prefixed garbage is the
    // adversarial case (the walk actually runs)
    val mp4Prefix = Array[Byte](0, 0, 0, 16, 'f', 't', 'y', 'p')
    val ebmlPrefix = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte)
    check(Prop.forAll(genBytes) { b =>
      graft.ops.Multimodal.decodeVideoInfo(b)
      graft.ops.Multimodal.decodeMp4Info(mp4Prefix ++ b)
      graft.ops.Multimodal.decodeMkvInfo(ebmlPrefix ++ b)
      graft.ops.Multimodal.decodeAudioInfo(b)
      true
    })
    // the avro block walk throws a classified RuntimeException (the
    // ignorecorrupt contract), never an index/NPE-style error
    val avroPrefix = Array[Byte]('O', 'b', 'j', 1)
    check(Prop.forAll(genBytes) { b =>
      val tmp = java.io.File.createTempFile("fuzz_avro", ".avro")
      try {
        java.nio.file.Files.write(tmp.toPath, avroPrefix ++ b)
        val conf = new org.apache.hadoop.conf.Configuration()
        try {
          graft.meta.AvroMeta.read(
            new org.apache.hadoop.fs.Path(tmp.getAbsolutePath), conf)
          true
        } catch {
          case _: RuntimeException => true // classified refusal
        }
      } finally tmp.delete()
    })
  }

  test("the unified dispatcher never throws on adversarial headers") {
    val pageTypes = Seq("DATA_PAGE", "DATA_PAGE_V2", "DICTIONARY_PAGE",
      "INDEX_PAGE", "???").map(UTF8String.fromString)
    val encodings = Seq("PLAIN", "PLAIN_DICTIONARY", "RLE_DICTIONARY",
      "DELTA_BINARY_PACKED", "DELTA_BYTE_ARRAY", "DELTA_LENGTH_BYTE_ARRAY",
      "BYTE_STREAM_SPLIT", "RLE", "JUNK").map(UTF8String.fromString)
    val codecs = Seq("UNCOMPRESSED", "SNAPPY", "ZSTD", "GZIP", "LZ4_RAW",
      "BROTLI").map(UTF8String.fromString)
    val types = Seq("BOOLEAN", "INT32", "INT64", "INT96", "FLOAT", "DOUBLE",
      "BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY").map(UTF8String.fromString)
    def boxed(g: Gen[Int]): Gen[java.lang.Integer] =
      Gen.oneOf(g.map(java.lang.Integer.valueOf),
        Gen.const(null: java.lang.Integer))
    check(Prop.forAll(genBytes, Gen.oneOf(pageTypes), Gen.oneOf(encodings),
      Gen.oneOf(codecs), boxed(genInt), boxed(genInt), boxed(genInt),
      boxed(genInt)) { (b, pt, enc, codec, usize, rl, dl, n) =>
      PageDecode.compute(b, pt, enc, codec, usize, rl, dl,
        java.lang.Integer.valueOf(0), java.lang.Integer.valueOf(1), n,
        types(b.length % types.length), java.lang.Integer.valueOf(9))
      true
    })
  }
}
