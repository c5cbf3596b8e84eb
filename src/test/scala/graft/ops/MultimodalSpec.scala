package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The image kernel: container-header dimension decode must agree with a
  * full pixel decode (`ImageIO.read`) on real JDK-encoded fixtures, refuse
  * malformed/truncated payloads, and ride the typed mapPartitions path. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG header decode equals ImageIO full decode on JDK-written fixtures") {
    for ((w, h) <- Seq((1, 1), (16, 23), (640, 480), (37, 211))) {
      val bytes = Multimodal.encodeFixture("png", w, h, seed = w * 1000L + h)
      assert(Multimodal.decodeImageDims(bytes) === Some((w, h, "png")))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
    }
  }

  test("JPEG header decode equals ImageIO full decode on JDK-written fixtures") {
    for ((w, h) <- Seq((1, 1), (16, 23), (640, 480), (37, 211))) {
      val bytes = Multimodal.encodeFixture("jpeg", w, h, seed = w * 1000L + h)
      assert(Multimodal.decodeImageDims(bytes) === Some((w, h, "jpeg")))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert((img.getWidth, img.getHeight) === ((w, h)))
    }
  }

  test("malformed and truncated payloads are a parse failure, never garbage dims") {
    assert(Multimodal.decodeImageDims(Array.empty[Byte]) === None)
    assert(Multimodal.decodeImageDims("plain text".getBytes("UTF-8")) === None)
    val png = Multimodal.encodeFixture("png", 32, 32, seed = 7L)
    assert(Multimodal.decodeImageDims(png.take(20)) === None) // cut inside IHDR
    val jpg = Multimodal.encodeFixture("jpeg", 32, 32, seed = 7L)
    assert(Multimodal.decodeImageDims(jpg.take(4)) === None) // SOI only
    // corrupt the marker stream right after SOI: walk must bail, not scan on
    val broken = jpg.clone(); broken(2) = 0x00
    assert(Multimodal.decodeImageDims(broken) === None)
  }

  test("typed extractFeatures uses real header dims for images, byte-math for opaque") {
    val png = Multimodal.encodeFixture("png", 48, 31, seed = 1L)
    val jpg = Multimodal.encodeFixture("jpeg", 19, 64, seed = 2L)
    val txt = "just some text".getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "image/png", png),
      MediaRecord(2L, "image/jpeg", jpg),
      MediaRecord(3L, "text/plain", txt)))(Multimodal.mediaRecordEnc)
    val got = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> ((f.width, f.height, f.byte_size))).toMap
    assert(got(1L) === ((48, 31, png.length)))
    assert(got(2L) === ((19, 64, jpg.length)))
    // opaque fallback: the documented byte-size math
    assert(got(3L) === ((64 + txt.length % 576, 64 + txt.length % 416, txt.length)))
  }

  test("resize shrinks the longer side to maxDim with floor aspect, full pixel path") {
    for ((w, h) <- Seq((100, 40), (40, 100), (33, 33), (7, 200))) {
      val in = Multimodal.encodeFixture("png", w, h, seed = 3L)
      val out = Multimodal.resizeImage(in, maxDim = 24).get
      val mx = math.max(w, h)
      val expect = (math.max(1, w * 24 / mx), math.max(1, h * 24 / mx))
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
      assert((img.getWidth, img.getHeight) === expect, s"for ${(w, h)}")
    }
  }

  test("resize passes through in-bounds images and non-image payloads untouched") {
    val small = Multimodal.encodeFixture("jpeg", 20, 10, seed = 4L)
    assert(Multimodal.resizeImage(small, maxDim = 24).get eq small) // same bytes, same container
    assert(Multimodal.resizeImage("not an image".getBytes("UTF-8"), 24) === None)
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "image/png", Multimodal.encodeFixture("png", 90, 30, 5L)),
      MediaRecord(2L, "image/jpeg", small),
      MediaRecord(3L, "text/plain", "opaque".getBytes("UTF-8"))))(Multimodal.mediaRecordEnc)
    val got = Multimodal.resizeImages(ds, maxDim = 24).collect()
      .map(r => r.media_id -> r).toMap
    assert(Multimodal.decodeImageDims(got(1L).bytes).map(d => (d._1, d._2)) === Some((24, 8)))
    assert(got(1L).kind === "png") // re-encoded
    assert(got(2L).kind === "image/jpeg" &&
      java.util.Arrays.equals(got(2L).bytes, small)) // passthrough
    assert(got(3L).kind === "text/plain" &&
      new String(got(3L).bytes, "UTF-8") === "opaque")
  }

  test("dHash: identical pixels hash identically, distinct bases do not collide") {
    // the mm_phash_dedup fixture family: 30 bases must be collision-free
    val mk = (id: Long) => Multimodal.encodeNoiseFixture(
      24 + (id % 13).toInt, 18 + (id % 11).toInt, id * 97 + 5)
    val hashes = (0L until 30L).map(id => Multimodal.dHash64(mk(id)).get)
    assert(hashes.distinct.length === 30, "base fixtures collide — oracle premise broken")
    // re-encoding the same pixels yields the same hash (container-independent)
    assert(Multimodal.dHash64(mk(3L)) === Multimodal.dHash64(mk(3L)))
    // a resized copy stays NEAR (small Hamming distance): the retrieval premise
    val big = Multimodal.encodeFixture("png", 96, 72, 42L)
    val small = Multimodal.resizeImage(big, 48).get
    val d = java.lang.Long.bitCount(
      Multimodal.dHash64(big).get ^ Multimodal.dHash64(small).get)
    assert(d <= 16, s"resized copy drifted $d bits")
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")) === None)
  }

  test("pattern fixture controls the perceptual hash bit-for-bit") {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    for (bits <- Seq(0L, -1L, 0x5555555555555555L, mix(1L), mix(2L), mix(12345L))) {
      assert(Multimodal.dHash64(Multimodal.encodePatternFixture(bits)) === Some(bits),
        f"pattern $bits%016x did not round-trip")
    }
    // the mm_phash_near oracle premise: 30 scrambled bases pairwise FAR
    // (> 2*3 bits, so a base can never pair with a base or with another
    // base's 3-bit-flipped copy), while each planted copy is EXACTLY 3 away
    val bases = (0L until 30L).map(mix)
    for (i <- bases.indices; j <- i + 1 until bases.length) {
      assert(java.lang.Long.bitCount(bases(i) ^ bases(j)) > 6,
        s"bases $i and $j too close — oracle premise broken")
    }
    val flips = (id: Long) =>
      (1L << (id % 64).toInt) | (1L << ((id + 21) % 64).toInt) |
        (1L << ((id + 43) % 64).toInt)
    (0L until 10L).foreach(id =>
      assert(java.lang.Long.bitCount(flips(id)) === 3))
  }

  test("WAV probe round-trips the fixture and agrees with the JDK's own parser") {
    for ((rate, ch, frames) <- Seq((8000, 1, 500), (11025, 2, 999), (44100, 2, 1))) {
      val bytes = Multimodal.encodeWavFixture(rate, ch, frames, seed = 7L)
      val info = Multimodal.decodeWavInfo(bytes).get
      assert(info === Multimodal.WavInfo(rate, ch, 16, frames.toLong))
      assert(info.durationMicros === frames.toLong * 1000000L / rate)
      // independent JDK parse of the same bytes
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleRate.toInt === rate)
      assert(in.getFormat.getChannels === ch)
      assert(in.getFrameLength === frames.toLong)
      in.close()
    }
    assert(Multimodal.decodeWavInfo("RIFFjunk".getBytes("US-ASCII")) === None)
    // a chunk size in the u32 Int-overflow zone must terminate, not loop
    val evil = Multimodal.encodeWavFixture(8000, 1, 4, 1L)
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1 // fmt size = 0xFFFFFFFF
    assert(Multimodal.decodeWavInfo(evil) === None)
    // size just UNDER the old Int.MaxValue-16 guard: an Int cursor would
    // wrap negative here (i += 8 + size + pad) and index out of bounds;
    // the Long cursor must walk off the end and return None instead
    val evil2 = Multimodal.encodeWavFixture(8000, 1, 4, 1L)
    evil2(16) = 0xEF.toByte; evil2(17) = -1; evil2(18) = -1; evil2(19) = 0x7F // 0x7FFFFFEF
    assert(Multimodal.decodeWavInfo(evil2) === None)
    // same band on the data chunk: data terminates the walk, so this is
    // the prefix-probe path — must not throw, reports the claimed size
    val evil3 = Multimodal.encodeWavFixture(8000, 1, 4, 1L)
    evil3(40) = 0xEF.toByte; evil3(41) = -1; evil3(42) = -1; evil3(43) = 0x7F
    assert(Multimodal.decodeWavInfo(evil3).get.nFrames === 0x7FFFFFEFL / 2)
    assert(Multimodal.decodeWavInfo(
      Multimodal.encodeWavFixture(8000, 1, 100, 1L).take(30)) === None)
    assert(Multimodal.decodeWavInfo("plain text".getBytes("UTF-8")) === None)
  }

  test("AIFF and AU probes agree with the JDK writer that produced the bytes") {
    for ((rate, ch, frames) <- Seq((8000, 1, 500), (22050, 2, 999), (44100, 1, 1));
         container <- Seq("aiff", "au")) {
      val bytes = Multimodal.encodeAudioFixture(container, rate, ch, frames, seed = 9L)
      val info = Multimodal.decodeAudioInfo(bytes).get
      assert(info.container === container)
      assert(info.sampleRate === rate, s"$container rate")
      assert(info.channels === ch)
      assert(info.bitsPerSample === 16)
      assert(info.nFrames === frames.toLong, s"$container frames")
      // independent JDK re-parse of the same bytes agrees
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(in.getFormat.getSampleRate.toInt === rate)
      assert(in.getFormat.getChannels === ch)
      assert(in.getFrameLength === frames.toLong)
      in.close()
    }
    // the dispatch also routes WAV through the unified shape
    val w = Multimodal.decodeAudioInfo(
      Multimodal.encodeWavFixture(8000, 1, 100, 1L)).get
    assert(w.container === "wav" && w.nFrames === 100L)
    // malformed: wrong magic, truncated AIFF, truncated AU header
    assert(Multimodal.decodeAudioInfo("garbage!".getBytes("US-ASCII")) === None)
    assert(Multimodal.decodeAudioInfo(
      Multimodal.encodeAudioFixture("aiff", 8000, 1, 100, 1L).take(20)) === None)
    assert(Multimodal.decodeAudioInfo(
      Multimodal.encodeAudioFixture("au", 8000, 1, 100, 1L).take(16)) === None)
    // adversarial AIFF chunk size just under the guard: must walk off the
    // end (Long cursor), not wrap and index negative
    val evilA = Multimodal.encodeAudioFixture("aiff", 8000, 1, 4, 1L)
    // first chunk after FORM/AIFF starts at 12; mangle its TAG (so the
    // walk must skip it) and its size field (the overflow band)
    evilA(12) = 'X'
    evilA(16) = 0x7F; evilA(17) = -1; evilA(18) = -1; evilA(19) = 0xEF.toByte
    assert(Multimodal.decodeAudioInfo(evilA) === None)
  }

  test("MP4 probe: box walk, v0/v1 layouts, largesize, malformed refusal") {
    // closed-form fixture: 2 tracks (video 640x360 + audio with zero
    // dims, as real muxers write), timescale 90000, 3s duration
    val b = Multimodal.encodeMp4Fixture(
      timescale = 90000, durationTicks = 270000L, w = 640, h = 360,
      nTracks = 2, seed = 7L)
    val got = Multimodal.decodeMp4Info(b).get
    assert(got.container === "mp4")
    assert(got.timescale === 90000L && got.durationTicks === 270000L)
    assert(got.durationMicros === 3000000L)
    assert(got.nTracks === 2)
    assert(got.width === 640 && got.height === 360)

    // v1 mvhd + v1 tkhd, hand-built (64-bit duration, wide offsets)
    def box(tpe: String, p: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + p.length)
      bb.putInt(8 + p.length).put(tpe.getBytes("US-ASCII")).put(p)
      bb.array()
    }
    val mvhd1 = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L) // creation, modification
      bb.putInt(1000).putLong(4500L) // timescale, 64-bit duration
      java.util.Arrays.copyOf(bb.array(), 112)
    }
    val tkhd1 = {
      val bb = java.nio.ByteBuffer.allocate(96)
      bb.putInt(0x01000007)
      bb.putLong(0L).putLong(0L).putInt(1).putInt(0).putLong(4500L)
      bb.position(88)
      bb.putInt(320 << 16).putInt(200 << 16)
      java.util.Arrays.copyOf(bb.array(), 96)
    }
    val v1 = box("ftyp", "isom".getBytes) ++
      box("moov", box("mvhd", mvhd1) ++ box("trak", box("tkhd", tkhd1)))
    val g1 = Multimodal.decodeMp4Info(v1).get
    assert(g1.timescale === 1000L && g1.durationTicks === 4500L)
    assert(g1.durationMicros === 4500000L)
    assert(g1.width === 320 && g1.height === 200)

    // 64-bit largesize header on the mdat box still walks cleanly
    val mdatLarge = {
      val bb = java.nio.ByteBuffer.allocate(16 + 4)
      bb.putInt(1).put("mdat".getBytes).putLong(20L).putInt(0xDEADBEEF)
      bb.array()
    }
    assert(Multimodal.decodeMp4Info(
      Multimodal.encodeMp4Fixture(1000, 100L, 64, 48, 1, 1L) ++ mdatLarge)
      .get.width === 64)

    // malformed: truncation, crafted size, missing ftyp all REFUSE
    assert(Multimodal.decodeMp4Info(b.take(b.length - 3)).isEmpty)
    val crafted = b.clone()
    crafted(0) = 0x7F // first box claims ~2GB
    assert(Multimodal.decodeMp4Info(crafted).isEmpty)
    assert(Multimodal.decodeMp4Info(b.drop(16)).isEmpty) // no ftyp
    assert(Multimodal.decodeMp4Info(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeMp4Info("RIFF....WAVE".getBytes).isEmpty)
  }

  test("Matroska/WebM probe: EBML walk, doctype split, malformed refusal") {
    val b = Multimodal.encodeMkvFixture("matroska", 1000000L, 4500L, 640, 360, 2)
    val got = Multimodal.decodeMkvInfo(b).get
    assert(got.container === "mkv")
    assert(got.timescale === 1000L) // 1 ms/tick default → 1000 ticks/s
    assert(got.durationTicks === 4500L && got.durationMicros === 4500000L)
    assert(got.nTracks === 2 && got.width === 640 && got.height === 360)
    // webm doctype surfaces as its own container name
    val wb = Multimodal.encodeMkvFixture("webm", 1000000L, 100L, 320, 200, 1)
    assert(Multimodal.decodeMkvInfo(wb).get.container === "webm")
    // a non-default timestamp scale renormalizes ticks-per-second
    val ns = Multimodal.encodeMkvFixture("matroska", 500000L, 1000L, 64, 48, 1)
    val gn = Multimodal.decodeMkvInfo(ns).get
    assert(gn.timescale === 2000L && gn.durationMicros === 500000L)
    // the unified dispatch routes all three containers
    assert(Multimodal.decodeVideoInfo(b).get.container === "mkv")
    assert(Multimodal.decodeVideoInfo(wb).get.container === "webm")
    assert(Multimodal.decodeVideoInfo(
      Multimodal.encodeMp4Fixture(1000, 100L, 64, 48, 1, 1L)).get.container === "mp4")
    assert(Multimodal.decodeVideoInfo("RIFFxxxxWAVE".getBytes).isEmpty)
    // malformed: truncation and a crafted element size refuse
    assert(Multimodal.decodeMkvInfo(b.take(b.length - 2)).isEmpty)
    val crafted = b.clone()
    crafted(5) = 0x41 // EBML header's size varint inflated past the buffer
    assert(Multimodal.decodeMkvInfo(crafted).isEmpty)
    assert(Multimodal.decodeMkvInfo(Array[Byte](0x1A, 0x45, 0xDF.toByte)).isEmpty)
  }

  test("video probes refuse interior malformation and lossy timescales") {
    def box(tpe: String, p: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + p.length)
      bb.putInt(8 + p.length).put(tpe.getBytes("US-ASCII")).put(p)
      bb.array()
    }
    val mvhd0 = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0).putInt(1000).putInt(4500)
      java.util.Arrays.copyOf(bb.array(), 100)
    }
    // a crafted box size INSIDE moov (after a valid mvhd): the interior
    // walk fails, and the probe must refuse even though the TOP-level
    // walk and the mvhd parse both succeeded
    val evilInner = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.putInt(0x7FFFFFFF).put("free".getBytes).putInt(0)
      bb.array()
    }
    val craftedMoov = box("ftyp", "isom".getBytes) ++
      box("moov", box("mvhd", mvhd0) ++ evilInner)
    assert(Multimodal.decodeMp4Info(craftedMoov).isEmpty)
    // same inside a trak: tkhd parses, then a crafted sibling refuses
    val tkhd0 = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.position(76)
      bb.putInt(320 << 16).putInt(200 << 16)
      java.util.Arrays.copyOf(bb.array(), 84)
    }
    val craftedTrak = box("ftyp", "isom".getBytes) ++
      box("moov", box("mvhd", mvhd0) ++
        box("trak", box("tkhd", tkhd0) ++ evilInner))
    assert(Multimodal.decodeMp4Info(craftedTrak).isEmpty)
    // the well-formed twin of the same layout parses fine (the refusal
    // above is the crafted size, not the shape)
    val clean = box("ftyp", "isom".getBytes) ++
      box("moov", box("mvhd", mvhd0) ++ box("trak", box("tkhd", tkhd0)))
    assert(Multimodal.decodeMp4Info(clean).get.width === 320)

    // MKV: a TimestampScale that doesn't divide 1e9 ns would make the
    // integer ticks-per-second lie about durations — refuse, don't round
    val lossy = Multimodal.encodeMkvFixture("matroska", 41666667L, 100L, 64, 48, 1)
    assert(Multimodal.decodeMkvInfo(lossy).isEmpty)
    // and a scale above 1e9 would yield timescale 0 — refuse too
    val huge = Multimodal.encodeMkvFixture("matroska", 2000000000L, 100L, 64, 48, 1)
    assert(Multimodal.decodeMkvInfo(huge).isEmpty)
    // exact divisors keep working
    val fine = Multimodal.encodeMkvFixture("matroska", 100000L, 100L, 64, 48, 1)
    assert(Multimodal.decodeMkvInfo(fine).get.timescale === 10000L)
  }

  test("mm_features fixture dimensions round-trip through the distributed path") {
    val ds = spark.range(0, 20).as[Long]
      .map { id =>
        val fmt = if (id % 2 == 0) "png" else "jpeg"
        MediaRecord(id, s"image/$fmt",
          Multimodal.encodeFixture(fmt, 16 + (id % 37).toInt, 16 + (id % 23).toInt, id))
      }(Multimodal.mediaRecordEnc)
    val bad = Multimodal.extractFeatures(ds).toDF()
      .filter(col("width") =!= (lit(16) + pmod(col("media_id"), lit(37))).cast("int") ||
        col("height") =!= (lit(16) + pmod(col("media_id"), lit(23))).cast("int"))
      .count()
    assert(bad === 0L)
  }
}
