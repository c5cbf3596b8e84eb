package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** One opaque media payload: the storage model for image/audio/video columns
  * is a `binary` column plus typed metadata, exactly as a 100 TB multimodal
  * lake would store it (content-addressed bytes + queryable sidecar). */
case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

/** Typed features extracted from one payload. */
case class MediaFeatures(
    media_id: Long,
    kind: String,
    byte_size: Int,
    width: Int,
    height: Int,
    checksum: Long)

/**
 * Multimodal-column plumbing: schema, partition-friendly batch decode, and
 * feature extraction over opaque `binary` payloads.
 *
 * The image kernel is REAL: PNG and JPEG dimensions are parsed straight off
 * the container headers (PNG IHDR chunk / JPEG SOF frame header) in pure
 * JVM code — the scale-appropriate decode for dimension extraction, since a
 * 100 TB media lake must not pay a full pixel decode to learn that an image
 * is 4032x3024. Non-image payloads fall back to a deterministic byte-math
 * fake (documented on [[decodeOpaque]]). Around the kernel is the Spark
 * shape a production pipeline needs: a typed `Dataset[MediaRecord]`,
 * `mapPartitions` batch execution (one decoder init per partition, not per
 * row — the same batching contract a Pandas-UDF / `mapInPandas` decoder
 * relies on), and narrow per-row output so no shuffle is introduced.
 */
object Multimodal {

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /**
   * Real image dimension decode from container headers, no pixel decode:
   *  - PNG: the IHDR chunk is REQUIRED to be first (PNG spec §11.2.2), so
   *    width/height are the two big-endian u32s at fixed offsets 16/20
   *    after the 8-byte signature + 4-byte length + "IHDR" tag;
   *  - JPEG: walk the marker stream from SOI to the first SOF frame header
   *    (C0-CF minus C4/C8/CC which are not frames); the frame's
   *    height/width are the big-endian u16s after the 1-byte precision.
   * Returns `(width, height, format)`; `None` for anything that is not a
   * well-formed PNG/JPEG prefix — truncated headers are a parse failure,
   * never a garbage dimension.
   */
  def decodeImageDims(b: Array[Byte]): Option[(Int, Int, String)] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    if (b.length >= 24 && b.startsWith(PngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      Some((be32(16), be32(20), "png"))
    } else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      var res: Option[(Int, Int, String)] = None
      var done = false
      while (!done && i + 1 < b.length) {
        if (u8(i) != 0xFF) done = true // marker stream out of sync: not a JPEG we trust
        else {
          val m = u8(i + 1)
          if (m == 0xFF) i += 1 // fill byte
          else if (m == 0x01 || (m >= 0xD0 && m <= 0xD9)) i += 2 // standalone marker
          else if (i + 3 >= b.length) done = true // truncated before segment length
          else {
            val len = be16(i + 2)
            if (len < 2) done = true
            else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
              // SOFn: len(2) precision(1) height(2) width(2) ...
              if (i + 9 <= b.length) res = Some((be16(i + 7), be16(i + 5), "jpeg"))
              done = true
            } else i += 2 + len
          }
        }
      }
      res
    } else None
  }

  /**
   * Fallback for payloads that are not a recognized image container: a
   * deterministic byte-math fake ("dimensions" from the byte size, checksum
   * from the codepoints of the first 64 characters of the UTF-8 decode) so
   * the typed path, the SQL-column path, and the DuckDB oracle all compute
   * the identical value for any valid-UTF-8 payload (including multibyte).
   * A real audio/video probe would slot in exactly here.
   */
  def decodeOpaque(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length
    // truncate by CODEPOINTS (matching SQL substring semantics), not UTF-16
    // units — .take(64) would split surrogate pairs on non-BMP payloads
    val decoded = new String(r.bytes, java.nio.charset.StandardCharsets.UTF_8)
    var crc = 0L
    decoded.codePoints().limit(64).forEach(c => crc = (crc * 31 + c) % 1000000007L)
    MediaFeatures(r.media_id, r.kind, n, 64 + n % 576, 64 + n % 416, crc)
  }

  /** One payload through the kernel: real header dimensions when the bytes
    * are a PNG/JPEG, [[decodeOpaque]] byte-math otherwise; byte_size and
    * checksum semantics are identical on both branches. */
  def decode(r: MediaRecord): MediaFeatures =
    decodeImageDims(r.bytes) match {
      case Some((w, h, _)) => decodeOpaque(r).copy(width = w, height = h)
      case None => decodeOpaque(r)
    }

  /**
   * Batch feature extraction: `mapPartitions` so a heavier decoder would be
   * initialised once per partition and fed a streaming batch of payloads.
   */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions { batch =>
      // (real pipeline: initialise codec/session here, once per partition)
      batch.map(decode)
    }

  /**
   * REAL image resize (full pixel decode -> bilinear rescale -> PNG
   * re-encode, all JDK `javax.imageio`/`java.awt`): shrink so the longer
   * side is at most `maxDim`, preserving aspect by integer floor
   * (`ow = max(1, w*maxDim/max(w,h))` — the closed form oracles
   * reproduce). Payloads already within bounds pass through untouched
   * (bytes AND container format preserved); payloads that do not decode
   * as images pass through untouched too — resize transforms what it can
   * prove is an image and never corrupts what it cannot.
   */
  def resizeImage(bytes: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val mx = math.max(w, h)
      if (mx <= maxDim) Some(bytes)
      else {
        val ow = math.max(1, w * maxDim / mx)
        val oh = math.max(1, h * maxDim / mx)
        val out = new java.awt.image.BufferedImage(
          ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    }
  }

  /** Batch resize: `mapPartitions` like [[extractFeatures]] (decoder state
    * once per partition, narrow output, no shuffle). Shrunken payloads
    * re-encode as PNG (kind "png"); in-bounds and non-image payloads pass
    * through with their original bytes and kind. */
  def resizeImages(ds: Dataset[MediaRecord], maxDim: Int): Dataset[MediaRecord] =
    ds.mapPartitions { batch =>
      batch.map { r =>
        resizeImage(r.bytes, maxDim) match {
          case Some(b) if !(b eq r.bytes) => MediaRecord(r.media_id, "png", b)
          case _ => r
        }
      }
    }

  /**
   * 64-bit difference hash (dHash) of an image — the standard perceptual
   * fingerprint for image near-dup: full pixel decode, bilinear shrink to
   * a 9x8 grayscale grid, one bit per horizontal gradient
   * (`gray(x+1,y) > gray(x,y)`). Identical pixels hash identically
   * regardless of container encoding; small edits flip few bits, so
   * Hamming distance over these longs plugs straight into the existing
   * simhash-style banded retrieval. `None` for payloads that do not
   * decode as images.
   */
  def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val grid = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val g = grid.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
      g.dispose()
      val raster = grid.getRaster
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (raster.getSample(x + 1, y, 0) > raster.getSample(x, y, 0)) {
            hash |= 1L << (y * 8 + x)
          }
          x += 1
        }
        y += 1
      }
      Some(hash)
    }
  }

  /** Decoded WAV (RIFF PCM) stream parameters. */
  case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int, nFrames: Long) {
    /** Exact integer duration in microseconds (`frames * 1e6 / rate`). */
    def durationMicros: Long = nFrames * 1000000L / sampleRate
  }

  /**
   * REAL WAV (RIFF/WAVE PCM) header probe: walk the chunk list for `fmt `
   * and `data`, all little-endian per the RIFF spec — sample rate,
   * channels, bit depth and frame count without touching a sample. `None`
   * for anything that is not a well-formed PCM WAV prefix (wrong magic,
   * truncated chunk, zero-size frame). The decode side of the audio story
   * whose encode side ([[encodeWavFixture]]) is validated against the
   * JDK's own independent `javax.sound.sampled` parser in specs.
   */
  def decodeWavInfo(b: Array[Byte]): Option[WavInfo] = {
    def le16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def le32(i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    def tag(i: Int, t: String): Boolean =
      i + 4 <= b.length && t.indices.forall(k => b(i + k) == t(k).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var rate, channels, bits = -1
    var dataBytes = -1L
    // Long cursor: le32 sizes are unsigned 32-bit, so an Int cursor could
    // wrap negative on a crafted size near Int.MaxValue even after a range
    // check; in Long arithmetic the walk is monotone and the loop guard
    // simply fails once the cursor passes the buffer end.
    var i = 12L
    while (i + 8 <= b.length && (rate < 0 || dataBytes < 0)) {
      val at = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue here
      val size = le32(at + 4)
      // sizes in the u32 Int-overflow zone are corrupt, not a real chunk;
      // the Long cursor makes them mechanically safe, this keeps them None
      if (size > Int.MaxValue - 16L) return None
      if (tag(at, "fmt ") && i + 24 <= b.length) {
        channels = le16(at + 10)
        rate = le32(at + 12).toInt
        bits = le16(at + 22)
      } else if (tag(at, "data")) {
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (rate <= 0 || channels <= 0 || bits <= 0 || dataBytes < 0) None
    else {
      val frameBytes = channels * (bits / 8)
      if (frameBytes <= 0) None
      else Some(WavInfo(rate, channels, bits, dataBytes / frameBytes))
    }
  }

  /** Decoded audio stream parameters with their container format —
    * the union shape [[decodeAudioInfo]] returns for WAV/AIFF/AU. */
  case class AudioInfo(
      container: String, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nFrames: Long) {
    def durationMicros: Long = nFrames * 1000000L / sampleRate
  }

  /**
   * REAL AIFF (big-endian IFF) header probe: `FORM`/`AIFF` magic, then a
   * chunk walk for `COMM` — channels, frame count, sample width, and the
   * 80-bit extended-precision sample rate the format insists on. The same
   * Long-cursor discipline as the WAV walk (chunk sizes are unsigned
   * 32-bit big-endian; a crafted size must walk off the end, not wrap).
   */
  def decodeAiffInfo(b: Array[Byte]): Option[AudioInfo] = {
    def be16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def be32(i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    def tag(i: Int, t: String): Boolean =
      i + 4 <= b.length && t.indices.forall(k => b(i + k) == t(k).toByte)
    if (b.length < 12 || !tag(0, "FORM") || !tag(8, "AIFF")) return None
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = be32(at + 4)
      if (size > Int.MaxValue - 16L) return None // corrupt, same as WAV
      if (tag(at, "COMM") && size >= 18 && i + 8 + 18 <= b.length) {
        val channels = be16(at + 8)
        val nFrames = be32(at + 10) // unsigned u32 frame count
        val bits = be16(at + 14)
        // 80-bit extended float: 2-byte sign+exponent, 64-bit mantissa;
        // value = mantissa * 2^(exp - 16383 - 63) — exact for real rates
        val se = be16(at + 16)
        val mantissa = (be32(at + 18) << 32) | be32(at + 22)
        if ((se & 0x8000) != 0) return None // negative rate
        val exp = (se & 0x7FFF) - 16383 - 63
        // the mantissa is UNSIGNED 64-bit and its integer bit is set for
        // every normalized value, so the signed Long reads negative —
        // split high/low to widen losslessly into a double (rates are
        // small integers; 53 bits of precision is plenty)
        val mD = (mantissa >>> 11).toDouble * 2048.0 + (mantissa & 0x7FF).toDouble
        val rate = math.round(mD * math.pow(2.0, exp))
        if (rate <= 0 || rate > Int.MaxValue || channels <= 0 || bits <= 0) return None
        return Some(AudioInfo("aiff", rate.toInt, channels, bits, nFrames))
      }
      i += 8L + size + (size & 1L) // IFF chunks are word-aligned
    }
    None
  }

  /**
   * REAL AU (Sun/NeXT `.snd`) header probe: a fixed 24-byte big-endian
   * header — data offset/size, encoding code, rate, channels. Frame count
   * derives from the data size for the linear-PCM encodings; an unknown
   * size (the streaming sentinel 0xFFFFFFFF) falls back to the bytes
   * actually present past the declared offset.
   */
  def decodeAuInfo(b: Array[Byte]): Option[AudioInfo] = {
    def be32(i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    if (b.length < 24) return None
    if (!(b(0) == '.'.toByte && b(1) == 's'.toByte &&
        b(2) == 'n'.toByte && b(3) == 'd'.toByte)) return None
    val dataOffset = be32(4)
    val dataSize = be32(8)
    val encoding = be32(12)
    val rate = be32(16)
    val channels = be32(20)
    // linear PCM widths by encoding code; μ-law (1) is 8-bit samples
    val bits = encoding match {
      case 1L | 2L => 8
      case 3L => 16
      case 4L => 24
      case 5L => 32
      case _ => return None
    }
    if (rate <= 0 || rate > Int.MaxValue || channels <= 0 ||
        channels > 64 || dataOffset < 24 || dataOffset > b.length) return None
    val payload =
      if (dataSize == 0xFFFFFFFFL) b.length - dataOffset else dataSize
    val frameBytes = channels * (bits / 8)
    Some(AudioInfo("au", rate.toInt, channels.toInt, bits, payload / frameBytes))
  }

  /** Container dispatch over the three probes: WAV (RIFF), AIFF (FORM),
    * AU (.snd) — `None` for anything else, never garbage. */
  def decodeAudioInfo(b: Array[Byte]): Option[AudioInfo] = {
    if (b == null || b.length < 4) return None
    if (b(0) == 'R'.toByte && b(1) == 'I'.toByte) {
      decodeWavInfo(b).map(w =>
        AudioInfo("wav", w.sampleRate, w.channels, w.bitsPerSample, w.nFrames))
    } else if (b(0) == 'F'.toByte && b(1) == 'O'.toByte) {
      decodeAiffInfo(b)
    } else if (b(0) == '.'.toByte && b(1) == 's'.toByte) {
      decodeAuInfo(b)
    } else None
  }

  /** Deterministic audio fixture in any of the three probed containers:
    * WAV through our own encoder; AIFF and AU through the JDK's
    * INDEPENDENT javax.sound writer (so decode parity against it is a
    * cross-implementation check, not a round trip). 16-bit PCM,
    * `seed`-derived samples. */
  def encodeAudioFixture(
      container: String, rate: Int, channels: Int,
      nFrames: Int, seed: Long): Array[Byte] = container match {
    case "wav" => encodeWavFixture(rate, channels, nFrames, seed)
    case "aiff" | "au" =>
      val bits = 16
      val pcm = java.nio.ByteBuffer.allocate(nFrames * channels * 2)
      var k = 0
      while (k < nFrames * channels) {
        pcm.putShort((((seed * 31 + k) % 65536) - 32768).toShort)
        k += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, bits, channels, true, true) // signed, big-endian
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm.array()), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      val tpe =
        if (container == "aiff") javax.sound.sampled.AudioFileFormat.Type.AIFF
        else javax.sound.sampled.AudioFileFormat.Type.AU
      javax.sound.sampled.AudioSystem.write(in, tpe, out)
      out.toByteArray
    case other =>
      throw new IllegalArgumentException(s"unknown audio container: $other")
  }

  /** Deterministic PCM WAV fixture encoder (tests + closed-form oracles):
    * a standard 44-byte RIFF header + `seed`-derived 16-bit samples. */
  def encodeWavFixture(rate: Int, channels: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bits = 16
    val dataBytes = nFrames * channels * (bits / 8)
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(rate)
      .putInt(rate * channels * (bits / 8)) // byte rate
      .putShort((channels * (bits / 8)).toShort) // block align
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var k = 0
    while (k < nFrames * channels) {
      bb.putShort((((seed * 31 + k) % 65536) - 32768).toShort)
      k += 1
    }
    bb.array()
  }

  /**
   * Deterministic image fixture encoder (tests + closed-form oracles): a
   * real `w x h` PNG or JPEG produced by the JDK's own `javax.imageio`
   * writers, pixels filled from `seed` so payload bytes are stable across
   * runs. This is fixture GENERATION, not the operator under test — the
   * oracle checks [[extractFeatures]]'s decoded dimensions against the
   * closed form the fixture was built with.
   */
  def encodeFixture(format: String, w: Int, h: Int, seed: Long): Array[Byte] = {
    require(format == "png" || format == "jpeg", s"unsupported fixture format $format")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (((seed * 31 + x) * 31 + y) % 0x1000000).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, out)
    require(ok, s"no JDK ImageIO writer for $format")
    out.toByteArray
  }

  /**
   * 9x8 PNG whose dHash is `bits` BY CONSTRUCTION (tests + oracles that
   * need bit-exact perceptual-hash control): each row walks gray values
   * +-10 so `gray(x+1) > gray(x)` holds exactly where the corresponding
   * bit is set; at 9x8 the hash's grayscale downsample is the identity,
   * and equal-channel RGB -> gray conversion is monotone, so the gradient
   * signs — hence every hash bit — survive untouched. Planting a copy
   * with `bits ^ flips` yields a pair at EXACTLY popcount(flips) Hamming
   * distance: the closed-form near-dup plant.
   */
  def encodePatternFixture(bits: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var v = 128
      var x = 0
      while (x < 9) {
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        if (x < 8) {
          v = if (((bits >>> (y * 8 + x)) & 1L) == 1L) v + 10 else v - 10
        }
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Noise-pixel PNG fixture (tests + oracles needing DISTINCT perceptual
    * hashes): integer-scrambled pixels, so downsampled gradient signs are
    * effectively random per seed — unlike [[encodeFixture]]'s smooth
    * pattern, whose dHashes can collide across seeds by construction. */
  def encodeNoiseFixture(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = x * 0x9E3779B1 + y * 0x85EBCA77 + seed.toInt * 0xC2B2AE3D
        val p = (v ^ (v >>> 13)) * 0x27D4EB2F
        img.setRGB(x, y, p & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /**
   * Pure-column variant of the OPAQUE-payload feature math over a DataFrame
   * with (media_id, kind, bytes) — SQL-expressible, so specs can pin the
   * typed fallback path against it. Checksum covers the first 64 characters,
   * matching [[decodeOpaque]].
   */
  def extractFeaturesSql(df: DataFrame): DataFrame = {
    val n = length(col("bytes"))
    // decode FIRST, then take 64 characters — slicing raw bytes could split
    // a multibyte codepoint and diverge from decodeStub
    val prefix = substring(col("bytes").cast("string"), 1, 64)
    val crc = aggregate(
      transform(filter(split(prefix, ""), c => c =!= ""),
        c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => pmod(acc * 31L + c, lit(1000000007L)))
    df.select(
      col("media_id"),
      col("kind"),
      n.cast("int").as("byte_size"),
      (lit(64) + pmod(n, lit(576))).cast("int").as("width"),
      (lit(64) + pmod(n, lit(416))).cast("int").as("height"),
      crc.as("checksum"))
  }

  /** Sample every `stride`-th frame (media rows) — the frame-sampling shape
    * for video pipelines, as a filter on a deterministic row index. */
  def sampleFrames(df: DataFrame, idCol: String, stride: Int): DataFrame =
    df.filter(pmod(col(idCol), lit(stride)) === 0)

  case class VideoInfo(
      container: String, timescale: Long, durationTicks: Long,
      nTracks: Int, width: Int, height: Int) {
    def durationMicros: Long =
      if (timescale > 0) durationTicks * 1000000L / timescale else 0L
  }

  /**
   * REAL MP4 / ISO-BMFF header probe: a top-level box walk (`[u32
   * size][4cc]`, `size == 1` → 64-bit largesize, `size == 0` → to EOF)
   * requiring `ftyp`, then inside `moov` the movie header `mvhd`
   * (version 0 and 1 layouts: timescale + duration) and each `trak`'s
   * `tkhd` (16.16 fixed-point presentation width/height — the video
   * track is the one with nonzero dimensions). The same Long-cursor
   * overflow discipline as the audio walks: a crafted box size must
   * refuse, never wrap or over-read. Frame/codec details live deeper
   * (stsd) and are NOT probed — container metadata is the Spark-side
   * contract; frame decode stays behind the documented stub boundary.
   */
  def decodeMp4Info(b: Array[Byte]): Option[VideoInfo] = {
    if (b == null || b.length < 16) return None
    def be16(i: Int): Int = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    def be32(i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")
    // walk boxes in [start, end); f receives (type, payloadStart, payloadEnd)
    def walk(start: Long, end: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = start
      while (i + 8 <= end) {
        val at = i.toInt
        var size = be32(at)
        var hdr = 8L
        if (size == 1L) {
          if (i + 16 > end) return false
          size = be64(at + 8)
          hdr = 16L
        } else if (size == 0L) {
          size = end - i
        }
        if (size < hdr || size > end - i) return false // crafted size: refuse
        f(fourcc(at + 4), i + hdr, i + size)
        i += size
      }
      i == end
    }
    var sawFtyp = false
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var w = 0
    var h = 0
    // interior walks must propagate failure too: a crafted size INSIDE
    // moov/trak stops that inner walk, and without this flag the probe
    // would return Some(...) built from the partial parse
    var badInner = false
    val ok = walk(0L, b.length.toLong) { (tpe, ps, pe) =>
      if (tpe == "ftyp") sawFtyp = true
      else if (tpe == "moov") {
        val innerOk = walk(ps, pe) { (t2, qs, qe) =>
          val q = qs.toInt
          if (t2 == "mvhd" && qe - qs >= 4) {
            val v = b(q) & 0xFF
            if (v == 0 && qe - qs >= 20) {
              timescale = be32(q + 12); duration = be32(q + 16)
            } else if (v == 1 && qe - qs >= 32) {
              timescale = be32(q + 20); duration = be64(q + 24)
            }
          } else if (t2 == "trak") {
            tracks += 1
            if (!walk(qs, qe) { (t3, rs, re) =>
              val r = rs.toInt
              if (t3 == "tkhd" && re - rs >= 4) {
                val v = b(r) & 0xFF
                val (wOff, hOff) = if (v == 1) (88, 92) else (76, 80)
                if (re - rs >= hOff + 4) {
                  val tw = be16(r + wOff) // integer part of 16.16 fixed
                  val th = be16(r + hOff)
                  if (tw > 0 && th > 0) { w = math.max(w, tw); h = math.max(h, th) }
                }
              }
            }) badInner = true
          }
        }
        if (!innerOk) badInner = true
      }
    }
    if (!ok || badInner || !sawFtyp || timescale <= 0 || duration < 0) None
    else Some(VideoInfo("mp4", timescale, duration, tracks, w, h))
  }

  /**
   * REAL Matroska/WebM (EBML) header probe: varint-ID/varint-size
   * element walk — EBML header (DocType distinguishes `webm` from
   * `matroska`), then Segment → Info (TimestampScale in ns/tick,
   * default 1 ms; Duration as a 4- or 8-byte float of ticks) and
   * Segment → Tracks → TrackEntry → Video (PixelWidth/PixelHeight).
   * Surfaced through the same [[VideoInfo]] shape as MP4 with
   * `timescale` normalized to ticks-per-second, so `durationMicros`
   * means the same thing across containers. Unknown-size elements
   * (streaming Matroska writes the Segment that way) walk to the end of
   * the buffer; crafted sizes refuse.
   */
  def decodeMkvInfo(b: Array[Byte]): Option[VideoInfo] = {
    if (b == null || b.length < 8) return None
    // EBML varint: leading zeros of the first byte give the width; IDs
    // keep the marker bit, sizes strip it. Returns (value, nextPos) or
    // null on malformation.
    def varint(i: Long, end: Long, keepMarker: Boolean): (Long, Long) = {
      if (i >= end) return null
      val first = b(i.toInt) & 0xFF
      if (first == 0) return null
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (i + len > end) return null
      var v: Long =
        if (keepMarker) first.toLong
        else first & ((1 << (8 - len)) - 1)
      var k = 1
      while (k < len) {
        v = (v << 8) | (b((i + k).toInt) & 0xFFL)
        k += 1
      }
      (v, i + len)
    }
    def uintAt(i: Long, n: Long): Long = {
      var v = 0L
      var k = 0L
      while (k < n) { v = (v << 8) | (b((i + k).toInt) & 0xFFL); k += 1 }
      v
    }
    var docType = "matroska"
    var scaleNs = 1000000L // EBML default: 1 ms per tick
    var durationTicks = -1L
    var tracks = 0
    var w = 0
    var h = 0
    var sawSegment = false
    // recursive element walk; f returns true to DESCEND into the element
    def walk(start: Long, end: Long, depth: Int)(
        f: (Long, Long, Long) => Boolean): Boolean = {
      if (depth > 8) return false
      var i = start
      while (i < end) {
        val id = varint(i, end, keepMarker = true)
        if (id == null) return false
        val sz = varint(id._2, end, keepMarker = false)
        if (sz == null) return false
        val unknown = sz._1 == (1L << (7 * (sz._2 - id._2))) - 1 // all-ones size
        val pEnd = if (unknown) end else sz._2 + sz._1
        if (pEnd < sz._2 || pEnd > end) return false
        if (f(id._1, sz._2, pEnd)) {
          if (!walk(sz._2, pEnd, depth + 1)(f)) return false
        }
        i = pEnd
      }
      true
    }
    val ok = walk(0L, b.length.toLong, 0) { (id, ps, pe) =>
      id match {
        case 0x1A45DFA3L => true // EBML header: descend for DocType
        case 0x4282L => // DocType
          docType = new String(b, ps.toInt, (pe - ps).toInt, "US-ASCII"); false
        case 0x18538067L => sawSegment = true; true // Segment
        case 0x1549A966L => true // Info
        case 0x2AD7B1L => scaleNs = uintAt(ps, pe - ps); false // TimestampScale
        case 0x4489L => // Duration: 4- or 8-byte float of ticks
          val n = pe - ps
          val d =
            if (n == 4) java.lang.Float.intBitsToFloat(uintAt(ps, 4).toInt).toDouble
            else if (n == 8) java.lang.Double.longBitsToDouble(uintAt(ps, 8))
            else -1.0
          if (d >= 0) durationTicks = math.round(d)
          false
        case 0x1654AE6BL => true // Tracks
        case 0xAEL => tracks += 1; true // TrackEntry
        case 0xE0L => true // Video settings
        case 0xB0L => w = math.max(w, uintAt(ps, pe - ps).toInt); false
        case 0xBAL => h = math.max(h, uintAt(ps, pe - ps).toInt); false
        case _ => false
      }
    }
    // `timescale` is ticks-per-second across containers; a TimestampScale
    // that doesn't divide 1e9 ns (spec-legal but exotic — real muxers
    // write 1 ms) would make integer division lie about durations, and a
    // scale above 1e9 would yield timescale 0. Both REFUSE rather than
    // surface a wrong number — the same contract as crafted sizes.
    if (!ok || !sawSegment || scaleNs <= 0 || durationTicks < 0 ||
        scaleNs > 1000000000L || 1000000000L % scaleNs != 0) None
    else Some(VideoInfo(
      if (docType == "webm") "webm" else "mkv",
      1000000000L / scaleNs, durationTicks, tracks, w, h))
  }

  /** Container dispatch over the video probes: MP4 (`ftyp` after the
    * first box header) and Matroska/WebM (EBML magic) — `None` for
    * anything else, never garbage. The video sibling of
    * [[decodeAudioInfo]]. */
  def decodeVideoInfo(b: Array[Byte]): Option[VideoInfo] = {
    if (b == null || b.length < 8) return None
    if (b(4) == 'f'.toByte && b(5) == 't'.toByte && b(6) == 'y'.toByte &&
        b(7) == 'p'.toByte) {
      decodeMp4Info(b)
    } else if ((b(0) & 0xFF) == 0x1A && (b(1) & 0xFF) == 0x45 &&
        (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3) {
      decodeMkvInfo(b)
    } else None
  }

  /** Deterministic Matroska/WebM fixture encoder (tests + closed-form
    * oracles): EBML header with the requested DocType, Segment with
    * Info (TimestampScale + float Duration) and one video TrackEntry. */
  def encodeMkvFixture(
      docType: String, scaleNs: Long, durationTicks: Long,
      w: Int, h: Int, nTracks: Int): Array[Byte] = {
    def sizeVarint(n: Int): Array[Byte] = {
      require(n < (1 << 14) - 1, "fixture sizes fit two varint bytes")
      Array((0x40 | (n >> 8)).toByte, (n & 0xFF).toByte)
    }
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (1 to n).map(k => ((id >> (8 * (n - k))) & 0xFF).toByte).toArray
    }
    def el(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVarint(payload.length) ++ payload
    def uintBytes(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      (1 to n).map(k => ((v >> (8 * (n - k))) & 0xFF).toByte).toArray
    }
    val header = el(0x1A45DFA3L,
      el(0x4282L, docType.getBytes("US-ASCII")))
    val dur = java.nio.ByteBuffer.allocate(8)
      .putDouble(durationTicks.toDouble).array()
    val info = el(0x1549A966L,
      el(0x2AD7B1L, uintBytes(scaleNs)) ++ el(0x4489L, dur))
    val trackEntries = (0 until nTracks).map { t =>
      val video =
        if (t == 0) el(0xE0L, el(0xB0L, uintBytes(w)) ++ el(0xBAL, uintBytes(h)))
        else Array.emptyByteArray
      el(0xAEL, el(0x83L, uintBytes(if (t == 0) 1L else 2L)) ++ video)
    }
    val tracksEl = el(0x1654AE6BL, trackEntries.flatten.toArray)
    header ++ el(0x18538067L, info ++ tracksEl)
  }

  /** Deterministic MP4 fixture encoder (tests + closed-form oracles):
    * `ftyp` + `moov(mvhd + nTracks x trak(tkhd))` + a seed-derived
    * `mdat`. The video track (index 0) carries the 16.16 fixed-point
    * dimensions; audio-shaped tracks carry zero dims, as real muxers
    * write them. */
  def encodeMp4Fixture(
      timescale: Int, durationTicks: Long, w: Int, h: Int,
      nTracks: Int, seed: Long): Array[Byte] = {
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp",
      "isomiso2".getBytes("US-ASCII")) // major brand + one compatible
    val mvhd = {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 mvhd payload
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(timescale).putInt(durationTicks.toInt)
      bb.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
      bb.put(new Array[Byte](8 + 36 + 24)) // reserved + matrix + predefines
      bb.putInt(nTracks + 1) // next_track_ID
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val traks = (0 until nTracks).map { t =>
      val bb = java.nio.ByteBuffer.allocate(84) // v0 tkhd payload
      bb.putInt(0x00000007) // version 0, flags: enabled|in-movie|in-preview
      bb.putInt(0).putInt(0) // creation, modification
      bb.putInt(t + 1) // track_ID
      bb.putInt(0) // reserved
      bb.putInt(durationTicks.toInt)
      bb.put(new Array[Byte](8)) // reserved
      bb.putShort(0).putShort(0) // layer, alternate_group
      bb.putShort(if (t == 0) 0 else 0x0100.toShort).putShort(0) // volume
      bb.put(new Array[Byte](36)) // identity matrix slot (zeros suffice)
      // 16.16 fixed-point presentation size; only the video track has one
      bb.putInt(if (t == 0) w << 16 else 0)
      bb.putInt(if (t == 0) h << 16 else 0)
      box("trak", box("tkhd", bb.array()))
    }
    val payload = new Array[Byte](32)
    var k = 0
    while (k < payload.length) {
      payload(k) = ((seed * 131 + k) & 0xFF).toByte
      k += 1
    }
    ftyp ++ box("moov", box("mvhd", mvhd) ++ traks.flatten.toArray) ++
      box("mdat", payload)
  }
}
