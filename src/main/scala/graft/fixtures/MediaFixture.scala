package graft.fixtures

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.operators.Multimodal

/** Deterministic in-memory media payloads for the multimodal decode gate
  * (q67) and MultimodalSpec: three images with known dimensions encoded by
  * the JDK's own codecs, one PCM WAV with a known duration built byte by
  * byte, and one undecodable payload. Dimensions/duration are deterministic
  * by construction (the encoded byte COUNT is codec-version-dependent, so
  * nothing asserts on it). */
object MediaFixture {

  /** Gradient RGB image encoded with the given ImageIO format. */
  def image(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 255 / math.max(1, w - 1)) << 16) |
          ((y * 255 / math.max(1, h - 1)) << 8) | 0x40)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Minimal RIFF/WAVE file: 16-bit mono PCM, `sampleRate` Hz, `ms` long,
    * samples a fixed ramp. Exactly the canonical 44-byte header + data. */
  def wav(sampleRate: Int, ms: Int): Array[Byte] = {
    val nSamples = sampleRate * ms / 1000
    val dataSize = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) { buf.putShort((i % 1000).toShort); i += 1 }
    buf.array()
  }

  /** [[wav]]'s ramp at a uniform GAIN: s(i) = (i % 1000) · scale — the
    * re-leveled copy whose energy-delta fingerprint must equal the
    * original's bit for bit (every window energy scales by scale², so
    * every comparison lands identically). */
  def wavScaled(sampleRate: Int, ms: Int, scale: Int): Array[Byte] = {
    require(scale >= 1 && 999L * scale <= Short.MaxValue,
      s"scale $scale would clip 16-bit samples")
    val nSamples = sampleRate * ms / 1000
    val dataSize = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) { buf.putShort(((i % 1000) * scale).toShort); i += 1 }
    buf.array()
  }

  /** Audio near-dup corpus: the ramp (61), the SAME ramp at 2× gain (62
    * — the re-leveled copy, fingerprint identical by gain invariance),
    * the alternating-sign signal (63 — a flat-energy profile whose delta
    * signs differ from the ramp's in far more bits than any threshold),
    * and an image payload (64 — NULL fingerprint, never pairs). All PCM
    * formulas, so fingerprints are oracle-recomputable. */
  def audioNearDupFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(61L, "audio", "audio/wav", null, null, null, wav(8000, 200)),
      Row(62L, "audio", "audio/wav", null, null, null, wavScaled(8000, 200, 2)),
      Row(63L, "audio", "audio/wav", null, null, null, wavAlt(8000, 200)),
      Row(64L, "image", "image/png", null, null, null, image(16, 16, "png")))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** The PCM construction formulas of [[audioNearDupFrame]], for oracles
    * and specs: id → (sample function, sample count). */
  def audioNearDupFormulas: Seq[(Long, Int => Int, Int)] = Seq(
    (61L, (i: Int) => i % 1000, 1600),
    (62L, (i: Int) => (i % 1000) * 2, 1600),
    (63L, (i: Int) => ((i % 7) + 1) * (if (i % 2 == 0) 1 else -1), 1600))

  /** Minimal ISO-BMFF (MP4) container: an `ftyp` box followed by a `moov`
    * holding one version-0 `mvhd` whose timescale/duration encode the given
    * presentation length. No media tracks — the CONTAINER metadata is the
    * contract the duration probe recovers (a trackless file also pins that
    * [[graft.operators.Multimodal.sampleFrames]] yields zero rows rather
    * than inventing frames; [[mjpegMp4]] is the fixture WITH samples). */
  def mp4(timescale: Int, durationTicks: Long): Array[Byte] = {
    val buf = ByteBuffer.allocate(16 + 116).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(16).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)        // major brand + minor
    buf.putInt(116).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)                                         // version 0 + flags
      .putInt(0).putInt(0)                               // ctime, mtime
      .putInt(timescale)
      .putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort)       // rate 1.0, volume 1.0
      .put(new Array[Byte](10))                          // reserved
      .putInt(0x00010000).putInt(0).putInt(0)            // identity matrix
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .put(new Array[Byte](24))                          // pre_defined
      .putInt(2)                                         // next_track_id
    buf.array()
  }

  private def be32(i: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(i).array()
  private def be16(i: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(i.toShort).array()
  private def be64(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(l).array()

  /** ISO-BMFF box: 32-bit size + fourcc + concatenated payloads. */
  private def bmffBox(fourcc: String, payloads: Array[Byte]*): Array[Byte] = {
    val size = 8 + payloads.map(_.length).sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(size).put(fourcc.getBytes("US-ASCII"))
    payloads.foreach(buf.put)
    buf.array()
  }

  /** MJPEG-in-MP4: each frame is an independently JPEG-encoded sample in
    * the mdat, located by a full sample table (stsd `jpeg` entry, stts
    * decode deltas of `frameTicks` at `mediaTimescale`, stsc mapping into
    * TWO chunks when there are >4 samples — so the sample→chunk walk is
    * genuinely exercised — stsz sizes, stco chunk offsets). Layout is
    * ftyp | mdat | moov, so sample offsets never depend on moov's size.
    *
    * `co64 = true` stores chunk offsets 64-bit (the large-file form);
    * `sampleTicks` overrides the uniform delta with per-sample decode
    * deltas, run-length-encoded into a multi-entry stts (variable frame
    * rate) — both exist so the parser's co64 and stts-run paths are
    * fixture-coverable. */
  def mjpegMp4(frames: Seq[Array[Byte]], mediaTimescale: Int, frameTicks: Int,
      co64: Boolean = false, sampleTicks: Option[Seq[Int]] = None,
      mdhdV1: Boolean = false): Array[Byte] = {
    val n = frames.length
    require(n > 0 && mediaTimescale > 0 && frameTicks > 0, "degenerate fixture")
    require(sampleTicks.forall(_.length == n), "one delta per sample")
    val ftyp = bmffBox("ftyp",
      "isom".getBytes("US-ASCII"), be32(0), "isom".getBytes("US-ASCII"))
    val mdat = bmffBox("mdat", frames: _*)
    val mdatPayloadOff = ftyp.length + 8
    val c1 = math.min(4, n)                 // samples in chunk 1
    val chunkOffs =
      if (n > c1) Seq(mdatPayloadOff, mdatPayloadOff + frames.take(c1).map(_.length).sum)
      else Seq(mdatPayloadOff)
    val deltas = sampleTicks.getOrElse(Seq.fill(n)(frameTicks))
    val durationTicks = deltas.sum

    val mvhd = bmffBox("mvhd", be32(0), be32(0), be32(0),
      be32(mediaTimescale), be32(durationTicks),
      be32(0x00010000), be16(0x0100), new Array[Byte](10),
      be32(0x00010000), be32(0), be32(0),
      be32(0), be32(0x00010000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      new Array[Byte](24), be32(2))
    val tkhd = bmffBox("tkhd", be32(7), be32(0), be32(0),
      be32(1), be32(0), be32(durationTicks), new Array[Byte](8),
      be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000), be32(0), be32(0),
      be32(0), be32(0x00010000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      be32(0), be32(0))
    // v1 widens creation/modification time and duration to 64 bits —
    // the layout real muxers emit for large/old-date files
    val mdhd =
      if (mdhdV1) bmffBox("mdhd", be32(0x01000000), be64(0L), be64(0L),
        be32(mediaTimescale), be64(durationTicks.toLong), be16(0x55c4), be16(0))
      else bmffBox("mdhd", be32(0), be32(0), be32(0),
        be32(mediaTimescale), be32(durationTicks), be16(0x55c4), be16(0))
    val hdlr = bmffBox("hdlr", be32(0), be32(0),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      "JpegSampler ".getBytes("US-ASCII"))
    val vmhd = bmffBox("vmhd", be32(1), new Array[Byte](8))
    // VisualSampleEntry 'jpeg' (86 bytes): the QuickTime/ISO MJPEG format
    val stsdEntry = bmffBox("jpeg", new Array[Byte](6), be16(1),
      be16(0), be16(0), new Array[Byte](12),
      be16(0), be16(0),                      // width/height: probe decodes
      be32(0x00480000), be32(0x00480000), be32(0),
      be16(1), new Array[Byte](32), be16(24), be16(0xffff))
    val stsd = bmffBox("stsd", be32(0), be32(1), stsdEntry)
    // run-length-encode the decode deltas into stts entries
    val sttsRuns = deltas.foldLeft(List.empty[(Int, Int)]) {
      case ((c, d) :: rest, delta) if d == delta => (c + 1, d) :: rest
      case (acc, delta) => (1, delta) :: acc
    }.reverse
    val stts = bmffBox("stts",
      (Seq(be32(0), be32(sttsRuns.length)) ++
        sttsRuns.flatMap { case (c, d) => Seq(be32(c), be32(d)) }): _*)
    val stscEntries =
      if (n > c1) Seq(be32(1), be32(c1), be32(1), be32(2), be32(n - c1), be32(1))
      else Seq(be32(1), be32(n), be32(1))
    val stsc = bmffBox("stsc",
      (Seq(be32(0), be32(stscEntries.length / 3)) ++ stscEntries): _*)
    val stsz = bmffBox("stsz",
      (Seq(be32(0), be32(0), be32(n)) ++ frames.map(f => be32(f.length))): _*)
    val stco =
      if (co64) bmffBox("co64",
        (Seq(be32(0), be32(chunkOffs.length)) ++ chunkOffs.map(o => be64(o.toLong))): _*)
      else bmffBox("stco",
        (Seq(be32(0), be32(chunkOffs.length)) ++ chunkOffs.map(be32)): _*)
    val stbl = bmffBox("stbl", stsd, stts, stsc, stsz, stco)
    val moov = bmffBox("moov", mvhd,
      bmffBox("trak", tkhd,
        bmffBox("mdia", mdhd, hdlr,
          bmffBox("minf", vmhd, stbl))))
    ftyp ++ mdat ++ moov
  }

  /** The gradient-JPEG dimensions of [[videoFrame]]'s MJPEG track, frame i
    * = dims(i) at pts i·100 ms (timescale 30, 3 ticks/frame). */
  val videoFrameDims: Seq[(Int, Int)] =
    Seq((16, 8), (24, 12), (32, 16), (40, 20), (48, 24), (56, 28))

  /** Two-payload video corpus for the frame-extraction gate (q91): a
    * 6-frame MJPEG-in-MP4 built from gradient JPEGs of known dimensions
    * (spanning both stsc chunks), and undecodable bytes that must yield
    * zero frame rows. */
  def videoFrame(spark: SparkSession): DataFrame = {
    val jpegs = videoFrameDims.map { case (w, h) => image(w, h, "jpg") }
    val rows = Seq(
      Row(11L, "video", "video/mp4", null, null, null, mjpegMp4(jpegs, 30, 3)),
      Row(12L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](512)(i => (i * 31).toByte)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** The (id, w, h) construction parameters of [[featureFrame]]'s LOSSLESS
    * images — PNG/BMP decode bit-exactly, so an oracle can recompute the
    * expected feature from the gradient formula alone. */
  val featureImages: Seq[(Long, Int, Int)] =
    Seq((21L, 32, 16), (22L, 7, 5), (23L, 64, 64))

  /** Construction-parameter raster of [[image]] — the same gradient
    * formula, WITHOUT going through an encoder — for feature oracles. */
  def expectedRgb(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      ((x * 255 / math.max(1, w - 1)) << 16) |
        ((y * 255 / math.max(1, h - 1)) << 8) | 0x40
    }

  /** Feature-extraction corpus (q92): three lossless images whose decoded
    * pixels are construction-derivable (one smaller than the downsample
    * grid, exercising the cell-repeat path), plus an audio payload and
    * garbage bytes that must keep their rows with NULL features. */
  def featureFrame(spark: SparkSession): DataFrame = {
    val rows = featureImages.map { case (id, w, h) =>
      val fmt = if (id == 22L) "bmp" else "png"
      val mime = if (id == 22L) "image/bmp" else "image/png"
      Row(id, "image", mime, null, null, null, image(w, h, fmt))
    } ++ Seq(
      Row(24L, "audio", "audio/wav", null, null, null, wav(8000, 100)),
      Row(25L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](256)(i => (i * 13).toByte)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** Gradient image with per-pixel OVERRIDES applied after the formula —
    * the perceptual-hash fixtures' perturbation primitive (PNG-encode for
    * bit-exact decode). `overrides` maps (x, y) → packed 0xRRGGBB. */
  def imageWithOverrides(w: Int, h: Int, format: String,
      overrides: Map[(Int, Int), Int]): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = expectedRgbWithOverrides(w, h, overrides)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(y * w + x)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** [[expectedRgb]] with overrides — the formula twin of
    * [[imageWithOverrides]], for oracles. */
  def expectedRgbWithOverrides(w: Int, h: Int,
      overrides: Map[(Int, Int), Int]): Array[Int] = {
    val rgb = expectedRgb(w, h)
    overrides.foreach { case ((x, y), v) => rgb(y * w + x) = v }
    rgb
  }

  /** The inverted gradient — the formula for the phash corpus's FAR image
    * (every luma trend reversed, so roughly half the hash bits flip). */
  def expectedRgbInverted(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      (((255 - x * 255 / math.max(1, w - 1)) << 16) |
        ((255 - y * 255 / math.max(1, h - 1)) << 8) | 0x40)
    }

  private def encodePng(rgb: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(y * w + x)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Perceptual-hash corpus: the 32×32 gradient base (41), a perturbation
    * of it blacking out the brightest 4×4 cell block (42 — the near-dup),
    * the SAME gradient at 16×16 (43 — the resized copy aHash exists to
    * catch), the INVERTED gradient (44 — far), and an audio payload (45 —
    * NULL hash, never pairs). All PNG (bit-exact decode) with
    * construction-formula twins, so an oracle recomputes every hash and
    * every pairwise hamming driver-side. */
  val phashOverrides: Map[(Int, Int), Int] =
    (for (x <- 28 until 32; y <- 28 until 32) yield (x, y) -> 0x000000).toMap
  def phashRasters: Seq[(Long, Array[Int], Int, Int)] = Seq(
    (41L, expectedRgb(32, 32), 32, 32),
    (42L, expectedRgbWithOverrides(32, 32, phashOverrides), 32, 32),
    (43L, expectedRgb(16, 16), 16, 16),
    (44L, expectedRgbInverted(32, 32), 32, 32))
  def phashFrame(spark: SparkSession): DataFrame = {
    val rows = phashRasters.map { case (id, rgb, w, h) =>
      Row(id, "image", "image/png", null, null, null, encodePng(rgb, w, h))
    } :+ Row(45L, "audio", "audio/wav", null, null, null, wav(8000, 100))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** 32×32 JPEG whose 4×4 pixel blocks paint a TARGET 64-bit cell
    * pattern (bit (cy·8+cx) set → white block, else black) — aHash64
    * recovers approximately that pattern (JPEG loss moves cell means a
    * few counts around 0/255, never across the global mean), so videos
    * built from these frames have HAND-DERIVABLE near-dup structure:
    * identical patterns hash within 0–1 bits, distinct patterns tens of
    * bits apart. */
  def patternJpeg(pattern: Long): Array[Byte] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val bit = (y / 4) * 8 + (x / 4)
        img.setRGB(x, y,
          if (((pattern >>> bit) & 1L) == 1L) 0xFFFFFF else 0x000000)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Video near-dup corpus: video 51 carries pattern frames P1..P4,
    * video 52 shares P1 and P2 BYTE-IDENTICALLY (the re-muxed clip) then
    * diverges (P5, P6), video 53 is all-different (P7, P8), and 54 is
    * undecodable bytes. Patterns are half-set constants with pairwise
    * hamming far above any threshold, so the expected video pairs are
    * hand-derivable: only (51, 52) with exactly 2 shared frames. */
  val videoPatterns: Seq[Long] = Seq(
    0xF0F0F0F00F0F0F0FL, // P1
    0x0F0F0F0FF0F0F0F0L, // P2 (complement of P1)
    0xAAAA5555AAAA5555L, // P3
    0x5555AAAA5555AAAAL, // P4
    0xFF00FF0000FF00FFL, // P5
    0x00FF00FFFF00FF00L, // P6
    0xF00FF00F0FF00FF0L, // P7
    0x0FF00FF0F00FF00FL) // P8
  def videoNearDupFrame(spark: SparkSession): DataFrame = {
    val p = videoPatterns.map(patternJpeg)
    val rows = Seq(
      Row(51L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(p(0), p(1), p(2), p(3)), 30, 3)),
      Row(52L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(p(0), p(1), p(4), p(5)), 30, 3)),
      Row(53L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(p(6), p(7)), 30, 3)),
      Row(54L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](512)(i => (i * 31).toByte)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** The six-payload corpus in [[Multimodal.metadataSchema]] shape, with
    * the decode-result fields (width/height/duration_ms) deliberately NULL
    * so decodeMedia must RECOVER them from the bytes. */
  def frame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(1L, "image", "image/png", null, null, null, image(32, 16, "png")),
      Row(2L, "image", "image/jpeg", null, null, null, image(64, 48, "jpg")),
      Row(3L, "image", "image/bmp", null, null, null, image(8, 8, "bmp")),
      Row(4L, "audio", "audio/wav", null, null, null, wav(8000, 500)),
      Row(5L, "video", "video/mp4", null, null, null, mp4(600, 1500)), // 2500 ms
      Row(6L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](512)(i => (i * 31).toByte))) // undecodable bytes
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** 16-bit mono PCM WAV whose samples ALTERNATE sign with varying
    * magnitude: s(i) = ((i % 7) + 1) · (−1)^i — every consecutive pair is
    * a strict zero crossing, so frame-level crossing counts are exactly
    * (frame length − 1). The voiced-signal counterpart of [[wav]]'s
    * non-negative ramp (whose crossing count is exactly 0). */
  /** 32×32 PNG whose 4×4 pixel blocks paint a TARGET 64-bit cell
    * pattern — [[patternJpeg]]'s LOSSLESS twin. PNG decodes bit-exactly,
    * so a white block's cell luma-mean is exactly 255000 (299·255 +
    * 587·255 + 114·255) and a black block's exactly 0; with
    * k = popcount(pattern) set bits constrained to 1 ≤ k ≤ 63, the
    * global cell-mean average k·255000/64 lies STRICTLY between 0 and
    * 255000, so aHash64's threshold reproduces `pattern` EXACTLY, bit
    * for bit. The expected hash is read off the hex constant by eye —
    * no kernel call anywhere in an oracle built on these. */
  def patternPng(pattern: Long): Array[Byte] =
    encodePng(patternRaster(pattern), 32, 32)

  /** The construction raster [[patternPng]] paints (for oracles and for
    * raster-level transforms like [[rotate90]]). */
  def patternRaster(pattern: Long): Array[Int] = {
    val k = java.lang.Long.bitCount(pattern)
    require(k >= 1 && k <= 63,
      s"pattern needs 1..63 set bits for an exact hash, got $k")
    Array.tabulate(32 * 32) { idx =>
      val bit = (idx / 32 / 4) * 8 + (idx % 32 / 4)
      if (((pattern >>> bit) & 1L) == 1L) 0xFFFFFF else 0x000000
    }
  }

  /** Square raster rotated 90° clockwise — the re-upload transform the
    * oriented near-dup (q199) exists to catch. */
  def rotate90(rgb: Array[Int], n: Int): Array[Int] = {
    require(rgb.length == n * n, "square raster required")
    val out = new Array[Int](n * n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) { out(x * n + (n - 1 - y)) = rgb(y * n + x); x += 1 }
      y += 1
    }
    out
  }

  /** Oriented near-dup corpus (q199): P is an ASYMMETRIC pattern (its
    * own nontrivial orbit stays ≥22 bits away, so nothing self-pairs
    * spuriously). 141 = patternPng(P); 142 = the SAME raster rotated
    * 90° (plain aHash 30 bits away — the miss — oriented hamming 0);
    * 143 paints mirror(P) with bits 0 and 2 flipped (a mirrored
    * re-encode with a small perturbation: oriented hamming 2 to both
    * 141 and 142, plain 28); 144 = Q, orbit-distance ≥24 from all;
    * 145 = audio (NULL, never pairs). Construction rasters exposed via
    * [[orientedRasters]] so the oracle brute-forces oriented distances
    * through the same pure kernels. */
  val orientedP: Long = 0x910A2DEC89025CC1L
  val orientedQ: Long = 0x975835DE1C9756CEL
  def orientedRasters: Seq[(Long, Array[Int])] = {
    // mirror(P): orientation 4 of the hash constant == the hash of the
    // mirrored raster; paint the permuted constant directly
    val mirrorP = {
      var v = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          v |= ((orientedP >>> (cy * 8 + (7 - cx))) & 1L) << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      v
    }
    Seq(
      (141L, patternRaster(orientedP)),
      (142L, rotate90(patternRaster(orientedP), 32)),
      (143L, patternRaster(mirrorP ^ 0x5L)),
      (144L, patternRaster(orientedQ)))
  }
  def orientedFrame(spark: SparkSession): DataFrame = {
    val rows = orientedRasters.map { case (id, rgb) =>
      Row(id, "image", "image/png", null, null, null, encodePng(rgb, 32, 32))
    } :+ Row(145L, "audio", "audio/wav", null, null, null, wav(8000, 100))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** Rotated-clip corpus (q201): video 121 carries two asymmetric
    * pattern frames (P = [[orientedP]], Q = [[orientedQ]] — self-orbit
    * ≥20 bits, orbit-distance 24 apart, so frames never cross-pair);
    * 122 is the SAME two frames each rotated 90° and re-encoded (the
    * portrait/landscape re-upload — every grid cell moves, so the
    * plain frame join finds nothing while the oriented join matches
    * both frames at orbit hamming ~0 through JPEG loss); 123 carries
    * two fresh asymmetric patterns ≥18 orbit-bits from everything;
    * 124 is undecodable. Expected oriented output is literal:
    * exactly (121, 122, 2). */
  def videoOrientedFrame(spark: SparkSession): DataFrame = {
    def jpeg(rgb: Array[Int]) = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) { img.setRGB(x, y, rgb(y * 32 + x)); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val p = patternRaster(orientedP)
    val q = patternRaster(orientedQ)
    val rows = Seq(
      Row(121L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(jpeg(p), jpeg(q)), 30, 3)),
      Row(122L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(jpeg(rotate90(p, 32)), jpeg(rotate90(q, 32))), 30, 3)),
      Row(123L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(jpeg(patternRaster(0x0EFEB38E6132B439L)),
          jpeg(patternRaster(0xF4A610C9A2C009C3L))), 30, 3)),
      Row(124L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](512)(i => (i * 31).toByte)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** [[wavStaircase]] nearest-neighbor-upsampled to 16 kHz: every
    * sample written TWICE at double the declared rate — same duration,
    * same waveform, twice the samples. The energy-delta fingerprint is
    * EXACTLY invariant: windows are fractions of the total sample
    * count, so window w covers the duplicated copies of the original
    * window w's samples and every energy doubles — every comparison,
    * ties included, lands identically. */
  def wavStaircaseUpsampled2x(pattern: Long): Array[Byte] = {
    val inner = wavStaircase(pattern)
    val nSamples = 2 * 1600
    val dataSize = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000)
      .putInt(16000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < 1600) {
      val lo = inner(44 + 2 * i); val hi = inner(44 + 2 * i + 1)
      buf.put(lo).put(hi).put(lo).put(hi)
      i += 1
    }
    buf.array()
  }

  /** Resample-invariance corpus (q200): 151 = the staircase constant A
    * at 8 kHz, 152 = its near-twin B = A ^ 0x30 nearest-neighbor
    * upsampled to 16 kHz (the re-encoded-at-a-different-rate copy —
    * fingerprint exactly B by the window-fraction argument), 153 = a
    * far constant, 154 = an image (NULL). Expected pairs are literal:
    * only (151, 152, 2). */
  def audioResampleFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(151L, "audio", "audio/wav", null, null, null,
        wavStaircase(0xA5A5A5A5A5A5A5A5L)),
      Row(152L, "audio", "audio/wav", null, null, null,
        wavStaircaseUpsampled2x(0xA5A5A5A5A5A5A595L)), // 151 ^ 0x30
      Row(153L, "audio", "audio/wav", null, null, null,
        wavStaircase(0x5A5A5A5A5A5A5A5AL)), // ~151
      Row(154L, "image", "image/png", null, null, null, image(16, 16, "png")))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** Literal-oracle image corpus: every aHash IS its painted constant
    * ([[patternPng]]), so the expected near-dup rows are hand-derived
    * from the constants alone — 46 and 47 differ by XOR 0x7 (hamming 3,
    * the only pair at threshold 7), 48 is 46's complement (64 and 61
    * bits away), 49 is audio (NULL hash, never pairs). */
  def phashLiteralFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(46L, "image", "image/png", null, null, null,
        patternPng(0xF0F0F0F00F0F0F0FL)),
      Row(47L, "image", "image/png", null, null, null,
        patternPng(0xF0F0F0F00F0F0F08L)), // 46 ^ 0x7: bits 0,1,2 flipped
      Row(48L, "image", "image/png", null, null, null,
        patternPng(0x0F0F0F0FF0F0F0F0L)), // ~46
      Row(49L, "audio", "audio/wav", null, null, null, wav(8000, 100)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** 16-bit mono WAV whose energy-delta fingerprint IS `pattern`: 64
    * windows of 25 constant samples each (1600 samples, exact 25-sample
    * window boundaries). The amplitude climbs one 100-step per
    * consecutive set bit and drops to SILENCE on a clear bit, so window
    * energy E(w) = 25·amp² rises exactly at the set bits: a climb is a
    * strict rise, silence after sound is a strict fall, silence after
    * silence ties (and a tie is not a rise), and window 0 rises iff it
    * is not silent (E(−1) = 0). The expected fingerprint is the hex
    * constant itself — no kernel call in an oracle built on these. */
  def wavStaircase(pattern: Long): Array[Byte] = {
    val base = wav(8000, 200) // 1600 zero-able samples, header reused
    val buf = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    var amp = 0
    var w = 0
    while (w < 64) {
      amp = if (((pattern >>> w) & 1L) == 1L) amp + 1 else 0
      var i = 0
      while (i < 25) {
        buf.putShort(44 + 2 * (w * 25 + i), (amp * 100).toShort)
        i += 1
      }
      w += 1
    }
    base
  }

  /** Literal-oracle audio corpus: every fingerprint IS its staircase
    * constant ([[wavStaircase]]), so expected pairs are hand-derived —
    * 71 and 72 differ by XOR 0x30 (hamming 2, the only pair at
    * threshold 7), 73 is 71's complement (64 and 62 bits away), 74 is
    * an image (NULL fingerprint, never pairs). */
  def audioLiteralFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(71L, "audio", "audio/wav", null, null, null,
        wavStaircase(0xA5A5A5A5A5A5A5A5L)),
      Row(72L, "audio", "audio/wav", null, null, null,
        wavStaircase(0xA5A5A5A5A5A5A595L)), // 71 ^ 0x30: bits 4,5 flipped
      Row(73L, "audio", "audio/wav", null, null, null,
        wavStaircase(0x5A5A5A5A5A5A5A5AL)), // ~71
      Row(74L, "image", "image/png", null, null, null, image(16, 16, "png")))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Textured gray raster for the DCT-vs-aHash gate (q195), built from
    * two orthogonal ingredients:
    *
    *  1. a LOW-FREQUENCY texture: every coefficient of the pHashDct
    *     window (the top-left 8×8 DCT block, DC excluded) gets a
    *     distinct seeded amplitude in ±[2, 8], so all 63 hashed
    *     coefficients are well separated from their median — the
    *     full-spectrum property natural photographs have and smooth
    *     synthetic gradients lack (near-median coefficients are what
    *     make a DCT hash flip under ANY perturbation);
    *  2. a WITHIN-CELL dither: on the aHash grid's checkerboard cells
    *     ((cx+cy) even), a ±`ditherAmp` pixel-granularity alternation —
    *     zero mean per cell (aHash cell means untouched in the base)
    *     and pure high-frequency (far outside the DCT window).
    *
    * Under a concave tone edit (gamma < 1) the dither is what breaks
    * aHash: E[f(m ± A)] < f(m) by Jensen, so every dithered cell's mean
    * drops ~18 luma relative to undithered cells, dragging the cells
    * that hug the global mean across it — 16 of 64 bits flip at
    * ditherAmp 100 / γ 0.5 — while the DCT window sees neither the
    * dither nor its gamma residue (both live at pixel frequency) and
    * moves 2 bits. Gray (r = g = b), so luma equals the channel value. */
  def texturedDitherRaster(seed: Long, w: Int, h: Int,
      ditherAmp: Int): Array[Int] = {
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var s = 128.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            if (u != 0 || v != 0) {
              val r = mix64(seed ^ (v * 8L + u))
              val amp = (2 + java.lang.Math.floorMod(r, 7L)).toDouble *
                (if (((r >> 40) & 1L) == 0L) 1 else -1)
              s += amp *
                StrictMath.cos((2.0 * x / w * 32 + 1) * u * StrictMath.PI / 64) *
                StrictMath.cos((2.0 * y / h * 32 + 1) * v * StrictMath.PI / 64)
            }
            u += 1
          }
          v += 1
        }
        val cx = x * 8 / w; val cy = y * 8 / h
        if (((cx + cy) & 1) == 0) {
          val px = x / math.max(1, w / 32); val py = y / math.max(1, h / 32)
          s += (if (((px + py) & 1) == 0) ditherAmp else -ditherAmp).toDouble
        }
        val vv = math.max(0L, math.min(255L, StrictMath.round(s)))
        rgb(y * w + x) = ((vv << 16) | (vv << 8) | vv).toInt
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Pixelwise γ = 0.5 tone edit (v → round(√(255·v)) per channel) —
    * the brightening gamma curve image re-encoders apply; 0 and 255 are
    * its fixed points. Concave, so dithered cells' means drop by the
    * Jensen penalty relative to smooth cells' — the aHash breaker. */
  def gammaHalf(rgb: Array[Int]): Array[Int] =
    rgb.map { p =>
      def g(c: Int): Long =
        StrictMath.round(StrictMath.sqrt(255.0 * c))
      ((g((p >>> 16) & 0xff) << 16) | (g((p >>> 8) & 0xff) << 8) |
        g(p & 0xff)).toInt
    }

  /** The DCT-robustness corpus's construction rasters, for oracles and
    * specs: the textured base (101), its γ-0.5 copy (102 — the tone
    * edit aHash provably misses at 16 flipped bits and pHashDct pairs
    * at hamming 2), and a different-seed far image (103). */
  def dctRasters: Seq[(Long, Array[Int], Int, Int)] = {
    val base = texturedDitherRaster(42L, 32, 32, 100)
    Seq(
      (101L, base, 32, 32),
      (102L, gammaHalf(base), 32, 32),
      (103L, texturedDitherRaster(777L, 32, 32, 100), 32, 32))
  }

  /** DCT-kernel near-dup corpus: [[dctRasters]] PNG-encoded (bit-exact
    * decode) plus an audio decoy (104 — NULL hash, never pairs). */
  def dctNearDupFrame(spark: SparkSession): DataFrame = {
    val rows = dctRasters.map { case (id, rgb, w, h) =>
      Row(id, "image", "image/png", null, null, null, encodePng(rgb, w, h))
    } :+ Row(104L, "audio", "audio/wav", null, null, null, wav(8000, 100))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  /** [[wavStaircase]] padded with `padMs` of DIGITAL SILENCE (zero
    * samples) before and after — the re-edit that breaks the raw
    * energy-delta fingerprint (all 64 window boundaries shift) and that
    * the silence-trimmed kernel is invariant to: provided the pattern's
    * bits 0 and 63 are SET (the staircase then starts and ends loud),
    * trimming at floor 0 strips exactly the padding and the trimmed
    * span is byte-identical to the unpadded staircase, so the
    * fingerprint is the hex constant again. */
  def wavStaircasePadded(pattern: Long, padMs: Int): Array[Byte] = {
    require((pattern & 1L) != 0 && (pattern >>> 63) != 0,
      "padding-exactness needs bits 0 and 63 set (loud edges)")
    val inner = wavStaircase(pattern)
    val pad = 8000 * padMs / 1000
    val nSamples = 1600 + 2 * pad
    val dataSize = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000)
      .putInt(8000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    buf.position(44 + 2 * pad)
    buf.put(inner, 44, 1600 * 2)
    buf.array()
  }

  /** Time-shift audio corpus (q196, literal oracle): 81 = the staircase
    * constant A, 82 = the near-twin B = A ^ 0x30 with 100 ms of silence
    * padded on BOTH ends (the re-edited copy — raw fingerprints miss
    * it, trimmed fingerprints recover exactly B), 83 = a far constant
    * (~62 bits from both), 84 = an image (NULL, never pairs). All three
    * patterns have bits 0 and 63 set, so floor-0 trimming strips
    * nothing but 82's padding and every fingerprint IS its constant. */
  def audioShiftFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(81L, "audio", "audio/wav", null, null, null,
        wavStaircase(0xA5A5A5A5A5A5A5A5L)),
      Row(82L, "audio", "audio/wav", null, null, null,
        wavStaircasePadded(0xA5A5A5A5A5A5A595L, 100)), // 81 ^ 0x30
      Row(83L, "audio", "audio/wav", null, null, null,
        wavStaircase(0xDA5A5A5A5A5A5A5BL)), // ~81 with loud edges forced
      Row(84L, "image", "image/png", null, null, null, image(16, 16, "png")))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  private def encodeJpeg(rgb: Array[Int], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(y * w + x)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** Tone-shifted re-encode video corpus (q198): video 111 carries two
    * textured frames ([[texturedDitherRaster]] seeds 42 / 43,
    * JPEG-encoded), video 112 the SAME two frames γ-0.5 tone-shifted
    * and re-encoded — the re-upload that also ran a brightness curve.
    * Through JPEG loss the per-frame aHash distance is 16–17 bits (no
    * pair at any sane threshold — the measured miss MultimodalSpec
    * pins) while pHashDct holds both frame pairs at hamming 2, so with
    * `kernel = "dct"` the ONLY video pair is the hand-derivable
    * (111, 112, 2). Video 113 is two different-seed frames (far under
    * both kernels); 114 is undecodable bytes. */
  def videoDctFrame(spark: SparkSession): DataFrame = {
    val t42 = texturedDitherRaster(42L, 32, 32, 100)
    val t43 = texturedDitherRaster(43L, 32, 32, 100)
    val rows = Seq(
      Row(111L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(encodeJpeg(t42, 32, 32), encodeJpeg(t43, 32, 32)),
          30, 3)),
      Row(112L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(encodeJpeg(gammaHalf(t42), 32, 32),
          encodeJpeg(gammaHalf(t43), 32, 32)), 30, 3)),
      Row(113L, "video", "video/mp4", null, null, null,
        mjpegMp4(Seq(
          encodeJpeg(texturedDitherRaster(777L, 32, 32, 100), 32, 32),
          encodeJpeg(texturedDitherRaster(888L, 32, 32, 100), 32, 32)),
          30, 3)),
      Row(114L, "video", "video/mp4", null, null, null,
        Array.tabulate[Byte](512)(i => (i * 31).toByte)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }

  def wavAlt(sampleRate: Int, ms: Int): Array[Byte] = {
    val base = wav(sampleRate, ms)
    val nSamples = sampleRate * ms / 1000
    val buf = ByteBuffer.wrap(base).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nSamples) {
      val mag = (i % 7) + 1
      buf.putShort(44 + 2 * i, (if (i % 2 == 0) mag else -mag).toShort)
      i += 1
    }
    base
  }

  /** Audio-feature fixture: the ramp payload (energy varies per frame,
    * zero crossings), the alternating payload (maximal crossings), an
    * image (not audio → zero rows) and a NULL payload (zero rows). */
  def audioFrame(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row(21L, "audio", "audio/wav", null, null, null, wav(8000, 250)),
      Row(22L, "audio", "audio/wav", null, null, null, wavAlt(4000, 125)),
      Row(23L, "image", "image/png", null, null, null, image(8, 8, "png")),
      Row(24L, "audio", "audio/wav", null, null, null, null))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
  }
}
