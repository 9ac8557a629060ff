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

  /** Minimal ISO-BMFF (MP4) container: an `ftyp` box followed by a `moov`
    * holding one version-0 `mvhd` whose timescale/duration encode the given
    * presentation length. No media tracks — the CONTAINER metadata is the
    * contract the header probe recovers (frame decode stays stubbed). */
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
}
