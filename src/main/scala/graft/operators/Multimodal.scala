package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed batch-wise per
  * partition.
  *
  * What is REAL vs STUB here:
  *  - image decode + resize: REAL, via the JDK's own codecs
  *    (`javax.imageio` — PNG/JPEG/BMP/GIF), headless-safe;
  *  - audio metadata: REAL, via a RIFF/WAVE chunk parse (PCM duration,
  *    sample rate, channels);
  *  - video frame extraction: STUB (the JDK ships no video codec) — the
  *    chunked explode reproduces a keyframe sampler's output shape;
  *  - learned feature extraction ([[extractFeatures]]): STUB feature MODEL
  *    (byte-histogram moments stand in for an embedding network); the batch
  *    plumbing around it is the real contract.
  *
  * All decode work runs batch-wise via mapPartitions (the JVM analogue of
  * arrow-batched pandas UDFs: one iterator per partition, per-partition
  * codec init amortized across the batch). Scale notes: payloads never pass
  * through a shuffle — decode is map-side; only (id, metadata/feature)
  * projections move. Partition sizing for ~100 MB binary batches is the
  * caller's `maxPartitionBytes` concern.
  */
object Multimodal {

  /** Typed metadata carried alongside every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),       // images/video
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),    // audio/video
    StructField("payload", BinaryType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Wrap a string-keyed corpus into the multimodal contract (used by tests
    * to fabricate payloads; production ingestion reads real binaries). */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("image").as("media_type"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"),
      col(textCol).cast("binary").as("payload"))

  /** STUB feature MODEL: a real deployment swaps the body for an embedding
    * network (the batch shape — one partition iterator, per-batch init — is
    * exactly what that call needs; intrinsic decode is already real, see
    * [[decodeMedia]]). The stand-in feature is deterministic: 8 floats
    * derived from byte histogram moments. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition (≈ per-batch) init happens once, here — the stub
        // has nothing to init, a real codec would.
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val feat = new Array[Float](8)
          var i = 0
          while (i < bytes.length) {
            feat(i % 8) += (bytes(i) & 0xff) / 255.0f
            i += 1
          }
          Row(id, bytes.length.toLong, feat.toSeq)
        }
      }(outEnc)
  }

  /** End-to-end: payloads → features, joined back to metadata. */
  def withFeatures(media: DataFrame): DataFrame =
    media.join(extractFeatures(media).drop("n_bytes"), Seq("media_id"))

  /** Schema of [[decodeMedia]]: recovered intrinsic metadata. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  /** REAL decode of intrinsic metadata from the payload bytes, map-side:
    * image dimensions from the codec HEADER only (`ImageReader.getWidth` —
    * never materializing the raster: a 50-MP JPEG costs a few header bytes
    * here, not 200 MB of decoded pixels), audio through the RIFF/WAVE
    * parse, video CONTAINER duration through the ISO-BMFF `moov`/`mvhd`
    * walk (byte arithmetic only — no codec; frame DECODE stays stubbed,
    * see [[sampleFrames]]). The media_type column routes each payload to
    * its own probe; rows with an unknown/NULL type try all three (every
    * probe is header-cheap). Undecodable payloads yield NULL width/height/
    * duration — never an exception, never a dropped row. */
  def decodeMedia(media: DataFrame): DataFrame = {
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select(col("media_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mtype = if (r.isNullAt(1)) null else r.getString(1)
          val bytes = if (r.isNullAt(2)) Array.emptyByteArray else r.getAs[Array[Byte]](2)
          val dims =
            if (mtype == "image" || mtype == null) imageDims(bytes) else None
          val wavMeta =
            if ((mtype == "audio" || mtype == null) && dims.isEmpty) Wav.parse(bytes)
            else None
          val mp4Ms =
            if ((mtype == "video" || mtype == null) && dims.isEmpty && wavMeta.isEmpty)
              Mp4.durationMs(bytes)
            else None
          Row(id, mtype,
            dims.map(d => Integer.valueOf(d._1)).orNull,
            dims.map(d => Integer.valueOf(d._2)).orNull,
            wavMeta.map(m => java.lang.Long.valueOf(m.durationMs))
              .orElse(mp4Ms.map(java.lang.Long.valueOf(_))).orNull,
            java.lang.Long.valueOf(bytes.length.toLong))
        }
      }(outEnc)
  }

  /** Header-only image dimensions: find a reader for the byte signature and
    * ask it for width/height — no raster decode. */
  private def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            Some((reader.getWidth(0), reader.getHeight(0)))
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  /** REAL image resize: decode (JDK codecs), scale to `w`×`h` with bilinear
    * Graphics2D, re-encode as PNG. Routing matches [[decodeMedia]]: only
    * rows typed `image` are decoded — audio/video rows pass through
    * UNTOUCHED (an image operation must never erase a valid WAV). An
    * UNTYPED row is resized only when its payload actually decodes as an
    * image; otherwise it passes through unchanged — the NULL decode-failure
    * marker (payload and dimensions nulled, the signal a downstream quality
    * filter keys on) is reserved for rows explicitly typed `image`, because
    * only there does decode failure prove the payload corrupt rather than
    * merely non-image. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(metadataSchema)
    media.select(metadataSchema.fieldNames.map(col): _*)
      .mapPartitions { rows =>
        rows.map { r =>
          val mtype = if (r.isNullAt(1)) null else r.getString(1)
          val payload =
            if (r.isNullAt(6)) Array.emptyByteArray else r.getAs[Array[Byte]](6)
          if (mtype != null && mtype != "image") r
          else decodeImage(payload) match {
            case None if mtype == null => r
            case Some(src) =>
              val dst = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = dst.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(src, 0, 0, w, h, null)
              g.dispose()
              val out = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", out)
              Row(r.getLong(0), r.getString(1), "image/png",
                Integer.valueOf(w), Integer.valueOf(h),
                if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)),
                out.toByteArray)
            case None =>
              Row(r.getLong(0), r.getString(1), r.getString(2),
                null, null,
                if (r.isNullAt(5)) null else java.lang.Long.valueOf(r.getLong(5)),
                null)
          }
        }
      }(outEnc)
  }

  /** ImageIO.read returns null (or throws, for truncated headers) on bytes
    * it cannot decode; normalize both to None. */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes.isEmpty) None
    else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** Minimal RIFF/WAVE reader: walks the chunk list for `fmt ` + `data` and
    * derives PCM duration. Pure byte arithmetic — no audio device, no
    * javax.sound pipeline (which needs a registered audio system). */
  private[operators] object Wav {
    final case class Meta(sampleRate: Int, channels: Int, durationMs: Long)

    def parse(b: Array[Byte]): Option[Meta] = {
      def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def tag(o: Int) = new String(b, o.toInt, 4, "US-ASCII")
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      // offsets as Long, chunk sizes as UNSIGNED 32-bit: a corrupt/hostile
      // size field must neither loop forever (negative step), overflow the
      // offset, nor index past the buffer — this parser runs on arbitrary
      // payload bytes under decodeMedia's never-throw contract
      var off = 12L
      var byteRate = 0; var sampleRate = 0; var channels = 0
      var dataSize = -1L
      while (off + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
        val id = tag(off.toInt)
        val size = le32(off.toInt + 4).toLong & 0xffffffffL
        if (id == "fmt " && off + 24 <= b.length) {
          channels = le16(off.toInt + 10)
          sampleRate = le32(off.toInt + 12)
          byteRate = le32(off.toInt + 16)
        } else if (id == "data") {
          // clamp to the bytes actually present: a truncated or hostile
          // declared size must not inflate the duration (wrong metadata is
          // worse than honest metadata about a short payload)
          dataSize = math.min(size, b.length - (off + 8))
        }
        off += 8 + size + (size & 1) // chunks are word-aligned; step >= 8
      }
      if (byteRate > 0 && dataSize >= 0)
        Some(Meta(sampleRate, channels, dataSize * 1000 / byteRate))
      else None
    }
  }

  /** Minimal ISO-BMFF (MP4) container probe: walks the top-level box list
    * for `moov`, then its children for `mvhd`, and derives the presentation
    * duration from the movie-header timescale. Pure byte arithmetic — the
    * same class as [[Wav]]: no codec, runs on arbitrary bytes under
    * decodeMedia's never-throw contract, so box sizes are treated as
    * unsigned/hostile (a corrupt size must neither loop, overflow, nor
    * index out of bounds). Handles 32- and 64-bit box sizes and mvhd
    * versions 0 and 1. */
  private[operators] object Mp4 {

    def durationMs(b: Array[Byte]): Option[Long] = {
      def be32(o: Long): Long =
        ((b(o.toInt) & 0xffL) << 24) | ((b(o.toInt + 1) & 0xffL) << 16) |
          ((b(o.toInt + 2) & 0xffL) << 8) | (b(o.toInt + 3) & 0xffL)
      def be64(o: Long): Long =
        (be32(o) << 32) | be32(o + 4)
      def tag(o: Long) = new String(b, o.toInt, 4, "US-ASCII")
      // find box `name` inside [from, until); returns (payloadOff, payloadEnd)
      def findBox(name: String, from: Long, until: Long): Option[(Long, Long)] = {
        var off = from
        while (off + 8 <= until) {
          val size32 = be32(off)
          val (size, hdr) =
            if (size32 == 1L && off + 16 <= until) (be64(off + 8), 16L)
            else if (size32 == 0L) (until - off, 8L)   // box extends to end
            else (size32, 8L)
          if (size < hdr || off + size > until || off + size < off) return None
          if (tag(off + 4) == name) return Some((off + hdr, off + size))
          off += size
        }
        None
      }
      findBox("moov", 0L, b.length.toLong).flatMap { case (moovOff, moovEnd) =>
        findBox("mvhd", moovOff, moovEnd).flatMap { case (p, pEnd) =>
          // v0 payload: version+flags(4) ctime(4) mtime(4) timescale(4)
          // duration(4) = 20 bytes min; v1 widens ctime/mtime/duration to 8
          if (pEnd - p < 20) None
          else {
            val version = b(p.toInt) & 0xff
            // an all-ones duration is the ISO-BMFF "duration unknown"
            // sentinel (common in fragmented/live-captured files) — NULL,
            // not an enormous bogus duration_ms
            if (version == 0) {
              val timescale = be32(p + 12); val duration = be32(p + 16)
              if (timescale > 0 && duration != 0xffffffffL)
                Some(duration * 1000L / timescale)
              else None
            } else if (version == 1 && pEnd - p >= 32) {
              val timescale = be32(p + 20); val duration = be64(p + 24)
              // hostile 64-bit durations must not overflow the ms multiply
              // (a wrapped-negative duration is wrong metadata, not NULL);
              // the v1 all-ones sentinel (-1L) fails the sign guard by
              // design, not by accident
              if (timescale > 0 && duration >= 0 &&
                  duration <= Long.MaxValue / 1000L)
                Some(duration * 1000L / timescale)
              else None
            } else None
          }
        }
      }
    }
  }

  /** STUB frame sampling for video payloads: every `everyNth` chunk of the
    * payload becomes one "frame" row (media_id, frame_no, frame bytes) —
    * the explode shape a real decoder's keyframe sampler produces. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4, chunk: Int = 256): DataFrame = {
    val frameSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val nChunks = math.max(1, payload.length / chunk)
          (0 until nChunks by everyNth).map { i =>
            val from = i * chunk
            val until = math.min(payload.length, from + chunk)
            Row(r.getLong(0), Integer.valueOf(i),
              java.util.Arrays.copyOfRange(payload, from, math.max(from, until)))
          }
        }
      }(outEnc)
  }
}
