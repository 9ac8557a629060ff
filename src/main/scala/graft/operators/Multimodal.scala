package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (north star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, processed batch-wise per
  * partition. Everything here is REAL, built on what the JVM itself ships:
  *
  *  - image decode + resize: the JDK's own codecs (`javax.imageio` —
  *    PNG/JPEG/BMP/GIF), headless-safe;
  *  - audio metadata: a RIFF/WAVE chunk parse (PCM duration, sample rate,
  *    channels);
  *  - video: an ISO-BMFF (MP4) walk — container duration via moov/mvhd,
  *    frame extraction via the full sample-table walk (stsd/stts/stsc/
  *    stsz/stco) with ImageIO decode of JPEG-sample (MJPEG) tracks;
  *  - learned features ([[extractFeatures]]): a seeded random-projection
  *    featurizer (Johnson–Lindenstrauss sign projection) over DECODED
  *    pixels — deterministic, distance-preserving in expectation; a
  *    deployment with a real embedding network swaps [[pixelFeature]] for
  *    the network call, keeping the identical batch plumbing.
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

  /** Downsample grid side (G×G cells × 3 channels = input dim 192). */
  val featureGrid: Int = 8
  /** Output feature dimensionality. */
  val featureDim: Int = 16
  /** Seed of the deterministic projection matrix. */
  val featureSeed: Long = 0x67726166744a4cL // "graftJL"

  /** splitmix64 finalizer — the public-domain mix from Steele et al.'s
    * "Fast Splittable Pseudorandom Number Generators" (the JDK's own
    * SplittableRandom uses it); here it derives the fixed ±1 projection
    * matrix entries from (seed, i, j), so the matrix is never materialized
    * or shipped — every executor recomputes any entry in a few ALU ops. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pure featurizer kernel over a decoded pixel raster (packed 0xRRGGBB
    * ints, row-major, `w`×`h`): box-average the raster onto a fixed
    * [[featureGrid]]² grid per channel (scale-invariant, deterministic
    * integer arithmetic), normalize to [0,1], then project to
    * [[featureDim]] floats with a seeded ±1 Johnson–Lindenstrauss sign
    * matrix scaled by 1/√d — the Achlioptas database-friendly projection:
    * pairwise distances are preserved in expectation, and the whole
    * pipeline is bit-deterministic across machines (fixed-order double
    * summation, no RNG state). Exposed as a pure function so an oracle can
    * recompute expected features from construction-parameter pixels. */
  def pixelFeature(rgb: Array[Int], w: Int, h: Int): Array[Float] = {
    require(rgb.length == w * h && w > 0 && h > 0, "raster shape mismatch")
    val g = featureGrid
    val v = new Array[Double](3 * g * g)
    var cy = 0
    while (cy < g) {
      val y0 = cy * h / g
      val y1 = math.max(y0 + 1, (cy + 1) * h / g)
      var cx = 0
      while (cx < g) {
        val x0 = cx * w / g
        val x1 = math.max(x0 + 1, (cx + 1) * w / g)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = rgb(y * w + x)
            sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = math.max(1L,
          (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0))
        val cell = cy * g + cx
        v(cell) = sr.toDouble / (255.0 * n)
        v(g * g + cell) = sg.toDouble / (255.0 * n)
        v(2 * g * g + cell) = sb.toDouble / (255.0 * n)
        cx += 1
      }
      cy += 1
    }
    val d = v.length
    val scale = 1.0 / math.sqrt(d.toDouble)
    Array.tabulate(featureDim) { i =>
      var acc = 0.0
      var j = 0
      while (j < d) {
        val sign = if (mix64(featureSeed ^ (i.toLong << 32) ^ j) < 0) -1.0 else 1.0
        acc += sign * v(j)
        j += 1
      }
      (acc * scale).toFloat
    }
  }

  /** Raster-size ceiling for the featurizer's decode (pixels). Above it,
    * the codec reads every k-th pixel instead of materializing the full
    * raster — a 50-MP JPEG would otherwise cost ~200 MB of decoded ints
    * PER ROW PER EXECUTOR THREAD, sizing executor memory to the largest
    * image in the corpus instead of this constant. 2²¹ pixels ≈ 8 MB. */
  val maxDecodePixels: Int = 1 << 21

  /** REAL learned-feature extraction: decode the payload's pixels (JDK
    * codecs — the same path [[decodeMedia]] proves) and run
    * [[pixelFeature]] over the raster. Oversized images decode SUBSAMPLED
    * (every k-th pixel via `ImageReadParam`, k chosen so the raster fits
    * [[maxDecodePixels]]) — deterministic, and since the kernel box-
    * averages onto a fixed 8×8 grid anyway, the feature of a subsampled
    * raster tracks the full-raster feature (bit-exact under integer pixel
    * replication, approximate on natural images). Rows whose payload does
    * not decode as an image (audio, video containers, corrupt bytes) keep
    * their row with a NULL feature — the never-drop contract decodeMedia
    * set. A deployment with an embedding network swaps the kernel call;
    * the batch shape (one partition iterator, per-partition model init
    * amortized across the batch) is exactly what that call needs. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featureSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // per-partition (≈ per-batch) init point — a real network loads here
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val feat = decodeImageBounded(bytes, maxDecodePixels).map { img =>
            val w = img.getWidth; val h = img.getHeight
            val rgb = img.getRGB(0, 0, w, h, null, 0, w)
            // getRGB yields ARGB; pixelFeature masks channels itself
            pixelFeature(rgb, w, h).toSeq
          }.orNull
          Row(id, bytes.length.toLong, feat)
        }
      }(outEnc)
  }

  /** Decode with the raster bounded at `maxPixels`: probe the header for
    * dimensions first (cheap), then read with source subsampling k =
    * ⌈√(w·h / maxPixels)⌉ so the materialized raster never exceeds the
    * bound regardless of the encoded image's size. k = 1 (the common
    * case) is a plain full decode. */
  private[operators] def decodeImageBounded(
      bytes: Array[Byte], maxPixels: Int): Option[java.awt.image.BufferedImage] =
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
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0) None
            else {
              val k = math.max(1L,
                math.ceil(math.sqrt(w * h / maxPixels.toDouble)).toLong).toInt
              val param = reader.getDefaultReadParam
              param.setSourceSubsampling(k, k, 0, 0)
              Option(reader.read(0, param))
            }
          } finally reader.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case _: Exception => None }

  /** End-to-end: payloads → features, joined back to metadata. */
  def withFeatures(media: DataFrame): DataFrame =
    media.join(extractFeatures(media).drop("n_bytes"), Seq("media_id"))

  /** 64-bit average-hash (aHash) perceptual fingerprint over a decoded
    * raster — the classic public perceptual-hash family's simplest
    * member: integer luma per pixel (the BT.601 299/587/114 weights,
    * ×1000-scaled so no per-pixel division happens), box-summed onto the
    * fixed 8×8 grid ([[pixelFeature]]'s cell walk), each cell reduced to
    * its integer mean, and bit (cy·8 + cx) set iff the cell mean exceeds
    * the integer mean of the 64 cell means. Pure integer arithmetic end
    * to end — bit-reproducible across JVMs, so ORACLES recompute it from
    * construction-formula rasters — and scale-invariant by the same
    * argument as the feature grid: a resized copy box-averages to nearly
    * identical cell means, which is the property that catches re-encoded
    * and thumbnailed duplicates embedding-cosine dedup misses. */
  def aHash64(rgb: Array[Int], w: Int, h: Int): Long = {
    require(rgb.length == w * h && w > 0 && h > 0, "raster shape mismatch")
    val g = featureGrid
    val cellMean = new Array[Long](g * g)
    var cy = 0
    while (cy < g) {
      val y0 = cy * h / g
      val y1 = math.max(y0 + 1, (cy + 1) * h / g)
      var cx = 0
      while (cx < g) {
        val x0 = cx * w / g
        val x1 = math.max(x0 + 1, (cx + 1) * w / g)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = rgb(y * w + x)
            sum += 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
              114L * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val n = math.max(1L,
          (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0))
        cellMean(cy * g + cx) = sum / n
        cx += 1
      }
      cy += 1
    }
    var total = 0L
    var i = 0
    while (i < cellMean.length) { total += cellMean(i); i += 1 }
    val mean = total / cellMean.length
    var hash = 0L
    i = 0
    while (i < cellMean.length) {
      if (cellMean(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** 64-bit DCT perceptual hash (the classic public pHash recipe) — the
    * robustness upgrade over [[aHash64]] for global TONE edits: luma
    * box-averaged onto a 32×32 grid (same cell walk, finer grid), 2D
    * DCT-II of the grid, the top-left 8×8 coefficient block kept (the
    * image's lowest spatial frequencies), the DC coefficient DROPPED,
    * and bit (v·8+u) set iff coefficient (u,v) exceeds the median of the
    * 63 AC coefficients (bit 0, the DC slot, is always clear).
    *
    * Why it survives what aHash doesn't: an affine luma edit
    * l′ = a·l + b (brightness/contrast, a > 0) sends the +b entirely to
    * the discarded DC and scales every AC coefficient — and their
    * median — by the same positive a, so every comparison lands
    * identically. Gamma and clipped edits are approximately affine
    * around the luma bulk, and their non-affine residue mostly lands
    * OUTSIDE the low-frequency window; aHash's cell-vs-global-mean bits
    * have no such separation (a gamma edit moves high-variance cells'
    * means relative to low-variance cells' — Jensen — flipping every
    * bit whose cell hugs the global mean; MultimodalSpec pins a
    * 16-bit aHash miss the DCT hash survives at hamming 2). StrictMath
    * throughout, so the hash is bit-reproducible across JVMs and
    * platforms and oracles can recompute it from construction rasters. */
  def pHashDct64(rgb: Array[Int], w: Int, h: Int): Long = {
    require(rgb.length == w * h && w > 0 && h > 0, "raster shape mismatch")
    val g = 32
    val cell = new Array[Double](g * g)
    var cy = 0
    while (cy < g) {
      val y0 = cy * h / g
      val y1 = math.max(y0 + 1, (cy + 1) * h / g)
      var cx = 0
      while (cx < g) {
        val x0 = cx * w / g
        val x1 = math.max(x0 + 1, (cx + 1) * w / g)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val p = rgb(y * w + x)
            sum += 299L * ((p >>> 16) & 0xff) + 587L * ((p >>> 8) & 0xff) +
              114L * (p & 0xff)
            x += 1
          }
          y += 1
        }
        val n = math.max(1L,
          (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0))
        cell(cy * g + cx) = sum.toDouble / n
        cx += 1
      }
      cy += 1
    }
    // separable DCT-II, top-left 8×8 block only: rows first (32×8 dot
    // products of length 32), then columns (8×8 of length 32) — ~10k
    // multiplies per image, negligible next to the decode
    val cosT = Array.tabulate(8, g)((u, x) =>
      StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * g)))
    val rowT = Array.ofDim[Double](g, 8)
    var y = 0
    while (y < g) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < g) { s += cell(y * g + x) * cosT(u)(x); x += 1 }
        rowT(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < g) { s += rowT(yy)(u) * cosT(v)(yy); yy += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // lower median of the 63 AC coefficients
    var hash = 0L
    var i = 1
    while (i < 64) {
      if (coef(i) > med) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** The image perceptual-hash kernel registry: `"ahash"` →
    * [[aHash64]] (cheapest, catches re-encodes and resizes), `"dct"` →
    * [[pHashDct64]] (additionally survives brightness/contrast/gamma
    * edits). One resolution point so every caller — DataFrame ops, the
    * SQL CALL verb's `kernel =>` param, streaming ingest — names
    * kernels identically. */
  def hashKernel(kernel: String): (Array[Int], Int, Int) => Long =
    kernel match {
      case "ahash" => aHash64
      case "dct"   => pHashDct64
      case other => throw new IllegalArgumentException(
        s"unknown perceptual-hash kernel '$other' (ahash | dct)")
    }

  val phashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType)))

  /** payload → perceptual fingerprint ([[hashKernel]]: [[aHash64]] by
    * default, [[pHashDct64]] via `kernel = "dct"`), map-side (same
    * bounded decode as [[extractFeatures]]); rows whose payload does not
    * decode as an image keep their row with a NULL hash — the never-drop
    * contract. */
  def perceptualHash(media: DataFrame, kernel: String = "ahash"): DataFrame = {
    hashKernel(kernel) // validate driver-side (fail fast on a typo)
    val kernelName = kernel // capture the NAME: a resolved method value
    // would drag closure-serialization questions into every task
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(phashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        val k = hashKernel(kernelName)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val h = decodeImageBounded(bytes, maxDecodePixels).map { img =>
            val w = img.getWidth; val hh = img.getHeight
            Long.box(k(img.getRGB(0, 0, w, hh, null, 0, w), w, hh))
          }.orNull
          Row(id, h)
        }
      }(outEnc)
  }

  /** The shared banded 64-bit-hash pair core: both sides are
    * (media_id, `hashCol`) tables; each explodes to `b` contiguous
    * (band_no, bits) slices, candidates come from the band equi-join,
    * exact bit_count(XOR) ≤ maxHamming filters. `fullCorpus = true`
    * joins one table against itself (id < id halves the pairs);
    * `false` is the INCREMENTAL shape — left = the new batch only,
    * right = existing ∪ new, id ≠ id with least/greatest canonicalizing
    * — so per-batch runs unioned reproduce exactly the full-corpus pair
    * set without ever re-pairing existing × existing. */
  private def bandedHashPairs(newSide: DataFrame, allSide: DataFrame,
      hashCol: String, b: Int, maxHamming: Int,
      fullCorpus: Boolean): DataFrame = {
    val left = bandExplode(newSide, hashCol, b, Seq("media_id")).alias("a")
    val right = bandExplode(allSide, hashCol, b, Seq("media_id")).alias("c")
    val idCond =
      if (fullCorpus) col("a.media_id") < col("c.media_id")
      else col("a.media_id") =!= col("c.media_id")
    left.join(right,
        col("a.band_no") === col("c.band_no") &&
          col("a.bits") === col("c.bits") && idCond)
      .select(least(col("a.media_id"), col("c.media_id")).as("id_a"),
        greatest(col("a.media_id"), col("c.media_id")).as("id_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"c.$hashCol")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The shared band-slicing step: `hashCol`'s 64 bits split into `b`
    * contiguous (band_no, bits) slices, one output row per (input row,
    * band). `carry` names the columns to keep alongside — (media_id)
    * for whole-media hashes, (media_id, frame_no) for per-frame video
    * hashes — so every banded near-dup path ([[bandedHashPairs]],
    * [[videoNearDups]]) shares ONE slice/mask implementation and a fix
    * here reaches all of them. */
  private def bandExplode(df: DataFrame, hashCol: String, b: Int,
      carry: Seq[String]): DataFrame = {
    val slices = (0 until b).map { i =>
      val lo = i * 64 / b
      val width = (i + 1) * 64 / b - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(i).as("band_no"),
        shiftrightunsigned(col(hashCol), lo).bitwiseAND(lit(mask)).as("bits"))
    }
    val kept = carry.map(col) :+ col(hashCol)
    df.select(kept :+ explode(array(slices: _*)).as("bd"): _*)
      .select(kept :+ col("bd.band_no").as("band_no")
        :+ col("bd.bits").as("bits"): _*)
  }

  private def bandCount(maxHamming: Int, bands: Int): Int = {
    val b = if (bands > 0) bands else maxHamming + 1
    require(b >= 1 && b <= 64, s"bands must be in [1, 64], got $b")
    require(maxHamming >= 0 && maxHamming < b,
      s"banding guarantee needs maxHamming < bands, got $maxHamming / $b")
    b
  }

  /** Banded perceptual near-dup over [[perceptualHash]] fingerprints: the
    * 64 bits split into `bands` contiguous slices, candidates = pairs
    * sharing at least one (band_no, slice) key, exact
    * bit_count(a XOR b) ≤ maxHamming filters. With the default
    * bands = maxHamming + 1 the pigeonhole guarantees a pair within the
    * threshold leaves SOME band untouched — the candidate set is a
    * superset of every true pair, so banding changes cost, never
    * answers. Cost: one decode pass (persisted), linear explode to
    * `bands` keys per image, equi-join quadratic only inside equal-band
    * buckets — the SimHash/q57 shape on pixels instead of text; never an
    * all-pairs join. Non-image rows carry NULL hashes and never pair.
    * The hash table persists through `scope` (both join sides + the
    * decode pass share one cache; release via [[CacheScope]]). */
  def phashNearDups(media: DataFrame, maxHamming: Int = 7,
      bands: Int = 0, scope: CacheScope = CacheScope.unmanaged,
      kernel: String = "ahash"): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val hashed = scope.persist(
      perceptualHash(media, kernel).filter(col("phash").isNotNull))
    bandedHashPairs(hashed, hashed, "phash", b, maxHamming, fullCorpus = true)
  }

  /** Incremental ingest: a NEW media batch near-dup'd against an
    * ACCUMULATED fingerprint table ([[perceptualHash]]'s (media_id,
    * phash) shape — typically a stored parquet/committed table the
    * caller appends each batch's hashes to) WITHOUT re-decoding one
    * existing image: only the batch decodes, the join is new ×
    * (existing ∪ new) on the band keys, and per-batch runs unioned
    * reproduce exactly the full-corpus pair set (existing × existing
    * pairs were already emitted by the batches that introduced them —
    * the [[graft.operators.Dedup.minhashCandidatesAgainst]] contract on
    * pixels). At 100 TB this is THE shape: a day's crawl pairs against
    * years of corpus for the cost of hashing the day. */
  def phashNearDupsAgainst(newMedia: DataFrame, existingHashes: DataFrame,
      maxHamming: Int = 7, bands: Int = 0,
      scope: CacheScope = CacheScope.unmanaged,
      kernel: String = "ahash"): DataFrame = {
    // validation happens in phashPairsAgainstHashes (same bandCount call);
    // the caller's store must of course have been hashed with the SAME
    // kernel — the hash table carries no kernel tag, by the same
    // convention as maxHamming/bands
    val newHashed = scope.persist(
      perceptualHash(newMedia, kernel).filter(col("phash").isNotNull))
    phashPairsAgainstHashes(newHashed, existingHashes, maxHamming, bands)
  }

  /** [[phashNearDups]] over an ALREADY-COMPUTED (media_id, phash)
    * table — the store-centric entry: pair a stored fingerprint corpus
    * without touching one payload byte (re-thresholding a 100 TB corpus
    * costs the fingerprint table's scan, not the decode). */
  def phashNearDupsFromHashes(hashes: DataFrame, maxHamming: Int = 7,
      bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val h = hashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull)
    bandedHashPairs(h, h, "phash", b, maxHamming, fullCorpus = true)
  }

  /** The incremental join at the HASH level (both sides pre-computed):
    * new batch hashes × (existing ∪ new) — [[phashNearDupsAgainst]]
    * without the decode, for callers that already persisted the batch's
    * fingerprints. */
  def phashPairsAgainstHashes(newHashes: DataFrame,
      existingHashes: DataFrame, maxHamming: Int = 7,
      bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val nh = newHashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull)
    val all = existingHashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull).unionByName(nh)
    bandedHashPairs(nh, all, "phash", b, maxHamming, fullCorpus = false)
  }

  /** The 8 dihedral orientation variants of an [[aHash64]] — rotations
    * and mirrors as PURE BIT PERMUTATIONS of the hash, no re-decode:
    * an aHash bit is "cell mean > global mean", rotating or mirroring a
    * (square) image permutes its 8×8 grid cells and leaves the global
    * mean unchanged, so hash(transform(image)) == permute(hash(image))
    * — EXACT when both sides are multiples of 8 (the proportional 8-cell
    * partition is then reversal-symmetric); for other sizes the cell
    * boundaries shift by at most a pixel under reversal (a 100-px side
    * partitions 12,13,12,… whose reverse is not itself), so a rotated
    * copy lands a few bits off orbit hamming 0 — absorbed by the
    * caller's hamming budget, not exact. The returned orbit is closed
    * under the group, so two
    * images that are rotations/mirrors of each other have EQUAL orbits
    * — which is what makes [[phashNearDupsOriented]]'s one-sided
    * explode complete. aHash only: DCT coefficients pick up sign flips
    * under mirroring, not a bit permutation. */
  def hashOrientations(h: Long): Array[Long] = {
    val out = new Array[Long](8)
    var o = 0
    while (o < 8) {
      var v = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val (cx0, cy0) = (o: @unchecked) match {
            case 0 => (cx, cy)         // identity
            case 1 => (cy, 7 - cx)     // rot 90
            case 2 => (7 - cx, 7 - cy) // rot 180
            case 3 => (7 - cy, cx)     // rot 270
            case 4 => (7 - cx, cy)     // mirror x
            case 5 => (cx, 7 - cy)     // flip y
            case 6 => (cy, cx)         // transpose
            case 7 => (7 - cy, 7 - cx) // anti-transpose
          }
          v |= ((h >>> (cy0 * 8 + cx0)) & 1L) << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      out(o) = v
      o += 1
    }
    out
  }

  private val orientedHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ohash", LongType, nullable = false)))

  /** (media_id, phash) → one row per DISTINCT orbit element (≤ 8; a
    * symmetric image's orbit collapses). Map-side, n-row input — the
    * oriented join's only extra cost is this ≤8× explode on ONE side. */
  private def orientedHashes(hashes: DataFrame): DataFrame = {
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(orientedHashSchema)
    hashes.select(col("media_id"), col("phash"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          hashOrientations(r.getLong(1)).distinct
            .map(o => Row(id, java.lang.Long.valueOf(o)))
        }
      }(outEnc)
  }

  /** The oriented banded core: LEFT = the ≤8-variant orbit explode of
    * `newSide`, RIGHT = `allSide`'s plain hashes, banded equi-join,
    * then MIN over matched orientations of the exact bit distance —
    * i.e. the pair's ORIENTED hamming, min_d bit_count(d(h_a) XOR h_b).
    * Exploding one side suffices: the dihedral group is closed under
    * inversion, so min_d ham(d(h_a), h_b) = min_d ham(h_a, d(h_b)), and
    * the pigeonhole guarantee applies to the achieving orientation's
    * banded row. `fullCorpus`/incremental semantics mirror
    * [[bandedHashPairs]]. */
  private def orientedBandedPairs(newSide: DataFrame, allSide: DataFrame,
      b: Int, maxHamming: Int, fullCorpus: Boolean): DataFrame = {
    val left = bandExplode(orientedHashes(newSide), "ohash", b,
      Seq("media_id")).alias("a")
    val right = bandExplode(allSide, "phash", b, Seq("media_id")).alias("c")
    val idCond =
      if (fullCorpus) col("a.media_id") < col("c.media_id")
      else col("a.media_id") =!= col("c.media_id")
    left.join(right,
        col("a.band_no") === col("c.band_no") &&
          col("a.bits") === col("c.bits") && idCond)
      .groupBy(least(col("a.media_id"), col("c.media_id")).as("id_a"),
        greatest(col("a.media_id"), col("c.media_id")).as("id_b"))
      .agg(min(bit_count(col("a.ohash").bitwiseXOR(col("c.phash"))))
        .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** ROTATION/MIRROR-robust image near-dup: pairs whose ORIENTED
    * hamming — min over the 8 dihedral orientations of one side — is
    * within `maxHamming`. The rotated/mirrored re-upload is the image
    * edit both aHash and pHashDct miss outright (every grid cell moves;
    * q199 pins a rot-90 copy 30 plain bits away pairing at 0); the
    * orbit is a pure bit permutation of the already-computed hash, so
    * the cost over [[phashNearDups]] is a ≤8× explode of the n-row
    * HASH table on one join side — payloads decode once, never again.
    * aHash kernel only (see [[hashOrientations]]). */
  def phashNearDupsOriented(media: DataFrame, maxHamming: Int = 7,
      bands: Int = 0, scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val hashed = scope.persist(
      perceptualHash(media).filter(col("phash").isNotNull))
    orientedBandedPairs(hashed, hashed, b, maxHamming, fullCorpus = true)
  }

  /** [[phashNearDupsOriented]] over an already-computed (media_id,
    * phash) table — the store-centric entry (re-orienting a stored
    * corpus costs the fingerprint scan, not one decode). */
  def phashNearDupsOrientedFromHashes(hashes: DataFrame,
      maxHamming: Int = 7, bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val h = hashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull)
    orientedBandedPairs(h, h, b, maxHamming, fullCorpus = true)
  }

  /** The incremental oriented shape ([[phashPairsAgainstHashes]]'s
    * contract): the new batch's orbit explode × (existing ∪ new) plain
    * hashes — per-batch unions reproduce the full-corpus oriented pair
    * set, the stored side never re-decodes OR re-orients. */
  def phashPairsOrientedAgainstHashes(newHashes: DataFrame,
      existingHashes: DataFrame, maxHamming: Int = 7,
      bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val nh = newHashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull)
    val all = existingHashes.select(col("media_id"), col("phash"))
      .filter(col("phash").isNotNull).unionByName(nh)
    orientedBandedPairs(nh, all, b, maxHamming, fullCorpus = false)
  }

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
    * walk (byte arithmetic only — per-frame extraction is the separate
    * [[sampleFrames]] pass). The media_type column routes each payload to
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
    media.select(metadataSchema.fieldNames.toIndexedSeq.map(col): _*)
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
    final case class Meta(sampleRate: Int, channels: Int, durationMs: Long,
        bitsPerSample: Int, dataOff: Int, dataLen: Int)

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
      var byteRate = 0; var sampleRate = 0; var channels = 0; var bits = 0
      var dataSize = -1L; var dataOff = -1L
      while (off + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
        val id = tag(off.toInt)
        val size = le32(off.toInt + 4).toLong & 0xffffffffL
        if (id == "fmt " && off + 24 <= b.length) {
          channels = le16(off.toInt + 10)
          sampleRate = le32(off.toInt + 12)
          byteRate = le32(off.toInt + 16)
          bits = le16(off.toInt + 22)
        } else if (id == "data") {
          // clamp to the bytes actually present: a truncated or hostile
          // declared size must not inflate the duration (wrong metadata is
          // worse than honest metadata about a short payload)
          dataSize = math.min(size, b.length - (off + 8))
          dataOff = off + 8
        }
        off += 8 + size + (size & 1) // chunks are word-aligned; step >= 8
      }
      if (byteRate > 0 && dataSize >= 0)
        Some(Meta(sampleRate, channels, dataSize * 1000 / byteRate,
          bits, dataOff.toInt, dataSize.toInt))
      else None
    }
  }

  /** Minimal ISO-BMFF (MP4) container probe: walks the box tree with pure
    * byte arithmetic — the same class as [[Wav]]: no codec, runs on
    * arbitrary bytes under decodeMedia's never-throw contract, so box sizes
    * are treated as unsigned/hostile (a corrupt size must neither loop,
    * overflow, nor index out of bounds). Handles 32- and 64-bit box sizes.
    *
    * Two probes: [[durationMs]] (moov/mvhd movie duration, versions 0 and
    * 1) and [[videoSamples]] (the full sample-table walk — moov/trak/mdia/
    * minf/stbl with stsd/stts/stsc/stsz/stco/co64, public ISO/IEC 14496-12
    * layout — locating every video sample's byte range and presentation
    * time). */
  private[operators] object Mp4 {

    /** Bounded box-walk cursor over untrusted bytes. Every declared size is
      * validated against the enclosing extent before use; a lying size
      * field terminates the walk instead of looping or escaping. */
    private final class Walk(b: Array[Byte]) {
      def be32(o: Long): Long =
        ((b(o.toInt) & 0xffL) << 24) | ((b(o.toInt + 1) & 0xffL) << 16) |
          ((b(o.toInt + 2) & 0xffL) << 8) | (b(o.toInt + 3) & 0xffL)
      def be64(o: Long): Long =
        (be32(o) << 32) | be32(o + 4)
      def tag(o: Long) = new String(b, o.toInt, 4, "US-ASCII")
      // find every box `name` inside [from, until); (payloadOff, payloadEnd)
      def findBoxes(name: String, from: Long, until: Long): List[(Long, Long)] = {
        val out = List.newBuilder[(Long, Long)]
        var off = from
        var ok = true
        while (ok && off + 8 <= until) {
          val size32 = be32(off)
          val (size, hdr) =
            if (size32 == 1L && off + 16 <= until) (be64(off + 8), 16L)
            else if (size32 == 0L) (until - off, 8L)   // box extends to end
            else (size32, 8L)
          if (size < hdr || off + size > until || off + size < off) ok = false
          else {
            if (tag(off + 4) == name) out += ((off + hdr, off + size))
            off += size
          }
        }
        out.result()
      }
      def findBox(name: String, from: Long, until: Long): Option[(Long, Long)] =
        findBoxes(name, from, until).headOption
    }

    def durationMs(b: Array[Byte]): Option[Long] = {
      val w = new Walk(b)
      import w._
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

    /** One located video sample: its index, byte range within the payload,
      * and presentation time derived from the stts deltas at the media
      * (mdhd) timescale. */
    final case class Sample(no: Int, offset: Int, size: Int, ptsMs: Long)

    /** Locate every sample of the FIRST video (`hdlr` = `vide`) track:
      * stsd names the sample format, stsz the per-sample sizes, stco/co64
      * the chunk offsets, stsc the sample→chunk mapping, stts the decode
      * deltas. All table entry counts are clamped to the bytes actually
      * present, and any sample whose declared range escapes the payload is
      * dropped (a truncated mdat yields the frames that ARE there, never an
      * exception). Returns empty for anything that is not a walkable MP4. */
    def videoSamples(b: Array[Byte]): IndexedSeq[Sample] =
      try {
        val w = new Walk(b)
        import w._
        val videoStbl = for {
          (moovOff, moovEnd) <- findBox("moov", 0L, b.length.toLong).toList
          (trakOff, trakEnd) <- findBoxes("trak", moovOff, moovEnd)
          (mdiaOff, mdiaEnd) <- findBox("mdia", trakOff, trakEnd).toList
          if findBox("hdlr", mdiaOff, mdiaEnd).exists { case (h, hEnd) =>
            hEnd - h >= 12 && tag(h + 8) == "vide" }
          timescale <- findBox("mdhd", mdiaOff, mdiaEnd).toList.flatMap {
            case (p, pEnd) =>
              val v = if (pEnd - p >= 1) b(p.toInt) & 0xff else -1
              // v0: version+flags(4) ctime(4) mtime(4) → timescale at 12;
              // v1 widens ctime/mtime to 8 bytes → timescale at 20 (the
              // same layout mvhd v1 uses in durationMs; duration follows
              // the timescale, it does not precede it)
              if (v == 0 && pEnd - p >= 20) Some(be32(p + 12))
              else if (v == 1 && pEnd - p >= 32) Some(be32(p + 20))
              else None
          }.filter(_ > 0)
          (minfOff, minfEnd) <- findBox("minf", mdiaOff, mdiaEnd).toList
          stbl <- findBox("stbl", minfOff, minfEnd).toList
        } yield (stbl, timescale)
        videoStbl.headOption.map { case ((sOff, sEnd), timescale) =>
          // per-sample sizes (stsz; fixed-size form when sample_size != 0)
          val sizes: IndexedSeq[Long] =
            findBox("stsz", sOff, sEnd).map { case (p, pEnd) =>
              if (pEnd - p < 12) Vector.empty[Long]
              else {
                val fixed = be32(p + 4)
                val declared = be32(p + 8)
                if (fixed != 0L) {
                  // fixed-size samples carry no table; cap the count at the
                  // number of samples that can PHYSICALLY fit in the payload
                  // AND represent the run in constant space — a hostile
                  // header (sample_size=1, count=2³¹) must not materialize
                  // a hundreds-of-MB vector of identical boxed values
                  val n = math.min(declared, b.length / fixed).toInt
                  new IndexedSeq[Long] {
                    def length: Int = n
                    def apply(i: Int): Long = fixed
                  }
                } else {
                  val n = math.min(declared, (pEnd - p - 12) / 4).toInt
                  (0 until n).map(i => be32(p + 12 + 4L * i))
                }
              }
            }.getOrElse(Vector.empty)
          // chunk offsets (stco 32-bit or co64 64-bit)
          val chunkOffsets: IndexedSeq[Long] =
            findBox("stco", sOff, sEnd).map { case (p, pEnd) =>
              val n = if (pEnd - p < 8) 0
                else math.min(be32(p + 4), (pEnd - p - 8) / 4).toInt
              (0 until n).map(i => be32(p + 8 + 4L * i))
            }.orElse(findBox("co64", sOff, sEnd).map { case (p, pEnd) =>
              val n = if (pEnd - p < 8) 0
                else math.min(be32(p + 4), (pEnd - p - 8) / 8).toInt
              (0 until n).map(i => be64(p + 8 + 8L * i))
            }).getOrElse(Vector.empty)
          // sample→chunk runs (stsc): entry e covers chunks
          // [first_chunk_e, first_chunk_{e+1}) at samples_per_chunk_e each
          val stscRuns: IndexedSeq[(Long, Long)] =
            findBox("stsc", sOff, sEnd).map { case (p, pEnd) =>
              val n = if (pEnd - p < 8) 0
                else math.min(be32(p + 4), (pEnd - p - 8) / 12).toInt
              (0 until n).map(i =>
                (be32(p + 8 + 12L * i), be32(p + 12 + 12L * i)))
            }.getOrElse(Vector.empty)
          // decode deltas (stts), expanded lazily against the sample count
          val sttsRuns: IndexedSeq[(Long, Long)] =
            findBox("stts", sOff, sEnd).map { case (p, pEnd) =>
              val n = if (pEnd - p < 8) 0
                else math.min(be32(p + 4), (pEnd - p - 8) / 8).toInt
              (0 until n).map(i =>
                (be32(p + 8 + 8L * i), be32(p + 12 + 8L * i)))
            }.getOrElse(Vector.empty)

          val out = Vector.newBuilder[Sample]
          var sample = 0
          var run = 0
          var cumTicks = 0L
          var sttsIdx = 0
          var sttsLeft = if (sttsRuns.nonEmpty) sttsRuns.head._1 else 0L
          var chunk = 0
          while (chunk < chunkOffsets.length && sample < sizes.length) {
            // advance the stsc run whose first_chunk (1-based) covers chunk
            while (run + 1 < stscRuns.length &&
                stscRuns(run + 1)._1 <= chunk + 1) run += 1
            val perChunk =
              if (stscRuns.isEmpty) sizes.length.toLong else stscRuns(run)._2
            var off = chunkOffsets(chunk)
            var j = 0L
            while (j < perChunk && sample < sizes.length) {
              val size = sizes(sample)
              val ptsMs =
                if (cumTicks >= 0 && cumTicks <= Long.MaxValue / 1000L)
                  cumTicks * 1000L / timescale
                else 0L
              // subtraction form, not `off + size <= length`: a hostile
              // co64 offset near Long.MaxValue would wrap off+size negative
              // and pass the additive check with a garbage Int offset
              if (size > 0 && off >= 0 && size <= b.length &&
                  off <= b.length - size)
                out += Sample(sample, off.toInt, size.toInt, ptsMs)
              // pts advances by this sample's stts delta
              if (sttsLeft > 0) { cumTicks += sttsRuns(sttsIdx)._2; sttsLeft -= 1 }
              if (sttsLeft == 0 && sttsIdx + 1 < sttsRuns.length) {
                sttsIdx += 1; sttsLeft = sttsRuns(sttsIdx)._1
              }
              off += size
              sample += 1
              j += 1
            }
            chunk += 1
          }
          out.result()
        }.getOrElse(Vector.empty)
      } catch { case _: Exception => Vector.empty }
  }

  /** Schema of [[sampleFrames]]: one row per retained video sample. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("pts_ms", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frame", BinaryType)))

  /** REAL video frame extraction: walks the payload's ISO-BMFF sample
    * tables ([[Mp4.videoSamples]]) to locate every sample of the first
    * video track, keeps every `everyNth`-th sample (the keyframe-sampler
    * stride), slices its byte range out of the payload, and probes its
    * dimensions with the same header-only ImageIO path as [[decodeMedia]]
    * — a full bytes→frames→dimensions decode for JPEG-sample (MJPEG)
    * tracks, the one video codec the JDK itself ships. Samples in a codec
    * ImageIO has no reader for still yield their bytes + presentation time
    * (the routing a downstream external decoder needs) with NULL
    * dimensions. Payloads that are not walkable MP4 yield zero rows.
    *
    * Scale shape: map-side flatMap — payload bytes never shuffle; only the
    * (id, frame) projection leaves the scan. */
  def sampleFrames(media: DataFrame, everyNth: Int = 4): DataFrame = {
    require(everyNth >= 1, s"everyNth ($everyNth) must be >= 1")
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          // iterator, not a mapped collection: the retained frames of one
          // payload stream through the encoder one at a time instead of
          // materializing every sliced frame copy simultaneously
          Mp4.videoSamples(payload).iterator
            .filter(_.no % everyNth == 0)
            .map { s =>
              val bytes =
                java.util.Arrays.copyOfRange(payload, s.offset, s.offset + s.size)
              val dims = imageDims(bytes)
              Row(r.getLong(0), Integer.valueOf(s.no),
                java.lang.Long.valueOf(s.ptsMs),
                dims.map(d => Integer.valueOf(d._1)).orNull,
                dims.map(d => Integer.valueOf(d._2)).orNull,
                bytes)
            }
        }
      }(outEnc)
  }

  private val frameHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("fhash", LongType, nullable = false)))

  /** Video near-dup via per-frame perceptual hashes: sample every Nth
    * frame ([[sampleFrames]]), [[aHash64]] each decoded frame, band the
    * FRAME hashes exactly like [[phashNearDups]] (pigeonhole superset,
    * exact bit_count filter), and pair VIDEOS sharing at least
    * `minSharedFrames` distinct near-matching frame pairs — the
    * re-encoded/re-muxed duplicate-clip detector (a clip re-containered
    * or re-stamped keeps its frames' pixels, which is all the hash
    * sees); `kernel = "dct"` swaps in [[pHashDct64]] per frame, so a
    * re-encode that ALSO tone-shifts (brightness/contrast/gamma) still
    * pairs — q198's case. Undecodable frames and non-video rows
    * contribute nothing.
    * Cost: linear decode + the banded equi-join — frame hashes never
    * all-pairs, video pairs aggregated from matched frames only. The
    * frame-hash table persists through `scope`. */
  def videoNearDups(media: DataFrame, everyNth: Int = 4, maxHamming: Int = 7,
      minSharedFrames: Int = 2, bands: Int = 0,
      scope: CacheScope = CacheScope.unmanaged,
      kernel: String = "ahash"): DataFrame =
    videoNearDupsFromHashes(
      scope.persist(videoFrameHashes(media, everyNth, kernel)),
      maxHamming, minSharedFrames, bands)

  /** The decode half of [[videoNearDups]]: every Nth frame of every
    * video, decoded map-side to a (media_id, frame_no, fhash) table —
    * the video fingerprint STORE shape (persist it, then re-threshold
    * or pair incrementally without touching one payload byte). */
  def videoFrameHashes(media: DataFrame, everyNth: Int = 4,
      kernel: String = "ahash"): DataFrame = {
    hashKernel(kernel) // fail fast driver-side
    val kernelName = kernel
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameHashSchema)
    sampleFrames(media, everyNth)
      .select(col("media_id"), col("frame_no"), col("frame"))
      .mapPartitions { rows =>
        val k = hashKernel(kernelName)
        rows.flatMap { r =>
          val bytes =
            if (r.isNullAt(2)) Array.emptyByteArray
            else r.getAs[Array[Byte]](2)
          decodeImageBounded(bytes, maxDecodePixels).map { img =>
            val w = img.getWidth; val h = img.getHeight
            Row(r.getLong(0), r.getInt(1),
              k(img.getRGB(0, 0, w, h, null, 0, w), w, h))
          }
        }
      }(outEnc)
  }

  /** The pair half of [[videoNearDups]], over an ALREADY-COMPUTED
    * (media_id, frame_no, fhash) table: the shared banded frame join,
    * aggregated to video pairs on >= `minSharedFrames` distinct matched
    * frame pairs. Re-thresholding a stored corpus costs the fingerprint
    * table's scan, not the decode. */
  def videoNearDupsFromHashes(frameHashes: DataFrame, maxHamming: Int = 7,
      minSharedFrames: Int = 2, bands: Int = 0): DataFrame = {
    val h = cleanFrameHashes(frameHashes)
    bandedFramePairs(h, h, maxHamming, minSharedFrames, bands,
      fullCorpus = true)
  }

  /** The incremental video shape ([[phashPairsAgainstHashes]] at frame
    * granularity): a new batch's frame hashes × (existing ∪ new),
    * aggregated to video pairs. A video pair is emitted by the batch
    * that introduces its LATER member (both sides' full frame sets are
    * in existing ∪ new by then), so per-batch runs unioned reproduce
    * the full-corpus pair set without re-decoding or re-pairing the
    * store. */
  def videoPairsAgainstHashes(newFrameHashes: DataFrame,
      existingFrameHashes: DataFrame, maxHamming: Int = 7,
      minSharedFrames: Int = 2, bands: Int = 0): DataFrame = {
    val nh = cleanFrameHashes(newFrameHashes)
    val all = cleanFrameHashes(existingFrameHashes).unionByName(nh)
    bandedFramePairs(nh, all, maxHamming, minSharedFrames, bands,
      fullCorpus = false)
  }

  private def cleanFrameHashes(df: DataFrame): DataFrame = df
    .select(col("media_id"), col("frame_no"), col("fhash"))
    .filter(col("fhash").isNotNull)

  /** [[bandedHashPairs]] at FRAME granularity, shared by the full-corpus
    * and incremental video paths: the §bandExplode banded equi-join on
    * frame hashes, aggregated to video pairs on >= `minSharedFrames`
    * DISTINCT matched frame pairs. `fullCorpus = true` halves the join
    * with id < id; `false` is the incremental shape (left = new batch
    * only, id ≠ id) — there frame numbers canonicalize by video-id
    * order before the distinct count, so a pair matched from both join
    * orientations counts its frame matches once. */
  private def bandedFramePairs(newSide: DataFrame, allSide: DataFrame,
      maxHamming: Int, minSharedFrames: Int, bands: Int,
      fullCorpus: Boolean): DataFrame = {
    val b = bandCount(maxHamming, bands)
    require(minSharedFrames >= 1,
      s"minSharedFrames ($minSharedFrames) must be >= 1")
    val carry = Seq("media_id", "frame_no")
    val left = bandExplode(newSide, "fhash", b, carry).alias("a")
    val right = bandExplode(allSide, "fhash", b, carry).alias("c")
    val idCond =
      if (fullCorpus) col("a.media_id") < col("c.media_id")
      else col("a.media_id") =!= col("c.media_id")
    val aFirst = col("a.media_id") < col("c.media_id")
    left.join(right,
        col("a.band_no") === col("c.band_no") &&
          col("a.bits") === col("c.bits") && idCond)
      .filter(bit_count(col("a.fhash").bitwiseXOR(col("c.fhash")))
        <= maxHamming)
      .groupBy(least(col("a.media_id"), col("c.media_id")).as("id_a"),
        greatest(col("a.media_id"), col("c.media_id")).as("id_b"))
      .agg(countDistinct(
          when(aFirst, col("a.frame_no")).otherwise(col("c.frame_no")),
          when(aFirst, col("c.frame_no")).otherwise(col("a.frame_no")))
        .as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
  }

  private val orientedFrameHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("ofhash", LongType, nullable = false)))

  /** (media_id, frame_no, fhash) → one row per distinct orbit element
    * of each frame hash — [[orientedHashes]] at frame granularity. */
  private def orientedFrameHashes(frameHashes: DataFrame): DataFrame = {
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(orientedFrameHashSchema)
    frameHashes.select(col("media_id"), col("frame_no"), col("fhash"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0); val f = r.getInt(1)
          hashOrientations(r.getLong(2)).distinct
            .map(o => Row(id, Integer.valueOf(f), java.lang.Long.valueOf(o)))
        }
      }(outEnc)
  }

  /** ROTATION/MIRROR-robust video near-dup: [[videoNearDups]] with each
    * FRAME pair matched at min-over-dihedral-orbit hamming — the
    * portrait/landscape-rotated clip re-upload, whose every frame moves
    * every grid cell past the plain join (q201 pins the miss). Orbit
    * explode on one side of the frame-hash table only (≤8× rows, no
    * re-decode — [[hashOrientations]]' argument); videos still pair on
    * >= `minSharedFrames` DISTINCT matched frame pairs. aHash frames
    * only. */
  def videoNearDupsOriented(media: DataFrame, everyNth: Int = 4,
      maxHamming: Int = 7, minSharedFrames: Int = 2, bands: Int = 0,
      scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    val h = scope.persist(
      cleanFrameHashes(videoFrameHashes(media, everyNth)))
    orientedFramePairs(h, h, maxHamming, minSharedFrames, bands,
      fullCorpus = true)
  }

  /** [[videoNearDupsOriented]] over an already-computed (media_id,
    * frame_no, fhash) table — the store-centric entry. */
  def videoNearDupsOrientedFromHashes(frameHashes: DataFrame,
      maxHamming: Int = 7, minSharedFrames: Int = 2,
      bands: Int = 0): DataFrame = {
    val h = cleanFrameHashes(frameHashes)
    orientedFramePairs(h, h, maxHamming, minSharedFrames, bands,
      fullCorpus = true)
  }

  /** The incremental oriented video shape: the new batch's frame-hash
    * orbit explode × (existing ∪ new) plain frame hashes — per-batch
    * unions reproduce the full-corpus oriented pair set; the store
    * never re-decodes or re-orients. */
  def videoPairsOrientedAgainstHashes(newFrameHashes: DataFrame,
      existingFrameHashes: DataFrame, maxHamming: Int = 7,
      minSharedFrames: Int = 2, bands: Int = 0): DataFrame = {
    val nh = cleanFrameHashes(newFrameHashes)
    val all = cleanFrameHashes(existingFrameHashes).unionByName(nh)
    orientedFramePairs(nh, all, maxHamming, minSharedFrames, bands,
      fullCorpus = false)
  }

  /** [[orientedBandedPairs]] at FRAME granularity: banded equi-join of
    * the oriented explode vs plain frame hashes, per-FRAME-PAIR
    * min-over-matched-orientations hamming (exact by the same
    * closure + pigeonhole argument), threshold filter, then the
    * [[bandedFramePairs]] distinct-matched-frame-pair count per video
    * pair. Frame numbers canonicalize by video-id order, so both join
    * orientations of the incremental shape count a matched frame pair
    * once. */
  private def orientedFramePairs(newSide: DataFrame, allSide: DataFrame,
      maxHamming: Int, minSharedFrames: Int, bands: Int,
      fullCorpus: Boolean): DataFrame = {
    val b = bandCount(maxHamming, bands)
    require(minSharedFrames >= 1,
      s"minSharedFrames ($minSharedFrames) must be >= 1")
    val left = bandExplode(orientedFrameHashes(newSide), "ofhash", b,
      Seq("media_id", "frame_no")).alias("a")
    val right = bandExplode(allSide, "fhash", b,
      Seq("media_id", "frame_no")).alias("c")
    val idCond =
      if (fullCorpus) col("a.media_id") < col("c.media_id")
      else col("a.media_id") =!= col("c.media_id")
    val aFirst = col("a.media_id") < col("c.media_id")
    left.join(right,
        col("a.band_no") === col("c.band_no") &&
          col("a.bits") === col("c.bits") && idCond)
      .groupBy(least(col("a.media_id"), col("c.media_id")).as("id_a"),
        greatest(col("a.media_id"), col("c.media_id")).as("id_b"),
        when(aFirst, col("a.frame_no")).otherwise(col("c.frame_no"))
          .as("fa"),
        when(aFirst, col("c.frame_no")).otherwise(col("a.frame_no"))
          .as("fb"))
      .agg(min(bit_count(col("a.ofhash").bitwiseXOR(col("c.fhash"))))
        .as("fham"))
      .filter(col("fham") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minSharedFrames)
  }

  private val audioFrameSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_no", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_sq", LongType),
    StructField("n_zero_cross", LongType)))

  /** Frame-level audio statistics straight off the PCM bytes: the payload's
    * 16-bit mono samples split into `frameMs` windows, each emitting its
    * sample count, energy as the EXACT integer sum of squares, and the
    * strict zero-crossing count (s[i-1]·s[i] < 0, both samples inside the
    * frame) — the silence/voicing features an audio curation pass filters
    * on, kept integer-exact so the gate needs no FP tolerance. Pure byte
    * arithmetic on [[Wav]]'s bounded parse (no javax.sound pipeline),
    * map-side per row like every decode here: rows that are not 16-bit
    * mono PCM WAVs (images, video, corrupt, stereo, 24-bit, NULL)
    * contribute ZERO rows rather than lies — callers needing row
    * accounting join back on media_id. A truncated final frame is emitted
    * with its honest shorter n_samples; a trailing odd byte (half a
    * sample) is ignored. */
  def audioFrameStats(media: DataFrame, frameMs: Int = 100): DataFrame = {
    require(frameMs >= 1, s"frameMs ($frameMs) must be >= 1")
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioFrameSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload =
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          Wav.parse(payload) match {
            case Some(m) if m.bitsPerSample == 16 && m.channels == 1 &&
                m.sampleRate > 0 && m.dataLen >= 2 =>
              val n = m.dataLen / 2
              val perFrame = math.max(1L, m.sampleRate.toLong * frameMs / 1000)
              def sample(i: Int): Int = {
                val o = m.dataOff + 2 * i
                ((payload(o) & 0xff) | (payload(o + 1) << 8)).toShort.toInt
              }
              val nFrames = ((n + perFrame - 1) / perFrame).toInt
              (0 until nFrames).iterator.map { f =>
                val lo = (f * perFrame).toInt
                val hi = math.min(n.toLong, (f + 1) * perFrame).toInt
                var i = lo; var sumSq = 0L; var zc = 0L
                var prev = 0
                while (i < hi) {
                  val s = sample(i)
                  sumSq += s.toLong * s
                  if (i > lo && prev * s < 0) zc += 1
                  prev = s
                  i += 1
                }
                Row(r.getLong(0), Integer.valueOf(f),
                  java.lang.Long.valueOf((hi - lo).toLong),
                  java.lang.Long.valueOf(sumSq), java.lang.Long.valueOf(zc))
              }
            case _ => Iterator.empty
          }
        }
      }(outEnc)
  }

  /** 64-bit audio fingerprint over 16-bit mono PCM: the samples split
    * into 64 equal windows, window energies as EXACT integer sums of
    * squares, bit i set iff E(i) > E(i−1) (E(−1) = 0) — the classic
    * energy-delta fingerprint. Pure integer arithmetic (oracles
    * recompute it from PCM construction formulas) and GAIN-INVARIANT by
    * construction: a uniformly amplified copy scales every energy by the
    * same square factor, so every comparison — including the equality
    * case — lands identically (the re-leveled re-encode is audio's
    * resized-thumbnail). Payloads that are not 16-bit mono PCM, or
    * carry fewer than 64 samples, fingerprint NULL. */
  def audioFingerprint64(samples: Int => Int, n: Int): Long = {
    require(n >= 64, s"audio fingerprint needs >= 64 samples, got $n")
    var hash = 0L
    var prevE = 0L
    var w = 0
    while (w < 64) {
      val lo = (w.toLong * n / 64).toInt
      val hi = ((w + 1).toLong * n / 64).toInt
      var e = 0L
      var i = lo
      while (i < hi) { val s = samples(i); e += s.toLong * s; i += 1 }
      if (e > prevE) hash |= (1L << w)
      prevE = e
      w += 1
    }
    hash
  }

  /** Leading/trailing-silence trim bounds: the largest prefix and suffix
    * whose samples all satisfy |s| ≤ noiseFloor are dropped, returning
    * the [lo, hi) span of what remains (possibly empty). INTERNAL
    * silence — clear-bit windows inside the signal — is untouched: only
    * the edges trim, so a fingerprint over the trimmed span is invariant
    * to padding the clip with silence, which is exactly the edit the
    * untrimmed energy-delta fingerprint breaks on (every one of the 64
    * window boundaries shifts; MultimodalSpec pins the miss). */
  def trimmedSpan(samples: Int => Int, n: Int, noiseFloor: Int): (Int, Int) = {
    require(noiseFloor >= 0, s"noiseFloor ($noiseFloor) must be >= 0")
    var lo = 0
    while (lo < n && math.abs(samples(lo)) <= noiseFloor) lo += 1
    var hi = n
    while (hi > lo && math.abs(samples(hi - 1)) <= noiseFloor) hi -= 1
    (lo, hi)
  }

  /** [[audioFingerprint64]] over the silence-trimmed span — the
    * TIME-SHIFT-ROBUST variant: a copy that gained or lost leading /
    * trailing silence (the re-edit that breaks the raw fingerprint)
    * trims back to the identical sample span and fingerprints
    * identically, bit for bit. None when fewer than 64 samples survive
    * the trim (all-silence or near-empty clips have no fingerprintable
    * signal). */
  def audioFingerprint64Trimmed(samples: Int => Int, n: Int,
      noiseFloor: Int): Option[Long] = {
    val (lo, hi) = trimmedSpan(samples, n, noiseFloor)
    if (hi - lo < 64) None
    else Some(audioFingerprint64(i => samples(lo + i), hi - lo))
  }

  private val audioHashSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("ahash", LongType)))

  /** payload → [[audioFingerprint64]], map-side off [[Wav]]'s bounded
    * parse; non-audio/short/stereo/24-bit rows keep their row with a
    * NULL fingerprint (the never-drop contract).
    *
    * `trimNoiseFloor >= 0` switches to the silence-normalized kernel
    * ([[audioFingerprint64Trimmed]]): edge samples with |s| ≤ the floor
    * are trimmed before windowing, making the fingerprint invariant to
    * leading/trailing-silence edits. The default (−1) is the raw
    * boundary-sensitive fingerprint — existing stores were built with
    * it, and a store must be paired with the kernel that built it. */
  def audioFingerprints(media: DataFrame, trimNoiseFloor: Int = -1): DataFrame = {
    val floor = trimNoiseFloor
    val outEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioHashSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload =
            if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val h = Wav.parse(payload) match {
            case Some(m) if m.bitsPerSample == 16 && m.channels == 1 &&
                m.dataLen >= 2 * 64 =>
              val n = m.dataLen / 2
              val sample = (i: Int) => {
                val o = m.dataOff + 2 * i
                ((payload(o) & 0xff) | (payload(o + 1) << 8)).toShort.toInt
              }
              if (floor >= 0)
                audioFingerprint64Trimmed(sample, n, floor)
                  .map(Long.box).orNull
              else Long.box(audioFingerprint64(sample, n))
            case _ => null
          }
          Row(r.getLong(0), h)
        }
      }(outEnc)
  }

  /** Banded audio near-dup over [[audioFingerprints]] — identical
    * machinery to [[phashNearDups]] (pigeonhole superset with
    * bands = maxHamming + 1, exact bit_count filter, never all-pairs),
    * completing the perceptual near-dup family across modalities:
    * winnow/MinHash/SimHash for text, aHash for images, frame hashes for
    * video, energy-delta fingerprints for audio. The fingerprint table
    * persists through `scope`. */
  def audioNearDups(media: DataFrame, maxHamming: Int = 7,
      bands: Int = 0, scope: CacheScope = CacheScope.unmanaged,
      trimNoiseFloor: Int = -1): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val hashed = scope.persist(
      audioFingerprints(media, trimNoiseFloor).filter(col("ahash").isNotNull))
    bandedHashPairs(hashed, hashed, "ahash", b, maxHamming, fullCorpus = true)
  }

  /** [[phashNearDupsAgainst]] for audio: a new batch against a stored
    * (media_id, ahash) fingerprint table — only the batch's PCM parses,
    * per-batch unions reproduce the full-corpus pair set. The store must
    * have been fingerprinted with the SAME `trimNoiseFloor`. */
  def audioNearDupsAgainst(newMedia: DataFrame, existingHashes: DataFrame,
      maxHamming: Int = 7, bands: Int = 0,
      scope: CacheScope = CacheScope.unmanaged,
      trimNoiseFloor: Int = -1): DataFrame = {
    val newHashed = scope.persist(
      audioFingerprints(newMedia, trimNoiseFloor)
        .filter(col("ahash").isNotNull))
    // audioPairsAgainstHashes null-filters the stored side too: a NULL
    // fingerprint can never band-match (NULL bits never equi-join), so
    // filtering before the explode saves the store's NULL rows their
    // pointless band rows
    audioPairsAgainstHashes(newHashed, existingHashes, maxHamming, bands)
  }

  /** [[phashNearDupsFromHashes]] for audio: pair a stored (media_id,
    * ahash) fingerprint corpus without parsing one PCM byte. */
  def audioNearDupsFromHashes(hashes: DataFrame, maxHamming: Int = 7,
      bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val h = hashes.select(col("media_id"), col("ahash"))
      .filter(col("ahash").isNotNull)
    bandedHashPairs(h, h, "ahash", b, maxHamming, fullCorpus = true)
  }

  /** [[phashPairsAgainstHashes]] for audio: both sides pre-computed,
    * new batch fingerprints × (existing ∪ new). */
  def audioPairsAgainstHashes(newHashes: DataFrame,
      existingHashes: DataFrame, maxHamming: Int = 7,
      bands: Int = 0): DataFrame = {
    val b = bandCount(maxHamming, bands)
    val nh = newHashes.select(col("media_id"), col("ahash"))
      .filter(col("ahash").isNotNull)
    val all = existingHashes.select(col("media_id"), col("ahash"))
      .filter(col("ahash").isNotNull).unionByName(nh)
    bandedHashPairs(nh, all, "ahash", b, maxHamming, fullCorpus = false)
  }
}
