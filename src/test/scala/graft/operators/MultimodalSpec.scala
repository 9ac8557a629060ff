package graft.operators

import graft.SparkSpec
import graft.queries.Registry

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Registry.table(spark, sf0001, "documents").limit(50), "doc_id", "text")

  test("binary payload plumbing: schema contract holds") {
    assert(media.schema.fieldNames.toSeq === Multimodal.metadataSchema.fieldNames.toSeq)
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("feature extraction: real pixels in, deterministic JL features out") {
    val feats = Multimodal.extractFeatures(graft.fixtures.MediaFixture.featureFrame(spark))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // every image row gets a featureDim-vector; non-images keep NULL
    graft.fixtures.MediaFixture.featureImages.foreach { case (id, _, _) =>
      assert(feats(id).getAs[Seq[Float]]("feature").length === Multimodal.featureDim)
    }
    Seq(24L, 25L).foreach { id =>
      assert(feats(id).isNullAt(feats(id).fieldIndex("feature")))
      assert(feats(id).getAs[Long]("n_bytes") > 0) // row kept, bytes counted
    }
    // the decoded-pixel feature equals the construction-formula feature:
    // PNG/BMP are lossless, so bytes→pixels→kernel must land bit-exactly
    // on raster→kernel
    graft.fixtures.MediaFixture.featureImages.foreach { case (id, w, h) =>
      val expected = Multimodal.pixelFeature(
        graft.fixtures.MediaFixture.expectedRgb(w, h), w, h).toSeq
      assert(feats(id).getAs[Seq[Float]]("feature") === expected, s"media $id")
    }
  }

  test("JL projection approximately preserves relative distances") {
    // three rasters: two near-identical gradients, one inverted — the
    // projected distance between the near pair must stay well under the
    // distance to the far raster (the property the featurizer exists for)
    val w = 32; val h = 32
    val base = graft.fixtures.MediaFixture.expectedRgb(w, h)
    val near = base.map(p => p ^ 0x01)           // LSB blue flip per pixel
    val far = base.map(p => ~p & 0xffffff)       // inverted image
    def dist(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val fBase = Multimodal.pixelFeature(base, w, h)
    val fNear = Multimodal.pixelFeature(near, w, h)
    val fFar = Multimodal.pixelFeature(far, w, h)
    assert(dist(fBase, fNear) < 0.1 * dist(fBase, fFar))
  }

  test("pixelFeature is bit-invariant to integer pixel replication") {
    // box-averaging onto the fixed grid makes the feature a function of
    // cell means: replicating every pixel k× scales each cell's sum and
    // count by k², and (k²·s)/(k²·n) rounds to the SAME double as s/n —
    // so an upscaled image must produce the bitwise-identical feature
    // (the scale-invariance a resolution-mixed corpus needs)
    val w = 16; val h = 16
    val base = graft.fixtures.MediaFixture.expectedRgb(w, h)
    for (k <- Seq(2, 3)) {
      val up = Array.tabulate(w * k * h * k) { idx =>
        val x = (idx % (w * k)) / k; val y = (idx / (w * k)) / k
        base(y * w + x)
      }
      assert(Multimodal.pixelFeature(up, w * k, h * k).toSeq ===
        Multimodal.pixelFeature(base, w, h).toSeq, s"k=$k")
    }
  }

  test("video -> frames -> features composes (the training-pipeline path)") {
    import graft.fixtures.MediaFixture
    // extracted MJPEG frames re-wrapped as media rows must featurize: the
    // frame bytes are standalone JPEGs, so the same decode->JL path runs
    val frames = Multimodal.sampleFrames(MediaFixture.videoFrame(spark), everyNth = 2)
    val asMedia = frames.selectExpr(
      "(media_id * 1000 + frame_no) AS media_id", "frame AS payload")
    val feats = Multimodal.extractFeatures(asMedia).collect()
    assert(feats.length === 3) // frames 0, 2, 4 of the 6-sample track
    feats.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("feature")),
        s"frame ${r.getLong(0)} failed to featurize")
      assert(r.getAs[Seq[Float]]("feature").length === Multimodal.featureDim)
    }
  }

  test("oversized image decodes SUBSAMPLED; feature matches the base raster") {
    import graft.fixtures.MediaFixture
    // a 2560×1024 image (>maxDecodePixels) built by 8× pixel replication
    // of a 320×128 base: bounded decode must subsample (k=2 → 1280×512,
    // which is the base replicated 4×), and by the replication invariance
    // the feature must equal the BASE raster's feature bitwise — the
    // bounded path costs 4× less memory and loses nothing here
    val wb = 320; val hb = 128; val k = 8
    val base = MediaFixture.expectedRgb(wb, hb)
    val big = new java.awt.image.BufferedImage(
      wb * k, hb * k, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < hb * k) {
      var x = 0
      while (x < wb * k) {
        big.setRGB(x, y, base((y / k) * wb + (x / k)))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", out)
    val bytes = out.toByteArray
    assert(wb.toLong * k * hb * k > Multimodal.maxDecodePixels) // engages
    val decoded = Multimodal.decodeImageBounded(bytes, Multimodal.maxDecodePixels)
    assert(decoded.exists(i => i.getWidth === 1280 && i.getHeight === 512))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(
        31L, "image", "image/png", null, null, null, bytes)),
      Multimodal.metadataSchema)
    val row = Multimodal.extractFeatures(df).collect().head
    val feat = row.getSeq[Float](row.fieldIndex("feature")).toSeq
    assert(feat === Multimodal.pixelFeature(base, wb, hb).toSeq)
  }

  test("withFeatures joins features back onto metadata without row loss") {
    val out = Multimodal.withFeatures(media)
    assert(out.count() === 50)
    assert(out.columns.contains("feature") && out.columns.contains("payload"))
  }

  test("decodeMedia recovers real dimensions/duration from payload bytes") {
    val out = Multimodal.decodeMedia(graft.fixtures.MediaFixture.frame(spark))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (Option(r.getAs[Integer]("width")), Option(r.getAs[Integer]("height")),
          Option(r.getAs[java.lang.Long]("duration_ms")))).toMap
    assert(out(1L) === ((Some(32), Some(16), None)))  // PNG
    assert(out(2L) === ((Some(64), Some(48), None)))  // JPEG
    assert(out(3L) === ((Some(8), Some(8), None)))    // BMP
    assert(out(4L) === ((None, None, Some(500L))))    // 8 kHz × 500 ms WAV
    assert(out(5L) === ((None, None, Some(2500L))))   // MP4: 1500 ticks @ 600 Hz
    assert(out(6L) === ((None, None, None)))          // undecodable, row kept
  }

  test("literal fixtures: painted pattern constants ARE the hashes, bit-exact") {
    import graft.fixtures.MediaFixture
    // the q189/q190 oracles hand-derive expected rows from these hex
    // constants with NO kernel call; this pins the exactness claim the
    // fixtures' derivations make (PNG lossless + strict-interior mean;
    // staircase energies rise exactly at set bits)
    val imgs = Multimodal.perceptualHash(MediaFixture.phashLiteralFrame(spark))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(imgs(46L) === Some(0xF0F0F0F00F0F0F0FL))
    assert(imgs(47L) === Some(0xF0F0F0F00F0F0F08L))
    assert(imgs(48L) === Some(0x0F0F0F0FF0F0F0F0L))
    assert(imgs(49L) === None)
    val auds = Multimodal.audioFingerprints(MediaFixture.audioLiteralFrame(spark))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(auds(71L) === Some(0xA5A5A5A5A5A5A5A5L))
    assert(auds(72L) === Some(0xA5A5A5A5A5A5A595L))
    assert(auds(73L) === Some(0x5A5A5A5A5A5A5A5AL))
    assert(auds(74L) === None)
  }

  test("perceptual hash: decode == formula, banding == brute force, near/far/NULL classified") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.phashFrame(spark)
    // 1) the distributed hash of every PNG equals the pure kernel over the
    //    construction-formula raster (bytes → pixels → hash, bit-exact)
    val got = Multimodal.perceptualHash(frame).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = MediaFixture.phashRasters.map { case (id, rgb, w, h) =>
      id -> Multimodal.aHash64(rgb, w, h) }.toMap
    expected.foreach { case (id, e) =>
      assert(got(id) === Some(e), s"hash mismatch for media $id") }
    // 2) the audio payload keeps its row with a NULL hash
    assert(got(45L) === None)
    // 3) banded near-dups == brute force over all pairs (pigeonhole: with
    //    bands = maxHamming + 1 the candidate set is a superset)
    val brute = (for {
      (a, ha) <- expected.toSeq
      (b, hb) <- expected.toSeq
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 7
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture must contain at least one near-dup pair")
    val banded = Multimodal.phashNearDups(frame, maxHamming = 7)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(banded === brute)
    // 4) design intent: the cell-blackout perturbation and the half-size
    //    copy both pair with the base; the inverted gradient never does
    assert(banded.exists(p => p._1 == 41L && p._2 == 42L),
      s"perturbed copy must be a near-dup: $banded")
    assert(banded.exists(p => p._1 == 41L && p._2 == 43L),
      s"resized copy must be a near-dup: $banded")
    assert(!banded.exists(p => p._1 == 44L || p._2 == 44L),
      s"the inverted gradient must stay far: $banded")
  }

  test("video near-dup: shared pattern frames pair videos; distinct/undecodable never") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.videoNearDupFrame(spark)
    // the full walk: only (51, 52) pair, on exactly their 2 shared frames
    val got = Multimodal.videoNearDups(frame, everyNth = 1,
        maxHamming = 7, minSharedFrames = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((51L, 52L, 2L)))
    // distinct patterns are mutually FAR: the frame hashes recover the
    // painted bit patterns through JPEG loss, so every cross-pattern
    // hamming is far above the threshold
    val hs = MediaFixture.videoPatterns.map { p =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MediaFixture.patternJpeg(p)))
      val w = img.getWidth; val h = img.getHeight
      p -> Multimodal.aHash64(img.getRGB(0, 0, w, h, null, 0, w), w, h)
    }
    hs.foreach { case (p, h) =>
      assert(java.lang.Long.bitCount(p ^ h) <= 1,
        f"hash must recover the painted pattern: $p%016x vs $h%016x") }
    for ((pa, ha) <- hs; (pb, hb) <- hs if pa != pb)
      assert(java.lang.Long.bitCount(ha ^ hb) > 7,
        f"distinct patterns must stay far: $pa%016x vs $pb%016x")
    // frame subsampling composes: every 2nd frame keeps one shared frame,
    // so minSharedFrames = 2 finds nothing and 1 finds the pair
    assert(Multimodal.videoNearDups(frame, everyNth = 2,
      maxHamming = 7, minSharedFrames = 2).isEmpty)
    assert(Multimodal.videoNearDups(frame, everyNth = 2,
        maxHamming = 7, minSharedFrames = 1)
      .as[(Long, Long, Long)].collect().toSet === Set((51L, 52L, 1L)))
  }

  test("incremental phash ingest: per-batch pairs union to the full-corpus set; existing never re-decoded or re-paired") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.phashFrame(spark)
    val batch1 = frame.filter($"media_id".isin(41L, 44L))
    val batch2 = frame.filter($"media_id".isin(42L, 43L, 45L))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    val full = pairs(Multimodal.phashNearDups(frame, maxHamming = 7))
    // the deployment shape: batch 1 pairs within itself, its hashes are
    // stored; batch 2 decodes ONLY ITSELF and pairs against the store
    val stored = Multimodal.perceptualHash(batch1)
      .filter($"phash".isNotNull)
    val p1 = pairs(Multimodal.phashNearDups(batch1, maxHamming = 7))
    val p2 = pairs(Multimodal.phashNearDupsAgainst(batch2, stored,
      maxHamming = 7))
    assert((p1 ++ p2) === full)
    // the against-join never re-emits existing × existing: every batch-2
    // pair involves at least one batch-2 id
    assert(p2.forall(p => Set(42L, 43L).contains(p._1) ||
      Set(42L, 43L).contains(p._2)), s"existing pair re-emitted: $p2")
    // audio twin: same contract on the fingerprint table
    val aframe = MediaFixture.audioNearDupFrame(spark)
    val a1 = aframe.filter($"media_id" === 61L)
    val a2 = aframe.filter($"media_id".isin(62L, 63L, 64L))
    val afull = pairs(Multimodal.audioNearDups(aframe, maxHamming = 7))
    val astored = Multimodal.audioFingerprints(a1).filter($"ahash".isNotNull)
    val ap = pairs(Multimodal.audioNearDupsAgainst(a2, astored,
      maxHamming = 7))
    assert(ap === afull) // batch 1 is a single row: no pairs of its own
    // a NULL-laden fingerprint store (failed decodes recorded as NULL)
    // changes nothing — and the NULL rows are filtered BEFORE the band
    // explode, matching the image path's contract
    val nullStore = astored.unionByName(
      Seq((900L, Option.empty[Long]), (901L, Option.empty[Long]))
        .toDF("media_id", "ahash"))
    assert(pairs(Multimodal.audioNearDupsAgainst(a2, nullStore,
      maxHamming = 7)) === afull)
  }

  test("incremental video ingest: per-batch pairs union to the full-corpus set; stored frames never re-decoded") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.videoNearDupFrame(spark)
    def vpairs(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().toSet
    val full = vpairs(Multimodal.videoNearDups(frame, everyNth = 1,
      maxHamming = 7, minSharedFrames = 2))
    assert(full === Set((51L, 52L, 2L)))
    // batch 1 introduces 51 and 53; batch 2 brings 52 and 54 and pairs
    // against the stored frame-hash table only — the (51, 52) pair is
    // found by batch 2 with batch 1's payloads never touched again
    val b1 = frame.filter($"media_id".isin(51L, 53L))
    val b2 = frame.filter($"media_id".isin(52L, 54L))
    val stored = Multimodal.videoFrameHashes(b1, everyNth = 1)
    val p1 = vpairs(Multimodal.videoNearDups(b1, everyNth = 1,
      maxHamming = 7, minSharedFrames = 2))
    val p2 = vpairs(Multimodal.videoPairsAgainstHashes(
      Multimodal.videoFrameHashes(b2, everyNth = 1), stored,
      maxHamming = 7, minSharedFrames = 2))
    assert((p1 ++ p2) === full)
    // frame counting canonicalizes across join orientations: n_shared
    // is exactly 2, not double-counted from both sides of the id≠id join
    assert(p2 === Set((51L, 52L, 2L)))
    // re-thresholding a stored corpus never touches a payload byte
    val all = stored.unionByName(Multimodal.videoFrameHashes(b2, everyNth = 1))
    assert(vpairs(Multimodal.videoNearDupsFromHashes(all, maxHamming = 7,
      minSharedFrames = 1)) === Set((51L, 52L, 2L)))
  }

  test("CALL graft.audio_neardups / video_neardups: incremental existing-store contract through SQL") {
    import graft.fixtures.MediaFixture
    val wh = java.nio.file.Files
      .createTempDirectory("graft-callinc").toString
    // audio: batch 1 = 71 alone (hashes persisted), batch 2 pairs against
    // the store — the literal fixture's only pair is (71, 72, hamming 2)
    val aframe = MediaFixture.audioLiteralFrame(spark)
    aframe.filter($"media_id" === 71L)
      .write.mode("overwrite").parquet(s"$wh/a1")
    aframe.filter($"media_id".isin(72L, 73L, 74L))
      .write.mode("overwrite").parquet(s"$wh/a2")
    spark.sql(s"CALL graft.audio_neardups(input => '$wh/a1', " +
      s"output => '$wh/ap1', hashes_out => '$wh/astore')")
    assert(spark.read.parquet(s"$wh/ap1").isEmpty)
    spark.sql(s"CALL graft.audio_neardups(input => '$wh/a2', " +
      s"existing => '$wh/astore', output => '$wh/ap2')")
    assert(spark.read.parquet(s"$wh/ap2").as[(Long, Long, Int)]
      .collect().toSet === Set((71L, 72L, 2)))
    // video: 51+53 stored first, 52+54 pair against the frame-hash store
    val vframe = MediaFixture.videoNearDupFrame(spark)
    vframe.filter($"media_id".isin(51L, 53L))
      .write.mode("overwrite").parquet(s"$wh/v1")
    vframe.filter($"media_id".isin(52L, 54L))
      .write.mode("overwrite").parquet(s"$wh/v2")
    spark.sql(s"CALL graft.video_neardups(input => '$wh/v1', " +
      s"every_nth => 1, output => '$wh/vp1', hashes_out => '$wh/vstore')")
    assert(spark.read.parquet(s"$wh/vp1").isEmpty)
    spark.sql(s"CALL graft.video_neardups(input => '$wh/v2', " +
      s"every_nth => 1, existing => '$wh/vstore', output => '$wh/vp2')")
    assert(spark.read.parquet(s"$wh/vp2").as[(Long, Long, Long)]
      .collect().toSet === Set((51L, 52L, 2L)))
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  test("audio near-dup: gain-invariant fingerprints, banding == brute force, non-audio NULL") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.audioNearDupFrame(spark)
    // distributed fingerprints == the pure kernel over the PCM formulas
    val got = Multimodal.audioFingerprints(frame).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val expected = MediaFixture.audioNearDupFormulas.map { case (id, f, n) =>
      id -> Multimodal.audioFingerprint64(f, n) }.toMap
    expected.foreach { case (id, e) =>
      assert(got(id) === Some(e), s"fingerprint mismatch for media $id") }
    assert(got(64L) === None) // the image payload
    // gain invariance is EXACT: the 2x copy fingerprints identically
    assert(expected(61L) === expected(62L))
    // and the alternating signal is far (well past the threshold)
    assert(java.lang.Long.bitCount(expected(61L) ^ expected(63L)) > 7)
    // banded pairs == brute force
    val brute = (for {
      (a, ha) <- expected.toSeq
      (b, hb) <- expected.toSeq
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 7
    } yield (a, b, d)).toSet
    assert(brute === Set((61L, 62L, 0)))
    val banded = Multimodal.audioNearDups(frame, maxHamming = 7)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2, t._3)).toSet
    assert(banded === brute)
  }

  test("resize really rescales images; non-images pass through untouched") {
    import org.apache.spark.sql.Row
    val base = graft.fixtures.MediaFixture.frame(spark)
    // plant a CORRUPT image-typed row: only this class earns the NULL marker
    val corrupt = spark.createDataFrame(
      java.util.Arrays.asList(Row(9L, "image", "image/png", null, null, null,
        Array.tabulate[Byte](64)(i => (i * 7).toByte))),
      Multimodal.metadataSchema)
    val out = Multimodal.resize(base.unionByName(corrupt), 10, 7)
    assert(out.schema.fieldNames.toSeq === Multimodal.metadataSchema.fieldNames.toSeq)
    val rows = out.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // every decodable image comes back as a real 10×7 PNG
    Seq(1L, 2L, 3L).foreach { id =>
      val r = rows(id)
      assert(r.getAs[Integer]("width") === 10 && r.getAs[Integer]("height") === 7)
      val reDecoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(reDecoded.getWidth === 10 && reDecoded.getHeight === 7)
    }
    // audio/video rows pass through with their payloads INTACT — an image
    // op must never erase a valid WAV
    Seq(4L, 5L, 6L).foreach { id =>
      val r = rows(id)
      assert(!r.isNullAt(r.fieldIndex("payload")))
      assert(r.getAs[Array[Byte]]("payload").length > 0)
    }
    assert(Multimodal.Wav.parse(rows(4L).getAs[Array[Byte]]("payload"))
      .exists(_.durationMs == 500L))
    // only the corrupt IMAGE row gets the explicit decode-failure marker
    val bad = rows(9L)
    assert(bad.isNullAt(bad.fieldIndex("payload")))
    assert(bad.isNullAt(bad.fieldIndex("width")))
  }

  test("resize: an UNTYPED non-image payload passes through, never nulled") {
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(7L, null, null, null, null, null, graft.fixtures.MediaFixture.wav(8000, 250)),
        Row(8L, null, null, null, null, null, graft.fixtures.MediaFixture.image(20, 10, "png"))),
      Multimodal.metadataSchema)
    val out = Multimodal.resize(df, 10, 7)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // an untyped row holding a valid WAV survives byte-for-byte — the NULL
    // decode-failure marker is reserved for rows explicitly typed image
    assert(Multimodal.Wav.parse(out(7L).getAs[Array[Byte]]("payload"))
      .exists(_.durationMs == 250L))
    // while an untyped row that DOES decode as an image is still resized
    assert(out(8L).getAs[Integer]("width") === 10)
    assert(out(8L).getAs[Integer]("height") === 7)
  }

  test("WAV parser clamps a truncated data chunk to the bytes present") {
    // 8 kHz 16-bit mono declares 16000 data bytes for 1000 ms; hand it only
    // 4000 — duration must reflect the REAL bytes (250 ms), not the header
    val full = graft.fixtures.MediaFixture.wav(8000, 1000)
    val truncated = java.util.Arrays.copyOfRange(full, 0, 44 + 4000)
    assert(Multimodal.Wav.parse(truncated).exists(_.durationMs == 250L))
  }

  test("WAV RIFF parser: sample rate, channels, duration; garbage rejected") {
    val nSamples = 44100 * 1250 / 1000
    val meta = Multimodal.Wav.parse(graft.fixtures.MediaFixture.wav(44100, 1250))
    assert(meta === Some(Multimodal.Wav.Meta(44100, 1, 1250L,
      bitsPerSample = 16, dataOff = 44, dataLen = nSamples * 2)))
    assert(Multimodal.Wav.parse(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.Wav.parse(graft.fixtures.MediaFixture.image(4, 4, "png")) === None)
  }

  test("WAV parser survives hostile chunk sizes (no hang, no throw)") {
    def riff(chunkSize: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
      b.put("junk".getBytes("US-ASCII")).putInt(chunkSize) // hostile size field
      b.array()
    }
    // -8 as signed would step the offset by 0 (infinite loop); huge values
    // would overflow an Int offset — both must just return None
    assert(Multimodal.Wav.parse(riff(-8)) === None)
    assert(Multimodal.Wav.parse(riff(0x7ffffff8)) === None)
    assert(Multimodal.Wav.parse(riff(0)) === None)
  }

  test("property: WAV encode→parse round-trips across rates and durations") {
    // deterministic grid over the PCM parameter space; duration_ms must
    // round-trip exactly for every rate whose sample count is integral
    for (rate <- Seq(8000, 16000, 22050, 44100, 48000);
         ms <- Seq(40, 500, 1000, 2500)) {
      val parsed = Multimodal.Wav.parse(graft.fixtures.MediaFixture.wav(rate, ms))
      assert(parsed.isDefined, s"rate=$rate ms=$ms failed to parse")
      assert(parsed.get.sampleRate === rate)
      // dataSize*1000/byteRate re-derives ms exactly when rate*ms/1000 is whole
      val expectMs = (rate * ms / 1000) * 1000L / rate
      assert(parsed.get.durationMs === expectMs, s"rate=$rate ms=$ms")
    }
  }

  test("MP4 probe: mvhd duration recovered; hostile boxes never throw or loop") {
    import graft.fixtures.MediaFixture
    assert(Multimodal.Mp4.durationMs(MediaFixture.mp4(600, 1500)) === Some(2500L))
    assert(Multimodal.Mp4.durationMs(MediaFixture.mp4(1000, 0)) === Some(0L))
    assert(Multimodal.Mp4.durationMs(Array.emptyByteArray) === None)
    assert(Multimodal.Mp4.durationMs(Array[Byte](1, 2, 3)) === None)
    // a WAV is not a box list: its RIFF "size" reads as a giant box → None
    assert(Multimodal.Mp4.durationMs(MediaFixture.wav(8000, 100)) === None)
    // hostile: a moov child whose unsigned size overflows its parent
    val evil = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt(24).put("moov".getBytes("US-ASCII"))
      .putInt(0xfffffff0).put("mvhd".getBytes("US-ASCII")).putInt(0)
    assert(Multimodal.Mp4.durationMs(evil.array()) === None)
    // truncated: mvhd header present but payload cut before the duration
    val full = MediaFixture.mp4(600, 1500)
    assert(Multimodal.Mp4.durationMs(
      java.util.Arrays.copyOfRange(full, 0, 40)) === None)
    // zero timescale must not divide
    val zeroTs = MediaFixture.mp4(0, 1500)
    assert(Multimodal.Mp4.durationMs(zeroTs) === None)
    // all-ones duration is the ISO-BMFF "unknown" sentinel (fragmented /
    // live captures) → NULL, never a ~82-day bogus duration
    assert(Multimodal.Mp4.durationMs(MediaFixture.mp4(600, 0xffffffffL)) === None)
  }

  test("sampleFrames: real MJPEG samples located, sliced, and decoded") {
    import graft.fixtures.MediaFixture
    val frames = Multimodal.sampleFrames(MediaFixture.videoFrame(spark), everyNth = 1)
      .collect().map(r => r.getAs[Int]("frame_no") -> r).toMap
    // all 6 samples of the MJPEG track come back (media 12 yields nothing)
    assert(frames.size === 6)
    assert(frames.values.forall(_.getAs[Long]("media_id") === 11L))
    MediaFixture.videoFrameDims.zipWithIndex.foreach { case ((w, h), i) =>
      val r = frames(i)
      assert(r.getAs[Integer]("width") === w, s"frame $i")
      assert(r.getAs[Integer]("height") === h, s"frame $i")
      assert(r.getAs[Long]("pts_ms") === i * 100L, s"frame $i")
      // the sliced bytes are a COMPLETE standalone JPEG: full raster decode
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("frame")))
      assert(img != null && img.getWidth === w && img.getHeight === h)
    }
    // stride: everyNth=3 keeps samples 0 and 3 only
    val strided = Multimodal.sampleFrames(MediaFixture.videoFrame(spark), everyNth = 3)
      .collect().map(_.getAs[Int]("frame_no")).sorted
    assert(strided.toSeq === Seq(0, 3))
  }

  test("videoSamples: co64 (64-bit offsets) and multi-run stts (VFR) parse") {
    import graft.fixtures.MediaFixture
    val jpegs = MediaFixture.videoFrameDims.map { case (w, h) =>
      MediaFixture.image(w, h, "jpg") }
    // co64 form locates the identical byte ranges as the stco form
    val viaStco = Multimodal.Mp4.videoSamples(MediaFixture.mjpegMp4(jpegs, 30, 3))
    val viaCo64 = Multimodal.Mp4.videoSamples(
      MediaFixture.mjpegMp4(jpegs, 30, 3, co64 = true))
    assert(viaCo64.map(s => (s.no, s.offset, s.size, s.ptsMs)) ===
      viaStco.map(s => (s.no, s.offset, s.size, s.ptsMs)))
    // variable frame rate: deltas (3,3,6,6,1,1) @30 Hz run-length-encode to
    // a 3-entry stts; pts must be the cumulative PRIOR deltas per sample
    val vfr = Multimodal.Mp4.videoSamples(MediaFixture.mjpegMp4(
      jpegs, 30, 3, sampleTicks = Some(Seq(3, 3, 6, 6, 1, 1))))
    assert(vfr.map(_.ptsMs) === Vector(0L, 100L, 200L, 400L, 600L, 633L))
  }

  test("videoSamples: fixed-size stsz form; hostile count stays bounded") {
    import graft.fixtures.MediaFixture
    // two equal-size opaque samples; patch stsz into the FIXED-size form
    // (sample_size field set, per-sample table ignored)
    val blob = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val mp4 = MediaFixture.mjpegMp4(Seq(blob, blob.clone()), 30, 3)
    val bb = java.nio.ByteBuffer.wrap(mp4).order(java.nio.ByteOrder.BIG_ENDIAN)
    val stszIdx = indexOfTag(mp4, "stsz")
    bb.putInt(stszIdx + 8, 300) // sample_size != 0 → fixed form
    val fixed = Multimodal.Mp4.videoSamples(mp4)
    assert(fixed.map(s => (s.no, s.size)) === Vector((0, 300), (1, 300)))
    // hostile declared count in the fixed form must cap at what physically
    // fits (never a giant allocation) and never emit out-of-range samples
    bb.putInt(stszIdx + 12, Int.MaxValue)
    val capped = Multimodal.Mp4.videoSamples(mp4)
    assert(capped.forall(s => s.offset >= 0 && s.offset + s.size <= mp4.length))
    assert(capped.size <= mp4.length / 300)
  }

  test("videoSamples: v1 mdhd (64-bit times) locates the same samples as v0") {
    import graft.fixtures.MediaFixture
    val jpegs = MediaFixture.videoFrameDims.map { case (w, h) =>
      MediaFixture.image(w, h, "jpg") }
    val v0 = Multimodal.Mp4.videoSamples(MediaFixture.mjpegMp4(jpegs, 30, 3))
    val v1 = Multimodal.Mp4.videoSamples(
      MediaFixture.mjpegMp4(jpegs, 30, 3, mdhdV1 = true))
    // v1 shifts the timescale field to payload offset 20 — reading the
    // duration's low word there instead would skew every pts (or zero out
    // the track when the low word is 0)
    assert(v1 === v0)
    assert(v1.nonEmpty && v1.last.ptsMs > 0)
  }

  test("videoSamples: co64 offset near Long.MaxValue cannot overflow the range check") {
    import graft.fixtures.MediaFixture
    val blob = Array.tabulate[Byte](300)(i => (i * 3).toByte)
    val mp4 = MediaFixture.mjpegMp4(Seq(blob, blob.clone()), 30, 3, co64 = true)
    val bb = java.nio.ByteBuffer.wrap(mp4).order(java.nio.ByteOrder.BIG_ENDIAN)
    // first (only) co64 chunk offset (tag + ver/flags + count = +12) → a
    // value whose off+size wraps negative under additive range checks
    bb.putLong(indexOfTag(mp4, "co64") + 12, 0x7ffffffffffffff0L)
    // must neither throw (never-throw contract) nor emit a wrapped sample
    val samples = Multimodal.Mp4.videoSamples(mp4)
    assert(samples.forall(s => s.offset >= 0 && s.offset + s.size <= mp4.length))
    // and the whole sampleFrames path stays exception-free on the payload
    import spark.implicits._
    val media = Multimodal.fromText(
      Seq((1L, "x")).toDF("id", "t"), "id", "t")
      .drop("payload")
      .withColumn("payload", org.apache.spark.sql.functions.lit(mp4))
    assert(Multimodal.sampleFrames(media, everyNth = 1).count() === 0L)
  }

  test("videoSamples: fixed-size stsz with sample_size=1 stays constant-space") {
    import graft.fixtures.MediaFixture
    val blob = Array.tabulate[Byte](300)(i => (i * 7).toByte)
    val mp4 = MediaFixture.mjpegMp4(Seq(blob, blob.clone()), 30, 3)
    val bb = java.nio.ByteBuffer.wrap(mp4).order(java.nio.ByteOrder.BIG_ENDIAN)
    val stszIdx = indexOfTag(mp4, "stsz")
    bb.putInt(stszIdx + 8, 1)              // sample_size = 1 (small divisor)
    bb.putInt(stszIdx + 12, Int.MaxValue)  // hostile declared count
    // n caps at payload length; the fixed-size run is a constant-space view
    // (no materialized per-sample vector), and every emitted range is valid
    val samples = Multimodal.Mp4.videoSamples(mp4)
    assert(samples.forall(s => s.size === 1 && s.offset >= 0 &&
      s.offset + s.size <= mp4.length))
    assert(samples.size <= mp4.length)
  }

  test("videoSamples survives truncated/hostile sample tables") {
    import graft.fixtures.MediaFixture
    val jpegs = MediaFixture.videoFrameDims.map { case (w, h) =>
      MediaFixture.image(w, h, "jpg") }
    val full = MediaFixture.mjpegMp4(jpegs, 30, 3)
    assert(Multimodal.Mp4.videoSamples(full).size === 6)
    // truncating ANYWHERE must neither throw nor loop; cutting inside the
    // moov loses table bytes → fewer (possibly zero) samples, never bogus
    // ones pointing outside the payload
    Seq(10, 40, full.length / 2, full.length - 20, full.length - 1).foreach { cut =>
      val t = java.util.Arrays.copyOfRange(full, 0, cut)
      val samples = Multimodal.Mp4.videoSamples(t)
      assert(samples.forall(s => s.offset >= 0 && s.offset + s.size <= t.length),
        s"cut=$cut leaked an out-of-range sample")
    }
    // hostile stco: point chunk 2 at the last 8 bytes of the buffer — its
    // samples' declared ranges escape the payload and must be dropped while
    // chunk 1's samples survive untouched
    val badStco = full.clone()
    val stcoIdx = indexOfTag(badStco, "stco")
    val bb = java.nio.ByteBuffer.wrap(badStco).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(stcoIdx + 16, badStco.length - 8) // second chunk offset
    val clamped = Multimodal.Mp4.videoSamples(badStco)
    assert(clamped.map(_.no).sorted === Vector(0, 1, 2, 3))
    assert(clamped.forall(s => s.offset + s.size <= badStco.length))
    // hostile stsz: flip the first sample's declared size to 0xffffffff —
    // that sample must be dropped, and nothing may throw
    val evil = full.clone()
    val stszIdx = indexOfTag(evil, "stsz")
    java.util.Arrays.fill(evil, stszIdx + 16, stszIdx + 20, 0xff.toByte)
    val survivors = Multimodal.Mp4.videoSamples(evil)
    assert(survivors.forall(s => s.offset + s.size <= evil.length))
    assert(!survivors.exists(_.no == 0))
  }

  test("audioFrameStats: truncation is honest, non-mono-16 is absence, hostile bytes survive") {
    import org.apache.spark.sql.Row
    import graft.fixtures.MediaFixture
    def frameOf(rows: Seq[Row]) = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      Multimodal.metadataSchema)
    val full = MediaFixture.wav(8000, 250)
    // cut mid-sample INSIDE the data chunk: the parser clamps to bytes
    // present, the trailing odd byte is ignored, frames report honestly
    val cut = java.util.Arrays.copyOfRange(full, 0, 44 + 1601)
    // a stereo header (channels=2) must yield ZERO rows, never bogus stats
    val stereo = full.clone()
    stereo(22) = 2
    val rows = frameOf(Seq(
      Row(1L, "audio", "audio/wav", null, null, null, cut),
      Row(2L, "audio", "audio/wav", null, null, null, stereo),
      Row(3L, "audio", "audio/wav", null, null, null,
        Array.tabulate[Byte](256)(i => (i * 17).toByte))))
    val got = Multimodal.audioFrameStats(rows)
      .select("media_id", "frame_no", "n_samples")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 0, 800L)), got) // 800 whole samples = 1 frame
    // sum_sq of the surviving frame matches the ramp formula exactly
    val sq = Multimodal.audioFrameStats(rows).select("sum_sq").as[Long].head()
    assert(sq === (0 until 800).map(i => (i.toLong * i)).sum)
    // zero-crossing semantics: the alternating fixture crosses at every
    // in-frame pair — (frame length - 1) — and the ramp never crosses
    val alt = frameOf(Seq(
      Row(9L, "audio", "audio/wav", null, null, null, MediaFixture.wavAlt(4000, 125))))
    val zc = Multimodal.audioFrameStats(alt)
      .select("frame_no", "n_samples", "n_zero_cross")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(zc === Seq((0, 400L, 399L), (1, 100L, 99L)), zc)
  }

  test("pHashDct64 survives the gamma edit aHash provably misses") {
    import graft.fixtures.MediaFixture
    val Seq((_, base, w, h), (_, copy, _, _), (_, far, _, _)) =
      MediaFixture.dctRasters
    // the honest miss first: the γ-0.5 copy is 16 aHash bits from its
    // original — FAR past any sane threshold (q184's gates run 7), so
    // an aHash near-dup pass silently drops this duplicate
    val aBase = Multimodal.aHash64(base, w, h)
    val aCopy = Multimodal.aHash64(copy, w, h)
    assert(java.lang.Long.bitCount(aBase ^ aCopy) === 16)
    // the DCT hash holds the pair at hamming 2: the tone edit lands in
    // the discarded DC + a near-uniform AC scale, and the dither that
    // broke aHash lives outside the low-frequency window
    val dBase = Multimodal.pHashDct64(base, w, h)
    val dCopy = Multimodal.pHashDct64(copy, w, h)
    assert(java.lang.Long.bitCount(dBase ^ dCopy) === 2)
    // and it still separates genuinely different images
    val dFar = Multimodal.pHashDct64(far, w, h)
    assert(java.lang.Long.bitCount(dBase ^ dFar) > 20)
    assert(java.lang.Long.bitCount(dCopy ^ dFar) > 20)
    // affine tone edits (brightness/contrast, no clipping) are EXACT
    // invariants: +b rides the discarded DC, ×a scales ACs and median
    val bright = base.map { p =>
      val v = math.min(255, (p & 0xff) + 40); (v << 16) | (v << 8) | v }
    val contrast = base.map { p =>
      val v = math.max(0, math.min(255, ((p & 0xff) - 128) * 3 / 4 + 128))
      (v << 16) | (v << 8) | v }
    assert(Multimodal.pHashDct64(bright, w, h) === dBase)
    assert(Multimodal.pHashDct64(contrast, w, h) === dBase)
    // resize robustness carries over from the box-average front end
    val big = MediaFixture.texturedDitherRaster(42L, 64, 64, 100)
    assert(java.lang.Long.bitCount(
      Multimodal.pHashDct64(big, 64, 64) ^ dBase) <= 2)
    // the end-to-end kernel option: bytes → pixels → DCT through the
    // banded join finds exactly the (base, copy) pair; the same corpus
    // through aHash finds nothing (the recall gap, measured end to end)
    val frame = MediaFixture.dctNearDupFrame(spark)
    val dct = Multimodal.phashNearDups(frame, maxHamming = 7, kernel = "dct")
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(dct === Set((101L, 102L, 2L)))
    assert(Multimodal.phashNearDups(frame, maxHamming = 7).count() === 0L)
    // unknown kernels fail fast, driver-side
    intercept[IllegalArgumentException] {
      Multimodal.perceptualHash(frame, "md5")
    }
  }

  test("video DCT kernel pairs the tone-shifted re-encode the aHash frames miss") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.videoDctFrame(spark)
    // the honest miss: per-frame aHash distances between 111's frames
    // and 112's tone-shifted re-encodes are FAR past threshold 7, so
    // the default kernel finds no video pair at all
    val aHashes = Multimodal.videoFrameHashes(frame, everyNth = 1)
      .as[(Long, Int, Long)].collect()
      .map { case (id, f, h) => (id, f) -> h }.toMap
    Seq(0, 1).foreach { f =>
      val d = java.lang.Long.bitCount(aHashes((111L, f)) ^ aHashes((112L, f)))
      assert(d > 7, s"frame $f aHash distance $d should be a miss")
    }
    assert(Multimodal.videoNearDups(frame, everyNth = 1, maxHamming = 7,
      minSharedFrames = 2).count() === 0L)
    // the DCT kernel holds both frame pairs through JPEG loss AND the
    // gamma shift, so the videos pair on exactly the two shared frames
    val dHashes = Multimodal.videoFrameHashes(frame, everyNth = 1, "dct")
      .as[(Long, Int, Long)].collect()
      .map { case (id, f, h) => (id, f) -> h }.toMap
    Seq(0, 1).foreach { f =>
      val d = java.lang.Long.bitCount(dHashes((111L, f)) ^ dHashes((112L, f)))
      assert(d <= 7, s"frame $f DCT distance $d should pair")
    }
    val pairs = Multimodal.videoNearDups(frame, everyNth = 1,
      maxHamming = 7, minSharedFrames = 2, kernel = "dct")
      .select($"id_a", $"id_b", $"n_shared").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs === Set((111L, 112L, 2L)))
    // and the SQL verb routes the kernel through to the same answer
    val root = java.nio.file.Files
      .createTempDirectory("graft-videodct").toString
    frame.write.parquet(s"$root/media")
    spark.sql(s"CALL graft.video_neardups(input => '$root/media', " +
      "every_nth => 1, min_shared_frames => 2, kernel => 'dct', " +
      s"output => '$root/pairs')")
    assert(spark.read.parquet(s"$root/pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet ===
      Set((111L, 112L)))
  }

  test("dihedral orbit: rotations/mirrors are exact hash permutations; oriented join finds the rotated copy") {
    import graft.fixtures.MediaFixture
    // property: for an asymmetric textured raster, the hash of EVERY
    // raster-level transform lands in hashOrientations' orbit, and the
    // orbit is transform-invariant (equal sets) — the exactness the
    // one-sided explode relies on
    val base = MediaFixture.texturedDitherRaster(42L, 32, 32, 100)
    def mirror(a: Array[Int], n: Int): Array[Int] = {
      val o = new Array[Int](n * n)
      for (y <- 0 until n; x <- 0 until n) o(y * n + (n - 1 - x)) = a(y * n + x)
      o
    }
    val h = Multimodal.aHash64(base, 32, 32)
    val orbit = Multimodal.hashOrientations(h).toSet
    val r1 = MediaFixture.rotate90(base, 32)
    val r2 = MediaFixture.rotate90(r1, 32)
    val r3 = MediaFixture.rotate90(r2, 32)
    Seq(base, r1, r2, r3, mirror(base, 32), mirror(r1, 32),
      mirror(r2, 32), mirror(r3, 32)).foreach { t =>
      val ht = Multimodal.aHash64(t, 32, 32)
      assert(orbit.contains(ht), "transform hash must be in the orbit")
      assert(Multimodal.hashOrientations(ht).toSet === orbit)
    }
    // the honest miss: the rot-90 copy is 30 PLAIN aHash bits away —
    // both plain kernels drop the rotated re-upload entirely
    val frame = MediaFixture.orientedFrame(spark)
    val hs = Multimodal.perceptualHash(frame).filter($"phash".isNotNull)
      .as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(hs(141L) ^ hs(142L)) === 30)
    assert(Multimodal.phashNearDups(frame, maxHamming = 7).count() === 0L)
    // oriented: exactly the three hand-derived pairs at min-over-orbit
    // hammings 0 / 2 / 2
    val got = Multimodal.phashNearDupsOriented(frame, maxHamming = 7)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((141L, 142L, 0L), (141L, 143L, 2L), (142L, 143L, 2L)))
    // incremental contract: per-batch unions == the full-corpus set,
    // the stored side never re-orients
    val b1 = frame.filter($"media_id".isin(141L, 144L))
    val b2 = frame.filter($"media_id".isin(142L, 143L, 145L))
    val stored = Multimodal.perceptualHash(b1).filter($"phash".isNotNull)
    val h2 = Multimodal.perceptualHash(b2).filter($"phash".isNotNull)
    val union = Multimodal.phashNearDupsOriented(b1, maxHamming = 7)
      .unionByName(Multimodal.phashPairsOrientedAgainstHashes(h2, stored,
        maxHamming = 7))
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(union === got)
    // the SQL verb routes oriented => true into the same answer and
    // rejects the meaningless dct composition
    val root = java.nio.file.Files
      .createTempDirectory("graft-oriented").toString
    frame.write.parquet(s"$root/media")
    spark.sql(s"CALL graft.phash_neardups(input => '$root/media', " +
      s"oriented => true, output => '$root/pairs')")
    assert(spark.read.parquet(s"$root/pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet ===
      got.map(p => (p._1, p._2)))
    val err = intercept[Exception] {
      spark.sql(s"CALL graft.phash_neardups(input => '$root/media', " +
        s"oriented => true, kernel => 'dct', output => '$root/p2')")
    }
    assert(err.getMessage.contains("ahash"))
  }

  test("oriented video join finds the rotated clip the plain frame join misses") {
    import graft.fixtures.MediaFixture
    val frame = MediaFixture.videoOrientedFrame(spark)
    // the honest miss: every frame of the rotated clip is far from its
    // original under PLAIN frame hamming, so no video pair exists
    val hs = Multimodal.videoFrameHashes(frame, everyNth = 1)
      .as[(Long, Int, Long)].collect()
      .map { case (id, f, h) => (id, f) -> h }.toMap
    Seq(0, 1).foreach { f =>
      val d = java.lang.Long.bitCount(hs((121L, f)) ^ hs((122L, f)))
      assert(d > 7, s"frame $f plain distance $d should be a miss")
    }
    assert(Multimodal.videoNearDups(frame, everyNth = 1, maxHamming = 7,
      minSharedFrames = 2).count() === 0L)
    // oriented: both frame pairs match at orbit hamming ~0 (JPEG noise
    // only) and the videos pair on exactly the two shared frames
    val got = Multimodal.videoNearDupsOriented(frame, everyNth = 1,
      maxHamming = 7, minSharedFrames = 2)
      .select($"id_a", $"id_b", $"n_shared").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((121L, 122L, 2L)))
    // incremental contract: batch 2 (the rotated clip + the decoy)
    // pairs against batch 1's stored frame hashes; unions == full set
    val b1 = frame.filter($"media_id".isin(121L, 123L))
    val b2 = frame.filter($"media_id".isin(122L, 124L))
    val stored = Multimodal.videoFrameHashes(b1, everyNth = 1)
    val union = Multimodal.videoNearDupsOriented(b1, everyNth = 1,
        maxHamming = 7, minSharedFrames = 2)
      .unionByName(Multimodal.videoPairsOrientedAgainstHashes(
        Multimodal.videoFrameHashes(b2, everyNth = 1), stored,
        maxHamming = 7, minSharedFrames = 2))
      .select($"id_a", $"id_b", $"n_shared").as[(Long, Long, Long)]
      .collect().toSet
    assert(union === got)
    // SQL verb route + the meaningless dct composition rejected
    val root = java.nio.file.Files
      .createTempDirectory("graft-voriented").toString
    frame.write.parquet(s"$root/media")
    spark.sql(s"CALL graft.video_neardups(input => '$root/media', " +
      "every_nth => 1, min_shared_frames => 2, oriented => true, " +
      s"output => '$root/pairs')")
    assert(spark.read.parquet(s"$root/pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet ===
      Set((121L, 122L)))
    val err = intercept[Exception] {
      spark.sql(s"CALL graft.video_neardups(input => '$root/media', " +
        "oriented => true, kernel => 'dct', " +
        s"output => '$root/p2')")
    }
    assert(err.getMessage.contains("ahash"))
  }

  test("audio fingerprint is exactly invariant to nearest-neighbor resampling") {
    import graft.fixtures.MediaFixture
    val b = 0xA5A5A5A5A5A5A595L
    def samplesOf(bytes: Array[Byte]): (Int => Int, Int) = {
      val m = Multimodal.Wav.parse(bytes).get
      ((i: Int) => {
        val o = m.dataOff + 2 * i
        ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
      }, m.dataLen / 2)
    }
    // the kernel-level exactness: 2x the samples, same fingerprint —
    // windows are sample-count fractions, every energy doubles
    val (up, nUp) = samplesOf(MediaFixture.wavStaircaseUpsampled2x(b))
    assert(nUp === 3200)
    assert(Multimodal.audioFingerprint64(up, nUp) === b)
    // and the duration metadata stays honest (same 200 ms at 16 kHz)
    val meta = Multimodal.Wav.parse(MediaFixture.wavStaircaseUpsampled2x(b)).get
    assert(meta.sampleRate === 16000 && meta.durationMs === 200L)
    // end to end through the banded join: only the hand-derived pair
    val got = Multimodal
      .audioNearDups(MediaFixture.audioResampleFrame(spark), maxHamming = 7)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((151L, 152L, 2L)))
  }

  test("silence-trimmed audio fingerprint survives the padding edit the raw kernel misses") {
    import graft.fixtures.MediaFixture
    val a = 0xA5A5A5A5A5A5A5A5L
    val b = 0xA5A5A5A5A5A5A595L
    def samplesOf(bytes: Array[Byte]): (Int => Int, Int) = {
      val m = Multimodal.Wav.parse(bytes).get
      ((i: Int) => {
        val o = m.dataOff + 2 * i
        ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
      }, m.dataLen / 2)
    }
    val (orig, nOrig) = samplesOf(MediaFixture.wavStaircase(b))
    val (padded, nPadded) = samplesOf(MediaFixture.wavStaircasePadded(b, 100))
    assert(nPadded === nOrig + 1600) // 100 ms = 800 samples each side
    // the honest miss: the raw fingerprint of the padded copy is far
    // from the original's constant (every window boundary shifted)
    val raw = Multimodal.audioFingerprint64(padded, nPadded)
    assert(java.lang.Long.bitCount(raw ^ a) > 7)
    // trimming at floor 0 strips exactly the padding: the trimmed span
    // is byte-identical to the unpadded staircase, so the fingerprint
    // is the painted constant again — exact, not approximate
    assert(Multimodal.trimmedSpan(padded, nPadded, 0) === ((800, 800 + 1600)))
    assert(Multimodal.audioFingerprint64Trimmed(padded, nPadded, 0)
      === Some(b))
    assert(Multimodal.audioFingerprint64Trimmed(orig, nOrig, 0) === Some(b))
    // internal silence (clear-bit windows) is untouched by the trim:
    // bit 1 of A is clear, yet the fingerprint still equals A
    val (aS, aN) = samplesOf(MediaFixture.wavStaircase(a))
    assert(Multimodal.audioFingerprint64Trimmed(aS, aN, 0) === Some(a))
    // an all-silence clip has nothing to fingerprint
    assert(Multimodal.audioFingerprint64Trimmed(_ => 0, 1600, 0) === None)
    // end to end: raw fingerprints miss the padded pair, trimmed ones
    // find exactly (81, 82) at the hand-derived hamming 2
    val frame = MediaFixture.audioShiftFrame(spark)
    assert(Multimodal.audioNearDups(frame, maxHamming = 7).count() === 0L)
    assert(Multimodal.audioNearDups(frame, maxHamming = 7, trimNoiseFloor = 0)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toSet === Set((81L, 82L, 2L)))
  }

  /** Locate the byte offset of a box tag in a fixture (test helper). */
  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    (0 to b.length - 4).find(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
      .getOrElse(sys.error(s"tag $tag not found"))
  }
}
