package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Text
import graft.functions.Text._
import graft.queries.Registry.table

/** North-star text operators over `documents`: quality stats, language ID,
  * token counting, fingerprinting, exact + MinHash/SimHash/Jaccard dedup.
  *
  * Hashing is md5-based throughout so the DuckDB oracle reproduces every
  * value bit-for-bit (SURVEY-level design choice: engine-portable hashes
  * beat engine-private xxhash for verifiability; at 100 TB md5 of short
  * shingles is still cheap relative to shuffle).
  */
object TextQueries {

  /** SQL fragment: normalized text (lower, collapse whitespace, trim). */
  private val NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  /** SQL fragment: whitespace token list of normalized text. */
  private val TOKS = s"string_split($NORM, ' ')"
  /** q87 mixture rates — shared by the operator call and its oracle so
    * the derived cut points can never drift (unlisted sources take rate
    * 1.0 on both sides). */
  private val q87Rates: Map[String, Double] = Map("src0" -> 2.5, "src2" -> 0.4)

  /** SQL fragment: the q21 quality-score blend (Spark-round parity),
    * shared by q21 and the q74 curation gate. */
  private lazy val QUALITY_SQL = Registry.sroundSql(s"""
            LEAST(len(text)/200.0, 1.0)*0.4
          + (1.0 - LEAST((len(text) - len(regexp_replace(text,'[.,;:!?]','','g')))
               / GREATEST(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END, 1), 1.0))*0.3
          + (CASE WHEN len(text) / GREATEST(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END, 1)
                  BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END)*0.3""", 6)

  val queries: Seq[Q] = Seq(

    // ---- Text quality / stats --------------------------------------------
    Q("q21_text_stats", (s, dir) => {
      val d = table(s, dir, "documents")
      d.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(tokenCount(col("text")).cast("long")).as("sum_tokens"),
          sum(bpeishTokenCount(col("text")).cast("long")).as("sum_bpeish"),
          sum(punctCount(col("text")).cast("long")).as("sum_punct"),
          sum(stopwordRatio(col("text")).cast("decimal(18,6)")).cast("double")
            .as("sum_stopword_ratio"),
          (sum(qualityScore(col("text")).cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("avg_quality"))
    }, Some {
      val P = s"(' ' || $NORM || ' ')"
      val hitsSql = Text.stopwords.map(w =>
        s"CAST((len($P) - len(replace($P, ' $w ', ''))) / ${w.length + 2} AS INT)")
        .mkString(" + ")
      val ntokSql = s"GREATEST(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END, 1)"
      s"""
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END) AS BIGINT) AS sum_tokens,
        CAST(SUM(GREATEST(len(string_split_regex($NORM,'[a-z]+'))-1,0)
          + GREATEST(len(string_split_regex($NORM,'[0-9]+'))-1,0)
          + len(regexp_replace($NORM,'[a-z0-9 ]','','g'))) AS BIGINT) AS sum_bpeish,
        CAST(SUM(len(text) - len(regexp_replace(text,'[.,;:!?]','','g'))) AS BIGINT) AS sum_punct,
        CAST(SUM(CAST(${Registry.sroundSql(s"CAST($hitsSql AS DOUBLE) / $ntokSql", 6)} AS DECIMAL(18,6))) AS DOUBLE) AS sum_stopword_ratio,
        CAST(SUM(CAST($QUALITY_SQL AS DECIMAL(18,6))) AS DOUBLE)
          / COUNT(*) AS avg_quality
      FROM documents GROUP BY lang"""
    }),

    // ---- Language ID (n-gram marker heuristic) ----------------------------
    // Staged columns (padded text → per-language scores → argmax) so the
    // normalize/split work runs once per row, not once per marker reference:
    // CollapseProject keeps multi-referenced non-cheap projections
    // materialized, turning an O(markers × languages) expression blowup into
    // a linear pipeline. Same values as the single-expression langId().
    Q("q22_langid", (s, dir) => {
      val d = table(s, dir, "documents")
      val padded = concat(lit(" "), normalize(col("text")), lit(" "))
      val scored = d.withColumn("__padded", padded)
        .select(col("lang") +: Text.langMarkers.map { case (lg, ms) =>
          ms.map(m => matchCount(col("__padded"), m)).reduce(_ + _).as(s"s_$lg")
        }: _*)
      val scoreCols = Text.langMarkers.map(lm => col(s"s_${lm._1}"))
      val withBest = scored.withColumn("__best", greatest(scoreCols: _*))
      val predicted = Text.langMarkers.map(_._1).sorted
        .foldRight(lit("und")) { case (lg, acc) =>
          when(col(s"s_$lg") === col("__best") && col("__best") > 0, lit(lg))
            .otherwise(acc)
        }
      withBest.withColumn("predicted", predicted)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
    }, Some {
      val padded = s"' ' || $NORM || ' '"
      val scoreSql = Text.langMarkers.map { case (lang, markers) =>
        val cnt = markers.map(m =>
          s"CAST((len(p) - len(replace(p, '$m', ''))) / ${m.length} AS INT)")
          .mkString(" + ")
        s"($cnt) AS s_$lang"
      }.mkString(", ")
      val langs = Text.langMarkers.map(_._1).sorted
      val best = s"GREATEST(${Text.langMarkers.map("s_" + _._1).mkString(",")})"
      val caseArms = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
      s"""
      SELECT lang, CASE $caseArms ELSE 'und' END AS predicted, COUNT(*) AS n
      FROM (SELECT lang, $best AS best, * FROM
             (SELECT lang, $scoreSql FROM
               (SELECT lang, $padded AS p FROM documents)))
      GROUP BY 1, 2"""
    }),

    // ---- Exact dedup via normalized-text fingerprint ----------------------
    // Scale: one shuffle on the 16-byte fingerprint — the canonical
    // hash-groupBy dedup; skew-free because fingerprints are uniform.
    Q("q23_dedup_exact", (s, dir) => {
      val d = table(s, dir, "documents")
      d.groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
    }, Some(s"""
      SELECT md5($NORM) AS fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1""")),

    // ---- MinHash signatures (the LSH building block) ----------------------
    // String-min minhash over word 3-shingles, 6 seeds; banded into 3 bands
    // of 2 for the LSH bucket key. Verified value-for-value by the oracle.
    Q("q24_minhash_sig", (s, dir) => {
      import graft.functions.TextKernels
      val d = table(s, dir, "documents")
      val sigs = (0 until 6).map(j =>
        TextKernels.minhashHex(col("__toks"), 3, j).as(s"mh_$j"))
      val withSig = d.withColumn("__toks", tokens(col("text")))
        .select((col("doc_id") +: sigs): _*)
      withSig
        .withColumn("band_0", md5(concat_ws("|", col("mh_0"), col("mh_1"))))
        .withColumn("band_1", md5(concat_ws("|", col("mh_2"), col("mh_3"))))
        .withColumn("band_2", md5(concat_ws("|", col("mh_4"), col("mh_5"))))
    }, Some {
      val shSql = s"list_distinct(list_transform(generate_series(1, GREATEST(len(toks)-2, 0)), i -> array_to_string(toks[i:i+2], ' ')))"
      val mh = (0 until 6).map(j =>
        s"list_min(list_transform(sh, x -> md5('$j:' || x))) AS mh_$j").mkString(", ")
      s"""
      SELECT doc_id, mh_0, mh_1, mh_2, mh_3, mh_4, mh_5,
        md5(mh_0 || '|' || mh_1) AS band_0,
        md5(mh_2 || '|' || mh_3) AS band_1,
        md5(mh_4 || '|' || mh_5) AS band_2
      FROM (SELECT doc_id, $mh FROM
             (SELECT doc_id, $shSql AS sh FROM
               (SELECT doc_id, $TOKS AS toks FROM documents)))"""
    }),

    // ---- n-gram Jaccard near-dup scores -----------------------------------
    // Scale: candidate pairs come from an equi-join on `source` (stand-in
    // for an LSH band key) — never an unconstrained cross join. Shingles are
    // hashed to 60-bit longs once per document (set ops over longs, not
    // strings), and |A∪B| is derived as |A|+|B|−|A∩B| instead of
    // materializing the union array — same integers, ~10× less work per
    // pair.
    Q("q25_ngram_jaccard", (s, dir) => {
      import graft.functions.ArrayOps._
      val d = table(s, dir, "documents")
        .withColumn("__toks", tokens(col("text")))
        .select(col("doc_id"), col("source"),
          sortedShingleHashesOfTokens(col("__toks"), 2).as("sh"))
        .withColumn("nsh", size(col("sh")))
        // NOT persisted: the double shingle hashing of the self-join costs
        // ~10% here, but a query function has no release point, and a
        // session-lifetime cache per call is the exact leak class
        // CacheScope exists to prevent — operators that CAN release
        // (Dedup/Curation) persist; fire-and-return queries must not
      // probe-side parallelism: the corpus is one parquet file with ONE
      // row group, so scan→shingle→probe would fuse into a single task
      // (measured: the whole query on one core). The explicit-count
      // repartition spreads the pairwise kernel across the cluster
      // (defaultParallelism — cluster-derived, never a local constant;
      // explicit so AQE's byte-based coalescing can't fold the tiny
      // exchange back to one task). Scale-safe for THIS join shape: a
      // broadcast self-join's sides fit in a broadcast by construction,
      // so the exchanged bytes are bounded and the per-pair kernel they
      // unlock is the dominant term at any corpus size.
      val a = d.repartition(
        s.sparkContext.defaultParallelism, col("doc_id")).as("a")
      val b = d.as("b")
      a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .withColumn("ni", sortedIntersectCount(col("a.sh"), col("b.sh")))
        .withColumn("jac",
          col("ni").cast("double") /
            (col("a.nsh") + col("b.nsh") - col("ni")).cast("double"))
        .filter(col("jac") >= 0.08)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("jac"))
    }, Some {
      val shSql = s"list_transform(list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-1, 0)), i -> array_to_string(($TOKS)[i:i+1], ' '))), g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))"
      s"""
      SELECT doc_a, doc_b, jac FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS jac
        FROM (SELECT doc_id, source, $shSql AS sh FROM documents) a
        JOIN (SELECT doc_id, source, $shSql AS sh FROM documents) b
          ON a.source = b.source AND a.doc_id < b.doc_id)
      WHERE jac >= 0.08"""
    }),

    // ---- SimHash fingerprints --------------------------------------------
    // 32-bit simhash: per token md5, hex digit b/4 → bit (b%4); majority
    // vote over tokens (with multiplicity) sets result bit b.
    Q("q26_simhash", (s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("doc_id"),
        graft.operators.Dedup.simhash32(col("text")).as("simhash"))
    }, Some {
      val bitSql = (0 until 32).map { b =>
        val pos = b / 4 + 1
        val shift = b % 4
        s"""CASE WHEN list_sum(list_transform(toks, t ->
             ((CAST(('0x' || substr(md5(t), $pos, 1)) AS INT) >> $shift) % 2) * 2 - 1)) > 0
           THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"""
      }.mkString(" + ")
      s"""
      SELECT doc_id, $bitSql AS simhash
      FROM (SELECT doc_id, $TOKS AS toks FROM documents)"""
    }),

    // ---- Token counting by source ----------------------------------------
    Q("q27_token_count", (s, dir) => {
      val d = table(s, dir, "documents")
      d.groupBy(col("source"))
        .agg(sum(tokenCount(col("text")).cast("long")).as("ws_tokens"),
          sum(bpeishTokenCount(col("text")).cast("long")).as("bpeish_tokens"),
          count(lit(1)).as("n_docs"))
    }, Some(s"""
      SELECT source,
        CAST(SUM(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END) AS BIGINT) AS ws_tokens,
        CAST(SUM(GREATEST(len(string_split_regex($NORM,'[a-z]+'))-1,0)
          + GREATEST(len(string_split_regex($NORM,'[0-9]+'))-1,0)
          + len(regexp_replace($NORM,'[a-z0-9 ]','','g'))) AS BIGINT) AS bpeish_tokens,
        COUNT(*) AS n_docs
      FROM documents GROUP BY source""")),

    // ---- Binary/multimodal metadata plumbing ------------------------------
    // Opaque payloads as binary + typed metadata over the driver corpus;
    // intrinsic decode is gated separately by q67.
    Q("q28_binary_meta", (s, dir) => {
      val d = table(s, dir, "documents")
      d.withColumn("payload", col("text").cast("binary"))
        .groupBy(col("source"))
        .agg(sum(length(col("payload")).cast("long")).as("sum_bytes"),
          countDistinct(md5(col("payload"))).as("n_distinct_payloads"))
    }, Some("""
      SELECT source, CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        COUNT(DISTINCT md5(text)) AS n_distinct_payloads
      FROM documents GROUP BY source""")),

    // ---- Multimodal intrinsic decode (REAL, JDK codecs + header probes) ---
    // Payloads the fixture encodes with the JDK's own PNG/JPEG/BMP writers,
    // a hand-built PCM WAV, and a hand-built ISO-BMFF MP4 (moov/mvhd);
    // decodeMedia must RECOVER the dimensions / durations from the bytes
    // map-side. The undecodable video row keeps its row with NULL
    // intrinsics. The oracle is the construction parameters — a genuine
    // end-to-end decode gate, not byte bookkeeping.
    Q("q67_media_decode", (s, _) => {
      graft.operators.Multimodal
        .decodeMedia(graft.fixtures.MediaFixture.frame(s))
        .select(col("media_id"), col("media_type"), col("width"),
          col("height"), col("duration_ms"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'image', 32, 16, CAST(NULL AS BIGINT)),
        (CAST(2 AS BIGINT), 'image', 64, 48, CAST(NULL AS BIGINT)),
        (CAST(3 AS BIGINT), 'image', 8, 8, CAST(NULL AS BIGINT)),
        (CAST(4 AS BIGINT), 'audio', NULL, NULL, CAST(500 AS BIGINT)),
        (CAST(5 AS BIGINT), 'video', NULL, NULL, CAST(2500 AS BIGINT)),
        (CAST(6 AS BIGINT), 'video', NULL, NULL, CAST(NULL AS BIGINT))
      ) AS t(media_id, media_type, width, height, duration_ms)""")),

    // ---- Video frame extraction (REAL, ISO-BMFF sample-table walk) --------
    // An MJPEG-in-MP4 built box-by-box (ftyp|mdat|moov with full stsd/stts/
    // stsc/stsz/stco tables; 6 JPEG samples spread across 2 stsc chunks).
    // sampleFrames must walk the tables, slice every 2nd sample's byte
    // range out of the mdat, and DECODE its dimensions with ImageIO. The
    // oracle is the construction parameters: frame i is a gradient JPEG of
    // videoFrameDims(i) at pts 100·i ms; the undecodable payload (media 12)
    // must contribute ZERO rows.
    Q("q91_video_frames", (s, _) => {
      graft.operators.Multimodal
        .sampleFrames(graft.fixtures.MediaFixture.videoFrame(s), everyNth = 2)
        .select(col("media_id"), col("frame_no"), col("pts_ms"),
          col("width"), col("height"))
    }, Some {
      val rows = graft.fixtures.MediaFixture.videoFrameDims.zipWithIndex
        .collect { case ((w, h), i) if i % 2 == 0 =>
          s"(CAST(11 AS BIGINT), CAST($i AS INT), CAST(${i * 100} AS BIGINT), $w, $h)"
        }
      s"""
      SELECT * FROM (VALUES
        ${rows.mkString(",\n        ")}
      ) AS t(media_id, frame_no, pts_ms, width, height)"""
    }),

    // ---- Learned-feature extraction (REAL, JL projection over pixels) -----
    // extractFeatures decodes the payload's pixels and runs the seeded
    // random-projection featurizer; PNG/BMP decode is bit-exact, so the
    // oracle recomputes the expected feature from the CONSTRUCTION-formula
    // raster (never touching an encoder) through the same pure kernel —
    // the gate proves bytes→pixels→feature end to end. Checksum = the
    // in-order float sum rounded at 6 dp (Spark round(double) ≡ BigDecimal
    // .valueOf setScale HALF_UP, replicated driver-side). Non-image rows
    // keep their row with NULL feature.
    Q("q92_media_features", (s, _) => {
      graft.operators.Multimodal
        .extractFeatures(graft.fixtures.MediaFixture.featureFrame(s))
        .select(col("media_id"),
          when(col("feature").isNotNull, size(col("feature"))).as("feat_dim"),
          round(aggregate(col("feature"), lit(0.0d),
            (a, x) => a + x.cast("double")), 6).as("feat_checksum"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val imgRows = MediaFixture.featureImages.map { case (id, w, h) =>
        val feat = Multimodal.pixelFeature(MediaFixture.expectedRgb(w, h), w, h)
        val sum = feat.foldLeft(0.0)((a, x) => a + x.toDouble)
        val rounded = java.math.BigDecimal.valueOf(sum)
          .setScale(6, java.math.RoundingMode.HALF_UP).toPlainString
        s"(CAST($id AS BIGINT), CAST(${Multimodal.featureDim} AS INT), CAST($rounded AS DOUBLE))"
      }
      val nullRows = Seq(24L, 25L).map(id =>
        s"(CAST($id AS BIGINT), CAST(NULL AS INT), CAST(NULL AS DOUBLE))")
      s"""
      SELECT * FROM (VALUES
        ${(imgRows ++ nullRows).mkString(",\n        ")}
      ) AS t(media_id, feat_dim, feat_checksum)"""
    }),

    // ---- Audio frame features (REAL, PCM bytes → integer-exact stats) ----
    // audioFrameStats splits each WAV's 16-bit mono samples into 100 ms
    // frames and emits sample count, EXACT integer energy (sum of
    // squares), and strict zero crossings. The oracle re-derives all three
    // from the fixtures' CONSTRUCTION FORMULAS in pure SQL (ramp
    // s(i)=i%1000 at 8 kHz, alternating s(i)=±((i%7)+1) at 4 kHz — lag
    // window per frame for the crossings), proving bytes→samples→features
    // end to end with no FP tolerance anywhere. The image and NULL
    // payloads contribute ZERO rows (not-audio is absence, not lies).
    Q("q123_audio_features", (s, _) => {
      graft.operators.Multimodal
        .audioFrameStats(graft.fixtures.MediaFixture.audioFrame(s))
        .select(col("media_id"), col("frame_no"), col("n_samples"),
          col("sum_sq"), col("n_zero_cross"))
    }, Some("""
      WITH samples AS (
        SELECT CAST(21 AS BIGINT) AS media_id, i,
          CAST(i % 1000 AS BIGINT) AS s, CAST(i // 800 AS INT) AS frame_no
        FROM generate_series(0, 1999) t(i)
        UNION ALL
        SELECT CAST(22 AS BIGINT), i,
          CAST(((i % 7) + 1) * (CASE WHEN i % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT),
          CAST(i // 400 AS INT)
        FROM generate_series(0, 499) t(i)),
      lagged AS (
        SELECT media_id, frame_no, s,
          lag(s) OVER (PARTITION BY media_id, frame_no ORDER BY i) AS prev
        FROM samples)
      SELECT media_id, frame_no,
        COUNT(*) AS n_samples,
        CAST(SUM(s * s) AS BIGINT) AS sum_sq,
        CAST(SUM(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_zero_cross
      FROM lagged GROUP BY media_id, frame_no""")),

    // ---- Perceptual-hash image near-dup (REAL, bytes → 64-bit aHash) ------
    // perceptualHash decodes each payload and computes the integer-exact
    // 64-bit average hash (BT.601 luma, 8×8 box means, bit = cell > mean);
    // phashNearDups bands the hash (pigeonhole: bands = maxHamming+1 ⇒ a
    // pair within threshold shares some band — candidates are a SUPERSET,
    // never an all-pairs join) and filters exact bit_count(XOR). The
    // corpus: a gradient base, a cell-blackout perturbation (re-encoded
    // near-dup), the SAME image at half size (the resized copy aHash
    // exists to catch — embedding-cosine dedup has no pixel path), an
    // inverted gradient (far), and an audio payload (NULL hash, never
    // pairs). The oracle recomputes every hash from the CONSTRUCTION
    // formulas through the same pure kernel (the q92 convention) and
    // brute-forces ALL pairs — a pass proves bytes→pixels→hash end to end
    // AND that banding lost nothing.
    Q("q184_image_phash_neardup", (s, _) => {
      graft.operators.Multimodal
        .phashNearDups(graft.fixtures.MediaFixture.phashFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.phashRasters.map { case (id, rgb, w, h) =>
        id -> Multimodal.aHash64(rgb, w, h) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- Incremental perceptual-hash ingest --------------------------------
    // The 100 TB shape (the q117 winnow-incremental pattern on pixels):
    // batch 1 pairs within itself and stores its (media_id, phash) table;
    // batch 2 decodes ONLY ITSELF and joins against existing ∪ new — so a
    // day's crawl pairs against years of corpus for the cost of hashing
    // the day, and per-batch unions must reproduce EXACTLY the
    // full-corpus pair set (the oracle is q184's brute force over all
    // construction-formula hashes — same expected rows, reached without
    // ever re-decoding or re-pairing the stored side).
    Q("q187_image_phash_incremental", (s, _) => {
      val frame = graft.fixtures.MediaFixture.phashFrame(s)
      val b1 = frame.filter(col("media_id").isin(41L, 44L))
      val b2 = frame.filter(col("media_id").isin(42L, 43L, 45L))
      val stored = graft.operators.Multimodal.perceptualHash(b1)
        .filter(col("phash").isNotNull)
      graft.operators.Multimodal.phashNearDups(b1, maxHamming = 7)
        .unionByName(graft.operators.Multimodal
          .phashNearDupsAgainst(b2, stored, maxHamming = 7))
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.phashRasters.map { case (id, rgb, w, h) =>
        id -> Multimodal.aHash64(rgb, w, h) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- SQL CALL: perceptual-hash near-dup as a runbook verb -------------
    // The q164 convention for the multimodal tier: the media table lands
    // as parquet, `CALL graft.phash_neardups(hashes_out => …)` decodes
    // ONCE (the pairs join reads back the written fingerprint table),
    // and the output must equal q184's brute-force oracle — proving the
    // SQL front end routes into the one Scala implementation AND that
    // the persisted fingerprint round-trip loses nothing. The
    // fingerprint store it writes is exactly what the incremental CALL
    // (`existing => …`) consumes next batch.
    Q("q188_sql_call_phash", (s, _) => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q188").toString
      graft.fixtures.MediaFixture.phashFrame(s)
        .write.mode("overwrite").parquet(s"$wh/media")
      s.sql(s"CALL graft.phash_neardups(input => '$wh/media', " +
        s"output => '$wh/pairs', hashes_out => '$wh/hashes')")
      val out = s.sql(
        s"""SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
            FROM parquet.`$wh/pairs`""")
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.phashRasters.map { case (id, rgb, w, h) =>
        id -> Multimodal.aHash64(rgb, w, h) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- Video near-dup via per-frame perceptual hashes -------------------
    // sampleFrames walks the real MP4 sample tables, each JPEG frame
    // decodes to a 64-bit aHash, frame hashes pair through the banded
    // join (never all-pairs), and videos pair on >= minSharedFrames
    // matched frames. The corpus is HAND-DERIVABLE (the q91 fixture-
    // oracle pattern): frames paint target bit patterns (4x4 white/black
    // blocks -> the hash reproduces the pattern through JPEG loss), video
    // 52 shares exactly two of 51's frames byte-identically (the re-muxed
    // clip case), 53 is all-different, 54 undecodable — so the ONLY
    // expected row is (51, 52, 2), written as literal VALUES with no
    // kernel in the oracle.
    Q("q185_video_phash_neardup", (s, _) => {
      graft.operators.Multimodal
        .videoNearDups(graft.fixtures.MediaFixture.videoNearDupFrame(s),
          everyNth = 1, maxHamming = 7, minSharedFrames = 2)
        .select(col("id_a"), col("id_b"),
          col("n_shared").cast("long").as("n_shared"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(51 AS BIGINT), CAST(52 AS BIGINT), CAST(2 AS BIGINT))
      ) AS t(id_a, id_b, n_shared)""")),

    // ---- Audio near-dup via energy-delta fingerprints ---------------------
    // audioFingerprints splits each WAV's PCM into 64 windows and sets
    // bit i iff the EXACT integer energy rose from window i−1 — gain-
    // invariant by construction, so the 2×-amplified copy fingerprints
    // IDENTICALLY (audio's resized-thumbnail case); audioNearDups is the
    // q184 banded join on the fingerprint. The oracle recomputes every
    // fingerprint from the PCM construction formulas through the same
    // pure kernel (the q92/q123 convention) and brute-forces all pairs —
    // bytes→samples→fingerprint end to end, banding lossless, the image
    // payload NULL and pairless.
    Q("q186_audio_neardup", (s, _) => {
      graft.operators.Multimodal
        .audioNearDups(graft.fixtures.MediaFixture.audioNearDupFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.audioNearDupFormulas.map { case (id, f, n) =>
        id -> Multimodal.audioFingerprint64(f, n) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- Image near-dup with a KERNEL-INDEPENDENT oracle -------------------
    // q184 proves banding == brute force, but its expected hashes flow
    // through the same aHash64 kernel the engine runs. Here the corpus is
    // patternPng: lossless PNGs whose 4×4 blocks paint hex constants the
    // hash provably equals (white cell mean 255000, black 0, global mean
    // strictly between — see the fixture's derivation), so the expected
    // rows are LITERAL VALUES hand-derived from the constants: 46 ^ 47 =
    // 0x7 → hamming 3; 48 is 46's complement (64/61 away); 49 is audio
    // (NULL, pairless). The q185 video convention, on still images.
    Q("q189_image_phash_literal", (s, _) => {
      graft.operators.Multimodal
        .phashNearDups(graft.fixtures.MediaFixture.phashLiteralFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(46 AS BIGINT), CAST(47 AS BIGINT), CAST(3 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- Audio near-dup with a KERNEL-INDEPENDENT oracle -------------------
    // q186's twin of the above: wavStaircase paints a target fingerprint
    // into PCM window energies (amplitude climbs on set bits, drops to
    // silence on clear bits — the energy rises exactly at the set bits),
    // so the fingerprints ARE the hex constants and the expected rows are
    // literal: 71 ^ 72 = 0x30 → hamming 2; 73 is 71's complement; 74 is
    // an image (NULL, pairless). No audioFingerprint64 call in the oracle.
    Q("q190_audio_neardup_literal", (s, _) => {
      graft.operators.Multimodal
        .audioNearDups(graft.fixtures.MediaFixture.audioLiteralFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(71 AS BIGINT), CAST(72 AS BIGINT), CAST(2 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- SQL CALL: audio near-dup as a runbook verb -------------------------
    // q188's convention for the audio modality: the media table lands as
    // parquet, `CALL graft.audio_neardups(hashes_out => …)` parses the
    // PCM once (pairs join from the written fingerprint table), and the
    // output must equal q190's LITERAL oracle — SQL front end routed into
    // the one Scala implementation, persisted-fingerprint round trip
    // lossless, and no kernel call anywhere in the expected rows.
    Q("q191_sql_call_audio", (s, _) => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q191").toString
      graft.fixtures.MediaFixture.audioLiteralFrame(s)
        .write.mode("overwrite").parquet(s"$wh/media")
      s.sql(s"CALL graft.audio_neardups(input => '$wh/media', " +
        s"output => '$wh/pairs', hashes_out => '$wh/hashes')")
      val out = s.sql(
        s"""SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
            FROM parquet.`$wh/pairs`""")
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(71 AS BIGINT), CAST(72 AS BIGINT), CAST(2 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- SQL CALL: video near-dup as a runbook verb -------------------------
    // The duplicate-clip detector end to end through SQL: MP4s land as
    // parquet, `CALL graft.video_neardups(every_nth => 1,
    // min_shared_frames => 2, hashes_out => …)` walks the sample tables,
    // hashes every frame once (the pairs join reads the written
    // frame-hash store), and the output must equal q185's hand-written
    // VALUES — video 52 shares exactly two of 51's frames byte-
    // identically, 53 is all-different, 54 undecodable.
    Q("q192_sql_call_video", (s, _) => {
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q192").toString
      graft.fixtures.MediaFixture.videoNearDupFrame(s)
        .write.mode("overwrite").parquet(s"$wh/media")
      s.sql(s"CALL graft.video_neardups(input => '$wh/media', " +
        "every_nth => 1, min_shared_frames => 2, " +
        s"output => '$wh/pairs', hashes_out => '$wh/hashes')")
      val out = s.sql(
        s"""SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
            FROM parquet.`$wh/pairs`""")
      val rows = out.collect()
      val schema = out.schema
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(51 AS BIGINT), CAST(52 AS BIGINT), CAST(2 AS BIGINT))
      ) AS t(id_a, id_b, n_shared)""")),

    // ---- Incremental video ingest (the q187 contract on frame hashes) -----
    // Batch 1 (videos 51, 53) pairs within itself and stores its frame-
    // hash table; batch 2 (52, 54) decodes ONLY ITSELF and pairs against
    // existing ∪ new. The (51, 52) pair is found by batch 2 with batch
    // 1's payloads never touched again, and the per-batch union must
    // equal q185's full-corpus literal: exactly (51, 52, 2) — n_shared
    // counts canonically so both join orientations agree.
    Q("q193_video_phash_incremental", (s, _) => {
      val frame = graft.fixtures.MediaFixture.videoNearDupFrame(s)
      val b1 = frame.filter(col("media_id").isin(51L, 53L))
      val b2 = frame.filter(col("media_id").isin(52L, 54L))
      val stored = graft.operators.Multimodal.videoFrameHashes(b1,
        everyNth = 1)
      graft.operators.Multimodal
        .videoNearDups(b1, everyNth = 1, maxHamming = 7,
          minSharedFrames = 2)
        .unionByName(graft.operators.Multimodal.videoPairsAgainstHashes(
          graft.operators.Multimodal.videoFrameHashes(b2, everyNth = 1),
          stored, maxHamming = 7, minSharedFrames = 2))
        .select(col("id_a"), col("id_b"),
          col("n_shared").cast("long").as("n_shared"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(51 AS BIGINT), CAST(52 AS BIGINT), CAST(2 AS BIGINT))
      ) AS t(id_a, id_b, n_shared)""")),

    // ---- Incremental audio ingest (literal oracle) --------------------------
    // q190's staircase corpus through the q187 contract: batch 1 stores
    // fingerprints for 71 and 73, batch 2 (72 + the image decoy) parses
    // only itself and pairs against the store — the only pair is the
    // hand-derived (71, 72, hamming 2), reached without re-parsing one
    // stored PCM byte.
    Q("q194_audio_neardup_incremental", (s, _) => {
      val frame = graft.fixtures.MediaFixture.audioLiteralFrame(s)
      val b1 = frame.filter(col("media_id").isin(71L, 73L))
      val b2 = frame.filter(col("media_id").isin(72L, 74L))
      val stored = graft.operators.Multimodal.audioFingerprints(b1)
        .filter(col("ahash").isNotNull)
      graft.operators.Multimodal
        .audioNearDups(b1, maxHamming = 7)
        .unionByName(graft.operators.Multimodal.audioNearDupsAgainst(
          b2, stored, maxHamming = 7))
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(71 AS BIGINT), CAST(72 AS BIGINT), CAST(2 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- DCT perceptual hash: the tone-edit-robust kernel ------------------
    // aHash flips bits under global brightness/contrast/gamma edits (a
    // concave tone curve moves high-variance cells' means relative to
    // low-variance cells' — Jensen — and every cell hugging the global
    // mean crosses it); pHashDct64 compares the top-left 8×8 DCT block
    // (DC dropped) against its median, where an affine tone edit lands
    // entirely in the discarded DC + a uniform AC scale. The corpus
    // (MediaFixture.dctRasters): a full-spectrum textured base with
    // within-cell dither, its γ-0.5 copy — aHash 16 bits away
    // (MultimodalSpec pins the miss), pHashDct 2 — and a far image.
    // The oracle recomputes every DCT hash from the construction
    // rasters through the same pure kernel and brute-forces all pairs
    // (the q184 convention): a pass proves bytes→pixels→DCT→hash end
    // to end AND that the shared banded core lost nothing on the new
    // kernel.
    Q("q195_image_dct_neardup", (s, _) => {
      graft.operators.Multimodal
        .phashNearDups(graft.fixtures.MediaFixture.dctNearDupFrame(s),
          maxHamming = 7, kernel = "dct")
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.dctRasters.map { case (id, rgb, w, h) =>
        id -> Multimodal.pHashDct64(rgb, w, h) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = java.lang.Long.bitCount(ha ^ hb)
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- Time-shift-robust audio near-dup (literal oracle) -----------------
    // The raw energy-delta fingerprint breaks when a copy gains leading
    // silence (every window boundary shifts — MultimodalSpec pins the
    // miss); the silence-trimmed kernel strips sub-floor edges before
    // windowing, so the 100 ms-padded staircase copy trims back to the
    // EXACT original samples and its fingerprint is the painted hex
    // constant again. Expected rows are hand-derived from the constants
    // (the q190 convention): 81 ^ 82 = 0x30 → hamming 2; 83 is ~62 bits
    // from both; 84 is an image (NULL, pairless). No kernel call in the
    // oracle.
    Q("q196_audio_neardup_timeshift", (s, _) => {
      graft.operators.Multimodal
        .audioNearDups(graft.fixtures.MediaFixture.audioShiftFrame(s),
          maxHamming = 7, trimNoiseFloor = 0)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(81 AS BIGINT), CAST(82 AS BIGINT), CAST(2 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- Video near-dup under the DCT kernel (tone-shifted re-encode) -----
    // The duplicate-clip case aHash frames miss: video 112 is video 111's
    // two frames γ-0.5 tone-shifted and JPEG re-encoded (the re-upload
    // that also ran a brightness curve) — per-frame aHash lands 16–17
    // bits away through JPEG loss (MultimodalSpec pins the miss), while
    // pHashDct holds both frame pairs at hamming 2. With kernel = 'dct'
    // the only video pair is the hand-derivable literal (111, 112, 2);
    // 113 is far under both kernels, 114 undecodable.
    Q("q198_video_dct_neardup", (s, _) => {
      graft.operators.Multimodal
        .videoNearDups(graft.fixtures.MediaFixture.videoDctFrame(s),
          everyNth = 1, maxHamming = 7, minSharedFrames = 2,
          kernel = "dct")
        .select(col("id_a"), col("id_b"),
          col("n_shared").cast("long").as("n_shared"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(111 AS BIGINT), CAST(112 AS BIGINT), CAST(2 AS BIGINT))
      ) AS t(id_a, id_b, n_shared)""")),

    // ---- Rotation/mirror-robust image near-dup (dihedral orbit) ------------
    // The rotated/mirrored re-upload moves every grid cell, so BOTH
    // plain kernels miss it outright (the rot-90 copy is 30 aHash bits
    // from its original — MultimodalSpec pins the miss). The oriented
    // join explodes ONE side's already-computed hashes to their 8
    // dihedral bit-permutations (hashOrientations — a pure Long
    // permutation, no re-decode) and reports min-over-orbit hamming.
    // Corpus: asymmetric P (141), the same raster rotated 90° (142 —
    // oriented 0), a mirrored 2-bit-perturbed re-encode (143 — oriented
    // 2 to both), far Q (144), audio decoy (145). Oracle brute-forces
    // the oriented distances from construction rasters through the same
    // pure kernels (the q184 convention).
    Q("q199_image_oriented_neardup", (s, _) => {
      graft.operators.Multimodal
        .phashNearDupsOriented(graft.fixtures.MediaFixture.orientedFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some {
      import graft.fixtures.MediaFixture
      import graft.operators.Multimodal
      val hs = MediaFixture.orientedRasters.map { case (id, rgb) =>
        id -> Multimodal.aHash64(rgb, 32, 32) }
      val pairs = for {
        (a, ha) <- hs
        (b, hb) <- hs
        if a < b
        d = Multimodal.hashOrientations(ha)
          .map(o => java.lang.Long.bitCount(o ^ hb)).min
        if d <= 7
      } yield s"(CAST($a AS BIGINT), CAST($b AS BIGINT), CAST($d AS INT))"
      s"""
      SELECT * FROM (VALUES
        ${pairs.mkString(",\n        ")}
      ) AS t(id_a, id_b, hamming)"""
    }),

    // ---- Rotation-robust video near-dup (dihedral orbit on frames) ---------
    // The portrait/landscape-rotated clip re-upload: video 122 is 121's
    // two frames each rotated 90° and re-encoded — every grid cell
    // moves, so the plain frame join finds nothing (MultimodalSpec pins
    // the miss), while the oriented frame join (the q199 orbit explode
    // at frame granularity, min-over-orbit hamming per FRAME pair, then
    // the distinct-matched-frames count) recovers exactly the
    // hand-derived literal (121, 122, 2). Frames are asymmetric
    // patterns ≥20 self-orbit bits apart, so nothing self-pairs.
    Q("q201_video_oriented_neardup", (s, _) => {
      graft.operators.Multimodal
        .videoNearDupsOriented(
          graft.fixtures.MediaFixture.videoOrientedFrame(s),
          everyNth = 1, maxHamming = 7, minSharedFrames = 2)
        .select(col("id_a"), col("id_b"),
          col("n_shared").cast("long").as("n_shared"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(121 AS BIGINT), CAST(122 AS BIGINT), CAST(2 AS BIGINT))
      ) AS t(id_a, id_b, n_shared)""")),

    // ---- Audio near-dup is resample-invariant (literal oracle) -------------
    // A copy re-encoded at a different sample rate keeps its duration
    // and waveform but not its sample count; the energy-delta
    // fingerprint windows are FRACTIONS of the sample count, so a
    // nearest-neighbor 2× upsample doubles every window energy and the
    // fingerprint is EXACTLY the original's — invariance the kernel has
    // by construction, pinned here with hand-derived literal rows:
    // 151 ^ 152 = 0x30 → hamming 2; 153 is ~62 bits from both; 154 is
    // an image (NULL, pairless).
    Q("q200_audio_neardup_resample", (s, _) => {
      graft.operators.Multimodal
        .audioNearDups(graft.fixtures.MediaFixture.audioResampleFrame(s),
          maxHamming = 7)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(151 AS BIGINT), CAST(152 AS BIGINT), CAST(2 AS INT))
      ) AS t(id_a, id_b, hamming)""")),

    // ---- STREAMING perceptual ingest, oracle-gated --------------------------
    // The battery's first streaming entry: MediaIngest.phashIngest runs
    // the q189 literal corpus as TWO AvailableNow file-drops against one
    // checkpoint (run 2 processes only the new files — exactly-once per
    // file), fingerprinting each batch once, pairing batch 2 against the
    // COMMITTED store batch 1 published, and keyed-merging both tables
    // MERGE-ON-READ. The committed pairs table must equal q189's
    // hand-derived literal: exactly (46, 47, hamming 3), found by the
    // batch that introduced 47 without re-decoding 46.
    Q("q197_streaming_phash_ingest", (s, _) => {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Files
        .createTempDirectory("graft-q197").toString
      val in = s"$root/in"; val store = s"$root/store"
      val pairs = s"$root/pairs"; val cp = s"$root/cp"
      val frame = graft.fixtures.MediaFixture.phashLiteralFrame(s)
        .select(col("media_id"), col("payload"))
      def drop(name: String, ids: Long*): Unit =
        frame.filter(col("media_id").isin(ids.map(Long.box): _*))
          .coalesce(1).write.parquet(s"$in/$name")
      drop("b1", 46L, 48L)
      val schema = s.read.parquet(s"$in/b1").schema
      def runOnce(): Unit = {
        val media = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "16").parquet(s"$in/*")
        val q = graft.streaming.MediaIngest
          .phashIngest(media, store, pairs, cp, maxHamming = 7).start()
        // a silent stop() after an expired wait would read a PARTIAL pairs
        // table and fail the battery as a false regression — fail loudly
        val finished = q.awaitTermination(120000)
        if (!finished) { q.stop(); throw new IllegalStateException(
          "q197: AvailableNow ingest did not drain within 120 s") }
        q.stop()
      }
      runOnce()                 // batch 1: 46 vs 48 — 61 bits apart, no pair
      drop("b2", 47L, 49L)
      runOnce()                 // batch 2: 47 pairs against the stored 46
      val out = graft.sources.CommittedTable.read(s, pairs)
        .select(col("id_a"), col("id_b"),
          col("hamming").cast("int").as("hamming"))
      val rows = out.collect()
      val outSchema = out.schema
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
      s.createDataFrame(java.util.Arrays.asList(rows: _*), outSchema)
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(46 AS BIGINT), CAST(47 AS BIGINT), CAST(3 AS INT))
      ) AS t(id_a, id_b, hamming)"""))
  ) ++ samplingQueries ++ Seq(

    // ---- Line-level boilerplate dedup (CCNet/RefinedWeb pass) -------------
    // The corpus has no line structure, so the gate runs the operator over
    // an inline fixture (q20/q67 pattern): a line in ≥2 distinct docs is
    // removed everywhere, within-doc repeats survive, a fully-boilerplate
    // doc comes back empty (row kept). Oracle = the hand-derived result.
    Q("q75_line_dedup", (s, _) => {
      import s.implicits._
      val docs = Seq(
        (1L, "alpha beta\nCOOKIE NOTICE\ngamma"),
        (2L, "COOKIE NOTICE\ndelta"),
        (3L, "epsilon\nzeta"),
        (4L, "COOKIE NOTICE"),
        (5L, "echo\necho\nfoxtrot"))
        .toDF("doc_id", "text")
      graft.operators.Dedup.lineDedup(docs, "text", "doc_id")
        .select(col("doc_id"), col("text"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'alpha beta' || chr(10) || 'gamma'),
        (CAST(2 AS BIGINT), 'delta'),
        (CAST(3 AS BIGINT), 'epsilon' || chr(10) || 'zeta'),
        (CAST(4 AS BIGINT), ''),
        (CAST(5 AS BIGINT), 'echo' || chr(10) || 'echo' || chr(10) || 'foxtrot')
      ) AS t(doc_id, text)""")),

    // ---- Gopher-rule quality signals (published MassiveText recipe) -------
    // All four signals are map-side; the per-source n_pass re-applies the
    // rule conjunction on the ROUNDED signals so both engines compare
    // identical 6-dp values (the q71 parity discipline). minWords=5 is the
    // corpus-appropriate operating point (synthetic docs are short).
    Q("q83_gopher_rules", (s, dir) => {
      val d = graft.operators.TextAnalysis
        .withGopherSignals(table(s, dir, "documents"))
      val pass = col("g_n_words") >= 5 && col("g_n_words") <= 100000 &&
        col("g_mean_word_len") >= 3.0 && col("g_mean_word_len") <= 10.0 &&
        col("g_symbol_ratio") <= 0.1 && col("g_alpha_ratio") >= 0.8
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("g_n_words")).as("sum_words"),
          sum(col("g_mean_word_len").cast("decimal(18,6)")).cast("double")
            .as("sum_mean_word_len"),
          sum(col("g_alpha_ratio").cast("decimal(18,6)")).cast("double")
            .as("sum_alpha_ratio"),
          sum(when(pass, 1L).otherwise(0L)).as("n_pass"))
    }, Some {
      val ntok = s"CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END"
      val mean = Registry.sroundSql(
        s"(len($NORM) - ($ntok) + 1) / GREATEST($ntok, 1)", 6)
      val symbols = Registry.sroundSql(
        s"""((len(text) - len(replace(text, '#', '')))
           + (len(text) - len(replace(text, '...', ''))) / 3)
           / GREATEST($ntok, 1)""", 6)
      val alpha = Registry.sroundSql(
        s"len(list_filter($TOKS, t -> regexp_matches(t, '[a-z]'))) / GREATEST($ntok, 1)", 6)
      s"""
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(nw) AS BIGINT) AS sum_words,
        CAST(SUM(CAST(mean AS DECIMAL(18,6))) AS DOUBLE) AS sum_mean_word_len,
        CAST(SUM(CAST(alpha AS DECIMAL(18,6))) AS DOUBLE) AS sum_alpha_ratio,
        CAST(SUM(CASE WHEN nw BETWEEN 5 AND 100000 AND mean BETWEEN 3.0 AND 10.0
                       AND symbols <= 0.1 AND alpha >= 0.8
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM (SELECT source, ($ntok) AS nw, ($mean) AS mean,
              ($symbols) AS symbols, ($alpha) AS alpha
            FROM documents)
      GROUP BY source"""
    }),

    // ---- Vocabulary top-k (the tokenizer-training precursor) --------------
    // Two-level aggregation (map-side partials on the token) feeding
    // TakeOrderedAndProject — the corpus is shuffled as (token, partial)
    // pairs only, and no global sort materializes. Ties broken by token.
    Q("q84_vocab_topk", (s, dir) => {
      table(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok").asc)
        .limit(100)
    }, Some(s"""
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT unnest($TOKS) AS tok FROM documents)
      WHERE len(tok) > 0
      GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 100""")),

    // ---- Heavy hitters via Misra-Gries sketch-then-verify -----------------
    // q84's exact plan keeps one row per DISTINCT token alive through the
    // shuffle — fine here, enormous at 100 TB. This is the at-scale
    // replacement: an MG(k=100) summary (≤ 100 entries per task partial,
    // mergeable) nominates candidates, then ONLY those ≤ 100 candidates are
    // re-counted exactly. Output = exactly the tokens with true count
    // > n/k (integer cnt·k > n, no float threshold). The gate leans on the
    // sketch's SUPERSET guarantee: a qualifying token the sketch lost would
    // be a missing row → hash mismatch. Estimates are partitioning-
    // dependent; presence is not — which is why the plan re-counts.
    Q("q101_heavy_hitters", (s, dir) => {
      val toks = table(s, dir, "documents")
        .select(explode(tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) > 0)
      graft.operators.FrequentItems.exactHeavyHitters(toks, "tok", 100)
    }, Some(s"""
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT unnest($TOKS) AS tok FROM documents)
      WHERE len(tok) > 0
      GROUP BY tok
      HAVING COUNT(*) * 100 > (
        SELECT COUNT(*) FROM (SELECT unnest($TOKS) AS tok FROM documents)
        WHERE len(tok) > 0)""")),

    // ---- Adaptive per-source quality floor --------------------------------
    // Keep each source's top half (exactly ceil(n/2) rows) by quality
    // score — the curation rule a single global threshold gets wrong
    // (over-prunes clean sources, under-prunes noisy ones). Rank-based, so
    // the kept SET is engine-exact (the score is the shared 6-dp-rounded
    // q21 blend, the order has a doc_id tie-break, and the row_number-vs-
    // group-count rule is integer/ceil arithmetic — no interpolated-
    // quantile boundary sensitivity). sum_ids pins exactly which rows
    // survived, not just how many.
    Q("q105_adaptive_quality", (s, dir) => {
      val d = table(s, dir, "documents")
        .withColumn("q", qualityScore(col("text")))
      graft.operators.TextAnalysis
        .keepTopFraction(d, "source", col("q"), 0.5, "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"),
          min(col("q")).as("min_q"),
          (sum(col("q").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("avg_q"))
    }, Some(s"""
      SELECT source, COUNT(*) AS n_kept,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        MIN(q) AS min_q,
        CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_q
      FROM (SELECT source, doc_id, q,
              row_number() OVER (PARTITION BY source
                ORDER BY q DESC, doc_id ASC) AS rn,
              COUNT(*) OVER (PARTITION BY source) AS grp_n
            FROM (SELECT source, doc_id, $QUALITY_SQL AS q FROM documents))
      WHERE rn <= CEIL(0.5 * grp_n)
      GROUP BY source""")),

    // ---- Context-window chunking (docs → training windows) ----------------
    // maxTokens=20, overlap=5 ⇒ stride 15. Map-side explode; the oracle
    // re-derives every chunk's text and ordinal through the identical
    // slice arithmetic (DuckDB's inclusive [a:b] == Spark's slice(a, len)).
    Q("q85_doc_chunking", (s, dir) => {
      val docs = table(s, dir, "documents")
      val chunks = graft.operators.Packing.chunk(
        docs.select(col("doc_id"), col("text")), "text", "doc_id",
        maxTokens = 20, overlap = 5)
      docs.select(col("doc_id"), col("source"))
        .join(chunks, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_chunk_tokens")).as("sum_chunk_tokens"),
          max(col("chunk_no")).cast("long").as("max_chunk_no"))
    }, Some {
      // RAW tokens (original case/punctuation; explicit [ \t\n\r] class —
      // the Java-vs-RE2 \s parity footgun), matching Packing.chunk exactly
      val trimmed = "trim(text, ' ' || chr(9) || chr(10) || chr(13))"
      val rawToks = s"string_split_regex($trimmed, '[ \\t\\n\\r]+')"
      val ntok = s"CASE WHEN len($trimmed) = 0 THEN 0 ELSE len($rawToks) END"
      s"""
      WITH t AS (
        SELECT doc_id, source, text, $rawToks AS toks,
          CASE WHEN ($ntok) <= 5 THEN 1
               ELSE CAST(CEIL((($ntok) - 5) / 15.0) AS BIGINT) END AS nchunks
        FROM documents),
      c AS (
        SELECT source, (u)."no" AS chunk_no,
          CASE WHEN (u).txt IS NULL OR len((u).txt) = 0 THEN 0
               ELSE len(string_split((u).txt, ' ')) END AS n_chunk_tokens
        FROM (
          -- a NULL-text doc still yields ONE row with a NULL chunk (the
          -- posexplode_outer row-accounting rule); unnest of a transform
          -- over NULL would drop it
          SELECT source, unnest(CASE WHEN text IS NULL
            THEN [{'no': CAST(NULL AS BIGINT), 'txt': CAST(NULL AS VARCHAR)}]
            ELSE list_transform(generate_series(0, nchunks - 1),
              i -> {'no': i, 'txt': array_to_string(toks[(i*15+1):(i*15+20)], ' ')})
            END) AS u
          FROM t))
      SELECT source, COUNT(*) AS n_chunks,
        CAST(SUM(n_chunk_tokens) AS BIGINT) AS sum_chunk_tokens,
        CAST(MAX(chunk_no) AS BIGINT) AS max_chunk_no
      FROM c GROUP BY source"""
    }),

    // ---- Data-mixture sampling (deterministic per-source rates) -----------
    // The pretraining mixture primitive: each source keeps its own md5-
    // bucket fraction (stable under reruns/repartitioning, nested under
    // rate changes), unlisted sources take the default rate.
    Q("q86_mixture_sampling", (s, dir) => {
      graft.operators.Sampling.sampleByGroup(
          table(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultFraction = 0.1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
    }, Some(s"""
      SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM documents
      WHERE ${graft.operators.Sampling.hashBucketSql("doc_id")} <
        CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                    WHEN 'src2' THEN 2500 ELSE 1000 END
      GROUP BY source""")),

    // ---- Token-budgeted mixture (the "N tokens of source X" unit) ---------
    // Per source: keep the md5-ordered document prefix until the TOKEN
    // budget is spent (kept iff budget not exhausted before the doc, so
    // overshoot ≤ one boundary doc). src0's 3k budget exhausts at every
    // SF, src1's 100k never does (keep-all path live), the 5k default
    // partially fills — all three regimes inside the one gate. The oracle
    // is the identical running-sum window over the identical order.
    Q("q135_token_budget_mix", (s, dir) => {
      graft.operators.Sampling.mixByTokenBudget(
          table(s, dir, "documents"), "doc_id", "source", "n_chars",
          Map("src0" -> 3000L, "src1" -> 100000L), defaultBudget = 5000L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
    }, Some("""
      WITH t AS (
        SELECT source, doc_id, n_chars,
          SUM(COALESCE(n_chars, 0)) OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents WHERE doc_id IS NOT NULL)
      SELECT source, COUNT(*) AS n,
        CAST(SUM(n_chars) AS BIGINT) AS sum_tokens,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM t
      WHERE cum - COALESCE(n_chars, 0) <
        CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 100000
                    ELSE 5000 END
      GROUP BY source""")),

    // ---- Epoch upsampling (the >1x mixture side) --------------------------
    // src0 at 2.5 epochs (two full copies + a stable md5-half a third
    // time), src2 at 0.4, everything else 1.0. The oracle re-derives the
    // copy count per row and explodes it with generate_series.
    Q("q87_epoch_upsampling", (s, dir) => {
      graft.operators.Sampling.upsampleByGroup(
          table(s, dir, "documents"), "doc_id", "source", q87Rates)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"),
          max(col("epoch")).as("max_epoch"))
    }, Some {
      // cut points DERIVED from the shared rates constant (the q70 rule:
      // paired oracles must not be able to drift from the operator's input)
      import graft.operators.Sampling
      val fullArms = q87Rates.toSeq.sorted.map { case (g, r) =>
        s"WHEN '$g' THEN ${math.floor(r).toLong}" }.mkString(" ")
      val cutArms = q87Rates.toSeq.sorted.map { case (g, r) =>
        s"WHEN '$g' THEN ${math.round((r - math.floor(r)) * Sampling.BUCKETS)}"
      }.mkString(" ")
      s"""
      SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
        CAST(MAX(ep) AS BIGINT) AS max_epoch
      FROM (
        SELECT source, doc_id, unnest(generate_series(0, ne - 1)) AS ep
        FROM (
          SELECT source, doc_id,
            CAST(CASE source $fullArms ELSE 1 END AS BIGINT)
            + CASE WHEN ${Sampling.hashBucketSql("doc_id")} <
                     CASE source $cutArms ELSE 0 END
                   THEN 1 ELSE 0 END AS ne
          FROM documents))
      GROUP BY source"""
    }),

    // ---- JSONL round trip (the corpus interchange format) -----------------
    // documents → JSONL shards → schema'd read-back → per-source integrity
    // aggregate. The md5-derived text checksum proves CONTENT survived the
    // JSON escaping round trip (not just row counts); the oracle computes
    // the same aggregate over the original table — equality IS the
    // round-trip proof (q65's write→read→analytic pattern).
    Q("q88_jsonl_roundtrip", (s, dir) => {
      import graft.operators.Sampling
      val docs = table(s, dir, "documents")
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-q88-" +
        s"${ProcessHandle.current().pid()}/docs"
      graft.sources.JsonlIngest.write(docs, out)
      val back = graft.sources.JsonlIngest.parsed(
        graft.sources.JsonlIngest.read(s, out, docs.schema))
      back.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(Sampling.hashBucket(col("text"))).as("text_checksum"))
    }, Some(s"""
      SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(${graft.operators.Sampling.hashBucketSql("text")}) AS BIGINT)
          AS text_checksum
      FROM documents GROUP BY source""")),

    // ---- PII redaction (the pre-release corpus scrub) ---------------------
    // Map-side regexp_replace chain over an inline fixture with planted
    // identifiers; the oracle is the hand-derived ground truth (VALUES),
    // not an engine regex replica — the gate proves OUR patterns redact
    // exactly what they claim, including the root@<ip> edge (no TLD ⇒ not
    // an email, but the address IS an IP) and NULL pass-through.
    Q("q81_pii_redaction", (s, _) => {
      import s.implicits._
      val docs = Seq(
        (1L, "contact me at jane.doe+spam@example-mail.co.uk for details"),
        (2L, "server at 192.168.0.1 responded"),
        (3L, "call +1 (555) 123-4567 now"),
        (4L, "no pii here just words"),
        (5L, "mail root@10.0.0.5 and 10.0.0.9"),
        (6L, "a1234567890@mail.com wrote this"),
        (7L, null.asInstanceOf[String]),
        (8L, "between 2010 - 2020 totals rose 10 20 30 40"),
        (9L, "call 555-867-5309 tonight"),
        (10L, "see Smith (2010) 20-30 for the derivation"))
        .toDF("doc_id", "text")
      graft.operators.TextAnalysis.redactPii(docs)
        .select(col("doc_id"), col("text"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'contact me at <EMAIL> for details'),
        (CAST(2 AS BIGINT), 'server at <IP> responded'),
        (CAST(3 AS BIGINT), 'call <PHONE> now'),
        (CAST(4 AS BIGINT), 'no pii here just words'),
        (CAST(5 AS BIGINT), 'mail root@<IP> and <IP>'),
        (CAST(6 AS BIGINT), '<EMAIL> wrote this'),
        (CAST(7 AS BIGINT), CAST(NULL AS VARCHAR)),
        (CAST(8 AS BIGINT), 'between 2010 - 2020 totals rose 10 20 30 40'),
        (CAST(9 AS BIGINT), 'call <PHONE> tonight'),
        (CAST(10 AS BIGINT), 'see Smith (2010) 20-30 for the derivation')
      ) AS t(doc_id, text)""")),

    // ---- Benchmark decontamination (eval-overlap excision) ----------------
    // src0 stands in for the held-out benchmark; every OTHER source's docs
    // sharing any trigram with it are flagged with their overlap count.
    // Spark: benchmark n-grams broadcast onto a map-side explode of the
    // corpus — the corpus is never shuffled by n-gram. Oracle re-derives
    // the same per-doc-distinct trigram overlap relationally.
    Q("q82_decontamination", (s, dir) => {
      val docs = table(s, dir, "documents")
      val bench = docs.filter(col("source") === "src0")
      val corpus = docs.filter(col("source") =!= "src0")
      val hits = graft.operators.Dedup.contaminated(
        corpus, bench, "text", "doc_id", n = 3)
      corpus.select(col("doc_id"), col("source")).join(hits, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated_docs"),
          sum(col("n_contaminated_ngrams")).as("n_overlap_ngrams"))
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      s"""
      WITH bg AS (
        SELECT DISTINCT unnest($sh3) AS g FROM documents WHERE source = 'src0'),
      dg AS (
        SELECT doc_id, source, unnest($sh3) AS g
        FROM documents WHERE source <> 'src0')
      SELECT source, COUNT(DISTINCT doc_id) AS n_contaminated_docs,
        COUNT(*) AS n_overlap_ngrams
      FROM dg JOIN bg USING (g)
      GROUP BY source"""
    }),

    // ---- Bloom-prefiltered decontamination (the broadcast-overflow path) --
    // q82's exact answer through the scale path for benchmark suites whose
    // DISTINCT n-gram set outgrows an exact broadcast: a Bloom filter of
    // the benchmark grams (built DISTRIBUTED by BloomFilterAggregate, the
    // finished config-bounded sketch inlined as a foldable literal)
    // prefilters the corpus explode map-side; only survivors (matches +
    // ~fpp noise) pay the exact semi-join verification. The oracle is
    // q82's exact SQL — blooms have no false negatives and the verify
    // join kills false positives, so the answer is IDENTICAL and the
    // filter is invisible in the result.
    Q("q120_bloom_decontamination", (s, dir) => {
      val docs = table(s, dir, "documents")
      val bench = docs.filter(col("source") === "src0")
      val corpus = docs.filter(col("source") =!= "src0")
      val hits = graft.operators.Dedup.contaminatedBloom(
        corpus, bench, "text", "doc_id", n = 3,
        expectedGrams = 1L << 18, fpp = 0.01)
      corpus.select(col("doc_id"), col("source")).join(hits, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_contaminated_docs"),
          sum(col("n_contaminated_ngrams")).as("n_overlap_ngrams"))
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      s"""
      WITH bg AS (
        SELECT DISTINCT unnest($sh3) AS g FROM documents WHERE source = 'src0'),
      dg AS (
        SELECT doc_id, source, unnest($sh3) AS g
        FROM documents WHERE source <> 'src0')
      SELECT source, COUNT(DISTINCT doc_id) AS n_contaminated_docs,
        COUNT(*) AS n_overlap_ngrams
      FROM dg JOIN bg USING (g)
      GROUP BY source"""
    }),

    // ---- Decontamination DROP (the composed one-call form) ----------------
    // q82 counts hits; this gate applies the remedy: documents sharing
    // MORE than maxHits=2 distinct 3-grams with the benchmark are
    // anti-joined away, everything else survives untouched. The oracle
    // recomputes the per-doc hit count and keeps via NOT IN — pinning the
    // threshold boundary (≤ 2 kept, ≥ 3 dropped) as well as the drop
    // itself.
    Q("q127_decontaminate_drop", (s, dir) => {
      val docs = table(s, dir, "documents")
      val bench = docs.filter(col("source") === "src0")
      val corpus = docs.filter(col("source") =!= "src0")
      graft.operators.Dedup.decontaminate(
          corpus, bench, "text", "doc_id", n = 3, maxHits = 2L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("doc_id")).as("sum_ids"))
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      s"""
      WITH bg AS (
        SELECT DISTINCT unnest($sh3) AS g FROM documents WHERE source = 'src0'),
      dg AS (
        SELECT doc_id, unnest($sh3) AS g
        FROM documents WHERE source <> 'src0'),
      hits AS (
        SELECT doc_id, COUNT(*) AS h FROM dg JOIN bg USING (g) GROUP BY doc_id)
      SELECT source, COUNT(*) AS n_kept,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids
      FROM documents
      WHERE source <> 'src0'
        AND doc_id NOT IN (SELECT doc_id FROM hits WHERE h > 2)
      GROUP BY source"""
    }),

    // ---- N-gram novelty vs a reference corpus (data selection) ------------
    // The decontamination plan's scoring twin: per doc, how many distinct
    // word trigrams are ABSENT from the reference (src0)? Summed exactly
    // per source (the per-doc novelty ratio is a clean division the
    // caller applies; sums keep the gate FP-free). Reference broadcast,
    // corpus never shuffled by gram — EXPLAIN §q127's shape.
    Q("q140_ngram_novelty", (s, dir) => {
      val docs = table(s, dir, "documents")
      graft.operators.TextAnalysis.ngramNovelty(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "text", "doc_id", n = 3)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_grams")).as("sum_grams"),
          sum(col("n_novel")).as("sum_novel"))
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      s"""
      WITH bg AS (
        SELECT DISTINCT unnest($sh3) AS g FROM documents WHERE source = 'src0'),
      dg AS (
        SELECT doc_id, unnest($sh3) AS g
        FROM documents WHERE source <> 'src0'),
      per_doc AS (
        SELECT dg.doc_id, COUNT(*) AS n_grams,
          COUNT(*) FILTER (WHERE bg.g IS NULL) AS n_novel
        FROM dg LEFT JOIN bg ON dg.g = bg.g GROUP BY dg.doc_id)
      SELECT d.source, COUNT(*) AS n_docs,
        CAST(SUM(COALESCE(p.n_grams, 0)) AS BIGINT) AS sum_grams,
        CAST(SUM(COALESCE(p.n_novel, 0)) AS BIGINT) AS sum_novel
      FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
      WHERE d.source <> 'src0'
      GROUP BY d.source"""
    }),

    // ---- BPE subword tokenization (REAL merges-apply kernel) --------------
    // The codegen'd GPT-2-style greedy apply (lowest-ranked adjacent pair,
    // leftmost-non-overlapping, per word) under a FIXED merge table, over
    // an inline fixture whose words exercise rank priority (banana: (a,n)
    // before (b,an)), chaining ((a,a) then (aa,b)), the overlap rule
    // (aaaa → aa|aa, never a|aa|a), unranked passthrough, and word
    // independence. The oracle is the HAND-DERIVED encoding of each doc —
    // independently computed VALUES, the q91 fixture-oracle pattern —
    // while BpeSpec proves kernel == an independent reference
    // formulation over real corpus words. Learning (TextAnalysis
    // .bpeLearn) is spec-gated: its per-round argmax is deterministic
    // ((count desc, pair asc)) but iterative-driver work, not a SQL
    // relation.
    Q("q129_bpe_encode", (s, _) => {
      import s.implicits._
      val docs = Seq(
        (1L, "banana band"), (2L, "aaaa aab"),
        (3L, "cabbage"), (4L, "nan na"))
        .toDF("doc_id", "text")
      val merges = Seq(("a", "n"), ("b", "an"), ("a", "a"), ("aa", "b"))
      docs.select(col("doc_id"),
          graft.functions.Bpe.tokens(
            graft.functions.Text.normalize(col("text")), merges).as("__t"))
        .select(col("doc_id"),
          size(col("__t")).cast("long").as("n_tokens"),
          concat_ws("|", col("__t")).as("toks"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(5 AS BIGINT), 'ban|an|a|ban|d'),
        (CAST(2 AS BIGINT), CAST(3 AS BIGINT), 'aa|aa|aab'),
        (CAST(3 AS BIGINT), CAST(7 AS BIGINT), 'c|a|b|b|a|g|e'),
        (CAST(4 AS BIGINT), CAST(4 AS BIGINT), 'n|an|n|a')
      ) AS t(doc_id, n_tokens, toks)""")),

    // ---- Byte-level BPE (GPT-2 form: pretokenizer + byte alphabet) --------
    // The fixture exercises the byte-level contract end to end: the
    // pretokenizer's contraction split (don|'t) and punctuation
    // detachment (final '.'), the space-prefix symbol (0x20 → 'Ġ') and
    // its merge into a word (Ġ+the), a multi-byte code point split into
    // its UTF-8 bytes and re-merged (é = C3 A9 → 'Ã'+'©' → 'Ã©'), a
    // whitespace-run token (ĠĠ), and rank chaining (t+h, th+e, Ġ+the).
    // Tokens are HAND-DERIVED values (the q129/q91 fixture-oracle
    // pattern); `lossless` pins decode∘encode == identity per doc in
    // the hash gate itself. RAW text in, never normalized — byte-level
    // BPE is case/whitespace-faithful by design.
    Q("q132_bpe_byte_level", (s, _) => {
      import s.implicits._
      val docs = Seq(
        (1L, "the theme"), (2L, "don't stop."),
        (3L, "héllo"), (4L, "ab 12  "))
        .toDF("doc_id", "text")
      val merges = Seq(("t", "h"), ("th", "e"), ("Ġ", "the"),
        ("o", "n"), ("d", "on"), ("Ã", "©"), ("Ġ", "Ġ"))
      docs.select(col("doc_id"), col("text"),
          graft.functions.Bpe.tokensByteLevel(col("text"), merges).as("__t"))
        .select(col("doc_id"),
          size(col("__t")).cast("long").as("n_tokens"),
          concat_ws("|", col("__t")).as("toks"),
          (graft.functions.Bpe.decodeByteLevel(col("__t")) === col("text"))
            .as("lossless"))
    }, Some("""
      SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(4 AS BIGINT), 'the|Ġthe|m|e', TRUE),
        (CAST(2 AS BIGINT), CAST(9 AS BIGINT), 'don|''|t|Ġ|s|t|o|p|.', TRUE),
        (CAST(3 AS BIGINT), CAST(5 AS BIGINT), 'h|Ã©|l|l|o', TRUE),
        (CAST(4 AS BIGINT), CAST(6 AS BIGINT), 'a|b|Ġ|1|2|ĠĠ', TRUE)
      ) AS t(doc_id, n_tokens, toks, lossless)""")),

    // ---- Unigram NLL (CCNet-style perplexity proxy) -----------------------
    // Per-doc mean -ln p(token) under the corpus's own unigram model,
    // aggregated per source. ln differs across libm in the last ulp, so
    // per-token values are rounded to 6 dp before the decimal sum (flip
    // probability ~1e-10 per eval — the same tolerance class as sround).
    Q("q77_unigram_nll", (s, dir) => {
      val d = table(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.unigramNll(
        d.select(col("doc_id"), col("text")))
      d.select(col("doc_id"), col("source")).join(scored, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(round(col("unigram_nll"), 6).cast("decimal(28,6)"))
            .cast("double").as("sum_nll"))
    }, Some {
      val perTok = Registry.sroundSql("-ln(cnt / total)", 6)
      s"""
      WITH toks AS (
        SELECT doc_id, tok FROM
          (SELECT doc_id, unnest($TOKS) AS tok FROM documents)
        WHERE len(tok) > 0),
      counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
      perdoc AS (
        SELECT doc_id,
          CAST(SUM(CAST($perTok AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS unigram_nll
        FROM toks JOIN counts USING (tok) CROSS JOIN tot
        GROUP BY doc_id)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CAST(${Registry.sroundSql("unigram_nll", 6)} AS DECIMAL(28,6))) AS DOUBLE) AS sum_nll
      FROM perdoc JOIN documents USING (doc_id)
      GROUP BY source"""
    }),

    // ---- BM25 relevance scoring (retrieval / relevance-filter primitive) --
    // Okapi BM25 with the Lucene idf; the corpus explode is filtered to the
    // query terms BEFORE any shuffle, df/N/avgdl broadcast. Mixed int/
    // literal arithmetic is forced to DOUBLE on the oracle side (DuckDB
    // would otherwise compute tf*2.2 in exact DECIMAL and diverge in the
    // last ulp); ln rounds at 6 dp pre-sum (the q77 discipline).
    Q("q89_bm25", (s, dir) => {
      graft.operators.TextAnalysis.bm25(
          table(s, dir, "documents"), Seq("spark", "join", "vector"))
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(15)
    }, Some {
      val dl = s"CAST(CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END AS BIGINT)"
      val wExpr = "ln(1 + (CAST(n - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))" +
        " * (CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + 1.2 * " +
        "(1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / n)))"
      s"""
      WITH docs AS (SELECT doc_id, $dl AS dl FROM documents),
      stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM docs),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf
             FROM (SELECT doc_id, unnest($TOKS) AS tok FROM documents)
             WHERE tok IN ('spark', 'join', 'vector') GROUP BY doc_id, tok),
      dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      scored AS (SELECT doc_id,
          CAST(${Registry.sroundSql(wExpr, 6)} AS DECIMAL(28,6)) AS w
        FROM tf JOIN dfreq USING (tok) JOIN docs USING (doc_id) CROSS JOIN stats)
      SELECT doc_id, COUNT(*) AS n_matched_terms, CAST(SUM(w) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id
      ORDER BY bm25 DESC, doc_id ASC LIMIT 15"""
    }),

    // ---- Shingle-containment near-dups (the quote-expansion pair class) ---
    // containment = |A∩B| / min(|A|,|B|): catches a doc quoted wholesale
    // inside a larger one, which Jaccard structurally misses. Same bucketed
    // plan and codegen'd two-pointer kernel as q25; min from stored sizes.
    Q("q90_containment", (s, dir) => {
      graft.operators.Dedup.containmentPairs(
        table(s, dir, "documents"), "source", "text", "doc_id",
        n = 2, minContainment = 0.25)
    }, Some {
      val shSql = s"list_transform(list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-1, 0)), i -> array_to_string(($TOKS)[i:i+1], ' '))), g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))"
      s"""
      SELECT doc_a, doc_b, containment FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / CAST(LEAST(len(a.sh), len(b.sh)) AS DOUBLE) AS containment
        FROM (SELECT doc_id, source, $shSql AS sh FROM documents) a
        JOIN (SELECT doc_id, source, $shSql AS sh FROM documents) b
          ON a.source = b.source AND a.doc_id < b.doc_id)
      WHERE containment >= 0.25"""
    }),

    // ---- BAND-KEYED containment (the 100 TB composition, hash-gated) ------
    // Candidates from real MinHash LSH band buckets (3 bands × 2 rows,
    // seeds 0..5, word 3-shingles — the q24/q56 signature), then
    // containment scored ONLY on candidates via the shared two-pointer
    // kernel. This is the plan a warehouse-scale run ships — q90's explicit
    // `source` bucket is the small-corpus stand-in; here the bucket key IS
    // the LSH band. The oracle re-derives bands, candidate pairs, and
    // containment independently.
    Q("q93_banded_containment", (s, dir) => {
      import graft.operators.Dedup
      val docs = table(s, dir, "documents")
      Dedup.containmentOverPairs(
        Dedup.minhashCandidates(docs, "text", "doc_id", n = 3, bands = 3, rows = 2),
        docs, "text", "doc_id", n = 2, minContainment = 0.25)
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      val mh = (0 until 6).map(j =>
        s"list_min(list_transform(sh, x -> md5('$j:' || x))) AS mh_$j").mkString(", ")
      val sh2 = s"list_transform(list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-1, 0)), i -> array_to_string(($TOKS)[i:i+1], ' '))), g -> CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT))"
      s"""
      WITH sig AS (
        SELECT doc_id,
          md5(mh_0 || '|' || mh_1) AS b0,
          md5(mh_2 || '|' || mh_3) AS b1,
          md5(mh_4 || '|' || mh_5) AS b2
        FROM (SELECT doc_id, $mh FROM
               (SELECT doc_id, $sh3 AS sh FROM documents))),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id
         AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2)),
      h AS (SELECT doc_id, $sh2 AS sh FROM documents)
      SELECT doc_a, doc_b, containment FROM (
        SELECT doc_a, doc_b,
          CAST(len(list_intersect(ha.sh, hb.sh)) AS DOUBLE)
            / CAST(LEAST(len(ha.sh), len(hb.sh)) AS DOUBLE) AS containment
        FROM cand JOIN h ha ON ha.doc_id = doc_a JOIN h hb ON hb.doc_id = doc_b)
      WHERE containment >= 0.25"""
    }),

    // ---- Winnowing fingerprints (rolling-hash document fingerprinting) ----
    // Schleimer et al.'s MOSS winnowing: Karp–Rabin rolling hash of every
    // character 8-gram of the normalized text (B=257, M=1e9+7), minimum of
    // each 4-hash window selected, distinct values = the fingerprint set
    // (guarantee: any shared substring ≥ 8+4-1 chars shares a fingerprint).
    // Spark side is one codegen'd O(n) pass (rolling reuse + monotonic-deque
    // sliding min); the oracle re-derives every k-gram hash FROM SCRATCH
    // (list_reduce polynomial — same arithmetic, no rolling) and takes plain
    // per-window minima: two independent derivations, one value set.
    // Scale: pure map-side — fingerprints never shuffle; downstream dedup
    // joins on exploded fingerprints exactly like the q56 band-bucket shape.
    Q("q95_winnow_fingerprint", (s, dir) => {
      import graft.functions.{Text, TextKernels}
      table(s, dir, "documents")
        .select(col("doc_id"),
          TextKernels.winnowFingerprints(Text.normalize(col("text")), 8, 4).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("sum_fp"),
          array_min(col("fps")).as("min_fp"),
          array_max(col("fps")).as("max_fp"))
    }, Some(s"""
      WITH h AS (SELECT doc_id,
        list_transform(generate_series(1, GREATEST(length(t) - 8 + 1, 0)), i ->
          list_reduce(list_transform(generate_series(i, i + 7), j ->
            CAST(unicode(t[j]) AS BIGINT)), (a, b) -> (a * 257 + b) % 1000000007)) AS hs
        FROM (SELECT doc_id, $NORM AS t FROM documents)),
      fp AS (SELECT doc_id,
        CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[]) ELSE
          list_distinct(list_transform(generate_series(1, GREATEST(len(hs) - 4 + 1, 1)), i ->
            list_min(hs[i:LEAST(i + 3, len(hs))]))) END AS fps
        FROM h)
      SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fp,
        CAST(COALESCE(list_sum(fps), 0) AS BIGINT) AS sum_fp,
        list_min(fps) AS min_fp, list_max(fps) AS max_fp
      FROM fp""")),

    // ---- Winnow-fingerprint near-dup pairs (the MOSS composition) ---------
    // Pairs sharing ≥5 winnowed fingerprints, with the maxDf=20 template
    // valve (Schleimer's common-code elimination — doubles as the skew
    // bound: posting arrays are capped at a CONFIG constant). The Spark
    // plan groups postings by fingerprint and generates pairs in-plan; the
    // oracle takes a DIFFERENT derivation (posting self-join) to the same
    // pair set — two independent routes, one answer.
    Q("q96_winnow_neardup", (s, dir) => {
      graft.operators.Dedup.winnowNearDups(
        table(s, dir, "documents"), "text", "doc_id",
        k = 8, w = 4, maxDf = 20, minShared = 5)
    }, Some(s"""
      WITH h AS (SELECT doc_id,
        list_transform(generate_series(1, GREATEST(length(t) - 8 + 1, 0)), i ->
          list_reduce(list_transform(generate_series(i, i + 7), j ->
            CAST(unicode(t[j]) AS BIGINT)), (a, b) -> (a * 257 + b) % 1000000007)) AS hs
        FROM (SELECT doc_id, $NORM AS t FROM documents)),
      fp AS (SELECT doc_id, unnest(
        CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[]) ELSE
          list_distinct(list_transform(generate_series(1, GREATEST(len(hs) - 4 + 1, 1)), i ->
            list_min(hs[i:LEAST(i + 3, len(hs))]))) END) AS fp
        FROM h),
      rare AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 20),
      posts AS (SELECT doc_id, fp.fp FROM fp JOIN rare USING (fp))
      SELECT doc_a, doc_b, n_shared FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM posts a JOIN posts b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      WHERE n_shared >= 5""")),

    // ---- Incremental winnow ingest (batch-wise valve, algorithm parity) ---
    // The write-at-ingest shape of q96 (the last spec-only member of the
    // dedup family, r10 verdict ask #8): batch 1 (even doc_ids) is scored
    // alone and its posting table stored; batch 2 (odd doc_ids) is scored
    // AGAINST those postings via winnowNearDupsAgainst — new×existing ∪
    // new×new only, the corpus never re-fingerprinted. The two batches'
    // pair sets are disjoint by construction (batch-1 pairs are even×even;
    // batch-2 pairs touch an odd doc). The oracle replicates the
    // ALGORITHM — each batch's pairs under the df-valve state of its own
    // ingest moment — the same parity discipline as q68/q115, because the
    // from-scratch q96 answer is NOT the target here: this corpus has
    // template fingerprints whose df crosses maxDf=20 between the half
    // corpus and the full one, so batch-union ≠ from-scratch BY DESIGN
    // (the documented valve drift of streaming ingest, which
    // winnowNearDupsAgainst's scaladoc spells out and DedupSpec pins in
    // both directions — a measured 60× pair inflation at sf0.001 if the
    // early valve were trusted corpus-wide).
    Q("q117_winnow_incremental", (s, dir) => {
      import graft.operators.Dedup
      val docs = table(s, dir, "documents")
      val b1 = docs.filter(col("doc_id") % 2 === 0)
      val b2 = docs.filter(col("doc_id") % 2 === 1)
      val posts1 = Dedup.winnowPostings(b1, "text", "doc_id", k = 8, w = 4)
      val first = Dedup.winnowNearDups(b1, "text", "doc_id",
        k = 8, w = 4, maxDf = 20, minShared = 5)
      val second = Dedup.winnowNearDupsAgainst(b2, posts1, "text", "doc_id",
        k = 8, w = 4, maxDf = 20, minShared = 5)
      first.unionByName(second)
    }, Some(s"""
      WITH h AS (SELECT doc_id,
        list_transform(generate_series(1, GREATEST(length(t) - 8 + 1, 0)), i ->
          list_reduce(list_transform(generate_series(i, i + 7), j ->
            CAST(unicode(t[j]) AS BIGINT)), (a, b) -> (a * 257 + b) % 1000000007)) AS hs
        FROM (SELECT doc_id, $NORM AS t FROM documents)),
      fp AS (SELECT doc_id, unnest(
        CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[]) ELSE
          list_distinct(list_transform(generate_series(1, GREATEST(len(hs) - 4 + 1, 1)), i ->
            list_min(hs[i:LEAST(i + 3, len(hs))]))) END) AS fp
        FROM h),
      fp1 AS (SELECT doc_id, fp FROM fp WHERE doc_id % 2 = 0),
      rare1 AS (SELECT fp FROM fp1 GROUP BY fp HAVING COUNT(*) <= 20),
      posts1 AS (SELECT doc_id, fp1.fp FROM fp1 JOIN rare1 USING (fp)),
      batch1 AS (
        SELECT doc_a, doc_b, n_shared FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
          FROM posts1 a JOIN posts1 b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        WHERE n_shared >= 5),
      rareAll AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 20),
      postsAll AS (SELECT doc_id, fp.fp FROM fp JOIN rareAll USING (fp)),
      newPosts AS (SELECT doc_id, fp FROM postsAll WHERE doc_id % 2 = 1),
      batch2 AS (
        SELECT doc_a, doc_b, n_shared FROM (
          SELECT doc_a, doc_b, COUNT(*) AS n_shared FROM (
            SELECT DISTINCT LEAST(a.doc_id, b.doc_id) AS doc_a,
              GREATEST(a.doc_id, b.doc_id) AS doc_b, a.fp
            FROM newPosts a JOIN postsAll b
              ON a.fp = b.fp AND a.doc_id <> b.doc_id)
          GROUP BY 1, 2)
        WHERE n_shared >= 5)
      SELECT * FROM batch1 UNION ALL SELECT * FROM batch2""")),

    // ---- Sequence packing (token bins per shard) --------------------------
    // Per-shard streaming fill: hash-sharded docs, running token sum over a
    // PARTITIONED window (never a global sort), bin = floor(exclusive-cumsum
    // / maxTokens). The oracle re-derives the same window arithmetic.
    Q("q76_token_packing", (s, dir) => {
      graft.operators.Packing.binStats(
        graft.operators.Packing.assignBins(
          table(s, dir, "documents").select("doc_id", "text"),
          "text", "doc_id", maxTokens = 500L, nShards = 4))
    }, Some {
      val ntok = s"CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END"
      val shard = graft.operators.Sampling.hashModSql("doc_id", 4)
      s"""
      SELECT shard, bin, COUNT(*) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
      FROM (
        SELECT shard, n_tokens,
          CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens) / 500.0) AS BIGINT) AS bin
        FROM (SELECT doc_id, $shard AS shard, $ntok AS n_tokens
              FROM documents))
      GROUP BY shard, bin"""
    }),

    // ---- End-to-end curation summary (the composed flagship, hash-gated) --
    // Every stage of Curation.run re-derived independently in SQL: exact
    // dedup = one survivor per md5 fingerprint; near-dup = MinHash-LSH
    // bands (3×2, seeds 0..5) → true trigram Jaccard ≥ 0.5; collapse keeps
    // each pair-graph component's MINIMUM doc (the oracle re-derives true
    // connected components via recursive transitive closure — matching the
    // operator's transitive label propagation); quality floor = the shared
    // q21 blend ≥ 0.3. The four counts must match Spark's single-pass run.
    Q("q74_curation_summary", (s, dir) => {
      graft.operators.Curation.run(table(s, dir, "documents")).summary
    }, Some {
      val sh3 = s"list_distinct(list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' ')))"
      val mh = (0 until 6).map(j =>
        s"list_min(list_transform(sh, x -> md5('$j:' || x))) AS mh_$j").mkString(", ")
      s"""
      WITH RECURSIVE surv AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($NORM)),
      ssh AS (
        SELECT d.doc_id, $sh3 AS sh FROM documents d JOIN surv USING (doc_id)),
      sig AS (
        SELECT doc_id,
          md5(mh_0 || '|' || mh_1) AS b0,
          md5(mh_2 || '|' || mh_3) AS b1,
          md5(mh_4 || '|' || mh_5) AS b2
        FROM (SELECT doc_id, $mh FROM ssh)),
      ver AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM sig a JOIN sig b
          ON a.doc_id < b.doc_id AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2)
        JOIN ssh sa ON sa.doc_id = a.doc_id
        JOIN ssh sb ON sb.doc_id = b.doc_id
        WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / CAST(len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          >= 0.5),
      undir AS (SELECT da AS a, db AS b FROM ver UNION SELECT db, da FROM ver),
      reach(s, t) AS (
        SELECT a, b FROM undir
        UNION
        SELECT r.s, u.b FROM reach r JOIN undir u ON r.t = u.a),
      kept AS (
        -- component minima: docs with no SMALLER doc reachable in the
        -- verified near-dup graph (true transitive collapse)
        SELECT doc_id FROM surv
        WHERE doc_id NOT IN (SELECT s FROM reach WHERE t < s)),
      cur AS (
        SELECT k.doc_id FROM kept k JOIN documents d USING (doc_id)
        WHERE $QUALITY_SQL >= 0.3)
      SELECT
        (SELECT COUNT(*) FROM documents) AS n_input,
        (SELECT COUNT(*) FROM surv) AS n_after_exact_dedup,
        (SELECT COUNT(*) FROM kept) AS n_after_near_dedup,
        (SELECT COUNT(*) FROM cur) AS n_curated"""
    }),

    // ---- Transitive canonical collapse (connected components) -------------
    // Inline pair fixture holding a 4-chain with a branch — the shape where
    // a one-pass min(doc_a)-per-doc_b collapse misattributes (3→2, 4→3,
    // 5→2). The operator's pointer-doubling label propagation must resolve
    // every doc to its component MINIMUM; the oracle computes true
    // connected components via a recursive transitive closure.
    Q("q79_transitive_collapse", (s, _) => {
      import s.implicits._
      val ids = (1L to 8L).toDF("doc_id")
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L), (6L, 7L))
        .toDF("doc_a", "doc_b")
      graft.operators.Dedup.collapseToCanonical(ids, pairs, "doc_id")
        .select(col("doc_id"), col("canonical_id"))
    }, Some("""
      WITH RECURSIVE
      edges(a, b) AS (SELECT * FROM (VALUES (1,2),(2,3),(3,4),(2,5),(6,7))),
      undir AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      reach(s, t) AS (
        SELECT a, b FROM undir
        UNION
        SELECT r.s, u.b FROM reach r JOIN undir u ON r.t = u.a),
      docs(doc_id) AS (SELECT unnest(generate_series(1, 8))),
      canon AS (SELECT s AS doc_id, MIN(t) AS m FROM reach GROUP BY s)
      SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        CAST(COALESCE(LEAST(c.m, d.doc_id), d.doc_id) AS BIGINT) AS canonical_id
      FROM docs d LEFT JOIN canon c USING (doc_id)""")),

    // ---- Repeated-n-gram ratio (Gopher-style repetition signal) ----------
    // Map-side per-doc ratio over trigram shingles; aggregate per source
    // with an exact-decimal sum and a boilerplate threshold count.
    Q("q71_repetition", (s, dir) => {
      table(s, dir, "documents")
        // stage the shingle array: CollapseProject keeps multi-referenced
        // non-cheap aliases materialized, so it computes once per row
        .withColumn("__sh", shingles(col("text"), 3))
        .withColumn("rep", repetitionRatioOf(col("__sh")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(col("rep").cast("decimal(18,6)")).cast("double").as("sum_rep"),
          sum(when(col("rep") > 0.2, 1L).otherwise(0L)).as("n_repetitive"))
    }, Some {
      val sh = s"list_transform(generate_series(1, GREATEST(len($TOKS)-2, 0)), i -> array_to_string(($TOKS)[i:i+2], ' '))"
      val rep = s"""CASE WHEN len(sh) <= 0 THEN 0.0
        ELSE ${Registry.sroundSql("1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE)", 6)} END"""
      s"""
      SELECT source, COUNT(*) AS n,
        CAST(SUM(CAST(rep AS DECIMAL(18,6))) AS DOUBLE) AS sum_rep,
        CAST(SUM(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
      FROM (SELECT source, $rep AS rep
            FROM (SELECT source, $sh AS sh FROM documents))
      GROUP BY source"""
    }))

  /** Once-per-(process, sfDir) bucketed materialization of `documents` —
    * q80's fixture write. Pid-scoped path so concurrent drivers can't
    * clobber each other; memoized so repeated Verify/Bench invocations of
    * q80 time the metadata-pruned READ, not a rewrite. */
  private val bucketedWritten =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bucketedDocs(s: org.apache.spark.sql.SparkSession, dir: String): String =
    bucketedWritten.computeIfAbsent(dir, d => {
      // the readable sanitized name is lossy ('/a/sf-1' and '/a/sf_1' both
      // sanitize to 'a_sf_1'); the md5 of the RAW dir disambiguates, so two
      // distinct source dirs can never clobber one bucketed table
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-q80-" +
        s"${ProcessHandle.current().pid()}/" +
        s"${d.replaceAll("[^A-Za-z0-9.]", "_")}-$digest/docs"
      graft.sources.Warehouse.writeBucketed(table(s, d, "documents"), out, "doc_id")
      out
    })

  // ---- Deterministic sampling / splitting (reproducibility primitives) ----
  private def samplingQueries: Seq[Q] = {
    import graft.operators.Sampling
    Seq(
      // Keyed hash sampling: same rows on every engine/rerun/partitioning —
      // the oracle recomputes the identical md5 bucket and must select the
      // identical subset (count AND id-sum per group).
      Q("q69_deterministic_sample", (s, dir) => {
        Sampling.sample(table(s, dir, "documents"), "doc_id", 0.25)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
      }, Some(s"""
        SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents
        WHERE ${Sampling.hashBucketSql("doc_id")} < ${Sampling.BUCKETS / 4}
        GROUP BY source""")),

      // Bucketed-sample round trip: hashBucket materialized as a partition
      // layout at write (Warehouse.writeBucketed), then a fraction-0.1
      // sample read back through the METADATA-pruned path — must select
      // exactly the rows the expression-filter sample selects (same md5
      // arithmetic the oracle recomputes). The pruning itself is asserted
      // plan-level in WarehouseSpec; here the gate is end-to-end equality.
      // The WRITE is once-per-(process, sfDir) fixture setup — the operator
      // exists to amortize one ingest-time write across many sampled
      // reads, so the benched/timed body is the metadata-pruned READ (the
      // thing a user actually repeats). The first Bench pass pays the
      // write; min-of-interleaved-passes then reports the read path.
      Q("q80_bucketed_sample", (s, dir) => {
        graft.sources.Warehouse
          .sampleBucketed(s, bucketedDocs(s, dir), 0.1)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
      }, Some(s"""
        SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM documents
        WHERE ${Sampling.hashBucketSql("doc_id")} < ${Sampling.BUCKETS / 10}
        GROUP BY source""")),

      // Deterministic shuffle: seeded-md5 permutation, hash-range shards
      // assigned map-side, ONE exchange + in-partition sort (never a global
      // sort). The pos-weighted id sum is a permutation-sensitive checksum:
      // any row in the wrong shard OR wrong position changes it, so the
      // oracle (which re-derives the full permutation from scratch) pins
      // the exact order, not just membership.
      Q("q102_deterministic_shuffle", (s, dir) => {
        Sampling.deterministicShuffle(
            table(s, dir, "documents").select(col("doc_id"), col("source")),
            "doc_id", nShards = 8, seed = "s42")
          .groupBy(col("shard"))
          .agg(count(lit(1)).as("n"),
            sum(col("doc_id")).as("sum_ids"),
            sum(col("pos") * col("doc_id")).as("perm_checksum"),
            max(col("pos")).cast("long").as("max_pos"))
      }, Some("""
        WITH h AS (
          SELECT doc_id, md5('3:s42:' || CAST(doc_id AS VARCHAR)) AS hh
          FROM documents),
        p AS (
          SELECT doc_id, hh,
            CAST(CAST(('0x' || substr(hh, 1, 4)) AS BIGINT) * 8 // 65536 AS INT) AS shard
          FROM h),
        o AS (
          SELECT shard, doc_id,
            row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1 AS pos
          FROM p)
        SELECT shard, COUNT(*) AS n,
          CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
          CAST(SUM(pos * doc_id) AS BIGINT) AS perm_checksum,
          CAST(MAX(pos) AS BIGINT) AS max_pos
        FROM o GROUP BY shard""")),

      // Shuffle → pack: the full batch-preparation composition. Packing in
      // SHUFFLED order gives bins that are random document mixes (training
      // batches) instead of q76's id-adjacent runs. The oracle re-derives
      // the permutation AND the per-shard running-sum fill from scratch;
      // the order checksum pins that bins were filled in exactly the
      // shuffled order, not merely with the same membership.
      Q("q103_shuffle_pack", (s, dir) => {
        val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
        val shuffled = Sampling.deterministicShuffle(
          docs, "doc_id", nShards = 8, seed = "s42")
        graft.operators.Packing
          .assignBinsOrdered(shuffled, "text", "shard", "pos", maxTokens = 500L)
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("sum_tokens"),
            sum(col("pos") * col("doc_id")).as("order_checksum"))
      }, Some {
        val ntok = s"CASE WHEN len($NORM)=0 THEN 0 ELSE len($TOKS) END"
        s"""
        WITH h AS (
          SELECT doc_id, md5('3:s42:' || CAST(doc_id AS VARCHAR)) AS hh,
            $ntok AS n_tokens
          FROM documents),
        p AS (
          SELECT doc_id, hh, n_tokens,
            CAST(CAST(('0x' || substr(hh, 1, 4)) AS BIGINT) * 8 // 65536 AS INT) AS shard
          FROM h),
        o AS (
          SELECT shard, doc_id, n_tokens,
            row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id) - 1 AS pos
          FROM p),
        c AS (
          SELECT shard, pos, doc_id, n_tokens,
            CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) - n_tokens) / 500.0) AS BIGINT) AS bin
          FROM o)
        SELECT shard, bin, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
          CAST(SUM(pos * doc_id) AS BIGINT) AS order_checksum
        FROM c GROUP BY shard, bin"""
      }),

      // Exact-count stratified sample: exactly 30 docs per source, the n
      // lowest-md5 keys of each group — the eval-set primitive, where a
      // rate sample cannot promise exact counts. The id sum pins WHICH 30.
      Q("q106_stratified_exact", (s, dir) => {
        Sampling.sampleExactPerGroup(
            table(s, dir, "documents"), "doc_id", "source", n = 30)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
      }, Some("""
        SELECT source, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM (SELECT source, doc_id,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
              FROM documents
              -- mirror the operator's NULL-key exclusion: a NULL key has
              -- no md5 identity; NULLS-LAST ranking would otherwise admit
              -- such rows in groups smaller than n
              WHERE doc_id IS NOT NULL)
        WHERE rn <= 30
        GROUP BY source""")),

      // Train/val/test split by hash bucket: disjoint, exhaustive, stable.
      // The oracle's CASE arms derive from the same weights constant the
      // operator defaults to, so the two can never drift.
      Q("q70_hash_split", (s, dir) => {
        Sampling.withSplit(table(s, dir, "documents"), "doc_id")
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"))
      }, Some {
        val arms = Sampling.defaultSplitWeights.init
          .zip(Sampling.splitCuts(Sampling.defaultSplitWeights).init)
          .map { case ((label, _), cut) => s"WHEN b < $cut THEN '$label'" }
          .mkString(" ")
        s"""
        SELECT CASE $arms ELSE '${Sampling.defaultSplitWeights.last._1}' END AS split,
          COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM (SELECT doc_id, ${Sampling.hashBucketSql("doc_id")} AS b FROM documents)
        GROUP BY 1"""
      }))
  }
}
