package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.media.Media

/** Multimodal queries over the media table derived from `documents`.
  *
  * Image rows carry REAL PNG bytes and go through a real `ImageIO` decode
  * ([[graft.media.Media.DeterministicPng]]); audio rows carry REAL PCM WAVE
  * bytes re-parsed by `javax.sound.sampled`
  * ([[graft.media.Media.DeterministicWav]]) — both generators are pure
  * functions of `strlen(text)`, so DuckDB predicts the decoded dims, probe
  * pixels, sample rate, frame count, and first/last PCM samples
  * arithmetically: the oracles verify genuine encode→decode round-trips
  * without parsing the containers. Video rows carry REAL multi-frame
  * animated-GIF bytes decoded by the JDK's own GIF reader
  * ([[graft.media.Media.DeterministicGif]]) — all three modalities now
  * round-trip through genuine codecs.
  *
  * The PNG container's byte size is codec-internal (filter choices, zlib),
  * so `n_bytes` and the raw content hash are NOT oracle-expressible for
  * image rows: mm1 gates the decoded features instead of n_bytes, and mm4
  * gates dedup group structure (keep_id, n_copies) rather than fingerprint
  * values — group membership is still byte-exact, because identical text
  * yields identical PNG bytes and differing text yields differing pixels.
  */
object MediaQueries {

  private def features(s: SparkSession, dir: String) =
    Media.extractFeatures(Media.mediaTable(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mm1_media_features" -> ((s, dir) =>
      features(s, dir).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("n_frames"), col("sample_rate"), col("px00"), col("px_corner"))
        .orderBy(col("media_id"))),

    "mm2_frame_sample" -> ((s, dir) =>
      Media.sampleFrames(features(s, dir), step = 4)
        .orderBy(col("media_id"), col("frame_idx"))),

    "mm3_resize_meta" -> ((s, dir) =>
      Media.resizeMeta(features(s, dir), maxDim = 256)
        .orderBy(col("media_id"))),

    // Per-frame DECODE of the sampled frames (mm2 gates only the index
    // arithmetic; this gates the pixels a real frame-extraction stage
    // reads): every 4th frame of every video is rendered by the GIF
    // reader and probed at two corners.
    "mm5_frame_pixels" -> ((s, dir) =>
      Media.sampleFramePixels(Media.mediaTable(s, dir), step = 4)
        .toDF().orderBy(col("media_id"), col("frame_idx"))),

    // REAL nearest-neighbor resize to 8×8 over the decoded PNG raster —
    // the actual pixel work mm3's metadata stage fronts. The oracle
    // re-derives every sampled pixel from the generator formula at the
    // same (ox·w div 8, oy·h div 8) coordinates.
    "mm9_resize_pixels" -> ((s, dir) =>
      Media.resizePixels(Media.mediaTable(s, dir), outDim = 8)
        .toDF().orderBy(col("media_id"))),

    // AUGMENTATION over the real decode: center-crop to the square
    // min(w,h), horizontal flip, 4×4 nearest-neighbor resample — the
    // deterministic skeleton of a vision loader's random-resized-crop +
    // flip. The oracle recomputes every sampled pixel at the FLIPPED
    // coordinates (x0 + m-1 - ox·m div 4), so a wrong crop offset or an
    // unflipped axis hash-mismatches.
    "mm12_augment_pixels" -> ((s, dir) =>
      Media.augmentPixels(Media.mediaTable(s, dir), outDim = 4)
        .toDF().orderBy(col("media_id"))),

    // SCENE-CUT detection over the real multi-frame decode: every frame's
    // probe luminance (gray frames: packed RGB / 65793), LAG delta per
    // video, cut = |Δ| > 128 — the frame-segmentation pass a video
    // curation pipeline runs before sampling. Decode is mapPartitions
    // (bytes never shuffle); the per-video window partitions on media_id
    // (frames-per-video bounded). Integer-only arithmetic; the oracle
    // recomputes luminance from the deterministic generator formula.
    "mm8_scene_cuts" -> ((s, dir) => {
      val frames = Media.sampleFramePixels(Media.mediaTable(s, dir),
        step = 1).toDF()
        .select(col("media_id"), col("frame_idx"),
          (col("px00") / 65793).cast("long").as("gray"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("delta", abs(col("gray") - lag(col("gray"), 1).over(w)))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("delta") > 128, 1L).otherwise(0L)).as("n_cuts"),
          coalesce(min(when(col("delta") > 128,
            col("frame_idx").cast("long"))), lit(-1L)).as("first_cut"))
        .orderBy(col("media_id"))
    }),

    // Windowed audio features off the REAL WAV decode: 64-sample RMS
    // energy + zero-crossing counts per window — integer sums + one
    // division + one sqrt, so bit-exact cross-engine with no grid.
    "mm6_audio_windows" -> ((s, dir) =>
      Media.audioWindowFeatures(Media.mediaTable(s, dir), win = 64)
        .toDF().orderBy(col("media_id"), col("win_idx"))),

    // ENERGY-GATED VOICE-ACTIVITY segments over the REAL WAV decode: a
    // window is "active" when its mm6 RMS (exact integer sum-of-squares,
    // two correctly-rounded IEEE ops — bit-identical cross-engine, so the
    // 17000.0 threshold comparison is deterministic) clears the gate;
    // consecutive active windows merge into segments via the classic
    // gaps-and-islands key (win_idx − ROW_NUMBER, both per-media bounded
    // windows). The VAD shape every speech-corpus pipeline runs before
    // transcription — emitted as (segment, start, end, counts), never the
    // samples.
    "mm10_vad_segments" -> ((s, dir) => {
      val byMedia = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_id"))
      val w = Media.audioWindowFeatures(Media.mediaTable(s, dir), win = 64)
        .toDF()
      w.filter(col("rms") > 17000.0d)
        .withColumn("rn",
          row_number().over(byMedia.orderBy(col("win_idx"))))
        .withColumn("island", col("win_idx") - col("rn"))
        .groupBy(col("media_id"), col("island"))
        .agg(min(col("win_idx")).as("start_win"),
          max(col("win_idx")).as("end_win"),
          count(lit(1)).as("n_windows"),
          sum(col("n_samples")).as("n_samples"))
        .withColumn("seg_idx",
          row_number().over(byMedia.orderBy(col("start_win"))))
        .select(col("media_id"), col("seg_idx"), col("start_win"),
          col("end_win"), col("n_windows"), col("n_samples"))
        .orderBy(col("media_id"), col("seg_idx"))
    }),

    // SPECTRAL DFT bank over the REAL WAV decode: per 64-sample window,
    // the dominant frequency bin among k = 1..8 cycles/window and its
    // power — the frequency-domain feature mm6's RMS can't give (tone vs
    // hiss vs speech band). Exact integers end-to-end: the 2^-20-grid
    // twiddle table is ONE shared set of literals rendered into both the
    // kernel and this oracle, the bank sums are 64-bit exact, and powers
    // square the 2^20-truncated components (trunc-div matches both
    // engines). See Media.audioSpectralBank.
    "mm11_spectral_bank" -> ((s, dir) =>
      Media.audioSpectralBank(Media.mediaTable(s, dir), win = 64, bins = 8)
        .toDF().orderBy(col("media_id"), col("win_idx"))),

    // Perceptual average-hash over the REAL image decode: the near-dup
    // fingerprint byte-exact dedup (mm4) cannot give — integer-only bits,
    // oracled from the generator formula.
    "mm7_phash" -> ((s, dir) =>
      Media.perceptualHash(Media.mediaTable(s, dir))
        .toDF().orderBy(col("media_id"))),

    // Byte-exact content dedup on the binary column (raw bytes, no text
    // normalization — a different contract than dd1). Output is the group
    // structure; the md5 fingerprint itself stays internal (PNG bytes are
    // not SQL-predictable).
    "mm4_content_dedup" -> ((s, dir) =>
      Media.contentDuplicateGroups(Media.mediaTable(s, dir))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id")))
  )

  /** `kind` mapping mirror: doc_id % 3 → 0=image, 1=audio, 2=video
    * (element-style 1-based index on [image, audio, video]).
    */
  private val kindSql =
    "(['image','audio','video'])[(doc_id % 3 + 1)::INT]"

  /** Mirror of [[graft.media.Media.DeterministicPng]]: seed = strlen(text);
    * dims = (seed%96+16, (seed//96)%96+16); pixel(x,y) packed RGB =
    * ((seed+x)%256)*65536 + ((seed+y)%256)*256 + (seed+x+y)%256.
    */
  private val featuresCte = s"""
    WITH f AS (
      SELECT doc_id AS media_id, $kindSql AS kind,
        strlen(text) AS seed,
        CASE WHEN $kindSql = 'image' THEN (strlen(text) % 96) + 16
             WHEN $kindSql = 'video' THEN (strlen(text) % 24) + 8
             ELSE 0 END AS width,
        CASE WHEN $kindSql = 'image' THEN ((strlen(text) // 96) % 96) + 16
             WHEN $kindSql = 'video' THEN ((strlen(text) // 24) % 24) + 8
             ELSE 0 END AS height,
        CASE WHEN $kindSql = 'image' THEN 1
             WHEN $kindSql = 'audio' THEN (strlen(text) % 480) + 32
             WHEN $kindSql = 'video' THEN (strlen(text) % 12) + 2
             ELSE 0 END AS n_frames,
        CASE WHEN $kindSql = 'audio'
          THEN ([8000, 16000, 22050, 44100])[(strlen(text) % 4 + 1)::INT]
          ELSE 0 END AS sample_rate
      FROM documents
    ), g AS (
      SELECT *,
        CASE WHEN kind = 'image' THEN
          (seed % 256) * 65536 + (seed % 256) * 256 + (seed % 256)
        WHEN kind = 'audio' THEN
          ((seed * 31) % 65536) - 32768
        WHEN kind = 'video' THEN
          -- gray(seed, f=0, x=0, y=0) on the 256-gray palette, packed RGB
          (seed % 256) * 65793
        ELSE 0 END AS px00,
        CASE WHEN kind = 'image' THEN
            ((seed + width - 1) % 256) * 65536
          + ((seed + height - 1) % 256) * 256
          + ((seed + width + height - 2) % 256)
        WHEN kind = 'audio' THEN
          ((seed * 31 + (n_frames - 1) * 17) % 65536) - 32768
        WHEN kind = 'video' THEN
          -- gray(seed, last frame, w-1, h-1), packed RGB
          ((seed + 7 * (n_frames - 1) + (width - 1) + 2 * (height - 1))
            % 256) * 65793
        ELSE 0 END AS px_corner
      FROM f
    )"""

  val oracleSql: Map[String, String] = Map(
    "mm1_media_features" -> s"""
      $featuresCte
      SELECT media_id, kind, width, height, n_frames, sample_rate,
             px00, px_corner
      FROM g ORDER BY media_id""",

    "mm2_frame_sample" -> s"""
      $featuresCte
      SELECT media_id, unnest(range(0, n_frames, 4)) AS frame_idx
      FROM g WHERE kind = 'video' ORDER BY media_id, frame_idx""",

    // gray(seed, f, x, y) = (seed + 7f + x + 2y) % 256 on the 256-gray
    // palette, packed to RGB by * 0x010101.
    "mm9_resize_pixels" -> s"""
      $featuresCte
      , grid AS (
        SELECT media_id, seed, width, height, unnest(range(0, 8)) AS oy
        FROM f WHERE kind = 'image'
      ), cells AS (
        SELECT media_id, seed, width, height, oy,
          unnest(range(0, 8)) AS ox
        FROM grid
      ), px AS (
        SELECT media_id, ox, oy,
          ((seed + (ox * width) // 8) % 256) * 65536
          + ((seed + (oy * height) // 8) % 256) * 256
          + ((seed + (ox * width) // 8 + (oy * height) // 8) % 256) AS rgb
        FROM cells
      )
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_px,
        CAST(SUM(rgb) AS BIGINT) AS rgb_sum,
        CAST(MAX(CASE WHEN ox = 0 AND oy = 0 THEN rgb END) AS BIGINT)
          AS px00,
        CAST(MAX(CASE WHEN ox = 7 AND oy = 7 THEN rgb END) AS BIGINT)
          AS px_corner
      FROM px GROUP BY media_id ORDER BY media_id""",

    "mm12_augment_pixels" -> s"""
      $featuresCte
      , img AS (
        SELECT media_id, seed, LEAST(width, height) AS m,
          (width - LEAST(width, height)) // 2 AS x0,
          (height - LEAST(width, height)) // 2 AS y0
        FROM f WHERE kind = 'image'
      ), grid AS (
        SELECT media_id, seed, m, x0, y0, unnest(range(0, 4)) AS oy
        FROM img
      ), cells AS (
        SELECT media_id, seed, m, x0, y0, oy, unnest(range(0, 4)) AS ox
        FROM grid
      ), px AS (
        SELECT media_id, m, ox, oy,
          x0 + (m - 1) - (ox * m) // 4 AS xi,
          y0 + (oy * m) // 4 AS yi, seed
        FROM cells
      ), rgbs AS (
        SELECT media_id, m, ox, oy,
          ((seed + xi) % 256) * 65536 + ((seed + yi) % 256) * 256
          + ((seed + xi + yi) % 256) AS rgb
        FROM px
      )
      SELECT media_id, CAST(MAX(m) AS BIGINT) AS crop,
        CAST(COUNT(*) AS BIGINT) AS n_px,
        CAST(SUM(rgb) AS BIGINT) AS rgb_sum,
        CAST(MAX(CASE WHEN ox = 0 AND oy = 0 THEN rgb END) AS BIGINT)
          AS px00,
        CAST(MAX(CASE WHEN ox = 3 AND oy = 3 THEN rgb END) AS BIGINT)
          AS px_corner
      FROM rgbs GROUP BY media_id ORDER BY media_id""",

    "mm5_frame_pixels" -> s"""
      $featuresCte
      SELECT media_id, frame_idx,
        ((seed + 7 * frame_idx) % 256) * 65793 AS px00,
        ((seed + 7 * frame_idx + (width - 1) + 2 * (height - 1)) % 256)
          * 65793 AS px_corner
      FROM (
        SELECT media_id, seed, width, height,
          unnest(range(0, n_frames, 4)) AS frame_idx
        FROM g WHERE kind = 'video'
      ) ORDER BY media_id, frame_idx""",

    // Frame luminance from the generator formula ((seed + 7f) % 256), LAG
    // delta per video, cut = |Δ| > 128 — mirrors the real-decode pipeline.
    "mm8_scene_cuts" -> s"""
      $featuresCte
      , fr AS (
        SELECT media_id, unnest(range(0, n_frames)) AS f,
          (seed + 7 * unnest(range(0, n_frames))) % 256 AS gray
        FROM g WHERE kind = 'video'
      ), d AS (
        SELECT media_id, f,
          abs(gray - LAG(gray) OVER (PARTITION BY media_id ORDER BY f))
            AS delta
        FROM fr
      )
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
        CAST(SUM(CASE WHEN delta > 128 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_cuts,
        COALESCE(MIN(CASE WHEN delta > 128 THEN f END), -1) AS first_cut
      FROM d GROUP BY media_id ORDER BY media_id""",

    // Sampled-grid aHash from the pixel formula: gray(x,y) =
    // ((seed+x)%256) + ((seed+y)%256) + ((seed+x+y)%256) at block centers
    // x=(2k+1)w/16, y=(2j+1)h/16; bit = gray*64 > total (integer
    // cross-multiply, no division).
    "mm7_phash" -> s"""
      $featuresCte
      , px AS (
        SELECT media_id, j * 8 + k AS i,
          ((seed + ((2 * k + 1) * width) // 16) % 256)
            + ((seed + ((2 * j + 1) * height) // 16) % 256)
            + ((seed + ((2 * k + 1) * width) // 16
                + ((2 * j + 1) * height) // 16) % 256) AS gray
        FROM g, (SELECT unnest(range(0, 8)) AS j),
             (SELECT unnest(range(0, 8)) AS k)
        WHERE kind = 'image'
      )
      SELECT media_id,
        CAST(SUM(CASE WHEN i >= 32 AND gray * 64 > tot
          THEN 1::BIGINT << (i - 32) ELSE 0 END) AS BIGINT) AS phash_hi,
        CAST(SUM(CASE WHEN i < 32 AND gray * 64 > tot
          THEN 1::BIGINT << i ELSE 0 END) AS BIGINT) AS phash_lo
      FROM (SELECT *, SUM(gray) OVER (PARTITION BY media_id) AS tot FROM px)
      GROUP BY media_id ORDER BY media_id""",

    // sample(seed, i) = ((seed*31 + i*17) % 65536) - 32768, 64-sample
    // windows; rms = sqrt(sum(s²)/n) is exact-int + two IEEE ops.
    "mm6_audio_windows" -> s"""
      $featuresCte
      , smp AS (
        SELECT media_id, i, CAST(i // 64 AS INT) AS win_idx,
          ((seed * 31 + i * 17) % 65536) - 32768 AS sv
        FROM (
          SELECT media_id, seed, unnest(range(0, n_frames)) AS i
          FROM g WHERE kind = 'audio')
      ), lagged AS (
        SELECT media_id, win_idx, i, sv,
          LAG(sv) OVER (PARTITION BY media_id ORDER BY i) AS prev
        FROM smp
      )
      SELECT media_id, win_idx, COUNT(*) AS n_samples,
        sqrt(CAST(SUM(sv * sv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
          AS rms,
        CAST(SUM(CASE WHEN i % 64 > 0 AND (prev >= 0) != (sv >= 0)
            THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
      FROM lagged GROUP BY media_id, win_idx
      ORDER BY media_id, win_idx""",

    "mm10_vad_segments" -> s"""
      $featuresCte
      , smp AS (
        SELECT media_id, i, CAST(i // 64 AS INT) AS win_idx,
          ((seed * 31 + i * 17) % 65536) - 32768 AS sv
        FROM (
          SELECT media_id, seed, unnest(range(0, n_frames)) AS i
          FROM g WHERE kind = 'audio')
      ), w AS (
        SELECT media_id, win_idx, CAST(COUNT(*) AS BIGINT) AS n_samples,
          sqrt(CAST(SUM(sv * sv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
            AS rms
        FROM smp GROUP BY media_id, win_idx
      ), voiced AS (
        SELECT media_id, win_idx, n_samples,
          win_idx - ROW_NUMBER() OVER (PARTITION BY media_id
            ORDER BY win_idx) AS island
        FROM w WHERE rms > 17000.0
      ), seg AS (
        SELECT media_id, MIN(win_idx) AS start_win, MAX(win_idx) AS end_win,
          CAST(COUNT(*) AS BIGINT) AS n_windows,
          CAST(SUM(n_samples) AS BIGINT) AS n_samples
        FROM voiced GROUP BY media_id, island
      )
      SELECT media_id,
        CAST(ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY start_win)
          AS INT) AS seg_idx,
        start_win, end_win, n_windows, n_samples
      FROM seg ORDER BY media_id, seg_idx""",

    "mm11_spectral_bank" -> s"""
      $featuresCte
      , smp AS (
        SELECT media_id, CAST(i // 64 AS INT) AS win_idx,
          CAST(i % 64 AS INT) AS j,
          ((seed * 31 + i * 17) % 65536) - 32768 AS sv
        FROM (
          SELECT media_id, seed, unnest(range(0, n_frames)) AS i
          FROM g WHERE kind = 'audio')
      ), terms AS (
        SELECT media_id, win_idx, k, sv,
          CAST(sv AS BIGINT) * ct.tab[((k * j) % 64) + 1] AS c_term,
          CAST(sv AS BIGINT) * st.tab[((k * j) % 64) + 1] AS s_term
        FROM smp,
          (SELECT UNNEST(range(1, 9)) AS k),
          (SELECT ${graft.media.Media.CosGrid.mkString("[", ", ", "]")}
             AS tab) ct,
          (SELECT ${graft.media.Media.SinGrid.mkString("[", ", ", "]")}
             AS tab) st
      ), bank AS (
        SELECT media_id, win_idx, CAST(k AS INT) AS k,
          CAST(COUNT(*) AS INT) AS n_samples,
          (CAST(SUM(c_term) AS BIGINT) // 1048576)
            * (CAST(SUM(c_term) AS BIGINT) // 1048576)
          + (CAST(SUM(s_term) AS BIGINT) // 1048576)
            * (CAST(SUM(s_term) AS BIGINT) // 1048576) AS power
        FROM terms GROUP BY 1, 2, 3
      ), ranked AS (
        SELECT *,
          row_number() OVER (PARTITION BY media_id, win_idx
            ORDER BY power DESC, k) AS rk,
          CAST(SUM(power) OVER (PARTITION BY media_id, win_idx)
            AS BIGINT) AS total_power
        FROM bank
      )
      SELECT media_id, win_idx, n_samples, k AS dom_bin,
        CAST(power AS BIGINT) AS dom_power, total_power
      FROM ranked WHERE rk = 1 ORDER BY media_id, win_idx""",

    "mm3_resize_meta" -> s"""
      $featuresCte
      SELECT media_id, kind, least(width, 256) AS out_width,
             least(height, 256) AS out_height
      FROM g ORDER BY media_id""",

    // Group-key mirror of the content generator: PNG, WAV, and GIF bytes
    // are each a pure function of strlen(text), so two rows of the same
    // kind share bytes iff their text LENGTHS are equal. The 'i'/'a'/'v'
    // prefixes keep the key spaces disjoint.
    "mm4_content_dedup" -> """
      SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY CASE WHEN (doc_id % 3) = 0
                    THEN 'i' || strlen(text)::VARCHAR
                    WHEN (doc_id % 3) = 1
                    THEN 'a' || strlen(text)::VARCHAR
                    ELSE 'v' || strlen(text)::VARCHAR END
      ORDER BY keep_id"""
  )
}
