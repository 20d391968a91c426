package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.media.Media

/** Multimodal queries: the media table derives from `documents` (content =
  * UTF-8 bytes), decode is the documented stub, but the oracle can still
  * verify the whole pipeline because the stub is a pure function of byte
  * length — which DuckDB computes as `strlen(text)` (ASCII corpus).
  */
object MediaQueries {

  private def features(s: SparkSession, dir: String) =
    Media.extractFeatures(
      Media.mediaFromDocuments(Tables(s, dir, "documents")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "mm1_media_features" -> ((s, dir) =>
      features(s, dir).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("width"),
          col("height"), col("n_frames"), col("sample_rate"))
        .orderBy(col("media_id"))),

    "mm2_frame_sample" -> ((s, dir) =>
      Media.sampleFrames(features(s, dir), step = 4)
        .orderBy(col("media_id"), col("frame_idx"))),

    "mm3_resize_meta" -> ((s, dir) =>
      Media.resizeMeta(features(s, dir), maxDim = 256)
        .orderBy(col("media_id"))),

    // Byte-exact content dedup on the binary column (raw bytes, no text
    // normalization — a different contract than dd1).
    "mm4_content_dedup" -> ((s, dir) =>
      Media.contentDuplicateGroups(
          Media.mediaFromDocuments(Tables(s, dir, "documents")))
        .orderBy(col("content_fp")))
  )

  /** `kind` mapping mirror: doc_id % 3 → 1=image, 2=audio, 0(+3)=video
    * (element_at is 1-based on [image, audio, video]).
    */
  private val kindSql =
    "(['image','audio','video'])[(doc_id % 3 + 1)::INT]"

  private val featuresCte = s"""
    WITH f AS (
      SELECT doc_id AS media_id, $kindSql AS kind,
        strlen(text) AS n_bytes,
        CASE WHEN $kindSql IN ('image','video')
          THEN (strlen(text) % 512) + 1 ELSE 0 END AS width,
        CASE WHEN $kindSql IN ('image','video')
          THEN ((strlen(text) // 512) % 512) + 1 ELSE 0 END AS height,
        CASE WHEN $kindSql = 'image' THEN 1
             WHEN $kindSql = 'video' THEN (strlen(text) % 32) + 1
             ELSE 0 END AS n_frames,
        CASE WHEN $kindSql = 'audio'
          THEN 8000 + (strlen(text) % 8) * 4000 ELSE 0 END AS sample_rate
      FROM documents
    )"""

  val oracleSql: Map[String, String] = Map(
    "mm1_media_features" -> s"""
      $featuresCte
      SELECT media_id, kind, n_bytes, width, height, n_frames, sample_rate
      FROM f ORDER BY media_id""",

    "mm2_frame_sample" -> s"""
      $featuresCte
      SELECT media_id, unnest(range(0, n_frames, 4)) AS frame_idx
      FROM f WHERE kind = 'video' ORDER BY media_id, frame_idx""",

    "mm3_resize_meta" -> s"""
      $featuresCte
      SELECT media_id, kind, least(width, 256) AS out_width,
             least(height, 256) AS out_height
      FROM f ORDER BY media_id""",

    // content = UTF-8 bytes of text, and DuckDB's md5(VARCHAR) hashes the
    // string's UTF-8 bytes — byte-identical input to Spark's md5(BINARY).
    "mm4_content_dedup" -> """
      SELECT md5(text) AS content_fp, min(doc_id) AS keep_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY 1 ORDER BY content_fp"""
  )
}
