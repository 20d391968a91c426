package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The container has no image/audio codecs, so the *byte-level decode* is a
  * clearly-marked deterministic STUB ([[StubCodec]]) — everything around it
  * (schema, case-class Encoders, mapPartitions batch shape, partitioning,
  * the explode-based frame sampler) is real, tested Spark plumbing. Swap
  * [[StubCodec.decode]] for a JNI/javacv call and nothing else changes.
  *
  * Scale shape: decode runs as `mapPartitions` (one codec init per
  * partition, not per row — the same batching rationale as arrow-batched
  * Python UDFs); binary payloads stay columnar in parquet and are never
  * shuffled — features are extracted before any wide operation.
  */
object Media {

  /** One media row: opaque bytes + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, mime: String,
                      content: Array[Byte])

  /** Extracted features (decode output). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           sample_rate: Int)

  /** STUB codec — a pure, deterministic stand-in for the real byte decoder.
    * Derives fake dimensions from the byte length so results are stable and
    * oracle-checkable. Replace `decode` with a real codec in production.
    */
  object StubCodec {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val n = bytes.length
      kind match {
        case "image" => ((n % 512) + 1, ((n / 512) % 512) + 1, 1, 0)
        case "video" => ((n % 512) + 1, ((n / 512) % 512) + 1, (n % 32) + 1, 0)
        case _       => (0, 0, 0, 8000 + (n % 8) * 4000) // audio
      }
    }
  }

  /** Build a media table from the `documents` fixture: content = UTF-8 bytes
    * of the text, kind assigned round-robin — a stand-in for a real
    * `binary`-column parquet corpus.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** Decode + feature-extract via mapPartitions: codec state initializes once
    * per partition; rows stream through without materializing the partition.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init here, once per partition
      rows.map { r =>
        val (w, h, frames, rate) = StubCodec.decode(r.kind, r.content)
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, w, h,
          frames, rate)
      }
    }
  }

  /** Resize stage (stub): clamps decoded dims to a bounding box, preserving
    * the metadata flow; a real implementation would transcode `content`.
    */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF().select(
      col("media_id"), col("kind"),
      least(col("width"), lit(maxDim)).as("out_width"),
      least(col("height"), lit(maxDim)).as("out_height"))

  /** Frame sampler: every `step`-th frame index per video — explode-based,
    * so sampling is narrow and parallel (no per-video collect).
    */
  def sampleFrames(features: Dataset[MediaFeatures], step: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step)))
          .as("frame_idx"))

  /** Byte-exact content dedup on the opaque binary column — the
    * content-hash pass every multimodal pipeline runs before any decode
    * (distinct from text dedup: this hashes the RAW bytes, no
    * normalization, so two files differing in one byte are different).
    * One hash shuffle; the binary payload itself never shuffles — only the
    * 16-byte digest does.
    */
  def contentDuplicateGroups(media: Dataset[MediaRow]): DataFrame =
    media.toDF()
      .groupBy(md5(col("content")).as("content_fp"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
}
