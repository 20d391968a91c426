package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

import graft.dedup.Dedup

/** Streaming corpus ingestion with near-duplicate rejection — the streaming
  * face of [[Dedup.incrementalNearDupDrops]].
  *
  * Each micro-batch is deduplicated (a) against itself with the greedy
  * min-id-wins pass (any verified pair drops its higher id) and (b) against
  * the standing corpus STORE with the asymmetric batch-bands × store-bands
  * join; survivors are APPENDED to the store as an immutable SEGMENT whose
  * visibility is one atomic [[ManifestStore]] commit. The store is
  * therefore append-only parquet with manifest-pointer commits —
  * object-store safe (no directory swaps, no rewrites, and a crash between
  * the segment write and its commit leaves an invisible orphan, never a
  * torn store; contrast the bounded-bucket rewrite [[Scd2Stream]] needs for
  * row-level upserts) — and its accumulated size only ever costs one
  * bucket-keyed shuffle per batch, never a corpus self-join.
  *
  * At production scale the signature computation for the store would be
  * persisted alongside it rather than recomputed per batch; the store side
  * here stays a plain `spark.read.parquet` so the helper has no state
  * beyond the directory itself — a restart resumes from whatever batches
  * committed (at-least-once upstream dedup keeps replays out, same
  * contract as [[Landing]]).
  */
object IncrementalDedupStream {

  /** Survivors of `batch` after within-batch greedy near-dedup and
    * near-dedup against `store`. Pure batch logic, unit-testable.
    */
  def dedupBatch(store: DataFrame, batch: DataFrame, textCol: String,
                 idCol: String, tau: Double, shingleN: Int = 3,
                 bands: Int = 4, rowsPerBand: Int = 3): DataFrame = {
    val withinDrops = Dedup.nearDuplicatePairs(batch, textCol, idCol, tau,
        shingleN, bands, rowsPerBand)
      .select(col("id_b").as(idCol)).distinct()
    val selfClean = batch.join(withinDrops, Seq(idCol), "left_anti")
    val storeDrops = Dedup.incrementalNearDupDrops(store, selfClean,
        textCol, idCol, tau, shingleN, bands, rowsPerBand)
      .withColumnRenamed("batch_id", idCol)
    selfClean.join(storeDrops, Seq(idCol), "left_anti")
  }

  /** Wire a streaming Dataset of documents into an append-only deduped
    * store at `storeDir`. Caller starts the returned writer (and may add
    * a checkpoint location first).
    */
  def writer(docs: DataFrame, storeDir: String, textCol: String,
             idCol: String, tau: Double, shingleN: Int = 3, bands: Int = 4,
             rowsPerBand: Int = 3): DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, storeDir, textCol, idCol, tau, shingleN, bands,
          rowsPerBand)
      }

  /** One micro-batch: dedup against the current store, append survivors as
    * a committed segment. Empty survivor sets commit nothing (no empty
    * segments, no manifest churn).
    */
  def appendBatch(batch: DataFrame, storeDir: String, textCol: String,
                  idCol: String, tau: Double, shingleN: Int, bands: Int,
                  rowsPerBand: Int): Unit = {
    val spark = batch.sparkSession
    val survivors = dedupBatch(readStore(spark, storeDir, batch), batch,
      textCol, idCol, tau, shingleN, bands, rowsPerBand)
    if (survivors.isEmpty) return
    val snap = ManifestStore.latest(spark, storeDir)
    val version = ManifestStore.versionAfter(snap)
    val rel = ManifestStore.dataRel(version)
    survivors.write.mode("errorifexists").parquet(s"$storeDir/$rel")
    val entries = snap.map(_.entries).getOrElse(Map.empty[String, String]) +
      (f"seg$version%020d" -> rel)
    ManifestStore.commit(spark, storeDir, version, entries)
  }

  /** The store's committed state as a DataFrame; empty-with-batch-schema
    * before the first commit.
    */
  def readStore(spark: SparkSession, storeDir: String,
                schemaFrom: DataFrame): DataFrame =
    ManifestStore.readOrEmpty(spark, storeDir, schemaFrom.schema)

  /** Segment compaction — the maintenance pass an append-only store needs:
    * a long-running writer leaves one segment per micro-batch, and every
    * dedup join re-opens all of them. Rewrites the current state as ONE
    * segment committed atomically (readers concurrent with the compaction
    * keep their snapshot; a crash leaves an invisible orphan, exactly like
    * an interrupted append). Rows are untouched — same survivors, fewer
    * files. Run it on a schedule; [[ManifestStore.vacuum]] reclaims the
    * superseded segment files afterwards.
    */
  def compactSegments(spark: SparkSession, storeDir: String): Unit = {
    val snap = ManifestStore.latest(spark, storeDir).getOrElse(return)
    val dataSlots = snap.entries.keys
      .filterNot(ManifestStore.isMetaSlot).toSeq
    if (dataSlots.size <= 1) return // nothing to merge
    val all = ManifestStore.read(spark, storeDir)
    val version = ManifestStore.versionAfter(Some(snap))
    val rel = ManifestStore.dataRel(version)
    all.write.mode("errorifexists").parquet(s"$storeDir/$rel")
    val entries = snap.entries -- dataSlots + (f"seg$version%020d" -> rel)
    ManifestStore.commit(spark, storeDir, version, entries)
  }
}
