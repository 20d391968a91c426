package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once streaming UPSERT into a manifest table, published as a
  * Delta transaction log after every batch — the end of the CDC pipeline
  * the reference assembles from Kafka-Connect + DuckDB views (reference
  * `README.md:86-125`), re-expressed as one Structured Streaming sink:
  * change batches land as MERGEs, every committed batch becomes a delta
  * version any foreign engine can read, and both sides are replay-proof.
  *
  * Exactly-once anatomy (each leg idempotent on its own, so any crash
  * point replays clean under foreachBatch's at-least-once contract):
  *  1. [[MergeInto.mergeBatch]] with `txnId = batchId` — a replayed
  *     batch at-or-below the manifest's `__lastTxn` high-water mark is
  *     skipped before any read or write (one manifest probe).
  *  2. [[DeltaExport.export]] — diff-based and idempotent: an unchanged
  *     live set publishes nothing; the batch's txn progress is recorded
  *     in the log as a protocol `txn` action, so a restarted stream can
  *     recover its position from the DELTA side too
  *     ([[DeltaExport.lastTxn]]), not just from Spark's checkpoint.
  *
  * Scale shape: per batch, one MERGE over the touched buckets (the
  * standard table-format streaming-upsert cost) plus O(changed files) of
  * driver-side log JSON; checkpoint compaction keeps replay O(interval)
  * no matter how many batches ever ran.
  */
object DeltaSink {

  /** The foreachBatch body, callable directly for batch backfills.
    * Returns the delta version holding the batch (the current head when
    * the batch was a replay).
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, root: String,
      keyCol: String, batchId: Long, numBuckets: Int = 64,
      deleteCol: Option[String] = None,
      checkpointInterval: Int = 10,
      changeData: Boolean = false): Long = {
    MergeInto.mergeBatch(spark, batch, root, keyCol, numBuckets,
      deleteCol, txnId = Some(batchId))
    DeltaExport.export(spark, root, checkpointInterval,
      changeDataKey = if (changeData) Some(keyCol) else None)._1
  }

  /** Wire a streaming DataFrame of upserts into the sink. `keyCol` must
    * be unique per batch (MERGE refuses ambiguous sources loudly). With
    * `changeData` each batch also publishes its row-level diff as the
    * protocol's change data feed ([[DeltaExport.readChanges]]).
    */
  def start(changes: DataFrame, root: String, keyCol: String,
      checkpointLocation: String, numBuckets: Int = 64,
      deleteCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      changeData: Boolean = false): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch.sparkSession, batch, root, keyCol, batchId,
          numBuckets, deleteCol, changeData = changeData)
        ()
      }
      .start()
}
