package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once streaming UPSERT into a manifest table, published as an
  * ICEBERG snapshot after every batch — the [[DeltaSink]] twin for the
  * second table format (reference analog: the lake-consumer role of
  * `README.md:86-125`, with the export a standard table format instead
  * of bare files).
  *
  * Exactly-once anatomy, each leg idempotent under foreachBatch's
  * at-least-once contract:
  *  1. [[MergeInto.mergeBatch]] with `txnId = batchId` — a replayed
  *     batch at-or-below the manifest's `__lastTxn` high-water mark is
  *     skipped before any read or write.
  *  2. [[IcebergExport.export]] — idempotent on the manifest version:
  *     an unchanged snapshot (same `graft.manifest-version` summary,
  *     same schema) publishes nothing, so a replayed export cannot mint
  *     a duplicate Iceberg snapshot.
  *
  * Scale shape: per batch, one MERGE over the touched buckets plus one
  * manifest rewrite (O(live files) metadata, carried counts/stats — no
  * data scan); [[IcebergExport.expireSnapshots]] is the maintenance
  * cadence that bounds metadata growth, exactly as a real Iceberg
  * streaming table runs it.
  */
object IcebergSink {

  /** The foreachBatch body, callable directly for batch backfills.
    * Returns the iceberg snapshot id holding the batch (the current
    * head when the batch was a replay).
    */
  def upsertBatch(spark: SparkSession, batch: DataFrame, root: String,
      keyCol: String, batchId: Long, numBuckets: Int = 64,
      deleteCol: Option[String] = None): Long = {
    MergeInto.mergeBatch(spark, batch, root, keyCol, numBuckets,
      deleteCol, txnId = Some(batchId))
    IcebergExport.export(spark, root)._1
  }

  /** Wire a streaming DataFrame of upserts into the sink. `keyCol` must
    * be unique per batch (MERGE refuses ambiguous sources loudly).
    */
  def start(changes: DataFrame, root: String, keyCol: String,
      checkpointLocation: String, numBuckets: Int = 64,
      deleteCol: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch.sparkSession, batch, root, keyCol, batchId,
          numBuckets, deleteCol)
        ()
      }
      .start()
}
