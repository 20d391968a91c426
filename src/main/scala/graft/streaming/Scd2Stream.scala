package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.cdc.Scd2

/** Incremental (stateful) SCD2 — SURVEY §7.3 "hard part #1".
  *
  * The reference recomputes its SCD2 dimension from the whole lake on every
  * query (batch recompute = the parity bar, served by [[graft.cdc.Scd2]]).
  * This is the streaming upgrade: `flatMapGroupsWithState` keyed by the
  * business key, state = the single open version per key, emitting each
  * version row exactly when it closes (plus the open version with the
  * sentinel expiration on every update).
  *
  * Ordering: events within a micro-batch are sorted by LSN before folding;
  * cross-batch regressions (an LSN older than the state's) are dropped —
  * the at-least-once dedup upstream ([[Landing.dedupWithinWatermark]])
  * makes genuine regressions impossible short of a source rewind.
  *
  * Scale shape: state is O(live keys) × one row; the shuffle is the same
  * hash-by-key exchange the batch window needs. State expires via
  * processing-time timeout only if `ttl` is set (dimension keys are
  * usually kept forever).
  */
object Scd2Stream {

  /** One decoded change event (the orders-fixture payload shape). */
  case class Change(id: Long, status: Option[String],
                    totalprice: Option[Double], operation_type: String,
                    log_seq_num: Long, source_timestamp: Timestamp)

  /** One emitted SCD2 version row. `closed` marks rows that can never change
    * again (their expiration is final); open rows carry the sentinel and are
    * re-emitted (upserted) as their key evolves.
    */
  case class Version(id: Long, status: Option[String],
                     totalprice: Option[Double],
                     row_valid_start_timestamp: Timestamp,
                     row_valid_expiration_timestamp: Timestamp,
                     closed: Boolean)

  /** Open-version state per key: the last event seen. */
  case class KeyState(status: Option[String], totalprice: Option[Double],
                      start: Timestamp, lsn: Long, versions: Long)

  val sentinel: Timestamp = Timestamp.valueOf("9999-01-01 00:00:00")

  /** Fold a batch of events for one key into emitted versions + new state.
    * Exposed for direct unit testing of the pure state transition.
    */
  def foldKey(id: Long, events: Seq[Change], prior: Option[KeyState])
      : (Seq[Version], Option[KeyState]) = {
    val ordered = events.filter(e => prior.forall(_.lsn < e.log_seq_num))
      .sortBy(_.log_seq_num)
    if (ordered.isEmpty) return (Nil, prior)

    val out = Seq.newBuilder[Version]
    var state = prior
    ordered.foreach { e =>
      state.foreach { s =>
        out += Version(id, s.status, s.totalprice, s.start,
          e.source_timestamp, closed = true)
      }
      state = Some(KeyState(e.status, e.totalprice, e.source_timestamp,
        e.log_seq_num, state.map(_.versions).getOrElse(0L) + 1))
    }
    // Re-emit the open version (sentinel expiration) — downstream upserts it.
    state.foreach { s =>
      out += Version(id, s.status, s.totalprice, s.start, sentinel,
        closed = false)
    }
    (out.result(), state)
  }

  private def stateFunc(id: Long, events: Iterator[Change],
                        state: GroupState[KeyState]): Iterator[Version] = {
    val (versions, next) =
      foldKey(id, events.toSeq, if (state.exists) Some(state.get) else None)
    next.foreach(state.update)
    versions.iterator
  }

  /** Wire the stateful transform over a streaming (or batch) Dataset. */
  def versions(changes: Dataset[Change]): Dataset[Version] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(stateFunc)
  }

  /** Batch-parity helper: the streamed versions of a *complete* change log
    * must equal the batch [[Scd2.scd2]] output restricted to multi-event
    * keys. Used by the spec; also a convenient materialized view.
    */
  def batchEquivalent(spark: SparkSession, changes: Dataset[Change]) = {
    Scd2.scd2(changes.toDF(), "id", "log_seq_num", "source_timestamp",
      Seq("status", "totalprice"))
  }

  /** Merge one micro-batch of emitted [[Version]] rows into a parquet
    * dimension at `dimPath`: existing rows superseded by a new emission for
    * the same (id, start) are replaced; everything else is kept.
    *
    * This is MERGE-into-parquet without a table format: read + anti-by-key +
    * union + atomic directory swap. On a real deployment use Delta/Iceberg
    * `MERGE` (row-level upsert, no full rewrite); the logic — new emission
    * wins per (id, row_valid_start_timestamp) — is identical. Rewrite cost
    * is bounded because closed versions never re-emit: steady-state churn is
    * one open row per changed key per batch.
    */
  def upsertBatch(spark: SparkSession, batch: Dataset[Version],
                  dimPath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Paths.get(dimPath)
    if (batch.isEmpty) return
    // Distributed merge (no collect): union existing + incoming with a
    // priority tag, keep the incoming row per (id, start) via one window.
    val incoming = batch.toDF().withColumn("__p", lit(1))
    val merged = (if (java.nio.file.Files.exists(dir))
        spark.read.parquet(dimPath).withColumn("__p", lit(0))
          .unionByName(incoming)
      else incoming)
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("id"), col("row_valid_start_timestamp"))
          .orderBy(col("__p").desc)))
      .filter(col("__r") === 1).drop("__p", "__r")
    // Write-then-swap: the read path can't be overwritten mid-read.
    val tmp = dimPath + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), dir)
  }

  /** Wire the full incremental pipeline: change stream → stateful versions →
    * foreachBatch dimension upsert.
    */
  def dimensionStream(changes: Dataset[Change], dimPath: String,
                      checkpoint: String) =
    versions(changes).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Version], _: Long) =>
        upsertBatch(batch.sparkSession, batch, dimPath)
      }
      .start()
}
