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
}
