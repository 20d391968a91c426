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
    * re-emitted (upserted) as their key evolves. `lsn` is the LSN of the
    * event that OPENED this version: it distinguishes two versions of one
    * key that share a start timestamp (rapid CDC updates inside the same
    * millisecond — distinct LSNs, equal `source_timestamp`), which a
    * (id, start)-keyed upsert would otherwise collapse, silently dropping a
    * version the batch [[graft.cdc.Scd2]] derivation retains.
    */
  case class Version(id: Long, status: Option[String],
                     totalprice: Option[Double],
                     row_valid_start_timestamp: Timestamp,
                     row_valid_expiration_timestamp: Timestamp,
                     closed: Boolean, lsn: Long)

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
          e.source_timestamp, closed = true, lsn = s.lsn)
      }
      state = Some(KeyState(e.status, e.totalprice, e.source_timestamp,
        e.log_seq_num, state.map(_.versions).getOrElse(0L) + 1))
    }
    // Re-emit the open version (sentinel expiration) — downstream upserts it.
    // Its lsn is stable across re-emissions (the opening event's), so the
    // later closed emission upserts over it exactly.
    state.foreach { s =>
      out += Version(id, s.status, s.totalprice, s.start, sentinel,
        closed = false, lsn = s.lsn)
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

  /** Merge one micro-batch of emitted [[Version]] rows into a
    * manifest-committed parquet dimension at `dimPath`, key-BUCKETED so a
    * batch rewrites only the buckets its keys hash into — not the whole
    * dimension. Read the dimension back with [[readDimension]] (a plain
    * `spark.read.parquet(dimPath)` sees staged + superseded files too).
    *
    * Layout: [[ManifestStore]] slots are bucket ids
    * (`pmod(hash(id), numBuckets)`); each commit's rewritten buckets live
    * under an immutable `data/v<N>/__bucket=<b>/` prefix and the manifest
    * points every bucket at its current prefix.
    *
    * Per batch: (1) the touched-bucket set is computed (a ≤ numBuckets-int
    * driver-side collect — metadata on the same order as a table format's
    * file index, not a data collect); (2) ONLY those buckets' current data
    * dirs are read back (manifest-pruned scan), merged with the incoming
    * rows — the newest emission wins per (id, row_valid_start_timestamp,
    * lsn), so same-millisecond versions with distinct LSNs both survive,
    * matching the batch derivation; (3) the rewritten buckets are staged
    * under a fresh versioned prefix and the commit is one atomic manifest
    * publish ([[ManifestStore]] documents why that is object-store-safe) —
    * untouched buckets' files are never opened, read, rewritten, or even
    * re-pointed. A crash between stage and commit leaves readers on the
    * old dimension; they can never observe a mix. Rewrite cost per batch
    * is O(dimension/numBuckets × touched buckets), not O(dimension).
    *
    * This is the same merge a Delta/Iceberg `MERGE` would run, with the
    * manifest pointer standing in for their transaction log.
    */
  def upsertBatch(spark: SparkSession, batch: Dataset[Version],
                  dimPath: String, numBuckets: Int = 64): Unit = {
    if (batch.isEmpty) return
    val (version, entries) = stageBatch(spark, batch, dimPath, numBuckets)
    ManifestStore.commit(spark, dimPath, version, entries)
  }

  /** The stage half of [[upsertBatch]]: write the merged touched buckets
    * under a fresh versioned prefix WITHOUT committing. Returns the staged
    * version and the full entry map a commit of it would publish. Split out
    * so the crash-injection spec can stop exactly between stage and commit.
    */
  private[streaming] def stageBatch(spark: SparkSession,
      batch: Dataset[Version], dimPath: String,
      numBuckets: Int): (Long, Map[String, String]) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val snap = ManifestStore.latest(spark, dimPath)
    val n = snap.flatMap(_.entries.get(MergeInto.NumBucketsSlot))
      .map(_.toInt).getOrElse(numBuckets)
    require(n == numBuckets,
      s"dimension at $dimPath was bucketed with $n buckets; batch " +
        s"requested $numBuckets — bucket count is immutable")
    val incoming = batch.toDF()
      .withColumn("__bucket", pmod(hash(col("id")), lit(numBuckets)))
      .withColumn("__p", lit(1))
    val touched = incoming.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    // Distributed merge (no data collect): union the touched buckets'
    // current files + incoming with a priority tag, keep the newest row per
    // (id, start, lsn) via one window. `__bucket` is a DATA column in the
    // files (the directory split below duplicates it into `__dir`), so the
    // read needs no partition discovery across mixed version prefixes.
    val touchedPaths = snap.toSeq.flatMap { s =>
      touched.flatMap(b => s.entries.get(b.toString)).map(rel => s"$dimPath/$rel")
    }
    val base = if (touchedPaths.nonEmpty)
        MergeInto.readRows(spark, dimPath, snap.get, touchedPaths)
          .withColumn("__p", lit(0))
          .unionByName(incoming)
      else incoming
    val merged = base
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("id"), col("row_valid_start_timestamp"),
            col("lsn"))
          .orderBy(col("__p").desc)))
      .filter(col("__r") === 1).drop("__p", "__r")
    val version = ManifestStore.versionAfter(snap)
    val rel = ManifestStore.dataRel(version)
    // bucket-id-stamped files + bucket metadata: dimension reads declare
    // HashPartitioning(id, n), so a key join against a same-bucketed
    // fact/merge table is zero-shuffle (the co-located-join contract the
    // merge table already carries)
    val written = MergeInto.stageBuckets(spark, merged, dimPath, rel)
    val entries = snap.map(_.entries).getOrElse(Map.empty[String, String]) ++
      written.map(b => b.toString -> s"$rel/__dir=$b") +
      (MergeInto.NumBucketsSlot -> numBuckets.toString) +
      (MergeInto.BucketKeySlot -> "id") +
      (MergeInto.SchemaSlot -> MergeInto.committedSchema(spark, dimPath,
        snap, merged.schema).json)
    (version, entries)
  }

  /** The dimension's current committed state. */
  def readDimension(spark: SparkSession, dimPath: String): Dataset[Version] = {
    import spark.implicits._
    ManifestStore.read(spark, dimPath)
      .select(col("id"), col("status"), col("totalprice"),
        col("row_valid_start_timestamp"),
        col("row_valid_expiration_timestamp"), col("closed"), col("lsn"))
      .as[Version]
  }

  /** Wire the full incremental pipeline: change stream → stateful versions →
    * foreachBatch dimension upsert.
    */
  def dimensionStream(changes: Dataset[Change], dimPath: String,
                      checkpoint: String, numBuckets: Int = 64) =
    versions(changes).writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Version], _: Long) =>
        upsertBatch(batch.sparkSession, batch, dimPath, numBuckets)
      }
      .start()
}
