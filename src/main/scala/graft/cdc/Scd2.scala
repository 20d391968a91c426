package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 derivation from a decoded change log — the reference's flagship
  * analytics transform (reference `example/duckdb_minio_product_scd2.sql:32-47`,
  * `README.md:108-124`), generalized over (key, order column, event-time
  * column, payload columns) so it serves `products`, `users`, and any other
  * CDC-tracked table.
  *
  * Semantics preserved exactly for oracle parity (SURVEY §7.4):
  *   - every change event becomes one version row (deletes too — their
  *     payload columns are null, from the null `after` image);
  *   - a version's validity is `[source_timestamp, next event's
  *     source_timestamp)`, ordered per key by LSN (not wall clock);
  *   - open versions are closed with the sentinel `9999-01-01` (reference
  *     `example…sql:39`);
  *   - only keys with MORE THAN ONE change event are published (the
  *     `IN (… HAVING COUNT(*) > 1)` semi-join, reference `example…sql:43`).
  *
  * Scale shape: the changed-keys filter is a self-grouped count + left-semi
  * join, and the versioning is a window — all three hash-partition by the same
  * key, so Catalyst/AQE plan ONE shuffle by `key` and reuse the exchange; the
  * small aggregated side broadcasts. `LEAD … IS NULL THEN sentinel` is
  * expressed as `coalesce(lead(...), sentinel)` — same semantics, one window
  * function instead of two (SURVEY §2 O11).
  */
object Scd2 {

  val SENTINEL = "9999-01-01"

  /** Sentinel timestamp closing open versions (reference `example…sql:39`).
    * TIMESTAMP_NTZ end-to-end: the lake's event times are naive (epoch millis
    * interpreted in UTC) and the DuckDB oracle's TIMESTAMP is naive too.
    */
  def sentinelTs: Column = lit(SENTINEL).cast("timestamp_ntz")

  /** Keys with more than one change event (reference `example…sql:43`):
    * `changes WHERE key IN (SELECT key … GROUP BY key HAVING COUNT(*) > 1)`.
    *
    * Expressed as a per-key windowed count rather than the literal
    * groupBy + left-semi join: identical row set, but ONE hash exchange by
    * `key` and ONE scan of the input instead of two scans + a join — on a
    * 100 TB change log the input is the expensive side (JSON decode), and
    * the window's exchange is then shared with the LEAD in [[scd2]].
    */
  def changedKeysOnly(changes: DataFrame, key: String): DataFrame = {
    val wAll = Window.partitionBy(col(key))
    changes
      .withColumn("__change_count", count(lit(1)).over(wAll))
      .filter(col("__change_count") > 1)
      .drop("__change_count")
  }

  /** Derive the SCD2 dimension.
    *
    * @param changes     decoded change log (one row per change event)
    * @param key         business key column
    * @param orderCol    total-order column within a key (LSN)
    * @param tsCol       event-time column (source_timestamp)
    * @param payloadCols dimension attribute columns to carry through
    */
  def scd2(changes: DataFrame, key: String, orderCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame = {
    // Both window functions share one (partition, order) spec — the per-key
    // count uses an explicit whole-partition frame — so Catalyst plans a
    // single Window exec over a single exchange + sort by `key`. Filtering
    // multi-event keys after the windows is equivalent to the reference's
    // semi-join (lead never crosses keys) and keeps the plan one-pass.
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    changes
      .withColumn("__change_count", count(lit(1)).over(wFull))
      .withColumn("row_valid_start_timestamp", col(tsCol))
      .withColumn("row_valid_expiration_timestamp",
        coalesce(lead(col(tsCol), 1).over(w), sentinelTs))
      .filter(col("__change_count") > 1)
      .select((key +: payloadCols ++: Seq(
        "row_valid_start_timestamp", "row_valid_expiration_timestamp"))
        .map(col): _*)
  }

  /** [[scd2]] for HOT-KEY change logs — same output, no per-key task bound.
    *
    * The default [[scd2]] windows by `key`: correct and one-pass, but a
    * window partition is indivisible — AQE cannot split it — so a
    * pathological key with ~10⁶⁺ changes serializes its whole history into
    * one sorted task. This variant computes the lead via
    * [[graft.joins.RangeLead]] (range-partitioned two-phase lookahead: a
    * hot key spans many consecutive partitions) and the per-key
    * multiplicity via hash-agg + join — a pair AQE's skew handling CAN
    * split. Output is bit-identical to [[scd2]] (Scd2SkewSpec + the 1M
    * hot-key soak assert it). Use when key skew is measured; the window
    * path stays the default.
    */
  def scd2Skewed(changes: DataFrame, key: String, orderCol: String,
      tsCol: String, payloadCols: Seq[String],
      numPartitions: Int = 0): DataFrame = {
    val cols = (Seq(key, orderCol, tsCol) ++ payloadCols).distinct
    // The led table feeds two consumers (multiplicity agg + join), and
    // RangeLead's range-sorted reduce stage re-runs per consuming job
    // (only its shuffle MAP stage is reused) — the lineage cut runs the
    // sort once and both consumers read the materialized rows (r12
    // optimization round; one materialization vs two full re-sorts at
    // any scale).
    val led = graft.graph.GraphOps.checkpoint(
      graft.joins.RangeLead.withLead(
        changes.select(cols.map(col): _*),
        key, orderCol, tsCol, "__next_ts", numPartitions))
    val counts = led.groupBy(col(key))
      .agg(count(lit(1)).as("__change_count"))
    led.join(counts, Seq(key))
      .filter(col("__change_count") > 1)
      .withColumn("row_valid_start_timestamp", col(tsCol))
      .withColumn("row_valid_expiration_timestamp",
        coalesce(col("__next_ts"), sentinelTs))
      .select((key +: payloadCols ++: Seq(
        "row_valid_start_timestamp", "row_valid_expiration_timestamp"))
        .map(col): _*)
  }

  /** The all-keys version store: [[scd2]] WITHOUT the more-than-one-event
    * filter, RETAINING the order column — the internal state an incremental
    * pipeline maintains between batches. Single-event keys must stay in the
    * store (their second change may arrive in a later batch); [[publish]]
    * applies the reference's filter at read-out. Versions are losslessly
    * re-expandable into change events: (key, orderCol, payload,
    * row_valid_start_timestamp) is exactly the event that created them.
    */
  def versionStore(changes: DataFrame, key: String, orderCol: String,
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(orderCol))
    changes
      .withColumn("row_valid_start_timestamp", col(tsCol))
      .withColumn("row_valid_expiration_timestamp",
        coalesce(lead(col(tsCol), 1).over(w), sentinelTs))
      .select((key +: orderCol +: payloadCols ++: Seq(
        "row_valid_start_timestamp", "row_valid_expiration_timestamp"))
        .map(col): _*)
  }

  /** Publish the reference-semantics dimension from a [[versionStore]]. */
  def publish(store: DataFrame, key: String, orderCol: String): DataFrame =
    changedKeysOnly(store, key).drop(orderCol)

  /** Apply a new batch of change events to an existing [[versionStore]],
    * recomputing ONLY the keys the batch touches — the batch-side answer to
    * keeping a 100 TB dimension current without re-deriving it: cost is
    * O(touched keys' versions + new changes) window work, while untouched
    * keys pass through join-pruned (and with a key-bucketed store layout —
    * see graft.streaming.Scd2Stream — untouched buckets are never read).
    *
    * Replays are tolerated: a change that already produced a version is
    * deduplicated on (key, orderCol). Result is exactly
    * `versionStore(allChangesSoFar)` for any batch split.
    */
  def incrementalMerge(store: DataFrame, newChanges: DataFrame, key: String,
      orderCol: String, tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val eventCols = (key +: orderCol +: payloadCols :+ tsCol).map(col)
    val changedKeys = newChanges.select(col(key)).distinct()
    val untouched = store.join(changedKeys, Seq(key), "left_anti")
    val replayed = store.join(changedKeys, Seq(key), "left_semi")
      .withColumn(tsCol, col("row_valid_start_timestamp"))
      .select(eventCols: _*)
    val recomputed = versionStore(
      replayed.unionByName(newChanges.select(eventCols: _*))
        .dropDuplicates(key, orderCol),
      key, orderCol, tsCol, payloadCols)
    untouched.unionByName(recomputed)
  }
}
