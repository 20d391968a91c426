package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** A STANDING data-quality counter table: the streaming twin of the
  * one-shot `dq2_constraint_audit` gate — per-constraint (n_checked,
  * n_violations) counters folded forward micro-batch by micro-batch.
  *
  * Why this exists: at 100 TB you cannot re-audit the corpus per check;
  * violation COUNTERS are additive (merge = SUM per constraint), so
  * folding each micro-batch's audit rows into an O(|constraints|) table
  * is LOSSLESS — the standing report is bit-identical to a one-shot audit
  * over everything ingested, and reading it costs O(|constraints|).
  *
  * Store mechanics are the repo's standard: tiny parquet rewritten per
  * merge under a fresh versioned prefix, atomic manifest commit,
  * `__lastTxn` replay guard (foreachBatch is at-least-once).
  */
object DqStore {

  private val CellsSlot = "cells"
  private val LastTxnSlot = "__lastTxn"

  val cellSchema: StructType = StructType(Seq(
    StructField("constraint_name", StringType, nullable = false),
    StructField("n_checked", LongType, nullable = false),
    StructField("n_violations", LongType, nullable = false)))

  /** Fold one batch's audit rows (constraint_name, n_checked,
    * n_violations — e.g. `quality.DataQuality.audit` output without the
    * pass flag) into the store: union with current counters, SUM per
    * constraint, commit.
    */
  def merge(spark: SparkSession, root: String, auditRows: DataFrame,
            txnId: Option[Long] = None): Unit = {
    val snap = ManifestStore.latest(spark, root)
    val applied = snap.flatMap(_.entries.get(LastTxnSlot)).map(_.toLong)
    if (txnId.exists(id => applied.exists(id <= _))) return // replayed
    val current = snap.map(s => spark.read.schema(cellSchema)
        .parquet(ManifestStore.resolvePaths(root, s): _*))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], cellSchema))
    val merged = auditRows
      .select(col("constraint_name").cast("string"),
        col("n_checked").cast("long"), col("n_violations").cast("long"))
      .unionByName(current)
      .groupBy(col("constraint_name"))
      .agg(sum(col("n_checked")).as("n_checked"),
        sum(col("n_violations")).as("n_violations"))
    val version = ManifestStore.versionAfter(snap)
    val rel = ManifestStore.dataRel(version)
    merged.coalesce(1).write.mode("errorifexists")
      .parquet(s"$root/$rel/cells")
    // carry prior manifest entries forward, REPLACING only the cells slot:
    // a txn-less merge (out-of-band correction) after txn-guarded ones
    // must keep the old `__lastTxn`, or a later stream restart would
    // re-apply replayed batches and double-count; a txn-ful merge
    // overwrites it via the ++ below
    ManifestStore.commit(spark, root, version,
      snap.map(_.entries).getOrElse(Map.empty) - CellsSlot ++
        Map(CellsSlot -> s"$rel/cells") ++
        txnId.map(id => LastTxnSlot -> id.toString))
  }

  /** Maintain the counters from a STREAM of raw rows: per micro-batch,
    * run `auditOf` over the batch and fold the resulting counter rows in
    * (one manifest commit per batch, batch id as the idempotence txn).
    */
  def mergeStream(spark: SparkSession, rows: DataFrame, root: String,
                  checkpoint: String, auditOf: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        merge(spark, root, auditOf(batch), txnId = Some(id))
      }
      .start()

  /** The standing report: counters + the pass flag, totally ordered. */
  def report(spark: SparkSession, root: String): DataFrame =
    ManifestStore.read(spark, root)
      .select(col("constraint_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0).cast("long").as("passed"))
      .orderBy(col("constraint_name"))

  /** The events-table audit rules used by the fixture, the gate oracle,
    * and the spec — one failing range rule with real violation mass plus
    * three passing rules.
    */
  def eventsAudit(batch: DataFrame): DataFrame = {
    import graft.quality.DataQuality
    DataQuality.audit(Seq(
      DataQuality.predicateRule("range:events.value in [0,100]", batch,
        col("value") < 0 || col("value") > 100),
      DataQuality.predicateRule(
        "domain:events.event_type in {view,click,purchase,signup,error}",
        batch, !col("event_type").isin(
          "view", "click", "purchase", "signup", "error")),
      DataQuality.predicateRule("not_null:events.user_id", batch,
        col("user_id").isNull),
      DataQuality.predicateRule("freshness:events.ts >= 2024-01-01", batch,
        col("ts") < lit("2024-01-01").cast("timestamp_ntz"))))
      .drop("passed")
  }

  /** Materialize-once fixture: the events audit counters built as TWO
    * merges (even event_ids, then odd) with txn ids — additive counters,
    * so the standing report must equal the one-shot audit the oracle
    * recomputes. The spec additionally proves MemoryStream ingest ≡
    * direct merges and the replay no-op.
    */
  def materializedEventsDqDir(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val base = sys.env.getOrElse("SPARK_GRAFT_LAKE_DIR",
      System.getProperty("java.io.tmpdir") + "/graft_fixture_lake")
    val root = java.nio.file.Paths.get(s"$base/$key/events_dq_v1")
    FixtureLock.once(root) {
        val ev = graft.ops.Tables(spark, sfDir, "events")
        merge(spark, root.toString,
          eventsAudit(ev.filter(col("event_id") % 2 === 0)),
          txnId = Some(1L))
        merge(spark, root.toString,
          eventsAudit(ev.filter(col("event_id") % 2 === 1)),
          txnId = Some(2L))
    }
    root.toString
  }
}
