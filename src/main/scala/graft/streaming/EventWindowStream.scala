package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tumbling-window aggregation over the `events` table as a REAL
  * Structured-Streaming run — the ST4 surface driver-gated end-to-end
  * (`ev1_stream_hourly`), complementing the append+watermark unit coverage
  * in `WindowedAggSpec`.
  *
  * Shape: the bounded backfill pattern — complete-output windowed agg,
  * each micro-batch's full aggregate overwriting a parquet store via
  * `foreachBatch`, so the final store equals the relational GROUP BY the
  * DuckDB oracle computes. (The unbounded-production twin is append mode
  * with a watermark — that path can't be batch-gated because its tail
  * windows only emit when a LATER event advances the watermark; the spec
  * covers its late-data semantics instead.)
  *
  * Scale shape: state is O(open windows × event types); the one exchange
  * is the hash-by-(window, type) shuffle with map-side partial counts —
  * identical to the batch agg. The event stream is range-split into
  * several files and consumed `maxFilesPerTrigger=2`, so the gate
  * exercises genuine multi-micro-batch state accumulation, not a
  * one-batch degenerate run.
  */
object EventWindowStream {

  /** The windowed aggregate (works on a batch or streaming DataFrame).
    * Money sums ride DECIMAL(18,2) internally (bit-exact cross-engine) and
    * publish as DOUBLE.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))


  /** Materialize the streamed hourly aggregate once per sfDir; returns the
    * store path. Deterministic for any micro-batch split (complete-mode
    * aggregation is split-invariant), so the done-marker only guards cost.
    */
  def materializedHourlyDir(spark: SparkSession, sfDir: String): String = {
    import java.nio.file.{Files, Paths}
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val base = sys.env.getOrElse("SPARK_GRAFT_LAKE_DIR",
      System.getProperty("java.io.tmpdir") + "/graft_fixture_lake")
    val root = Paths.get(s"$base/$key/events_hourly_stream")
    val store = root.resolve("store").toString
    FixtureLock.once(root) {
        val events = graft.ops.Tables(spark, sfDir, "events")
          .select(col("ts"), col("event_type"), col("value"))
        val chunks = root.resolve("chunks").toString
        events.repartitionByRange(8, col("ts"))
          .write.mode("overwrite").parquet(chunks)
        val stream = spark.readStream
          .schema(events.schema)
          .option("maxFilesPerTrigger", 2)
          .parquet(chunks)
        val q = hourlyAgg(stream).writeStream
          .outputMode("complete")
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("overwrite").parquet(store)
          }
          .start()
        q.processAllAvailable()
        q.stop()
    }
    store
  }
}
