package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermarked tumbling-window aggregation over an event stream — the
  * Structured Streaming windowed-agg surface (SURVEY §2 ST4 notes the
  * reference itself has no time windows; this is the Spark-first upgrade).
  */
class WindowedAggSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("tumbling windows aggregate per 10-minute bucket; late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val counts = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n"))

    val q = counts.writeStream.format("memory")
      .queryName("win_agg").outputMode("append").start()

    // Two events in [0,10), one in [10,20); advance watermark far past both.
    input.addData((1L, ts(1)), (1L, ts(5)), (1L, ts(12)))
    q.processAllAvailable()
    input.addData((1L, ts(120))) // watermark -> 110min; closes all old windows
    q.processAllAvailable()
    // This event is 100+ minutes late — behind the watermark, dropped.
    input.addData((1L, ts(3)))
    q.processAllAvailable()
    input.addData((1L, ts(240))) // close everything still open
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_agg")
      .select(col("w_start").cast("long"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(rows(0L) == 2)        // [0,10): the two on-time events only
    assert(rows(600L) == 1)      // [10,20)
    assert(rows(7200L) == 1)     // [120,130)
  }
}
