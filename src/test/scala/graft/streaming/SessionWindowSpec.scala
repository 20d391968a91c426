package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming gap-based sessionization via `session_window` — the streaming
  * twin of the batch q17_sessionize query (state expires with the
  * watermark; sessions merge when events bridge the gap).
  */
class SessionWindowSpec extends SparkSpec {

  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("session_window groups events within a 30-minute gap and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("long").as("s_start"),
        col("session_window.end").cast("long").as("s_end"),
        col("user_id"), col("n_events"))

    val q = sessions.writeStream.format("memory")
      .queryName("sess_win").outputMode("append").start()

    // events at 0, 20, 40 min chain into ONE session (each gap < 30 min);
    // an event at 200 min starts a new one and closes the first.
    input.addData((1L, ts(0)), (1L, ts(20)), (1L, ts(40)))
    q.processAllAvailable()
    input.addData((1L, ts(200)))
    q.processAllAvailable()
    input.addData((1L, ts(400))) // close the 200-min session too
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_win")
      .select("s_start", "s_end", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    // session 1: [0, 40+30) with 3 events; session 2: [200, 230) with 1
    assert(rows.contains((0L, 70L * 60, 3L)))
    assert(rows.contains((200L * 60, 230L * 60, 1L)))
  }
}
