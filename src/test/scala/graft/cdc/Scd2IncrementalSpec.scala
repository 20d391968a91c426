package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2IncrementalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: three changes; key 2: one change (store must retain it);
  // key 3: second change arrives only in a later batch.
  private val changes = Seq(
    (1L, "a", 10L, ts("2024-01-01 00:00:00")),
    (1L, "b", 20L, ts("2024-01-02 00:00:00")),
    (1L, "c", 30L, ts("2024-01-03 00:00:00")),
    (2L, "x", 15L, ts("2024-01-01 12:00:00")),
    (3L, "p", 11L, ts("2024-01-01 06:00:00")),
    (3L, "q", 41L, ts("2024-01-04 06:00:00"))
  ).toDF("id", "v", "lsn", "src_ts")

  private val payload = Seq("v")

  private def full: DataFrame =
    Scd2.versionStore(changes, "id", "lsn", "src_ts", payload)

  private def rows(df: DataFrame) =
    df.select("id", "lsn", "v", "row_valid_start_timestamp",
        "row_valid_expiration_timestamp")
      .collect().map(_.toSeq).toSet

  test("incremental merge equals full recompute for any lsn split") {
    for (cut <- Seq(0L, 11L, 20L, 30L, 99L)) {
      val store = Scd2.versionStore(changes.filter(col("lsn") <= cut),
        "id", "lsn", "src_ts", payload)
      val merged = Scd2.incrementalMerge(store,
        changes.filter(col("lsn") > cut), "id", "lsn", "src_ts", payload)
      assert(rows(merged) == rows(full), s"cut=$cut")
    }
  }

  test("chained batches and replayed events still equal the full store") {
    val b1 = changes.filter(col("lsn") <= 15)
    val b2 = changes.filter(col("lsn") > 15 && col("lsn") <= 30)
    // b3 replays an event from b2 alongside the genuinely new ones
    val b3 = changes.filter(col("lsn") > 30 || col("lsn") === 30)
    val s1 = Scd2.versionStore(b1, "id", "lsn", "src_ts", payload)
    val s2 = Scd2.incrementalMerge(s1, b2, "id", "lsn", "src_ts", payload)
    val s3 = Scd2.incrementalMerge(s2, b3, "id", "lsn", "src_ts", payload)
    assert(rows(s3) == rows(full))
  }

  test("publish applies the more-than-one-event filter and drops the lsn") {
    val pub = Scd2.publish(full, "id", "lsn")
    assert(!pub.columns.contains("lsn"))
    val ids = pub.select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // key 2 has a single change event
    // and matches scd2's published shape exactly
    val direct = Scd2.scd2(changes, "id", "lsn", "src_ts", payload)
    assert(pub.collect().map(_.toSeq).toSet ==
      direct.collect().map(_.toSeq).toSet)
  }

  test("untouched keys pass through without recomputation artifacts") {
    val store = Scd2.versionStore(changes.filter(col("id") =!= 3L),
      "id", "lsn", "src_ts", payload)
    val merged = Scd2.incrementalMerge(store,
      changes.filter(col("id") === 3L), "id", "lsn", "src_ts", payload)
    assert(rows(merged) == rows(full))
  }
}
