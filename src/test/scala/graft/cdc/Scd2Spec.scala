package graft.cdc

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def changeLog(rows: Seq[(Long, String, Long, Long)]): DataFrame =
    rows.toDF("id", "status", "log_seq_num", "ts_ms")
      .withColumn("source_timestamp",
        timestamp_millis($"ts_ms").cast("timestamp_ntz"))
      .drop("ts_ms")

  test("single-event keys are excluded (HAVING COUNT(*) > 1 semi-join)") {
    val out = Scd2.scd2(
      changeLog(Seq((1L, "a", 1L, 1000L), (2L, "a", 2L, 1000L),
        (2L, "b", 3L, 2000L))),
      "id", "log_seq_num", "source_timestamp", Seq("status"))
    assert(out.select("id").distinct().as[Long].collect().toSet == Set(2L))
  }

  test("versions chain: expiration = next start, last = sentinel") {
    val out = Scd2.scd2(
      changeLog(Seq((1L, "a", 1L, 1000L), (1L, "b", 2L, 2000L),
        (1L, "c", 3L, 3000L))),
      "id", "log_seq_num", "source_timestamp", Seq("status"))
      .orderBy("row_valid_start_timestamp")
      .select($"status", $"row_valid_start_timestamp".cast("string"),
        $"row_valid_expiration_timestamp".cast("string"))
      .as[(String, String, String)].collect().toSeq
    assert(out == Seq(
      ("a", "1970-01-01 00:00:01", "1970-01-01 00:00:02"),
      ("b", "1970-01-01 00:00:02", "1970-01-01 00:00:03"),
      ("c", "1970-01-01 00:00:03", "9999-01-01 00:00:00")))
  }

  /** Property: for random per-key op sequences, SCD2 output has (a) version
    * count == change count for multi-change keys, (b) exactly one open
    * (sentinel) version per key, (c) contiguous non-overlapping validity.
    */
  test("SCD2 invariants hold for random change streams") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 8) {
      val keys = List.fill(1 + rnd.nextInt(40))(1L + rnd.nextInt(8))
      val rows = keys.zipWithIndex.map { case (k, i) =>
        (k, s"v$i", i.toLong, 1000L * (i + 1))
      }
      val out = Scd2.scd2(changeLog(rows), "id", "log_seq_num",
          "source_timestamp", Seq("status"))
        .select($"id", $"row_valid_start_timestamp",
          $"row_valid_expiration_timestamp")
        .as[(Long, LocalDateTime, LocalDateTime)]
        .collect().toSeq

      val expected = rows.groupBy(_._1).filter(_._2.size > 1)
      assert(out.groupBy(_._1).view.mapValues(_.size).toMap ==
        expected.view.mapValues(_.size).toMap)

      val sentinel = LocalDateTime.parse("9999-01-01T00:00")
      out.groupBy(_._1).foreach { case (_, versions) =>
        assert(versions.count(_._3 == sentinel) == 1)
        val sorted = versions.sortBy(_._2)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._3 == b._2) // contiguous
          case _ =>
        }
        sorted.foreach(v => assert(v._2.isBefore(v._3)))
      }
    }
  }
}
