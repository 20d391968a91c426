package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.joins.RangeLead

/** The hot-key fallback must be BIT-IDENTICAL to the window formulation —
  * including the tricky placements: a key spanning multiple range
  * partitions, a key boundary landing exactly on a partition boundary,
  * empty partitions between a row and its successor, single-change keys.
  */
class Scd2SkewSpec extends SparkSpec {

  import spark.implicits._

  test("RangeLead matches window lead across partition boundaries") {
    // 3 keys × varying history lengths, shuffled input order, and more
    // partitions than rows so empty partitions + boundary cases all occur
    val rows = scala.util.Random.shuffle(for {
      k <- Seq("a", "b", "c"); i <- 1 to (k(0) - 'a' + 1) * 4
    } yield (k, i.toLong, s"v$k$i")).toDF("k", "lsn", "payload")

    val expected = rows.withColumn("nxt",
        lead(col("payload"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("lsn"))))
      .select("k", "lsn", "payload", "nxt")
      .as[(String, Long, String, Option[String])].collect().sorted.toSeq

    val got = RangeLead.withLead(rows, "k", "lsn", "payload", "nxt",
        numPartitions = 13)
      .select("k", "lsn", "payload", "nxt")
      .as[(String, Long, String, Option[String])].collect().sorted.toSeq

    assert(got == expected)
  }

  test("scd2Skewed output equals scd2 on a skewed change log") {
    // one hot key with 500 changes, 50 cold keys with 1-3 changes
    val hot = (1 to 500).map(i =>
      (1L, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 60}%02d"), s"p$i"))
    val cold = for (k <- 2 to 51; i <- 1 to (k % 3) + 1) yield
      (k.toLong, i.toLong,
        java.sql.Timestamp.valueOf(s"2024-02-0${(i % 8) + 1} 00:00:00"), s"q$k-$i")
    val changes = scala.util.Random.shuffle(hot ++ cold)
      .toDF("id", "lsn", "source_timestamp", "payload")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "payload", "row_valid_start_timestamp",
          "row_valid_expiration_timestamp")
        .as[(Long, String, java.sql.Timestamp, java.sql.Timestamp)]
        .collect().sorted.toSeq

    val viaWindow = canon(Scd2.scd2(changes, "id", "lsn",
      "source_timestamp", Seq("payload")))
    val viaSkew = canon(Scd2.scd2Skewed(changes, "id", "lsn",
      "source_timestamp", Seq("payload"), numPartitions = 7))
    assert(viaSkew == viaWindow)
    // the hot key's 500 versions all survived, cold single-change keys
    // were filtered exactly like the window path
    assert(viaSkew.count(_._1 == 1L) == 500)
  }
}
