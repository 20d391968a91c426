package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactLakeSpec extends SparkSpec {

  import spark.implicits._

  test("compaction preserves the line multiset and leaves one file per partition") {
    val root = java.nio.file.Files.createTempDirectory("compact").toString
    val raw = s"$root/raw"
    // simulate 3 micro-batches each touching the same 2×2 partitions
    (1 to 3).foreach { b =>
      Seq(("t", "2024-05-01", "00", s"b$b-a"), ("t", "2024-05-01", "01", s"b$b-b"),
          ("t", "2024-05-02", "00", s"b$b-c"), ("t", "2024-05-02", "01", s"b$b-d"))
        .toDF("topic", "event_date", "event_hour", "value")
        .repartition(2)
        .write.partitionBy("topic", "event_date", "event_hour")
        .mode("append").text(raw)
    }
    def lines(path: String) =
      spark.read.format("text").load(path)
        .select(col("topic"), col("event_date"), col("event_hour"),
          col("value"))
        .as[(String, String, String, String)].collect().sorted.toSeq
    def files(path: String) =
      org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(path), Array("txt"), true).size

    val before = lines(raw)
    val nRaw = files(raw)
    val compact = s"$root/compact"
    Landing.compactLake(spark, raw, compact)
    assert(lines(compact) == before)
    val nCompact = files(compact)
    assert(nCompact == 4, s"expected 1 file per partition, got $nCompact")
    assert(nRaw > nCompact)
  }
}
