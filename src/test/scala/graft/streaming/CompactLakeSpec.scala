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

  test("monthly coarsening tier derives event_month and rolls days up") {
    val root = java.nio.file.Files.createTempDirectory("compactm").toString
    val raw = s"$root/raw"
    Seq(("t", "2024-05-01", "00", "a"), ("t", "2024-05-02", "01", "b"),
        ("t", "2024-06-30", "23", "c"))
      .toDF("topic", "event_date", "event_hour", "value")
      .write.partitionBy("topic", "event_date", "event_hour")
      .mode("append").text(raw)
    val compact = s"$root/compact"
    Landing.compactLake(spark, raw, compact,
      granularity = Seq("topic", "event_month"))
    val got = spark.read.format("text").load(compact)
      .select(col("topic"), col("event_month").cast("string"), col("value"))
      .as[(String, String, String)].collect().sorted.toSeq
    assert(got == Seq(("t", "2024-05", "a"), ("t", "2024-05", "b"),
      ("t", "2024-06", "c")))
    // one file per (topic, month): the two May days merged
    assert(org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(compact), Array("txt"), true).size == 2)
  }

  test("file index: readers resolve the manifest list, unindexed files are invisible") {
    val root = java.nio.file.Files.createTempDirectory("compacti").toString
    val raw = s"$root/raw"
    Seq(("t", "2024-05-01", "00", "a"), ("t", "2024-05-02", "00", "b"))
      .toDF("topic", "event_date", "event_hour", "value")
      .write.partitionBy("topic", "event_date", "event_hour")
      .mode("append").text(raw)
    val compact = s"$root/compact"
    Landing.compactLake(spark, raw, compact,
      granularity = Seq("topic", "event_date"))
    // the index was committed by compactLake
    val snap = ManifestStore.latest(spark, compact)
    assert(snap.nonEmpty && snap.get.entries.nonEmpty)
    // a file dropped into the lake BEHIND the manifest (crashed writer,
    // in-flight append) is invisible to an indexed reader — visibility is
    // commit-gated, like the engine's other manifest stores
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$compact/topic=t/event_date=2024-05-01/zz-stray.txt"),
      "STRAY\n".getBytes)
    val lines = spark.read.format("text").option("basePath", compact)
      .load(ManifestStore.resolvePaths(compact, snap.get): _*)
      .select("value").as[String].collect().sorted.toSeq
    assert(lines == Seq("a", "b"))
  }
}
