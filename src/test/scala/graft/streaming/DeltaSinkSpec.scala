package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeltaSinkSpec extends SparkSpec {

  import spark.implicits._

  test("exactly-once under foreachBatch replay: a re-delivered batch " +
      "changes neither the table nor the delta log") {
    val root = java.nio.file.Files.createTempDirectory("dsink").toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val b1 = Seq((1L, "A"), (3L, "c")).toDF("k", "s")

    assert(DeltaSink.upsertBatch(spark, b0, root, "k", 0L, 4) == 0L)
    assert(DeltaSink.upsertBatch(spark, b1, root, "k", 1L, 4) == 1L)
    val vAfter = ManifestStore.latest(spark, root).get.version

    // at-least-once replay of BOTH batches (crash between merge and
    // Spark's own checkpoint commit): nothing may move
    assert(DeltaSink.upsertBatch(spark, b0, root, "k", 0L, 4) == 1L)
    assert(DeltaSink.upsertBatch(spark, b1, root, "k", 1L, 4) == 1L)
    assert(ManifestStore.latest(spark, root).get.version == vAfter)
    assert(new java.io.File(root, "_delta_log").listFiles()
      .count(_.getName.endsWith(".json")) == 2)

    assert(DeltaExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "b"), (3L, "c")))
    // restart position recoverable from the DELTA side (txn action)
    assert(DeltaExport.lastTxn(spark, root).contains(1L))
    // …and the log carries it as a protocol txn action, not a comment
    val l1 = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "_delta_log"),
      "00000000000000000001.json")).getLines().mkString("\n")
    assert(l1.contains("\"txn\"") && l1.contains(DeltaExport.txnAppId(root)))
  }

  test("txn progress survives checkpoint compaction + log expiration") {
    val root = java.nio.file.Files.createTempDirectory("dsink").toString + "/t"
    (0 to 6).foreach { i =>
      DeltaSink.upsertBatch(spark,
        Seq((i % 3L, s"v$i")).toDF("k", "s"), root, "k", i.toLong, 2,
        checkpointInterval = 3)
    }
    assert(DeltaExport.cleanLog(spark, root) > 0)
    // the expired prefix held txn actions 0..5; the checkpoint carries
    // the latest mark forward
    assert(DeltaExport.lastTxn(spark, root).contains(6L))
    assert(DeltaExport.read(spark, root).count() == 3)
  }

  test("change data feed: each batch's row-level diff is published as a " +
      "cdc action; table_changes reconstructs inserts/updates/deletes") {
    val root = java.nio.file.Files.createTempDirectory("dsink").toString + "/t"
    DeltaSink.upsertBatch(spark,
      Seq((1L, "a", false), (2L, "b", false)).toDF("k", "s", "del"),
      root, "k", 0L, 4, deleteCol = Some("del"), changeData = true)
    DeltaSink.upsertBatch(spark,
      Seq((1L, "A", false), (3L, "c", false), (2L, "", true))
        .toDF("k", "s", "del"),
      root, "k", 1L, 4, deleteCol = Some("del"), changeData = true)

    // v0 = initial write: adds ARE the inserts (no cdc file needed)
    val all = DeltaExport.readChanges(spark, root, 0L)
      .select("k", "s", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(all == Seq(
      (1L, "A", "update_postimage", 1L),
      (1L, "a", "insert", 0L),
      (1L, "a", "update_preimage", 1L),
      (2L, "b", "delete", 1L),
      (2L, "b", "insert", 0L),
      (3L, "c", "insert", 1L)))
    // the log carries a protocol cdc action pointing under _change_data
    val l1 = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "_delta_log"),
      "00000000000000000001.json")).getLines().mkString("\n")
    assert(l1.contains("\"cdc\"") && l1.contains("_change_data/"))
    // spec conformance: a CDF-writing table must declare writer v4 and
    // delta.enableChangeDataFeed=true, or foreign engines' table_changes
    // will refuse/ignore the feed (Delta protocol, writer features)
    val l0 = scala.io.Source.fromFile(new java.io.File(
      new java.io.File(root, "_delta_log"),
      "00000000000000000000.json")).getLines().mkString("\n")
    assert(l0.contains("\"minWriterVersion\":4"))
    assert(l0.contains("\"delta.enableChangeDataFeed\":\"true\""))
    // the cdc file is NOT part of the snapshot (dataChange=false)
    assert(DeltaExport.read(spark, root).count() == 2)
    // a version exported without change data refuses the CDF read by name
    MergeInto.mergeBatch(spark, Seq((5L, "e")).toDF("k", "s"), root, "k",
      numBuckets = 4)
    DeltaExport.export(spark, root)
    val e = intercept[IllegalArgumentException] {
      DeltaExport.readChanges(spark, root, 2L, 2L).collect()
    }
    assert(e.getMessage.contains("no change-data files"))
  }

  test("the change feed streams: each cdc file admitted exactly once " +
      "across restarts, _commit_version from the protocol file names, " +
      "and the streamed set equals the batch table_changes read") {
    val root = java.nio.file.Files.createTempDirectory("dsink").toString + "/t"
    DeltaSink.upsertBatch(spark,
      Seq((1L, "a", false), (2L, "b", false)).toDF("k", "s", "del"),
      root, "k", 0L, 4, deleteCol = Some("del"), changeData = true)
    DeltaSink.upsertBatch(spark,
      Seq((1L, "A", false), (2L, "", true)).toDF("k", "s", "del"),
      root, "k", 1L, 4, deleteCol = Some("del"), changeData = true)

    val out = java.nio.file.Files.createTempDirectory("cdfout").toString
    def runOnce(): Unit = {
      val q = DeltaCdfStream.changes(spark, root)
        .writeStream.format("parquet")
        .option("path", s"$out/data")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(s"$out/data")
      .select("k", "s", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(first == Seq(
      (1L, "A", "update_postimage", 1L),
      (1L, "a", "update_preimage", 1L),
      (2L, "b", "delete", 1L)))
    // a LATER commit streams incrementally on restart — and the already-
    // admitted v1 file is NOT re-delivered (checkpoint-tracked)
    DeltaSink.upsertBatch(spark,
      Seq((3L, "c", false)).toDF("k", "s", "del"),
      root, "k", 2L, 4, deleteCol = Some("del"), changeData = true)
    runOnce()
    val second = spark.read.parquet(s"$out/data")
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(second == Seq(
      (1L, "update_postimage", 1L), (1L, "update_preimage", 1L),
      (2L, "delete", 1L), (3L, "insert", 2L)))
    // same row set as the batch reader over the same window
    val batch = DeltaExport.readChanges(spark, root, 1L)
      .select("k", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(second == batch)
  }

  test("a real AvailableNow stream lands every file batch exactly once " +
      "and the delta view equals the source's last-write-wins state") {
    val dir = java.nio.file.Files.createTempDirectory("dsink-src")
    val root = dir.toString + "/t"
    // three source files = three deterministic micro-batches (admitted
    // in modification-time order; stamped ascending like the fixtures)
    Seq(
      Seq((1L, "a"), (2L, "b")),
      Seq((2L, "B"), (3L, "c")),
      Seq((1L, "Z"))
    ).zipWithIndex.foreach { case (rows, i) =>
      val f = s"$dir/in/part-$i.json"
      rows.toDF("k", "s").coalesce(1).write.json(s"$dir/stage/$i")
      val src = new java.io.File(s"$dir/stage/$i").listFiles()
        .find(_.getName.endsWith(".json")).get
      new java.io.File(s"$dir/in").mkdirs()
      java.nio.file.Files.move(src.toPath,
        java.nio.file.Paths.get(f))
      new java.io.File(f).setLastModified(1700000000000L + i * 60000L)
    }
    val schema = "k LONG, s STRING"
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(s"$dir/in")
    val q = DeltaSink.start(stream, root, "k", s"$dir/ckpt", numBuckets = 2)
    q.awaitTermination(120000)
    assert(DeltaExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "Z"), (2L, "B"), (3L, "c")))
    assert(DeltaExport.lastTxn(spark, root).contains(2L))
    // restart over the same source: no new data, no new versions
    val before = DeltaExport.history(spark, root).map(_.version).max
    val q2 = DeltaSink.start(stream, root, "k", s"$dir/ckpt", numBuckets = 2)
    q2.awaitTermination(120000)
    assert(DeltaExport.history(spark, root).map(_.version).max == before)
  }
}
