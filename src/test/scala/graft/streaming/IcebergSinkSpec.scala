package graft.streaming

import graft.SparkSpec

class IcebergSinkSpec extends SparkSpec {

  import spark.implicits._

  test("exactly-once under foreachBatch replay: a re-delivered batch " +
      "changes neither the table nor the iceberg metadata") {
    val root = java.nio.file.Files.createTempDirectory("isink")
      .toString + "/t"
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
    val b1 = Seq((1L, "A"), (3L, "c")).toDF("k", "s")

    assert(IcebergSink.upsertBatch(spark, b0, root, "k", 0L, 4) == 1L)
    assert(IcebergSink.upsertBatch(spark, b1, root, "k", 1L, 4) == 2L)
    val vAfter = ManifestStore.latest(spark, root).get.version

    // at-least-once replay of BOTH batches (crash between merge and
    // Spark's own checkpoint commit): nothing may move — no manifest
    // version, no iceberg snapshot
    assert(IcebergSink.upsertBatch(spark, b0, root, "k", 0L, 4) == 2L)
    assert(IcebergSink.upsertBatch(spark, b1, root, "k", 1L, 4) == 2L)
    assert(ManifestStore.latest(spark, root).get.version == vAfter)
    assert(IcebergExport.snapshots(spark, root).size == 2)

    assert(IcebergExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "A"), (2L, "b"), (3L, "c")))
  }

  test("a real AvailableNow stream lands every file batch exactly once " +
      "and the iceberg view equals the source's last-write-wins state") {
    val dir = java.nio.file.Files.createTempDirectory("isink-src")
    val root = dir.toString + "/t"
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
    val q = IcebergSink.start(stream, root, "k", s"$dir/ckpt",
      numBuckets = 2)
    q.awaitTermination(120000)
    assert(IcebergExport.read(spark, root).select("k", "s")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "Z"), (2L, "B"), (3L, "c")))
    assert(IcebergExport.snapshots(spark, root).size == 3)
    // restart over the same source: no new data, no new snapshots
    val q2 = IcebergSink.start(stream, root, "k", s"$dir/ckpt",
      numBuckets = 2)
    q2.awaitTermination(120000)
    assert(IcebergExport.snapshots(spark, root).size == 3)
  }
}
