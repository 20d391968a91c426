package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, ops}
import graft.cdc.Fixtures
import graft.model.Envelope

class LandingSpec extends SparkSpec {

  import spark.implicits._

  test("file-stream landing: NDJSON → partitioned lake → read-back round-trip") {
    val base = Files.createTempDirectory("graft-landing").toString
    val srcDir = s"$base/src"
    val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    // Write fixture envelopes (plus duplicated lines to exercise dedup)
    // as the streaming input.
    val lines = Fixtures
      .ordersChangeLines(ops.Tables(spark, sfDir, "orders").limit(50))
      .collect().map(_.getString(0))
    val dup = lines ++ lines.take(10)
    Files.write(java.nio.file.Paths.get(s"$srcDir/batch0.json"),
      dup.mkString("\n").getBytes)

    val q = Landing.landingJob(
      Landing.fileSource(spark, srcDir, "debezium.commerce.orders"),
      Envelope.ordersPayload, lake, ckpt)
    q.processAllAvailable()
    q.stop()

    // Hive-style layout partitions exist
    val part = new java.io.File(s"$lake/topic=debezium.commerce.orders")
    assert(part.isDirectory)
    assert(part.listFiles().exists(_.getName.startsWith("event_date=")))

    // Read-back decodes; duplicates dropped; tombstones (null value) from the
    // fixture have null lsn and are filtered at decode.
    val decoded = graft.cdc.Decode.decodeEnvelope(
      Landing.readLake(spark, lake, Envelope.ordersPayload))
    val expected = graft.cdc.Decode.decodeEnvelope(
      graft.cdc.Decode.parseLines(lines.toSeq.toDS(), Envelope.orders))
    assert(decoded.count() == expected.count())
    assert(decoded.select("log_seq_num").as[Long].collect().sorted.toSeq ==
      expected.select("log_seq_num").as[Long].collect().sorted.toSeq)

    // A topic/date filter on the lake must partition-prune, not scan-filter.
    val pruned = spark.read.format("text").load(lake)
      .filter(col("topic") === "debezium.commerce.orders" &&
        col("event_date") === "1995-01-01")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("isnotnull(topic"))
  }

  test("landing job restarts from checkpoint; duplicates re-delivered " +
       "across the restart are dropped by checkpointed state") {
    val base = Files.createTempDirectory("graft-landing-restart").toString
    val srcDir = s"$base/src"
    val lake = s"$base/lake"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))

    val lines = Fixtures
      .ordersChangeLines(ops.Tables(spark, sfDir, "orders").limit(40))
      .collect().map(_.getString(0))
    val (first, second) = lines.splitAt(20)

    // Fixture event times span years, so use a wide watermark: this test is
    // about state surviving restart, not late-data policy (LandingSpec's
    // main test covers the dedup mechanics; WindowedAggSpec covers late
    // drops).
    def start() = Landing.landingJob(
      Landing.fileSource(spark, srcDir, "debezium.commerce.orders"),
      Envelope.ordersPayload, lake, ckpt, dedupDelay = "36500 days")

    Files.write(java.nio.file.Paths.get(s"$srcDir/batch0.json"),
      first.mkString("\n").getBytes)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // Restart: re-deliver 8 already-landed lines (at-least-once upstream
    // replay) + the 20 genuinely new ones, in a new file.
    Files.write(java.nio.file.Paths.get(s"$srcDir/batch1.json"),
      (first.takeRight(8) ++ second).mkString("\n").getBytes)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // Each unique line exactly once. (`distinct`: every tombstone serializes
    // to the identical `{"value":null}` text — all-null dedup key — so the
    // at-least-once dedup rightly collapses them too.)
    val landedLines = spark.read.format("text").load(lake).count()
    assert(landedLines == lines.distinct.length)

    val decoded = graft.cdc.Decode.decodeEnvelope(
      Landing.readLake(spark, lake, Envelope.ordersPayload))
    val expected = graft.cdc.Decode.decodeEnvelope(
      graft.cdc.Decode.parseLines(lines.toSeq.toDS(), Envelope.orders))
    assert(decoded.count() == expected.count())
  }
}
