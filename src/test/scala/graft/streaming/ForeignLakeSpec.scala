package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{SparkSpec, ops}
import graft.cdc.{Decode, Fixtures}
import graft.model.Envelope

/** The reference's RAW lake layout
  * (`<topic>/<yyyy-MM-dd>/<HH>/<partition>-<offset>.json`, reference
  * `connectors/s3-sink.json:14`): files landed in that exact template must
  * (a) decode identically to the Hive-layout path and (b) prune the file
  * LISTING when a date/hour slice is requested — not list-everything and
  * filter rows.
  */
class ForeignLakeSpec extends SparkSpec {

  import spark.implicits._

  test("raw-template lake: pruned listing + decode identical to direct parse") {
    val root = Files.createTempDirectory("graft-foreign").toString
    val topic = "debezium.commerce.orders"

    val lines = Fixtures
      .ordersChangeLines(ops.Tables(spark, sfDir, "orders").limit(80))
      .collect().map(_.getString(0))

    // Derive each line's (date, hour) the same way the sink would (envelope
    // source.ts_ms); tombstones (null value → null ts) land in an epoch dir,
    // mirroring a sink that falls back to a fixed path for keyless messages.
    val landed = Landing.landingTransform(
        lines.toSeq.toDF("line").withColumn("topic", lit(topic)),
        Envelope.ordersPayload)
      .select(col("line"),
        coalesce(col("event_date"), lit("1970-01-01")).as("d"),
        coalesce(col("event_hour"), lit("00")).as("h"))
      .collect()

    // Write the raw template: flush.size=20 lines per file, kafka partition
    // 0, zero-padded-free offsets — `<part>-<offset>.json`.
    val groups = landed.groupBy(r => (r.getString(1), r.getString(2)))
    var offset = 0L
    var totalFiles = 0
    val filesPerSlice = groups.map { case ((d, h), rows) =>
      val dir = Paths.get(s"$root/$topic/$d/$h")
      Files.createDirectories(dir)
      val nFiles = rows.grouped(20).zipWithIndex.map { case (chunk, _) =>
        Files.write(dir.resolve(s"0-$offset.json"),
          chunk.map(_.getString(0)).mkString("\n").getBytes)
        offset += chunk.length
        1
      }.sum
      totalFiles += nFiles
      (d, h) -> nFiles
    }

    // (a) full-scan decode == direct parse of the same lines (tombstones
    // dropped by the lsn filter on both paths), with path columns attached.
    val foreign = ForeignLake.read(spark, root, topic, Envelope.ordersPayload)
    val direct = Decode.decodeEnvelope(
      Decode.parseLines(lines.toSeq.toDS(), Envelope.orders))
    assert(foreign.count() == direct.count())
    assert(foreign.select("log_seq_num").as[Long].collect().sorted.toSeq ==
      direct.select("log_seq_num").as[Long].collect().sorted.toSeq)
    assert(foreign.select("topic").distinct().as[String].collect().toSeq ==
      Seq(topic))
    assert(foreign.filter(col("file_offset").isNull ||
      col("file_partition") =!= 0).count() == 0)

    // (b) a date+hour slice lists ONLY that directory's files — pruning at
    // listing time, before any read.
    val ((d0, h0), nFiles0) = filesPerSlice.head
    val pruned = ForeignLake.readLines(spark, root, topic,
      dates = Seq(d0), hours = Seq(h0))
    assert(pruned.inputFiles.length == nFiles0)
    assert(pruned.inputFiles.length < totalFiles)
    val full = ForeignLake.readLines(spark, root, topic)
    assert(full.inputFiles.length == totalFiles)

    // The pruned slice decodes to exactly the full decode filtered to it.
    val prunedDecoded = ForeignLake.read(spark, root, topic,
      Envelope.ordersPayload, dates = Seq(d0), hours = Seq(h0))
    val expectSlice = foreign
      .filter(col("event_date") === d0 && col("event_hour") === h0)
    assert(prunedDecoded.count() == expectSlice.count())
  }
}
