package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.Fixtures
import graft.model.Envelope

class RawLakeWriterSpec extends SparkSpec {

  import spark.implicits._

  test("round-trip: write the raw sink template, read it back via ForeignLake") {
    val root = Files.createTempDirectory("graft_rawlake").toString
    val orders = graft.ops.Tables(spark, sfDir, "orders")
    // NO tombstone pre-filter: the writer must consume landingTransform's
    // full output (real CDC streams always carry tombstones) and route the
    // null-ts/lsn rows to the epoch directory.
    val landed = Landing.landingTransform(
        Fixtures.ordersChangeLines(orders)
          .select(lit("debezium.commerce.orders").as("topic"),
            col("line")),
        Envelope.ordersPayload)

    RawLakeWriter.writeBatch(landed, root, flushSize = 20)

    // every file obeys the <topic>/<date>/<HH>/<part>-<offset>.json template
    // and the flush size
    import scala.jdk.CollectionConverters._
    val files = Files.walk(Paths.get(root)).iterator().asScala
      .filter(Files.isRegularFile(_)).toSeq
    assert(files.nonEmpty)
    val tmpl = (".*/debezium\\.commerce\\.orders/" +
      "\\d{4}-\\d{2}-\\d{2}/\\d{2}/\\d+-\\d+\\.json$").r
    files.foreach { f =>
      assert(tmpl.findFirstIn(f.toString).isDefined, s"bad path: $f")
      assert(Files.readAllLines(f).size <= 20)
    }

    // tombstones landed in the epoch-dir fallback, nowhere else
    val nTombstones = landed.filter(col("lsn").isNull).count()
    assert(nTombstones > 0, "fixture should contain tombstones")
    val epochDir = Paths.get(root,
      "debezium.commerce.orders", "1970-01-01", "00")
    val epochLines = Files.walk(epochDir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .flatMap(Files.readAllLines(_).asScala).toSeq
    assert(epochLines.length == nTombstones)

    // identical line multiset back through the foreign reader
    val written = ForeignLake
      .readLines(spark, root, "debezium.commerce.orders")
      .select("line").as[String].collect().sorted
    val expected = landed.select("line").as[String].collect().sorted
    assert(written.length == expected.length)
    assert(written.sameElements(expected))

    // and the decoded change log equals the direct-decode path
    val viaForeign = ForeignLake.read(spark, root,
        "debezium.commerce.orders", Envelope.ordersPayload)
      .select("id", "operation_type", "log_seq_num")
      .as[(Long, String, Long)].collect().sorted.toSeq
    val direct = Fixtures.ordersChangeLog(orders, sfDir)
      .select("id", "operation_type", "log_seq_num")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(viaForeign == direct)
  }
}
