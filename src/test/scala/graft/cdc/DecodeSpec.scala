package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Envelope

class DecodeSpec extends SparkSpec {

  import spark.implicits._

  /** Hand-written NDJSON lines shaped like the reference's sample envelope
    * (reference `README.md:214`): one create, one update, one delete, one
    * snapshot, one invalid op, one tombstone (null value).
    */
  private val lines = Seq(
    """{"value":{"before":null,"after":{"id":1,"status":"O","totalprice":10.5},"source":{"ts_ms":1000,"lsn":100,"table":"orders"},"op":"c","ts_ms":1000}}""",
    """{"value":{"before":{"id":1,"status":"O","totalprice":10.5},"after":{"id":1,"status":"F","totalprice":11.0},"source":{"ts_ms":2000,"lsn":200,"table":"orders"},"op":"u","ts_ms":2000}}""",
    """{"value":{"before":{"id":1,"status":"F","totalprice":11.0},"after":null,"source":{"ts_ms":3000,"lsn":300,"table":"orders"},"op":"d","ts_ms":3000}}""",
    """{"value":{"before":null,"after":{"id":2,"status":"O","totalprice":5.0},"source":{"ts_ms":500,"lsn":50,"table":"orders"},"op":"r","ts_ms":500}}""",
    """{"value":{"before":null,"after":{"id":3,"status":"O","totalprice":1.0},"source":{"ts_ms":600,"lsn":60,"table":"orders"},"op":"z","ts_ms":600}}""",
    """{"value":null}"""
  )

  private lazy val decoded =
    Decode.decodeEnvelope(
      Decode.parseLines(lines.toDS(), Envelope.orders), "id")

  test("tombstones (null value / null lsn) are dropped") {
    assert(decoded.count() == 5)
  }

  test("op codes classify as the reference CASE does") {
    val ops = decoded.orderBy("log_seq_num")
      .select("operation_type").as[String].collect().toSeq
    assert(ops == Seq("SNAPSHOT", "INVALID", "CREATE", "UPDATE", "DELETE"))
  }

  test("key falls back to before.id on deletes (COALESCE)") {
    val del = decoded.filter($"operation_type" === "DELETE")
    assert(del.select("id").as[Long].head() == 1L)
    assert(del.select($"after").filter($"after".isNotNull).count() == 0)
  }

  test("malformed / truncated / wrong-shape lines decode to null and are filtered") {
    val bad = Seq(
      """not json at all""",
      """{"value": {"truncated": """,
      """{"unexpected": 42}""",
      """{"value": {"before": "not-a-struct", "op": 7}}""",
      "")
    val decoded = Decode.decodeEnvelope(
      Decode.parseLines((lines ++ bad).toDS(), Envelope.orders), "id")
    // exactly the 5 well-formed events survive (lsn null-filter drops the rest)
    assert(decoded.count() == 5)
  }

  test("S5: schema-inferred single-file JSON scan sees the envelope shape") {
    val dir = java.nio.file.Files.createTempDirectory("graft-s5")
    val f = dir.resolve("sample.json")
    java.nio.file.Files.write(f, lines.filter(_.contains("\"op\""))
      .mkString("\n").getBytes)
    val inferred = spark.read.json(f.toString)
    val value = inferred.schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(value.fieldNames.toSet
      .intersect(Set("after", "before", "op", "source")).size == 4)
    assert(inferred.count() == 5)
  }

  test("source_timestamp is epoch-millis as TIMESTAMP_NTZ") {
    val ts = decoded.filter($"log_seq_num" === 100)
      .select($"source_timestamp".cast("string")).as[String].head()
    assert(ts == "1970-01-01 00:00:01")
  }
}
