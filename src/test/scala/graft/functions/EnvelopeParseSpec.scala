package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cdc.{Decode, Fixtures}
import graft.model.Envelope

class EnvelopeParseSpec extends SparkSpec {

  import spark.implicits._

  private val schema = Envelope.prunedLineSchema(Envelope.ordersPayload)

  test("native parse equals from_json on the real fixture lake lines") {
    val orders = graft.ops.Tables(spark, sfDir, "orders")
    val lines = Fixtures.ordersChangeLines(orders).select(col("line"))
    val viaJackson = Decode.parseLineColumn(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j").as[String].collect().sorted
    val viaNative = Decode.parseLineColumnNative(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j").as[String].collect().sorted
    assert(viaNative.length == viaJackson.length && viaNative.length > 0)
    assert(viaNative.sameElements(viaJackson))
  }

  test("edge lines: tombstones, malformed, missing/extra/dup fields, mismatches") {
    val lines = Seq(
      """{"value": null}""",                                  // tombstone
      """not json at all""",                                  // malformed
      """{"value": {"op": "c"}}""",                           // missing most
      """{"value": {"op": "c", "bogus": {"deep": [1,2]}}}""", // unknown subtree
      """{"value": {"op": "c", "op": "u"}}""",                // dup: last wins
      """{"value": {"source": {"lsn": "oops"}}}""",           // long <- string
      """{"value": {"after": 7}}""",                          // struct <- int
      """{}""",
      """{"value": {"after": {"id": 3, "status": "O", "totalprice": 12.5},
           "source": {"ts_ms": 1700000000123, "lsn": 42}, "op": "c"}}"""
    ).toDF("line")
    val viaJackson = Decode.parseLineColumn(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j").as[String].collect().sorted
    val viaNative = Decode.parseLineColumnNative(lines, schema)
      .selectExpr("coalesce(to_json(value), '<null>') AS j").as[String].collect().sorted
    assert(viaNative.sameElements(viaJackson))
  }

  test("interpreted eval path matches codegen") {
    val line =
      """{"value": {"after": {"id": 9, "status": "F", "totalprice": 1.25},
         "source": {"ts_ms": 5, "lsn": 90}, "op": "u"}}"""
    val parser = new JsonStructParser(schema)
    val row = parser.parse(org.apache.spark.unsafe.types.UTF8String.fromString(line))
    val value = row.getStruct(0, 4)
    assert(value.getStruct(1, 3).getLong(0) == 9L)      // after.id
    assert(value.getStruct(2, 2).getLong(1) == 90L)     // source.lsn
    assert(value.getUTF8String(3).toString == "u")      // op
  }
}
