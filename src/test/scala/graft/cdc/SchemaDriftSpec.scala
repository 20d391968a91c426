package graft.cdc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CDC schema drift, end to end: an upstream `ALTER TABLE ADD COLUMN`
  * makes newer Debezium envelopes carry a payload field older ones lack.
  * The engine's answer is schema-on-read — the landed lake keeps the RAW
  * lines, so re-decoding with the WIDENED payload schema surfaces the new
  * column (null on pre-drift rows) without rewriting a byte, and decoding
  * with the OLD schema keeps working because the native parser skips
  * unknown fields. Both directions are pinned here.
  */
class SchemaDriftSpec extends SparkSpec {

  import spark.implicits._

  private val oldPayload = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType)))
  private val newPayload = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType),
    StructField("discount", DoubleType))) // the ALTER-added column

  private def envelope(id: Long, status: String,
                       discount: Option[Double], lsn: Long): String = {
    val disc = discount.map(d => s""", "discount": $d""").getOrElse("")
    s"""{"value": {"op": "c", "before": null, "after": {"id": $id, "status": "$status"$disc}, "source": {"ts_ms": ${1704067200000L + lsn}, "lsn": $lsn}}}"""
  }

  private lazy val lake = Seq(
    envelope(1L, "old1", None, 10L),        // pre-drift envelope
    envelope(2L, "old2", None, 20L),        // pre-drift envelope
    envelope(3L, "new3", Some(0.25), 30L),  // post-drift envelope
    envelope(4L, "new4", Some(0.5), 40L)
  ).toDF("line")

  test("widened schema decodes old and new envelopes; old rows read null") {
    val decoded = Decode.parseLineColumnNative(lake,
        graft.model.Envelope.lineSchema(newPayload))
      .select(col("value.after.id").as("id"),
        col("value.after.status").as("status"),
        col("value.after.discount").as("discount"))
      .as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(decoded == Seq(
      (1L, "old1", None), (2L, "old2", None),
      (3L, "new3", Some(0.25)), (4L, "new4", Some(0.5))))
  }

  test("old schema keeps decoding post-drift envelopes (unknown field skipped)") {
    val decoded = Decode.parseLineColumnNative(lake,
        graft.model.Envelope.lineSchema(oldPayload))
      .select(col("value.after.id").as("id"),
        col("value.after.status").as("status"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(decoded == Seq(
      (1L, "old1"), (2L, "old2"), (3L, "new3"), (4L, "new4")))
  }
}
