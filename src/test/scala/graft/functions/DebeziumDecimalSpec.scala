package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DebeziumDecimalSpec extends SparkSpec {

  import spark.implicits._

  test("""reference vector "DOQ=" decodes to 33.00 (README.md:214)""") {
    val out = Seq("DOQ=").toDF("b64")
      .select(DebeziumDecimal($"b64", 2).as("d"))
      .as[java.math.BigDecimal].head()
    assert(out == new java.math.BigDecimal("33.00"))
  }

  test("negative two's-complement and null pass through correctly") {
    // -1 unscaled at scale 2 = -0.01; byte 0xFF base64 = "/w=="
    val out = Seq(Some("/w=="), None).toDF("b64")
      .select(DebeziumDecimal($"b64", 2).as("d"))
      .as[Option[java.math.BigDecimal]].collect().toSeq
    assert(out == Seq(Some(new java.math.BigDecimal("-0.01")), None))
  }

  test("stays inside whole-stage codegen (no UDF fallback)") {
    // Input must depend on the row (a pure literal constant-folds away, a
    // LocalRelation folds entirely); `*(n)` marks a codegen'd stage in the
    // executedPlan string.
    val plan = spark.range(4)
      .select(when($"id" % 2 === 0, "DOQ=").otherwise("/w==").as("b64"))
      .select(DebeziumDecimal($"b64", 2).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("))
    assert(plan.contains("debezium_decimal"))
  }
}
