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

  test("encode is the exact inverse: unscaled long → wire base64 → decimal") {
    // Known vector: 3300 → 0x0CE4 → "DOQ=". Round-trip a spread of signed
    // values (incl. negatives whose minimal two's-complement adds/drops a
    // sign byte) through encode → decode.
    val enc = Seq(3300L).toDF("u")
      .select(DebeziumDecimal.encodeCol($"u").as("b64"))
      .as[String].head()
    assert(enc == "DOQ=")
    val vals = Seq(0L, 1L, -1L, 127L, 128L, -128L, -129L, 3300L,
      1234567890123L, -987654321L)
    val bad = vals.toDF("u")
      .select($"u",
        DebeziumDecimal(DebeziumDecimal.encodeCol($"u"), 2).as("d"))
      .filter($"d" =!= $"u".cast("decimal(20,2)") / 100)
      .count()
    assert(bad == 0)
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
