package graft.functions

import graft.SparkSpec

/** The shared test session is built `.withExtensions(new GraftExtensions)`
  * (see SparkSpec), so this exercises the real injection path.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("debezium_decimal is callable from SQL via SparkSessionExtensions") {
    val out = spark.sql("SELECT debezium_decimal('DOQ=', 2) AS d")
      .collect().head.getDecimal(0)
    assert(out == new java.math.BigDecimal("33.00"))
  }

  test("wrong arity is rejected at resolution") {
    val err = intercept[Exception] {
      spark.sql("SELECT debezium_decimal('DOQ=')").collect()
    }
    assert(err.getMessage.contains("2 arguments"))
  }
}
