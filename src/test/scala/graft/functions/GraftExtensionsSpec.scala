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

  test("debezium_decimal_encode round-trips from SQL") {
    val out = spark.sql(
      "SELECT debezium_decimal(debezium_decimal_encode(3300), 2) AS d")
      .collect().head.getDecimal(0)
    assert(out == new java.math.BigDecimal("33.00"))
  }

  test("hash60 / min_chargram_hash / word_ngrams are SQL-callable and " +
       "agree with their composed built-in forms") {
    val r = spark.sql("""
      SELECT hash60('abc') AS h,
             CAST(conv(substr(md5(CAST('abc' AS BINARY)), 1, 15), 16, 10)
               AS BIGINT) AS h_composed,
             min_chargram_hash('the quick brown fox', 8) AS mg,
             word_ngrams('a b c', 2) AS ng
    """).collect().head
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(2) >= 0 && r.getLong(2) < (1L << 60))
    assert(r.getSeq[String](3).sorted == Seq("a b", "b c"))
  }

  test("envelope_parse is SQL-callable with a DDL schema literal") {
    val r = spark.sql("""
      SELECT envelope_parse(
        '{"value": {"op": "c", "source": {"lsn": 42}}}',
        'value STRUCT<op: STRING, source: STRUCT<lsn: BIGINT>>') AS e
    """).selectExpr("e.value.op", "e.value.source.lsn").collect().head
    assert(r.getString(0) == "c" && r.getLong(1) == 42L)
  }

  test("withS3a mirrors the reference's s3 conf block onto the Hadoop conf") {
    graft.GraftSession.withS3a(spark, "http://localhost:9000",
      "minio", "minio123")
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(hc.get("fs.s3a.access.key") == "minio")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "false")
  }

  test("jaro_winkler / deletion_variants / nfc_normalize / ac_count are " +
       "SQL-callable") {
    val r = spark.sql("""
      SELECT jaro_winkler('martha', 'marhta') AS jw,
             deletion_variants('abc') AS dv,
             nfc_normalize('café') AS nfc,
             ac_count('she sells seashells', array('she', 'sea')) AS ac
    """).collect().head
    assert(r.getDouble(0) == 0.9611111111111111)
    assert(r.getSeq[String](1).toSet == Set("abc", "bc", "ac", "ab"))
    assert(r.getString(2) == "café")
    // per-term hit counts: 'she' at 0 and inside 'seashells'; 'sea' once
    assert(r.getSeq[Long](3) == Seq(2L, 1L))
  }

  test("char_ngram_entropy / char_ngram_counts / int_ewma / bpe_apply are " +
       "SQL-callable") {
    val r = spark.sql("""
      SELECT char_ngram_entropy('aaaa', 2) AS e,
             char_ngram_counts('aab', 2) AS c,
             int_ewma(array(CAST(4 AS BIGINT), 8, 12)) AS w,
             bpe_apply('abab', array('ab'), array('Z')) AS b
    """).collect().head
    assert(r.getStruct(0).getDouble(2) == 0.0) // all grams identical
    assert(r.getSeq[org.apache.spark.sql.Row](1).nonEmpty)
    assert(r.getSeq[Long](2).head == 4L * 1048576L) // 2^20 grid units
    assert(r.getString(3) == "ZZ")
  }

  test("wordpiece_count is SQL-callable") {
    val r = spark.sql("""
      SELECT wordpiece_count('the',
        array('t', 'h', 'e', '_', 'the')) AS np
    """).collect().head
    assert(r.getInt(0) == 2) // "the" + "_"
  }
}
