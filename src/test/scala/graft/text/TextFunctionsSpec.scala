package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions._

class TextFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("v")).collect().head.getAs[T]("v")

  test("token counts: whitespace vs BPE-ish pieces") {
    assert(one[Int](tokenCount(col("text")), "the quick  brown fox") == 4)
    assert(one[Int](bpeTokenCount(col("text")), "it's 42 tokens!") == 6)
  }

  test("stopword ratio and type-token ratio") {
    assert(one[Double](stopwordRatio(col("text")), "the cat and the hat") == 0.6)
    assert(one[Double](typeTokenRatio(col("text")), "the cat and the hat") == 0.8)
  }

  test("langId picks the marker-densest language deterministically") {
    assert(one[String](langId(col("text")), "the weather there is rather nice") == "en")
    // 'sch'/'ei' markers dominate
    assert(one[String](langId(col("text")), "schein scheint eins zwei") == "de")
  }

  test("fingerprint normalizes whitespace and case") {
    val a = one[String](fingerprint(col("text")), "  Hello   World ")
    val b = one[String](fingerprint(col("text")), "hello world")
    assert(a == b)
  }

  test("hash60 is a positive 60-bit value") {
    val h = one[Long](hash60(col("text")), "anything")
    assert(h >= 0 && h < (1L << 60))
  }

  test("shingles are distinct space-joined word n-grams") {
    val sh = Seq("a b c b c d").toDF("text")
      .select(shingles(col("text"), 3).as("v")).as[Seq[String]].head()
    assert(sh.toSet == Set("a b c", "b c b", "c b c", "b c d"))
  }

  test("jaccard on known sets") {
    val j = Seq(1).toDF("x").select(jaccard(
      array(lit("a"), lit("b"), lit("c")),
      array(lit("b"), lit("c"), lit("d"))).as("v"))
      .collect().head.getDouble(0)
    assert(j == 0.5)
  }
}
