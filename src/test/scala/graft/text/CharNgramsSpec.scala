package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharNgramsSpec extends SparkSpec {
  import spark.implicits._

  /** The composed reference form the kernel replaces (interpreted HOF). */
  private def viaHof(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("id"),
        explode(expr(s"""CASE WHEN length(s) < $n
            THEN CAST(array() AS ARRAY<STRING>)
            ELSE transform(sequence(1, length(s) - $n + 1),
                           i -> substring(s, i, $n)) END""")).as("ng"))
      .groupBy(col("id"), col("ng")).agg(count(lit(1)).as("k"))
      .select("id", "ng", "k").as[(Long, String, Long)].collect().toSet

  private def viaKernel(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("id"), explode(CharNgrams(col("s"), n)).as("e"))
      .select(col("id"), col("e.ng"), col("e.k"))
      .as[(Long, String, Long)].collect().toSet

  test("kernel counts equal the transform+substring+groupBy composition") {
    val rows = Seq(
      (1L, "abcabcab"), (2L, "aa"), (3L, "a"), (4L, ""),
      (5L, "the quick brown fox the quick"), (6L, "ααββ αβ"),
      (7L, "x\ty\nz"), (8L, "zzzzzzzz")).toDF("id", "s")
    for (n <- Seq(2, 3)) {
      assert(viaKernel(rows, n) == viaHof(rows, n), s"n=$n diverged")
    }
  }

  test("supplementary (non-BMP) code points step like Spark's substring") {
    // emoji are surrogate PAIRS in UTF-16; the kernel must step by code
    // point or the windows shift off Spark/DuckDB's character semantics
    val rows = Seq((1L, "a😀b😀")).toDF("id", "s")
    assert(viaKernel(rows, 2) == viaHof(rows, 2))
  }

  test("short strings yield zero rows and counts sum to windows") {
    val rows = Seq((1L, "abcdef")).toDF("id", "s")
    val total = viaKernel(rows, 2).toSeq.map(_._3).sum
    assert(total == 5L)
    assert(viaKernel(Seq((1L, "x")).toDF("id", "s"), 2).isEmpty)
  }
}
