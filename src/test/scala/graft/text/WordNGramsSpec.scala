package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordNGramsSpec extends SparkSpec {

  import spark.implicits._

  test("native shingles == composed array_distinct/transform/slice form") {
    val inputs = Seq("a b c b c d", "  Mixed   CASE  words ", "one",
      "two words", "exactly three words", "ünïcödé words here too")
    for (n <- Seq(2, 3)) {
      val toks = split(lower(trim(col("s"))), "\\s+")
      val composed = array_distinct(transform(
        sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
        i => array_join(slice(toks, i, lit(n)), " ")))
      val mismatches = inputs.toDF("s")
        .select(WordNGrams(col("s"), n).as("native"),
          composed.as("composed"))
        .filter(col("native") =!= col("composed"))
        .count()
      assert(mismatches == 0, s"n=$n")
    }
  }
}
