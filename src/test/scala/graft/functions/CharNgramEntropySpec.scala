package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CharNgramEntropySpec extends SparkSpec {

  import spark.implicits._

  private val Grid = 1048576L

  private def run(texts: String*): Seq[(Long, Long, Double)] =
    texts.toDF("t")
      .select(CharNgramEntropy(col("t"), 3).as("e"))
      .select(col("e.n_grams"), col("e.n_distinct"), col("e.entropy"))
      .as[(Long, Long, Double)].collect().toSeq

  private def quantized(p: Double): Double =
    java.math.BigDecimal.valueOf(p * Math.log(p) * Grid)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / Grid

  test("counts and entropy match a hand-computed example") {
    // "abcabc" → grams abc, bca, cab, abc: 4 total, 3 distinct,
    // p = {2/4, 1/4, 1/4}
    val Seq((n, d, h)) = run("abcabc")
    assert(n == 4L && d == 3L)
    assert(h == -(quantized(0.5) + quantized(0.25) + quantized(0.25)))
  }

  test("uniform text has zero entropy; short/empty strings yield 0 grams") {
    assert(run("aaaa") == Seq((2L, 1L, -(2 * 0.0))) ||
      run("aaaa").head._3 == 0.0) // p=1 → ln 1 = 0
    assert(run("ab") == Seq((0L, 0L, 0.0)))
    assert(run("") == Seq((0L, 0L, 0.0)))
  }

  test("n-grams window code points, not UTF-16 chars") {
    // U+1F600 is a surrogate pair in UTF-16; 5 code points → 3 trigrams
    val s = "a😀b😀c"
    val Seq((n, d, _)) = run(s)
    assert(n == 3L && d == 3L)
  }

  test("matches the relational explode+groupBy form on arbitrary text") {
    val docs = Seq("the cat sat on the mat", "aabbccaabbcc", "xyzzy xyzzy")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "t")
    val kernel = docs
      .select(col("doc_id"), CharNgramEntropy(col("t"), 3).as("e"))
      .select(col("doc_id"), col("e.n_grams"), col("e.n_distinct"),
        col("e.entropy"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val cnt = docs
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - 2)).as("i"), col("t"))
      .select(col("doc_id"), expr("substring(t, i, 3)").as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("nd"))
    val p = col("c").cast("double") / col("n").cast("double")
    val relational = cnt.join(tot, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(first(col("n")).as("n_grams"), first(col("nd")).as("n_distinct"),
        (-sum(round(p * log(p) * Grid, 0) / Grid)).as("entropy"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(kernel == relational)
  }
}
