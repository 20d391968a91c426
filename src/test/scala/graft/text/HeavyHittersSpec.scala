package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("two-pass result equals the exact groupBy-HAVING, tiny capacity") {
    // adversarial mix: 3 heavy tokens drowned in a long unique tail, spread
    // over several partitions so the per-partition summaries must compose
    val heavy = Seq.fill(120)("aa") ++ Seq.fill(80)("bb") ++ Seq.fill(40)("cc")
    val tail = (1 to 600).map(i => s"u$i")
    val docs = scala.util.Random.shuffle(heavy ++ tail)
      .grouped(20).map(_.mkString(" ")).toSeq
      .toDF("text").repartition(7)

    val expected = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= 40)
      .as[(String, Long)].collect().sorted.toSeq

    // n = 840 tokens, capacity 32 → guarantee holds for threshold > 26
    val got = HeavyHitters.frequentTokens(docs, "text", threshold = 40,
        capacity = 32)
      .as[(String, Long)].collect().sorted.toSeq
    assert(got == expected)
    assert(got.map(_._1) == Seq("aa", "bb", "cc"))
  }

  test("a threshold below the n/capacity guarantee is rejected loudly") {
    val docs = Seq.fill(100)("x y z").toDF("text")
    val err = intercept[IllegalArgumentException] {
      HeavyHitters.frequentTokens(docs, "text", threshold = 2, capacity = 8)
    }
    assert(err.getMessage.contains("raise capacity"))
  }
}
