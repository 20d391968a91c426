package graft.pack

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property check: the distributed prefix-sum packing equals the sequential
  * single-window greedy pass for random corpora, budgets, and bucket widths
  * (seeded generators — reproducible, no flaky randomness).
  */
class PackingPropertySpec extends SparkSpec {

  import spark.implicits._

  private val caseGen = for {
    n <- Gen.choose(1, 60)
    ids <- Gen.pick(n, 0L until 500L)
    toks <- Gen.listOfN(n, Gen.choose(0, 3000))
    budget <- Gen.oneOf(1L, 7L, 100L, 1000L)
    width <- Gen.oneOf(1L, 2L, 13L, 64L, 1000L)
  } yield (ids.toSeq.sorted.zip(toks), budget, width)

  test("packByBudget == single-window greedy pass (20 seeded cases)") {
    val params = Gen.Parameters.default
    for (seed <- 1 to 20) {
      val (rows, budget, width) =
        caseGen.pureApply(params, org.scalacheck.rng.Seed(seed.toLong))
      val docs = rows.toDF("doc_id", "n_tokens")

      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = docs
        .withColumn("start_offset",
          sum("n_tokens").over(w) - col("n_tokens"))
        .withColumn("pack_id", expr(s"start_offset DIV $budget"))
        .select("doc_id", "start_offset", "pack_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq

      val got = Packing
        .packByBudget(docs, "doc_id", "n_tokens", budget, width)
        .select("doc_id", "start_offset", "pack_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq

      assert(got == expected,
        s"seed=$seed budget=$budget width=$width n=${rows.size}")
    }
  }
}
