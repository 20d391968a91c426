package graft.pack

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  import spark.implicits._

  // Sparse, non-contiguous ids; token counts straddle the budget.
  private val docs = Seq(
    (3L, 400), (7L, 700), (12L, 100), (40L, 900), (41L, 250),
    (90L, 1), (91L, 2600), (200L, 50), (201L, 950), (500L, 10)
  ).toDF("doc_id", "n_tokens")

  test("matches the single-window greedy pass at any bucket width") {
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs
      .withColumn("start_offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("pack_id", expr("start_offset DIV 1000"))
      .select("doc_id", "start_offset", "pack_id")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    for (width <- Seq(1L, 3L, 50L, 1000L)) {
      val got = Packing.packByBudget(docs, "doc_id", "n_tokens", 1000L, width)
        .select("doc_id", "start_offset", "pack_id")
        .as[(Long, Long, Long)].collect().sorted.toSeq
      assert(got == expected, s"bucketWidth=$width")
    }
  }

  test("degenerate inputs: empty corpus, single document") {
    val empty = Packing.packByBudget(
      docs.filter(col("doc_id") < 0), "doc_id", "n_tokens", 1000L, 10L)
    assert(empty.columns.toSeq ==
      Seq("doc_id", "n_tokens", "start_offset", "pack_id"))
    assert(empty.count() == 0)

    val one = Packing.packByBudget(
      docs.filter(col("doc_id") === 3L), "doc_id", "n_tokens", 1000L, 10L)
      .select("start_offset", "pack_id").as[(Long, Long)].collect()
    assert(one.toSeq == Seq((0L, 0L)))
  }

  test("pack ids are non-decreasing in doc order and start at zero") {
    val rows = Packing.packByBudget(docs, "doc_id", "n_tokens", 1000L, 3L)
      .orderBy("doc_id")
      .select("start_offset", "pack_id")
      .as[(Long, Long)].collect()
    assert(rows.head._1 == 0L && rows.head._2 == 0L)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._1 >= a._1 && b._2 >= a._2
      case _ => true
    })
  }

  test("a pack never spans more tokens than budget plus one document") {
    val budget = 1000L
    val spans = Packing.packByBudget(docs, "doc_id", "n_tokens", budget, 3L)
      .groupBy("pack_id")
      .agg(min("start_offset").as("lo"),
        max(col("start_offset") + col("n_tokens")).as("hi"))
      .select(col("hi") - col("lo"))
      .as[Long].collect()
    val maxDoc = 2600L
    assert(spans.forall(_ <= budget + maxDoc))
  }
}
