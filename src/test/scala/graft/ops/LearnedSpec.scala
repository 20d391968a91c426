package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gate-level checks for the trained-model queries on sf0.001. */
class LearnedSpec extends SparkSpec {

  test("cur13 beats the base rate by a wide margin (model learned)") {
    val out = LearnedQueries.queries("cur13_lr_quality_model")(spark, sfDir)
    val row = out.agg(
      avg(when(col("pred") === col("y_teacher"), 1.0).otherwise(0.0)),
      avg(col("y_teacher").cast("double"))).head
    val (acc, base) = (row.getDouble(0), row.getDouble(1))
    assert(base > 0.35 && base < 0.65, s"teacher classes unbalanced: $base")
    assert(acc >= 0.9, s"accuracy $acc — the classifier must actually learn")
  }

  test("cur13 probabilities are calibrated-ordered against the teacher") {
    val out = LearnedQueries.queries("cur13_lr_quality_model")(spark, sfDir)
    val row = out.agg(
      avg(when(col("y_teacher") === 1, col("p_quality"))),
      avg(when(col("y_teacher") === 0, col("p_quality")))).head
    assert(row.getDouble(0) > row.getDouble(1) + 0.2,
      s"positives must score clearly above negatives: $row")
    val bounds = out.agg(min(col("p_quality")), max(col("p_quality"))).head
    assert(bounds.getDouble(0) > 0.0 && bounds.getDouble(1) < 1.0)
  }

  test("tx23 confusion matrix covers the eval split exactly once") {
    val out = LearnedQueries.queries("tx23_nb_langid")(spark, sfDir)
    val total = out.agg(sum(col("n_docs"))).head.getLong(0)
    val evalDocs = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(total == evalDocs, s"$total confusion entries vs $evalDocs docs")
  }
}
