package graft.model

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NaiveBayesText: the char-bigram NB pipeline must LEARN when the labels
  * carry bigram signal (the driver corpus's `lang` is text-independent by
  * construction, so the tx23 gate itself can only pin arithmetic — this
  * fixture is where model quality is proven).
  */
class NaiveBayesTextSpec extends SparkSpec {

  /** Two "languages" with disjoint character inventories, plus per-doc
    * deterministic variation so bigram counts differ across docs.
    */
  private def corpus = {
    import spark.implicits._
    (0 until 120).map { i =>
      val (label, alpha) =
        if (i % 2 == 0) ("aa", "abcd") else ("zz", "wxyz")
      val text = (0 until 40).map { j =>
        val c1 = alpha((i + j) % 4); val c2 = alpha((i * 3 + j) % 4)
        s"$c1$c2"
      }.mkString(" ")
      (i.toLong, label, text)
    }.toDF("id", "label", "text")
  }

  test("held-out accuracy is perfect on a signal-bearing corpus") {
    val pred = NaiveBayesText.heldOutPredictions(corpus, evalMod = 5)
    val rows = pred.collect()
    assert(rows.length == 24, "one row per held-out doc (120 / 5)")
    val acc = rows.count(r => r.getString(1) == r.getString(2)).toDouble /
      rows.length
    assert(acc >= 0.9, s"accuracy $acc")
  }

  test("every eval doc gets exactly one prediction; ids are the %5 split") {
    val pred = NaiveBayesText.heldOutPredictions(corpus, evalMod = 5)
    val ids = pred.select(col("id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0 until 120 by 5).map(_.toLong))
  }

  test("confusion matrix totals the eval split and is deterministic") {
    val c1 = NaiveBayesText.heldOutConfusion(corpus).collect()
    val c2 = NaiveBayesText
      .heldOutConfusion(corpus.repartition(7)).collect()
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq,
      "grid-quantized scores must be partitioning-independent")
    assert(c1.map(_.getLong(2)).sum == 24)
  }

  test("sub-2-char texts contribute no bigrams (prior-only corpus is fine)") {
    import spark.implicits._
    // One-char docs: training sees no bigrams, so eval scoring is
    // priors-only — must not throw (Spark's sequence(1, 0) pitfall).
    val tiny = Seq((0L, "a", "x"), (1L, "a", "y"), (2L, "b", "z"),
      (3L, "b", "w"), (4L, "b", "v"), (5L, "a", "u"))
      .toDF("id", "label", "text")
    val pred = NaiveBayesText.heldOutPredictions(tiny, evalMod = 5)
    // Eval ids 0 and 5 have no bigram rows at all -> no score rows; the
    // pipeline derives eval docs FROM bigram rows, so they are absent
    // rather than mis-scored.
    assert(pred.collect().isEmpty)
  }
}
