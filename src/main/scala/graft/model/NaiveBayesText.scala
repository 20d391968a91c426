package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over character bigrams — the train-a-cheap-
  * classifier step (language ID, domain routing) of a training-data
  * pipeline, built so the whole train→score→argmax chain is exact:
  *
  *   - per-(label, bigram) Laplace-smoothed log-probabilities and label
  *     log-priors are rounded to the 2^-20 ln grid (the repo-standard
  *     cross-libm ln discipline) and kept as BIGINT grid units;
  *   - a document's score is then an exact integer sum Σ count·logp —
  *     order-independent, so parallel and sequential engines agree;
  *   - the argmax tie-breaks (score DESC, label ASC) deterministically.
  *
  * Scale shape: training is two hash aggregations over the bigram
  * explosion (O(chars) rows, collapsing immediately to O(labels·vocab));
  * inference joins eval bigram counts against the model by
  * (label, bigram) equi-join with the O(labels) prior/floor table
  * broadcast; the per-doc argmax is a bounded window (labels rows per
  * doc). Driver state: two scalar counts (vocab size, train-doc count).
  */
object NaiveBayesText {

  val Grid = 1048576L

  /** Pre-counted char-bigram rows (id, label, bg, k) from
    * `docs(id, label, text)` via the [[graft.text.CharNgrams]] codegen
    * kernel — one scan-side pass per document instead of an interpreted
    * per-character HOF explosion, and counts arrive already aggregated
    * per (doc, bigram) so the eval path needs no corpus-wide shuffle at
    * all. Sub-2-char texts yield zero rows (the kernel emits no short
    * windows).
    */
  private def bigramCountRows(docs: DataFrame): DataFrame =
    docs.select(col("id"), col("label"),
        explode(graft.text.CharNgrams(lower(col("text")), 2)).as("e"))
      .select(col("id"), col("label"),
        col("e.ng").as("bg"), col("e.k").as("k"))

  /** Train on `id % evalMod != 0`, score the held-out `id % evalMod = 0`
    * split. Input `docs`: (id, label, text); output one row per eval doc:
    * (id, label_true, label_pred).
    */
  def heldOutPredictions(docs: DataFrame, evalMod: Int = 5): DataFrame = {
    val g = Grid.toDouble
    // lineage-cut (r12 optimization round): the bigram-count table is
    // referenced by the train aggregation, the vocab-size count (a
    // driver action), and the eval scoring path — each reference re-ran
    // the text scan + CharNgrams explosion; the cut runs it once
    val db = graft.graph.GraphOps.checkpoint(bigramCountRows(docs))
    val train = db.filter(col("id") % evalMod =!= 0)
    val counts = train.groupBy(col("label"), col("bg"))
      .agg(sum(col("k")).as("c"))
    val totals = counts.groupBy(col("label")).agg(sum(col("c")).as("tl"))
    val v = counts.select(col("bg")).distinct().count()
    val tdocs = docs.filter(col("id") % evalMod =!= 0)
      .select(col("id"), col("label"))
    val tn = tdocs.count()
    val priors = tdocs.groupBy(col("label")).agg(count(lit(1)).as("nd"))
      .select(col("label"),
        round(log(col("nd").cast("double") / lit(tn.toDouble)) * lit(g))
          .cast("long").as("prior"))
    val lp = counts.join(totals, "label")
      .select(col("label"), col("bg"),
        round(log((col("c") + lit(1)).cast("double")
            / (col("tl") + lit(v)).cast("double")) * lit(g))
          .cast("long").as("lp"))
    val fl = totals.select(col("label"),
      round(log(lit(1.0) / (col("tl") + lit(v)).cast("double")) * lit(g))
        .cast("long").as("fl"))
    // kernel counts are already per-(doc, bigram) — no aggregation needed
    val evalCnt = db.filter(col("id") % evalMod === 0)
      .withColumnRenamed("label", "label_true")
    val cand = fl.join(priors, "label")
    val scored = evalCnt.crossJoin(broadcast(cand))
      .join(lp, Seq("label", "bg"), "left")
      .groupBy(col("id"), col("label_true"), col("label"), col("prior"))
      .agg(sum(col("k") * coalesce(col("lp"), col("fl"))).as("sk"))
      .select(col("id"), col("label_true"), col("label").as("label_pred"),
        (col("sk") + col("prior")).as("s"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("s").desc, col("label_pred"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("label_true"), col("label_pred"))
  }

  /** Held-out confusion matrix: (label_true, label_pred, n_docs). */
  def heldOutConfusion(docs: DataFrame, evalMod: Int = 5): DataFrame =
    heldOutPredictions(docs, evalMod)
      .groupBy(col("label_true"), col("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("label_true"), col("label_pred"))
}
