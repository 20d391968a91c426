package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-batch logistic-regression training as repeated Spark aggregations —
  * the distill-a-heuristic-into-a-model step of a training-data pipeline
  * (fasttext-style quality filters, label models). Reference scope: the
  * CDC reference has no model training; this extends the LLM-pipeline
  * surface (`BASELINE.json` north star) with a TRAINED classifier whose
  * result the DuckDB oracle can recompute bit-for-bit.
  *
  * Determinism contract (cross-engine-exact, same discipline as the
  * PageRank / k-means gates in this repo):
  *   - the link is the RATIONAL sigmoid σ(z) = 0.5 + 0.5·z/(1+|z|)
  *     (softsign-based) — pure +,−,×,÷ IEEE ops, bit-identical in any
  *     engine, unlike exp()-based logistic whose libm result can wobble
  *     1 ulp between engines; monotone with σ(0)=0.5, so the decision
  *     boundary σ(z) ≥ 0.5 ⟺ z ≥ 0 matches the logistic one;
  *   - per-row gradient contributions are quantized to an integer grid
  *     (round(g·2^20) AS BIGINT), so gradient SUMS are exact integers —
  *     order-independent, which makes Spark's parallel partial
  *     aggregation and a sequential engine agree exactly;
  *   - the learning rate is a power of two (×4.0 multiplies exactly) and
  *     the update w − lr·(Σ/n/2^20) is the same left-to-right double op
  *     chain an oracle's chained CTEs evaluate.
  *
  * Scale shape: one hash-aggregation job per iteration over the feature
  * frame (map-side partial sums; k+1 LONG cells per partition reach the
  * driver), so a 100 TB corpus costs `iters` narrow scans. Driver state
  * is O(k) weights. Callers with expensive feature derivations should
  * persist the feature frame; iterations re-read it.
  */
object LogReg {

  /** Gradient quantization grid (2^20) — power of two, so ·Grid is exact. */
  val Grid = 1048576L

  /** σ(z) = 0.5 + 0.5·z/(1+|z|). */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z))

  /** Margin w0 + Σ wj·xj as a left-associated chain (oracle-identical
    * parenthesization).
    */
  def margin(w: Array[Double], xCols: Seq[String]): Column =
    xCols.zipWithIndex.foldLeft(lit(w(0)): Column) { case (acc, (c, i)) =>
      acc + lit(w(i + 1)) * col(c)
    }

  /** Train `iters` full-batch gradient-descent steps from w = 0.
    *
    * `feats` must carry double feature columns `xCols` and a 0/1 double
    * label `yCol`. Returns k+1 weights, bias first.
    */
  def train(feats: DataFrame, xCols: Seq[String], yCol: String,
      iters: Int, lr: Double = 4.0): Array[Double] = {
    require(java.lang.Double.doubleToLongBits(lr) ==
      java.lang.Double.doubleToLongBits(Math.scalb(1.0,
        Math.getExponent(lr))), s"lr must be a power of two, got $lr")
    var w = Array.fill(xCols.size + 1)(0.0)
    val n = feats.agg(count(lit(1))).head.getLong(0).toDouble
    for (_ <- 1 to iters) {
      val err = fastSigmoid(margin(w, xCols)) - col(yCol)
      val gs = (lit(1.0): Column) +: xCols.map(col)
      val aggs = gs.map(x =>
        sum(round(err * x * lit(Grid.toDouble)).cast("long")))
      val row = feats.agg(aggs.head, aggs.tail: _*).head
      w = Array.tabulate(w.length) { j =>
        w(j) - lr * (row.getLong(j).toDouble / n / Grid.toDouble)
      }
    }
    w
  }
}
