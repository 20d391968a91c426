package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 scoring (Robertson k1/b defaults) shared by the ad-hoc gate
  * (`q52_bm25`) and the standing inverted index ([[PostingStore]]) — ONE
  * expression tree, so the store path is provably the same arithmetic as
  * the recompute path and both match the one DuckDB oracle.
  *
  * Cross-engine determinism: the single libm call (ln in idf) and each
  * per-term addend are floor-quantized to the 2^-20 grid, making every
  * addend an exact grid multiple < 2^5 — the per-doc sum of ≤|terms|
  * addends is then EXACT in double regardless of aggregation order.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75
  private val G = 1048576L

  private def gridQ(c: Column): Column = floor(c * G) / lit(G.toDouble)

  /** Score per-(doc, term) hits and return the global top-k.
    *
    * @param tf    (doc_id, dl, tok, tf) — one row per query-term hit
    * @param dfq   (tok, df) — document frequency per query term (broadcast)
    * @param stats one row (n_docs, avgdl) (broadcast)
    */
  def topK(tf: DataFrame, dfq: DataFrame, stats: DataFrame, k: Int)
      : DataFrame = {
    val idfQ = gridQ(log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
    val addend = idfQ * (col("tf") * lit(K1 + 1)) /
      (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), gridQ(addend).as("addend"))
      .groupBy(col("doc_id"))
      .agg(sum(col("addend")).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
