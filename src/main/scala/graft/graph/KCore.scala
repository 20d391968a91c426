package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE decomposition by iterative peeling: repeatedly delete nodes of
  * degree < k until fixpoint; survivors form the maximal subgraph where
  * every node has ≥ k neighbors inside it (the classic cohesive-subgraph /
  * spam-farm / community-seed primitive next to CC / PageRank / HITS).
  *
  * Distributed shape: each round is one hash-agg (degrees) + two
  * semi-joins (restrict edges to surviving endpoints) — all key-partitioned
  * shuffles, no all-pairs anything; lineage is cut per round with
  * `localCheckpoint` (the ConnectedComponents discipline, CC.scala). Rounds
  * to fixpoint are bounded by the peel depth, which is small for real
  * graphs (≤3 on every driver fixture SF); like CC, the loop FAILS LOUDLY
  * if `maxRounds` did not reach the fixpoint rather than returning a
  * silently-unpeeled core — the check is one scalar min-degree aggregate,
  * not a data collect.
  */
object KCore {

  /** Nodes of the k-core of the UNDIRECTED graph given by (src, dst) edge
    * rows (deduplicated internally), with their within-core degree.
    *
    * @return DataFrame(id, core_deg) — every core_deg ≥ k at fixpoint.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int): DataFrame = {
    val sym = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .distinct()
    var und = sym.localCheckpoint(true)
    for (_ <- 1 to maxRounds) {
      val keep = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
      und = und
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .localCheckpoint(true)
    }
    val deg = und.groupBy(col("u")).agg(count(lit(1)).as("core_deg"))
    // Fixpoint proof: after maxRounds every surviving node must already
    // have degree ≥ k. One scalar aggregate — loud failure over a silent
    // half-peeled result (the CC non-convergence rule).
    val minDeg = deg.agg(min(col("core_deg"))).collect()(0)
    if (!minDeg.isNullAt(0) && minDeg.getLong(0) < k)
      throw new IllegalStateException(
        s"k-core peel did not converge in $maxRounds rounds " +
          s"(min surviving degree ${minDeg.getLong(0)} < $k)")
    deg.select(col("u").as("id"), col("core_deg"))
  }
}
