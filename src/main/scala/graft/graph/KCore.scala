package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** K-CORE decomposition by iterative peeling: repeatedly delete nodes of
  * degree < k until fixpoint; survivors form the maximal subgraph where
  * every node has ≥ k neighbors inside it (the classic cohesive-subgraph /
  * spam-farm / community-seed primitive next to CC / PageRank / HITS).
  *
  * Distributed shape: each round is one hash-agg (degrees) + two
  * semi-joins (restrict edges to surviving endpoints) — all key-partitioned
  * shuffles, no all-pairs anything; lineage is cut per round with
  * [[GraphOps.checkpoint]] (local by default, reliable under
  * `spark.graft.checkpointDir`). The loop EARLY-EXITS once a round removes
  * no edge (the fixpoint), so `maxRounds` is a safety bound, not a
  * parameter to tune; like CC, it still FAILS LOUDLY if the bound is
  * exhausted while the graph is shrinking — the check is one scalar
  * min-degree aggregate, not a data collect.
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
    // lazy setup cut: the convergence count below is the next action and
    // materializes it (r13, guide §5) — the per-round cuts+counts stay
    // (the early-exit check is load-bearing)
    var und = sym.graftCheckpoint(false)
    // early-exit at the fixpoint: a round that removes no edge removed no
    // node (nodes exist only through edges), so every later round is an
    // identical materialization — stop. The count is one job over the
    // round's already-checkpointed blocks, and it frees callers from
    // guessing maxRounds ≥ the peel depth exactly.
    var nEdges = und.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val keep = und.groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("u"))
      und = und
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .graftCheckpoint(true)
      val n = und.count()
      converged = n == nEdges
      nEdges = n
      round += 1
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
