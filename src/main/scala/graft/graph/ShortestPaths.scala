package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** Bounded multi-source BFS (unweighted shortest hop-distance) as
  * DataFrame algebra — the reachability/distance pass next to
  * [[ConnectedComponents]]' components, [[PageRank]]'s influence and
  * [[LabelPropagation]]'s communities.
  *
  * Per round: one equi-join (frontier → out-neighbors) and one min
  * aggregation merging the relaxed distances with the standing table —
  * both key-partitioned hash shuffles that scale horizontally; no
  * window, no driver-side state beyond the loop counter. Distances are
  * checkpointed per round (the [[ConnectedComponents]] pattern) so the
  * iterative plan stays O(1) deep instead of compounding lineage.
  *
  * Unlike a delta-frontier BFS (which would track only newly-settled
  * nodes), each round re-relaxes from the full distance table; for the
  * small fixed round counts used in analytics ("within k hops") the
  * extra work is one bounded join per round and the result is exactly
  * min(k, true distance) — a deterministic function of the edge set, so
  * the DuckDB oracle can unroll the same rounds as CTEs and match
  * bit-for-bit. At a 100 TB edge table every round is a pair of keyed
  * exchanges over (src) — the same shape AQE already handles for skewed
  * hub nodes.
  */
object ShortestPaths {

  /** Hop distance from any `sources` node, capped at `maxHops`.
    *
    * @param edges   (src, dst) pairs, treated as undirected; duplicates
    *                allowed.
    * @param sources (id) frame of source nodes (distance 0).
    * @return (id, dist) for every node within `maxHops` of a source.
    */
  def distances(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .graftCheckpoint(true)
    var dist = sources.select(col("id")).distinct()
      .withColumn("dist", lit(0L))
      .graftCheckpoint(true)
    for (round <- 1 to maxHops) {
      // measured: hinting the frontier side broadcast (GraphOps.nodeSide)
      // is a net LOSS here — the relax round is dominated by the min-agg
      // exchange, and the per-round count+broadcast-build jobs outweigh
      // the saved edge shuffle — so this keeps the plain keyed join
      val relaxed = und
        .join(dist.select(col("id").as("src"), col("dist")), "src")
        .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("id"))
        .agg(min(col("dist")).as("dist"))
      // EVERY-OTHER-round lineage cuts (r13, the r12-verdict cadence
      // task): an uncut round leaves the next round referencing its plan
      // twice (the union + the relax join), but the duplicated aggregate
      // subtrees are byte-identical so runtime ReuseExchange computes
      // them once — cutting on even rounds keeps plans ≤ 2 rounds deep
      // at half the job barriers. The FINAL round stays uncut (r12).
      dist = if (round < maxHops && round % 2 == 0)
        next.graftCheckpoint(true) else next
    }
    dist
  }
}
