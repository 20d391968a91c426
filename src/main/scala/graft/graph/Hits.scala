package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (hubs & authorities) over a DIRECTED edge list —
  * the bipartite-influence companion to [[PageRank]]: on a
  * customer→supplier purchase graph, hub scores rank the breadth of a
  * buyer's supplier base while authority scores rank how concentrated the
  * demand on a supplier is (PageRank's single score conflates the two
  * roles).
  *
  * Shape per round: authorities are one equi-join (edge → source hub) +
  * one hash agg at the destination, hubs the mirror — key-partitioned
  * shuffles that scale horizontally; the L2 normalizer is a scalar agg
  * broadcast back (no driver loop). Edges are deduplicated once and
  * localCheckpointed so each round re-reads a materialized list instead
  * of replaying the upstream derivation.
  *
  * Cross-engine determinism: contributions are floor-quantized to the
  * 2^-20 grid before summing (exact dyadic sums, order-independent), the
  * normalizer is `sqrt` of a grid-quantized sum of squares, and each
  * normalized score is re-floored to the grid — so an oracle unrolling
  * the same rounds as SQL CTEs reproduces the bits exactly.
  */
object Hits {

  private val Grid = 1048576L // 2^20

  /** @param edges directed (src, dst) pairs, duplicates allowed.
    * @return (id, hub, auth) — grid-quantized scores after `iters` rounds
    *   from the all-ones start; nodes with no outgoing (resp. incoming)
    *   edges score 0 on the hub (resp. authority) axis.
    */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    // setup cuts are LAZY (r13, guide §5): nodes.count() below is the
    // next action and materializes both in one job chain instead of two
    // back-to-back eager barriers
    val e = edges.select(col("src"), col("dst")).distinct()
      .graftCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().graftCheckpoint(false)

    def normalized(raw: DataFrame, c: String): DataFrame = {
      // scalar L2 normalizer, broadcast back — grid-exact sum of squares
      val s = raw.agg(sum(floor(col(c) * col(c) * Grid) / Grid).as("s"))
      raw.crossJoin(broadcast(s))
        .select(col("id"),
          when(col("s") > 0,
            floor(col(c) / sqrt(col("s")) * Grid) / Grid)
            .otherwise(lit(0.0)).as(c))
    }

    // under GraphOps.BroadcastNodeCap the score tables broadcast, so the
    // edge list never shuffles for the per-round joins
    val nNodes = nodes.count()
    if (iters == 0)
      return nodes.select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
    // r12 optimization round (guide §2.4): the r11 loop re-assembled the
    // full node scaffold (nodes ⋈ hub ⋈ auth, zero-filled, checkpointed)
    // EVERY round, only for the next round's inner join to discard the
    // zero rows again — every e.src is in hub (it has outgoing edges) and
    // every e.dst is in auth, so the per-round joins see identical rows
    // without the scaffold. Two node-table joins per round deleted (above
    // the broadcast cap those are node-table shuffles); the zero-fill for
    // edge-less nodes happens ONCE at the end. Bits unchanged: summed
    // contributions come from the same present rows either way.
    var hub = nodes.select(col("id"), lit(1.0).as("h"))
    var auth: DataFrame = null
    for (round <- 1 to iters) {
      val aRaw = e
        .join(GraphOps.nodeSide(
          hub.select(col("id").as("src"), col("h")), nNodes), "src")
        .groupBy(col("dst")).agg(sum(floor(col("h") * Grid) / Grid).as("a"))
        .select(col("dst").as("id"), col("a"))
      // intermediate auth has ONE consumer (this round's hRaw, whose cut
      // bounds the plan the same round) — its eager cut was a pure job
      // barrier; normalized()'s double reference to aRaw is byte-identical
      // so runtime ReuseExchange computes it once (r13, the r12-verdict
      // cadence task). The FINAL round's auth keeps the cut: it feeds
      // both hRaw and the zero-fill assembly after the loop.
      auth = if (round < iters) normalized(aRaw, "a")
        else normalized(aRaw, "a").graftCheckpoint()
      val hRaw = e
        .join(GraphOps.nodeSide(
          auth.select(col("id").as("dst"), col("a")), nNodes), "dst")
        .groupBy(col("src")).agg(sum(floor(col("a") * Grid) / Grid).as("h"))
        .select(col("src").as("id"), col("h"))
      // the final round's hub has exactly ONE consumer (the assembly
      // below) — a lineage-cut there would materialize it just to read
      // it back once
      hub = if (round < iters) normalized(hRaw, "h").graftCheckpoint()
        else normalized(hRaw, "h")
    }
    nodes
      .join(hub, Seq("id"), "left")
      .join(auth, Seq("id"), "left")
      .select(col("id"), coalesce(col("h"), lit(0.0)).as("hub"),
        coalesce(col("a"), lit(0.0)).as("auth"))
  }
}
