package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) as DataFrame algebra — the cheap community pass next to
  * [[ConnectedComponents]]' exact components and [[PageRank]]'s
  * influence: after `rounds` synchronous updates, densely-connected
  * neighborhoods converge on a shared label.
  *
  * Per round: one equi-join (edge → neighbor label) and two hash
  * aggregations — (node, label) frequency, then a per-node argmax via
  * `max(struct(cnt, -label))`, whose lexicographic order is exactly
  * (count desc, label asc): deterministic, no window, map-side
  * combinable. Labels are checkpointed per round (the
  * [[ConnectedComponents]] pattern) so the iterative plan stays O(1)
  * deep. Synchronous updates + the total-order tie-break make the result
  * engine-reproducible — the oracle unrolls the same rounds as CTEs.
  */
object LabelPropagation {

  /** @param edges (src, dst) pairs, any direction, duplicates allowed.
    * @return (id, label) — the node's community label after `rounds`.
    */
  def propagate(edges: DataFrame, rounds: Int): DataFrame = {
    // setup cuts are LAZY (r13, guide §5): the labels.count() below is
    // the next action and materializes both in one job chain — the two
    // eager cuts were back-to-back blocking barriers computing the same
    // thing
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .graftCheckpoint(false)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .graftCheckpoint(false)
    // under GraphOps.BroadcastNodeCap the label table broadcasts, so the
    // edge list never shuffles for the per-round join. The same single
    // action also measures the id range: when every id (hence every
    // label, which is always some node's id) fits 31 bits and counts fit
    // below 2^31, the per-round argmax runs on ONE packed long instead
    // of a struct — max(struct) has an immutable aggregation buffer, so
    // it planned as SortAggregate with a FULL per-round sort of the
    // neighbor-label table (measured 150–214 MB sort buffers per round);
    // the packed form is max(long), hash-aggregable end to end.
    // Order equivalence: for packed = (cnt << 32) | (IdCap-1-label),
    // numeric max ≡ lexicographic max of (cnt, -label) — the exact
    // (count desc, label asc) tie-break — because cnt occupies disjoint
    // high bits and IdCap-1-label is monotone decreasing in label.
    val idStats = labels
      .agg(count(lit(1)), min(col("id")), max(col("id"))).head()
    val nNodes = idStats.getLong(0)
    val packable = nNodes > 0L && nNodes < PackedPairs.IdCap &&
      idStats.getLong(1) >= 0L && idStats.getLong(2) < PackedPairs.IdCap
    for (round <- 1 to rounds) {
      val joined = und
        .join(GraphOps.nodeSide(
          labels.select(col("id").as("dst"), col("label")), nNodes), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = if (packable)
        joined
          .groupBy(col("src"))
          .agg(max(shiftleft(col("cnt"), 32).bitwiseOR(
            lit(PackedPairs.IdCap - 1L) - col("label"))).as("m"))
          .select(col("src").as("id"),
            (lit(PackedPairs.IdCap - 1L) -
              col("m").bitwiseAND(lit((1L << 32) - 1L))).as("label"))
      else
        joined
          .groupBy(col("src"))
          .agg(max(struct(col("cnt"), (col("label") * -1).as("nl"))).as("m"))
          .select(col("src").as("id"), (col("m.nl") * -1).as("label"))
      // EVERY-OTHER-round lineage cuts (r13, the r12-verdict cadence
      // task): each eager cut is a sequential job barrier, and labels
      // feed exactly ONE consumer per round (the next round's join), so
      // an uncut round costs plan depth, not recompute — cutting on even
      // rounds keeps plans ≤ 2 rounds deep at half the barriers. The
      // FINAL round stays uncut (one consumer: the caller; r12).
      labels = if (round < rounds && round % 2 == 0)
        next.graftCheckpoint(true) else next
    }
    labels
  }
}
