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
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .graftCheckpoint(true)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .graftCheckpoint(true)
    // under GraphOps.BroadcastNodeCap the label table broadcasts, so the
    // edge list never shuffles for the per-round join
    val nNodes = labels.count()
    for (round <- 1 to rounds) {
      val next = und
        .join(GraphOps.nodeSide(
          labels.select(col("id").as("dst"), col("label")), nNodes), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (col("label") * -1).as("nl"))).as("m"))
        .select(col("src").as("id"), (col("m.nl") * -1).as("label"))
      // intermediate rounds cut lineage; the FINAL round has one consumer
      // (the caller), so a checkpoint there would materialize the result
      // just to read it back once (r12 optimization round)
      labels = if (round < rounds) next.graftCheckpoint(true) else next
    }
    labels
  }
}
