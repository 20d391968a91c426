package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared plumbing for the iterative graph algorithms. */
object GraphOps {

  /** Node-table broadcast budget for per-round joins: every round of the
    * iterative algorithms equi-joins the EDGE list (the big side) against
    * a node-keyed table (labels / ranks / distances / scores). Below this
    * many nodes (≈16 MB of (long, value) pairs) the node table is
    * broadcast, so the edge list never shuffles — per round the only
    * exchange left is the aggregation's. Above it the plain shuffle join
    * runs unchanged: node tables on a 100 TB graph are not broadcastable,
    * and the hint would be a scale bug, which is why the cap is on the
    * MEASURED node count, not a static choice.
    */
  val BroadcastNodeCap: Long = 1L << 20

  /** `table` hinted for broadcast iff the measured node count is under
    * [[BroadcastNodeCap]].
    */
  def nodeSide(table: DataFrame, nNodes: Long): DataFrame =
    if (nNodes <= BroadcastNodeCap) broadcast(table) else table
}
