package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** Ancestor-chain aggregation over a parent forest — the WITH RECURSIVE
  * workload (reference oracle: DuckDB's recursive CTE), which Spark SQL
  * has no native operator for.
  *
  * Evaluation is POINTER DOUBLING, not row-at-a-time recursion: the state
  * table holds, per node, a contiguous already-aggregated chain segment
  * `[id .. anc)` (anc exclusive; `anc IS NULL` = segment reaches the
  * root). Each round self-joins the state on `a.anc = b.id`, splicing two
  * segments into one of double length — so depth-D chains finish in
  * ⌈log₂ D⌉ rounds of hash equi-joins instead of D dependent scans
  * (`rounds = 5` covers depth 32, i.e. id-halving forests up to 2³²
  * nodes). Each round is one exchange of the O(nodes) state; the state is
  * `localCheckpoint`ed per round (same pattern as
  * [[ConnectedComponents]]) so round r+1's two reads of it don't
  * re-execute round r twice and the plan stays O(1) deep.
  *
  * Cross-engine determinism: weights are aggregated as LONGs (the gate
  * feeds money as integer cents), so splice order cannot affect the sums.
  */
object Hierarchy {

  /** nodes: (id, parent nullable — null marks a root, weight long).
    * Returns (id, chain_len, chain_sum): the node count and weight sum of
    * the node's ancestor chain, itself included, up to its root. A parent
    * id absent from `nodes` ends the chain (dangling edges tolerated).
    */
  def chainAgg(nodes: DataFrame, rounds: Int = 5): DataFrame = {
    var st = nodes.select(col("id"), col("parent").as("anc"),
      lit(1L).as("len"), col("weight").as("s"))
      .graftCheckpoint(true)
    for (round <- 1 to rounds) {
      val next = st.as("a")
        .join(st.as("b"), col("a.anc") === col("b.id"), "left")
        .select(col("a.id"),
          // no match (done, or dangling parent): the segment is complete
          col("b.anc").as("anc"),
          (col("a.len") + coalesce(col("b.len"), lit(0L))).as("len"),
          (col("a.s") + coalesce(col("b.s"), lit(0L))).as("s"))
      // EVERY-OTHER-round lineage cuts (r13, the r12-verdict cadence
      // task): an uncut round leaves the next round's self-join holding
      // two copies of its plan, but those subtrees are byte-identical so
      // runtime ReuseExchange computes them once — cutting on even
      // rounds halves the job barriers at ≤ 2-round plan depth. The
      // FINAL round stays uncut (one consumer: the caller).
      st = if (round < rounds && round % 2 == 0) next.graftCheckpoint(true)
        else next
    }
    st.select(col("id"), col("len").as("chain_len"),
      col("s").as("chain_sum"))
  }
}
