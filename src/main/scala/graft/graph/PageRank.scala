package graft.graph

import org.apache.spark.sql.DataFrame

import GraphOps.CheckpointSyntax
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank as pure DataFrame algebra — the influence
  * companion to [[ConnectedComponents]]' cluster ids (e.g. ranking the
  * canonical document inside a duplicate cluster, or the most-connected
  * suppliers in a purchase graph).
  *
  * Shape per iteration: one equi-join (edge → source rank) and one hash
  * aggregation (sum of contributions at the destination) — both key-
  * partitioned shuffles Spark scales horizontally; no driver-side state,
  * no collect, and the iteration count is a small constant (power
  * iteration converges geometrically; ranking stabilizes in a handful of
  * rounds). Edges are made undirected and deduplicated up front, so every
  * node has degree ≥ 1 and no dangling-mass correction is needed.
  *
  * SCALE-ADAPTIVE ROUND SHAPE (r12 optimization round, guide §2.4): each
  * round must re-attach the static per-node `outdeg` to the new rank
  * table. Below [[GraphOps.BroadcastNodeCap]] that re-join is a cheap
  * broadcast build and stays; ABOVE the cap it would be a full node-table
  * shuffle per round, so there `outdeg` instead rides the edge list (one
  * setup join, materialized once) and the per-round deg re-join vanishes
  * — one shuffle per round instead of two. Both shapes compute identical
  * bits (PageRankWideSpec pins forced-wide ≡ broadcast on the same
  * graph); the switch is on the MEASURED node count, like nodeSide's.
  *
  * Cross-engine determinism (the gate's oracle unrolls the same rounds as
  * DuckDB CTEs): every per-edge contribution `pr/outdeg` and every updated
  * rank is floor-quantized to the 2^-20 grid, so the hash-agg sums are
  * sums of grid multiples — exact under 2^53 and therefore independent of
  * accumulation order in BOTH engines.
  */
object PageRank {

  private val Grid = 1048576L // 2^20

  /** @param edges (src, dst) pairs, any direction, duplicates allowed.
    * @return (id, pr) — quantized rank after `iters` damped rounds.
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, iters, damping, forceWide = None)

  /** `forceWide` pins the round shape for tests (None = by node count). */
  private[graph] def pageRankImpl(edges: DataFrame, iters: Int,
                                  damping: Double,
                                  forceWide: Option[Boolean]): DataFrame = {
    // materialize the symmetrized edge list and degrees once — every
    // iteration re-reads them, and without the checkpoint each round's
    // lineage would recompute the upstream edge derivation (the same
    // reason ConnectedComponents checkpoints per round). The cuts are
    // LAZY (r13, guide §5): deg.count() below is the next action and
    // materializes both in one job chain instead of two eager barriers.
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .graftCheckpoint(false)
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("id"), col("outdeg"))
      .graftCheckpoint(false)
    val n = deg.agg(count(lit(1)).as("n"))
    // under GraphOps.BroadcastNodeCap the rank table broadcasts, so the
    // edge list never shuffles for the per-round contribution join
    val nNodes = deg.count()
    val wide = forceWide.getOrElse(nNodes > GraphOps.BroadcastNodeCap)
    // wide shape: outdeg rides the edge row; the setup join pays one
    // edge-list pass so that no round re-shuffles the node table
    val undD =
      if (!wide) und
      else und
        .join(deg.select(col("id").as("src"), col("outdeg")), "src")
        .graftCheckpoint()

    var v = deg.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("n")).as("pr"), col("outdeg"))
    for (_ <- 1 to iters) {
      val vNarrow =
        if (wide) v.select(col("id").as("src"), col("pr"))
        else v.select(col("id").as("src"), col("pr"), col("outdeg"))
      val contrib = undD
        .join(GraphOps.nodeSide(vNarrow, nNodes), "src")
        .select(col("dst").as("id"),
          (floor(col("pr") / col("outdeg") * Grid) / Grid).as("c"))
      val s = contrib.groupBy(col("id")).agg(sum(col("c")).as("s"))
      // every node appears as a dst (und is symmetrized), so the
      // aggregate's id set IS the node set: the deg join below only
      // re-attaches outdeg for the next round's contributions — skipped
      // in the wide shape, where the edge row already carries it
      val withDeg = if (wide) s else s.join(deg, "id")
      v = withDeg.crossJoin(broadcast(n))
        .select(
          Seq(col("id"),
            (floor((lit(1.0 - damping) / col("n") + lit(damping) * col("s"))
              * Grid) / Grid).as("pr")) ++
            (if (wide) Nil else Seq(col("outdeg"))): _*)
    }
    v.select(col("id"), col("pr"))
  }

  /** PERSONALIZED PageRank: the restart mass concentrates on `seeds`
    * instead of spreading uniformly — the relatedness-to-a-query-set
    * primitive behind recommendation ("suppliers close to THESE
    * customers") and seed-expansion labeling. Identical plan shape and
    * grid-exact arithmetic as [[pageRank]]; only the teleport vector
    * differs (1/|S| on seeds, 0 elsewhere), so ranks measure proximity
    * to the seed set rather than global centrality.
    *
    * @param seeds one `id` column; ids absent from the graph contribute
    *   nothing (their restart mass vanishes like dangling mass).
    */
  def personalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                   damping: Double = 0.85): DataFrame =
    personalizedImpl(edges, seeds, iters, damping, forceWide = None)

  /** `forceWide` pins the round shape for tests (None = by node count). */
  private[graph] def personalizedImpl(edges: DataFrame, seeds: DataFrame,
                                      iters: Int, damping: Double,
                                      forceWide: Option[Boolean])
      : DataFrame = {
    // lazy setup cuts: deg.count() below materializes the chain (r13)
    val und = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .graftCheckpoint(false)
    val seedIds = seeds.select(col("id")).distinct()
    val deg = und.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("id"), col("outdeg"))
      .join(seedIds.withColumn("__seed", lit(1)), Seq("id"), "left_outer")
      .graftCheckpoint(false)
    // bounded driver scalars: node and seed counts
    val nNodes = deg.count()
    val nSeeds = deg.filter(col("__seed").isNotNull).count()
    require(nSeeds > 0, "no seed id exists in the graph")
    val reset = when(col("__seed").isNotNull,
      lit(1.0 - damping) / lit(nSeeds.toDouble)).otherwise(lit(0.0))
    val wide = forceWide.getOrElse(nNodes > GraphOps.BroadcastNodeCap)
    // wide shape: source outdeg AND destination teleport mass ride the
    // edge row (one setup pass); the reset folds through the aggregate
    // as max() of a per-dst constant (all rows of a group carry the same
    // value, so max is exact) — no per-round node-table shuffle
    val undD =
      if (!wide) und
      else und
        .join(deg.select(col("id").as("src"), col("outdeg")), "src")
        .join(deg.select(col("id").as("dst"), reset.as("__reset")), "dst")
        .graftCheckpoint()
    var v = deg.select(col("id"),
      when(col("__seed").isNotNull, lit(1.0) / lit(nSeeds.toDouble))
        .otherwise(lit(0.0)).as("pr"),
      col("outdeg"))
    for (_ <- 1 to iters) {
      val vNarrow =
        if (wide) v.select(col("id").as("src"), col("pr"))
        else v.select(col("id").as("src"), col("pr"), col("outdeg"))
      if (wide) {
        val contrib = undD
          .join(GraphOps.nodeSide(vNarrow, nNodes), "src")
          .select(col("dst").as("id"), col("__reset"),
            (floor(col("pr") / col("outdeg") * Grid) / Grid).as("c"))
        v = contrib.groupBy(col("id"))
          .agg(sum(col("c")).as("s"), max(col("__reset")).as("__r"))
          .select(col("id"),
            (floor((col("__r") + lit(damping) * col("s")) * Grid) / Grid)
              .as("pr"))
      } else {
        val contrib = undD
          .join(GraphOps.nodeSide(vNarrow, nNodes), "src")
          .select(col("dst").as("id"),
            (floor(col("pr") / col("outdeg") * Grid) / Grid).as("c"))
        v = contrib.groupBy(col("id")).agg(sum(col("c")).as("s"))
          .join(deg, "id")
          .select(col("id"),
            (floor((reset + lit(damping) * col("s")) * Grid) / Grid)
              .as("pr"),
            col("outdeg"))
      }
    }
    v.select(col("id"), col("pr"))
  }
}
