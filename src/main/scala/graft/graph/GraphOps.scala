package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared plumbing for the iterative graph algorithms. */
object GraphOps {

  /** Conf key: when set to a path, iterative algorithms cut lineage with
    * RELIABLE checkpoints under it instead of `localCheckpoint`.
    */
  val CheckpointDirConf = "spark.graft.checkpointDir"

  /** Per-round lineage cut for iterative loops.
    *
    * Default (`spark.graft.checkpointDir` unset): `localCheckpoint` —
    * blocks live on executor local storage, the fastest cut, but lineage
    * is TRUNCATED: lose an executor mid-iteration on a real cluster
    * (preemption, spot reclaim) and the job cannot recompute — a 5-round
    * PageRank over 100 TB restarts from zero or fails outright.
    *
    * With the conf set to a (durable, e.g. HDFS/S3) path: a reliable
    * `checkpoint` — each round's state is written to the configured
    * directory, so executor death costs one re-read, not the run. That is
    * the right trade on preemptible clusters; the extra per-round I/O is
    * why it is opt-in rather than the default.
    *
    * The SparkContext checkpoint dir is initialized from the conf on
    * first use (a later conf change in the same session keeps the first
    * directory — Spark's checkpoint dir is context-global).
    */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager)
      case None =>
        // Loud once-per-JVM warning on real clusters (r13, advisor item):
        // localCheckpoint blocks live only on executors and the TRUNCATED
        // lineage cannot recompute them, so executor loss (preemption,
        // dynamic-allocation release) fails the query instead of slowing
        // it. Local mode is exempt — the driver IS the executor.
        if (!spark.sparkContext.isLocal && !clusterWarned.getAndSet(true))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"graft lineage cuts are using localCheckpoint on a " +
              s"non-local master: executor loss will FAIL queries that " +
              s"cross a cut instead of recomputing. Set $CheckpointDirConf " +
              "to a durable path (HDFS/S3) for cluster deployments.")
        df.localCheckpoint(eager)
    }
  }

  private val clusterWarned =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Postfix form so call chains read like the `localCheckpoint` they
    * replace: `edges.distinct().graftCheckpoint(true)`.
    */
  implicit class CheckpointSyntax(private val df: DataFrame) extends AnyVal {
    def graftCheckpoint(eager: Boolean = true): DataFrame =
      checkpoint(df, eager)
  }

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
