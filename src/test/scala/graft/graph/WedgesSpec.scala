package graft.graph

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class WedgesSpec extends SparkSpec {

  import spark.implicits._

  private def edgesDf(rows: Seq[(Long, Long)]) = rows.toDF("p", "c")

  test("stats: id range and exact banded wedge mass in one pass") {
    // p=1 deg 3 (wedges 3), p=2 deg 2 (1), p=3 deg 1 (0), p=4 deg 5
    val rows = Seq(1L -> 10L, 1L -> 11L, 1L -> 12L,
      2L -> 7L, 2L -> 900L,
      3L -> 42L) ++ (1L to 5L).map(i => 4L -> (100L + i))
    val all = Wedges.stats(edgesDf(rows), 1L, 64L)
    assert(all.minId == 7L && all.maxId == 900L && !all.empty)
    assert(all.wedges == 3L + 1L + 0L + 10L)
    // degree band excludes deg-1 and deg-5 parts; id range is UNbanded
    val band = Wedges.stats(edgesDf(rows), 2L, 4L)
    assert(band.wedges == 3L + 1L)
    assert(band.minId == 7L && band.maxId == 900L)
  }

  test("stats: empty edge table") {
    val st = Wedges.stats(edgesDf(Seq.empty), 1L, 64L)
    assert(st.empty && st.wedges == 0L)
  }

  test("fanout pins the grouping exchange at the measured-size count") {
    val df = edgesDf((1L to 100L).map(i => (i % 7) -> i))
    val perTask = Wedges.WedgesPerTask
    // below 2 partitions: identity (no repartition node appears)
    val skip = Wedges.fanout(df, "p", perTask - 1L)
    assert(skip.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
    }.isEmpty)
    // measured mass sizes the count, clamped at 4x default parallelism
    val cores = spark.sparkContext.defaultParallelism.toLong
    // sparkPlan, not executedPlan: AQE's wrapper hides the exchanges
    // until execution, and the pin must hold in the INITIAL plan anyway
    val n3 = Wedges.fanout(df, "p", 3L * perTask)
      .groupBy(col("p")).agg(count(lit(1)))
    val exch3 = n3.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(exch3 == Seq(3), s"expected one 3-partition exchange, got $exch3")
    val big = Wedges.fanout(df, "p", 1000000L * perTask)
      .groupBy(col("p")).agg(count(lit(1)))
    val exchBig = big.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec => e.outputPartitioning.numPartitions
    }
    assert(exchBig == Seq((4L * cores).toInt))
  }

  test("fanout changes no rows (grouped aggregation equivalence)") {
    val rows = (1L to 500L).map(i => (i % 13) -> i)
    val base = edgesDf(rows).groupBy(col("p"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .orderBy(col("p")).collect()
    val fanned = Wedges.fanout(edgesDf(rows), "p", 5L * Wedges.WedgesPerTask)
      .groupBy(col("p"))
      .agg(sort_array(collect_list(col("c"))).as("cs"))
      .orderBy(col("p")).collect()
    assert(base.toSeq == fanned.toSeq)
  }
}
