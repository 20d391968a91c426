package graft.joins

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime (bloom) filter injection — Catalyst's runtime answer to "push
  * the join's selectivity down to the big side's scan": with
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, a selective build
  * side gets aggregated into a bloom filter that is applied to the probe
  * side BEFORE the shuffle, so at 100 TB the fact scan ships only rows
  * that can possibly join. This spec pins that the optimization engages
  * on the fact-dim shape our queries use (a regression here silently
  * reverts to full-probe shuffles at scale).
  */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  test("selective dim join injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // production default is 10GB — the fixture fact table must qualify
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // fact and dim from parquet scans (runtime filters target scans);
      // the dim side is filtered hard, so probing all facts is wasteful
      val fact = graft.ops.Tables(spark, sfDir, "orders")
      val dim = graft.ops.Tables(spark, sfDir, "customer")
        .filter(col("c_acctbal") > 9000)
      val joined = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
