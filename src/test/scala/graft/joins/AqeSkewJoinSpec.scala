package graft.joins

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE runtime skew-join handling — the other half of the skew story next
  * to the explicit [[SaltedJoin]]: with adaptive execution on, a sort-merge
  * join whose one key dwarfs the rest is re-planned at runtime into
  * split-and-replicate subjoins (the executed plan marks the join
  * `isSkewJoin`), without any query rewrite. Salting remains the tool when
  * AQE can't see the skew (broadcast-disabled pipelines, non-shuffle
  * stages); this spec pins that the AQE path actually engages under the
  * thresholds a skewed workload would set.
  */
class AqeSkewJoinSpec extends SparkSpec {

  import spark.implicits._

  test("AQE re-plans a skewed sort-merge join into skew-split subjoins") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one giant key (0) among small ones — the classic hot-key join
      val left = spark.range(0, 40000)
        .select((when(col("id") < 30000, 0L).otherwise(col("id")))
          .as("k"), concat(lit("padpadpadpadpadpad-"), col("id")).as("pl"))
      val right = spark.range(0, 2000)
        .select(col("id").as("k"), col("id").as("pr"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame so its adaptive plan finalizes
      // (only the hot key matches the right side: 30000 × 1 rows)
      assert(joined.collect().length == 30000)

      val exec = joined.queryExecution.executedPlan
      val adaptive = exec.collectFirst { case a: AdaptiveSparkPlanExec => a }
      val finalPlan = adaptive.map(_.executedPlan.toString)
        .getOrElse(exec.toString)
      assert(finalPlan.contains("isSkewJoin=true") ||
        finalPlan.contains("skew=true"),
        s"AQE did not mark the join skew-handled:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
