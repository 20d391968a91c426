package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev tool: dump one gate's plan. Prints BOTH the pre-execution plan and
  * the post-execution plan of the noop write — under AQE these differ (the
  * write's execution carries the final re-optimized plan: runtime join
  * demotions, coalesced AQEShuffleReads, reused stages), and optimization
  * claims must be made against what actually RAN.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match the bench session: sort shuffle writer, never bypass-merge
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var last: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = last = qe
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    println("=== pre-execution plan ===")
    println(df.queryExecution.executedPlan.toString)
    // give the (async) listener bus a beat so `last` is the write's
    // execution — a dev tool, polling is fine
    var spin = 0
    while (last == null && spin < 100) { Thread.sleep(50); spin += 1 }
    if (last != null) {
      println("=== executed (AQE-final) plan ===")
      println(last.executedPlan.toString)
    }
    spark.stop()
  }
}
