package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print one compact line per query listing which physical-plan
  * markers appear — grounds the PlanGuardSpec assertions in real plans.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val markers = Seq("TakeOrderedAndProject", "WindowGroupLimit",
      "ObjectHashAggregate", "SortAggregate", "BroadcastHashJoin",
      "BroadcastNestedLoopJoin",
      "SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
      "LeftSemi", "LeftAnti", "Window", "PushedFilters: [",
      "WholeStageCodegen")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hit = markers.filter(plan.contains).mkString(",")
        println(s"[probe] $name :: $hit")
      } catch { case e: Throwable =>
        println(s"[probe] $name :: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
