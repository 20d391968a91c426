package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool (optimization round): dump `explain("formatted")` for a list of
  * gates to `<outDir>/<gate>_<tag>.txt` in ONE JVM — the before/after plan
  * evidence the round's deliverables require.
  *
  * Usage: PlanDump <name[,name…]|all> <tag> [outDir] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(1)
    val outDir = if (args.length > 2) args(2) else "plans/r12"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match the bench session: sort shuffle writer, never bypass-merge
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // "formatted" on the pre-execution plan: with AQE this is the
        // initial plan (isFinalPlan=false) — the shape (exchange count,
        // join strategies, pushed filters) is what the round's claims
        // reference, and it is stable across runs.
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          println(s"[plandump] $name ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(120))
      }
    }
    spark.stop()
  }
}
