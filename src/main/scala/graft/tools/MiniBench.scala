package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named query N times on a SF dir (noop sink). */
object MiniBench {
  def main(args: Array[String]): Unit = {
    // comma-separated names run in sequence in ONE session — reproduces
    // cross-query session-state interactions (e.g. a strategy installed
    // by an earlier gate changing a later gate's plan)
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      for (i <- 1 to iters) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[minibench] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
