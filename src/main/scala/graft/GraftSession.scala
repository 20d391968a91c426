package graft

import org.apache.spark.sql.SparkSession

/** Library front door: a SparkSession wired the way the engine expects —
  * graft's native SQL functions registered, UTC session time, AQE on
  * (Spark 4 default, pinned here explicitly), and shuffle parallelism sized
  * to the actual core count instead of the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      Runtime.getRuntime.availableProcessors())
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new functions.GraftExtensions)
  }
}
