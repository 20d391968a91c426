package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool (optimization round): PER-STAGE task counts and time for one
  * gate execution — answers "which stage is serialized" when GateProfile's
  * whole-gate parallelism ratio (taskSec / exec wall) looks low. AQE
  * coalescing decisions are runtime-only, so the executed-plan dump cannot
  * show the partition count a stage actually ran with; this can.
  *
  * Usage: StageProfile <name[,name…]> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq

    case class St(id: Int, name: String, tasks: Int, taskMs: Long,
                  maxMs: Long, cpuMs: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
            si.numTasks,
            if (tm != null) tm.executorRunTime else 0L,
            0L,
            if (tm != null) tm.executorCpuTime / 1000000L else 0L)
        }
      }
    })

    for (n <- names) {
      // warm pass (plans, fixtures, JIT) — not profiled
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"[stageprof] $n wall=$wall%6.2f")
      stages.synchronized {
        stages.sortBy(-_.taskMs).take(12).foreach { s =>
          println(f"  stage=${s.id}%4d tasks=${s.tasks}%4d " +
            f"runSec=${s.taskMs / 1000.0}%7.2f cpuSec=${s.cpuMs / 1000.0}%7.2f  ${s.name}")
        }
      }
    }
    spark.stop()
  }
}
