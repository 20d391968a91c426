package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev tool (optimization round): per-gate cost BREAKDOWN, not just a total.
  *
  * For each named gate it reports, on one line:
  *   - build   — DataFrame construction (query-authoring Scala, driver)
  *   - plan    — analysis + optimization + physical planning (Catalyst, driver)
  *   - exec    — best-of-N noop execution (the distributed work)
  *   - jobs/stages/tasks — Spark actions scheduled during ONE execution
  *   - exch    — `Exchange` count in the executed plan (shuffle boundaries)
  *
  * The split tells which lever applies: a gate dominated by `plan` needs a
  * smaller expression tree (guide §7.3 — driver-side, single-threaded, does
  * NOT scale with executors); many `jobs` mean driver-side actions
  * (count()/checkpoint/broadcast builds) serializing the gate; `exec` with
  * few jobs is genuine distributed compute where the §2/§3 shuffle and join
  * levers live.
  *
  * Usage: GateProfile <name[,name…]|all> [sfDir] [iters]
  */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 2
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
      if (args.isEmpty || args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    val runMs = new AtomicLong(0L)
    val deserMs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val cpuMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskMs.addAndGet(e.taskInfo.duration)
        if (e.taskMetrics != null) {
          runMs.addAndGet(e.taskMetrics.executorRunTime)
          deserMs.addAndGet(e.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
          cpuMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000L)
        }
      }
    })

    def sec(n: Long) = f"${n / 1e9}%6.2f"
    names.foreach { name =>
      try {
        val fn = graft.SparkEntry.queries(name)
        // warm once so JIT/footers/fixtures do not pollute the split
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val plan = df.queryExecution.executedPlan // forces full planning
        val t2 = System.nanoTime()
        val exch = "(?i)exchange".r.findAllIn(plan.toString).size
        var best = Long.MaxValue
        var jB = 0; var sB = 0; var tB = 0; var tmB = 0L
        var runB = 0L; var desB = 0L; var gcB = 0L; var cpuB = 0L
        for (_ <- 1 to iters) {
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
          runMs.set(0L); deserMs.set(0L); gcMs.set(0L); cpuMs.set(0L)
          val e0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val el = System.nanoTime() - e0
          if (el < best) {
            best = el; jB = jobs.get; sB = stages.get; tB = tasks.get
            tmB = taskMs.get
            runB = runMs.get; desB = deserMs.get; gcB = gcMs.get
            cpuB = cpuMs.get
          }
        }
        println(s"[gateprof] $name build=${sec(t1 - t0)} plan=${sec(t2 - t1)}" +
          s" exec=${sec(best)} jobs=$jB stages=$sB tasks=$tB" +
          f" taskSec=${tmB / 1e3}%7.1f run=${runB / 1e3}%6.1f" +
          f" cpu=${cpuB / 1e3}%6.1f deser=${desB / 1e3}%5.1f" +
          f" gc=${gcB / 1e3}%5.1f exch=$exch")
      } catch {
        case e: Throwable =>
          println(s"[gateprof] $name ERROR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").take(100))
      }
    }
    spark.stop()
  }
}
