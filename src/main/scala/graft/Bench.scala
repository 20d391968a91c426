package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds at
  * `SPARK_GRAFT_SF_DIR`.
  *
  * Methodology: each query is fully evaluated into the `noop` sink —
  * `.count()` would let Catalyst prune every projected column and measure a
  * fraction of the work. A warm-up pass at sf0.001 (same plans, tiny data)
  * JIT-compiles generated code and primes parquet footers so the first
  * measured query isn't charged the JVM's startup cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(dir: String, name: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try run(warmDir, n)
      catch { case _: Throwable => }
    }
    // Plan-construction pass at the bench SF: materializes the one-time
    // fixture lakes (written eagerly at DataFrame build time) without
    // executing the queries, so the first measured query isn't charged for
    // test-data setup.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir)
      catch { case _: Throwable => }
    }

    // Best-of-2 per query: single-JVM local mode has multi-second GC/JIT
    // jitter; the min is the steady-state cost of the plan. A query that
    // throws must not be published as a (fast) time — it is recorded in
    // `errors` and excluded from the per-query map so the total can never
    // be built on silently failing queries.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.flatMap { name =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          run(sfDir, name)
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors.getOrElseUpdate(name,
              e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse("").take(120))
            None
        }
      }
      if (times.isEmpty) None else Some(name -> times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String) =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\""
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
