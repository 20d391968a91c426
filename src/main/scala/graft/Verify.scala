package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Gates run CONCURRENTLY (SPARK_GRAFT_VERIFY_THREADS, default 6): each
  * gate is an independent Spark job and the serial `coalesce(1)` writes
  * left most of the 32 cores idle — the driver's wall-clock budget was
  * the binding constraint (the round-7/round-9 correctness artifacts
  * came back empty). Fixture builders serialize themselves through
  * FixtureLock, so concurrency is safe there by construction.
  *
  * A machine-readable `manifest.json` lands in the output directory —
  * gate list, row counts, millis, per-gate status, git SHA — so a
  * truncated or failed driver sweep is diagnosable from the artifact
  * alone instead of by cross-referencing SELFCHECK.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // sort shuffle writer, never bypass-merge — see Bench.scala: the
      // bypass writer's O(maps × partitions) file creation is the
      // dominant blocked time on latency-bound filesystems
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val startedAt = System.currentTimeMillis()
    // Dev-loop subset: SPARK_GRAFT_VERIFY_ONLY=q1_agg,zm1_... verifies just
    // those gates (oracle json filtered to match, so check.py agrees). The
    // driver never sets it — full runs are unchanged.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def keep(name: String) = only.forall(_.contains(name))

    // (name, rows, millis, status, error) — populated concurrently
    val done = new java.util.concurrent.ConcurrentHashMap[String,
      (Long, Long, String, String)]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val gates = SparkEntry.queries.filter(e => keep(e._1)).toSeq
    gates.foreach { case (name, fn) =>
      pool.execute { () =>
        val t0 = System.currentTimeMillis()
        try {
          val df = fn(spark, sfDir)
          df.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          val rows = spark.read.parquet(s"$outDir/$name").count()
          done.put(name,
            (rows, System.currentTimeMillis() - t0, "written", ""))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          done.put(name, (-1L, System.currentTimeMillis() - t0,
            "failed", Option(e.getMessage).getOrElse(
              e.getClass.getName).take(200)))
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(6, java.util.concurrent.TimeUnit.HOURS)

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => keep(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    // best-effort git SHA (no process exec: read .git directly)
    val sha = try {
      val head = Files.readString(Paths.get(".git/HEAD")).trim
      if (head.startsWith("ref: ")) {
        val ref = Paths.get(".git", head.stripPrefix("ref: "))
        if (Files.exists(ref)) Files.readString(ref).trim else head
      } else head
    } catch { case _: Throwable => "unknown" }
    val failed = gates.map(_._1).filter(n =>
      done.getOrDefault(n, (-1L, 0L, "missing", ""))._3 != "written")
    val entries = gates.map(_._1).sorted.map { n =>
      val (rows, ms, status, err) =
        done.getOrDefault(n, (-1L, 0L, "missing", ""))
      s"${q(n)}: {" + "\"rows\":" + rows + ",\"ms\":" + ms +
        ",\"status\":" + q(status) +
        (if (err.nonEmpty) ",\"error\":" + q(err) else "") + "}"
    }.mkString(",")
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      "{\"sfDir\":" + q(sfDir) + ",\"sha\":" + q(sha) +
        ",\"startedAtMs\":" + startedAt +
        ",\"wallMs\":" + (System.currentTimeMillis() - startedAt) +
        ",\"threads\":" + threads +
        ",\"gates\":" + gates.size +
        ",\"failed\":" + failed.sorted.map(q).mkString("[", ",", "]") +
        ",\"results\":{" + entries + "}}")
    // exit 0 regardless (the driver's contract): a failed gate has no
    // output directory, which check.py reports as its own FAIL line —
    // and the manifest's `failed` list names it for the artifact
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} gate(s) failed: " +
        failed.sorted.mkString(", "))
    spark.stop()
  }
}
