package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential test: every supported running-window shape must be
  * BIT-IDENTICAL between [[GlobalRunningWindowExec]] (extension on, the
  * session default here) and Spark's single-partition WindowExec (the
  * `spark.graft.runningWindow.enabled=false` kill switch), on data with
  * duplicate order keys, nulls, and negative values, across >1 shuffle
  * partition.
  */
class RunningWindowSpec extends SparkSpec {

  import org.apache.spark.sql.execution.SparkPlan
  import spark.implicits._

  private def physical(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def hasRunningExec(df: DataFrame): Boolean =
    physical(df).toString.contains("GlobalRunningWindow")

  /** Run `q` with the rewrite on and off; assert identical sorted rows and
    * that the on-plan actually used the custom exec.
    */
  private def differential(q: => DataFrame, sortCols: Seq[String]): Unit = {
    val on = q
    assert(hasRunningExec(on), "rewrite did not fire:\n" + physical(on))
    val got = on.orderBy(sortCols.map(col): _*).collect().toSeq
    spark.conf.set(RunningWindow.EnabledKey, "false")
    val want =
      try q.orderBy(sortCols.map(col): _*).collect().toSeq
      finally spark.conf.unset(RunningWindow.EnabledKey)
    assert(got == want)
  }

  // messy fixture: duplicate keys (ties), nulls in the value, negatives,
  // enough rows to spread over the 4 shuffle partitions
  private lazy val messy: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 500).map { i =>
      val k = rnd.nextInt(60) // heavy ties
      val v = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(2001) - 1000L)
      val s = "s" + rnd.nextInt(26)
      (i.toLong, k, v, s)
    }.toDF("id", "k", "v", "s")
  }

  test("running SUM (RANGE default frame) over ties matches WindowExec") {
    differential(
      messy.withColumn("rsum", sum($"v").over(Window.orderBy($"k"))),
      Seq("id"))
  }

  test("running SUM with ROWS frame over a total order matches") {
    val w = Window.orderBy($"k", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    differential(messy.withColumn("rsum", sum($"v").over(w)), Seq("id"))
  }

  test("decimal SUM matches, including precision growth") {
    val d = messy.withColumn("dv",
      ($"v" / lit(7)).cast("decimal(20,6)"))
    differential(
      d.withColumn("rsum", sum($"dv").over(Window.orderBy($"k"))),
      Seq("id"))
  }

  test("COUNT / MIN / MAX (numeric + string) in ONE window node match") {
    val w = Window.orderBy($"k")
    differential(
      messy.select($"id", $"k", $"v", $"s",
        count($"v").over(w).as("c"),
        min($"v").over(w).as("mn"),
        max($"v").over(w).as("mx"),
        min($"s").over(w).as("smn"),
        max($"s").over(w).as("smx")),
      Seq("id"))
  }

  test("ROW_NUMBER / RANK / DENSE_RANK / NTILE match across partitions") {
    val w = Window.orderBy($"k", $"id") // total order for row_number
    val wt = Window.orderBy($"k") // ties for rank semantics
    differential(
      messy.select($"id", $"k",
        row_number().over(w).as("rn"),
        rank().over(wt).as("rk"),
        dense_rank().over(wt).as("dr"),
        ntile(7).over(w).as("nt"),
        ntile(13).over(w).as("nt13")),
      Seq("id"))
  }

  test("mixed agg + rank family in one node; all-null and empty inputs") {
    val w = Window.orderBy($"k")
    differential(
      messy.withColumn("v2", when(lit(false), $"v")) // all-null column
        .select($"id", $"k",
          sum($"v2").over(w).as("nullsum"),
          count($"v2").over(w).as("nullcount"),
          dense_rank().over(w).as("dr")),
      Seq("id"))
    // empty-at-runtime input: the optimizer must not be able to prove it
    // empty (a LocalRelation filter would constant-fold the window away),
    // so round-trip through parquet first — exec planned, zero rows, no
    // crash in either pass
    val dir = java.nio.file.Files.createTempDirectory("rw_empty").toString
    messy.write.mode("overwrite").parquet(dir)
    val empty = spark.read.parquet(dir).filter($"id" < 0)
      .withColumn("rsum", sum($"v").over(w))
    assert(hasRunningExec(empty))
    assert(empty.count() == 0)
  }

  test("the rewrite does NOT fire on bounded input or partitioned windows") {
    // aggregated input: the PrefixSum-style bucket cumsum must keep the
    // built-in single-partition plan (one row per group, exchange would
    // only add latency)
    val bounded = messy.groupBy($"k").agg(sum($"v").as("t"))
      .withColumn("c", sum($"t").over(Window.orderBy($"k")))
    assert(!hasRunningExec(bounded))
    assert(bounded.count() == 60)
    // partitioned window: untouched
    val part = messy.withColumn("c",
      sum($"v").over(Window.partitionBy($"s").orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(!hasRunningExec(part))
    // double sum: excluded on purpose (reassociation) — built-in plan
    val dbl = messy.withColumn("c",
      sum($"v".cast("double")).over(Window.orderBy($"k", $"id")))
    assert(!hasRunningExec(dbl))
  }

  test("output is actually multi-partition (the point of the rewrite)") {
    val big = spark.range(0, 20000).select(
      $"id", (col("id") % 977).as("k"), (col("id") * 3).as("v"))
    val out = big.withColumn("rsum",
      sum($"v").over(Window.orderBy($"k", $"id")))
    assert(hasRunningExec(out))
    // AQE rightly coalesces a 20k-row shuffle to one partition; pin the
    // pre-coalesce behavior to show the exec itself never serializes
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try assert(out.rdd.getNumPartitions > 1,
      "running window output collapsed to one partition")
    finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
    // spot-check the global invariant: last row's running sum == total
    val last = out.orderBy(desc("k"), desc("id")).select($"rsum")
      .head.getLong(0)
    val total = big.agg(sum($"v")).head.getLong(0)
    assert(last == total)
  }

  test("STACKED windows: prefix-satisfied distribution with straddling " +
      "tie groups matches (the sf0.1 dense_rank off-by-one)") {
    // Two running windows, one ordered by (k, id), one by k alone. Spark
    // satisfies OrderedDistribution([k]) with the existing
    // RangePartitioning([k, id]) by the PREFIX rule — so a k-tie group
    // straddles partition boundaries and every tie-dependent value
    // (RANGE sums, MIN/MAX, RANK, DENSE_RANK) crosses the boundary merge
    // path. k has only 6 distinct values over 400 rows: with 4 shuffle
    // partitions, straddles are guaranteed, including chains that span
    // whole partitions.
    val few = messy.limit(400).withColumn("k6", $"k" % 6)
    val total = Window.orderBy($"k6", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byK = Window.orderBy($"k6")
    def q = few.select($"id", $"k6",
      sum($"v").over(total).as("rows_sum"),
      sum($"v").over(byK).as("range_sum"),
      min($"v").over(byK).as("range_min"),
      max($"v").over(byK).as("range_max"),
      count($"v").over(byK).as("range_cnt"),
      rank().over(byK).as("rk"),
      dense_rank().over(byK).as("dr"),
      row_number().over(Window.orderBy($"k6", $"id")).as("rn"))
    // AQE's coalescing collapses this tiny shuffle to ONE partition and
    // silently skips every boundary-merge path (it hid the sf0.1
    // dense_rank off-by-one from this suite once) — force the spread
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val on = q
      assert(hasRunningExec(on))
      // both window nodes must plan as the distributed exec
      assert(physical(on).toString
        .sliding("GlobalRunningWindow".length)
        .count(_ == "GlobalRunningWindow") >= 2)
      assert(on.rdd.getNumPartitions > 1, "straddle test needs >1 partition")
      val got = on.orderBy($"id").collect().toSeq
      spark.conf.set(RunningWindow.EnabledKey, "false")
      val want =
        try q.orderBy($"id").collect().toSeq
        finally spark.conf.unset(RunningWindow.EnabledKey)
      assert(got == want)
    } finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("LEAD/LAG across partition boundaries match, incl. defaults and " +
      "mixed offsets in one node") {
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val w = Window.orderBy($"k", $"id")
      def q = messy.select($"id", $"k", $"v",
        lead($"v", 1).over(w).as("nv"),
        lead($"v", 7).over(w).as("nv7"),
        lead($"s", 2, "THE_END").over(w).as("ns2"),
        lag($"v", 1).over(w).as("pv"),
        lag($"v", 11).over(w).as("pv11"),
        lag($"s", 3, "THE_START").over(w).as("ps3"),
        lead($"v", 0).over(w).as("self"),
        // mixed with running shapes in the SAME node
        sum($"v").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("rsum"),
        row_number().over(w).as("rn"),
        rank().over(Window.orderBy($"k")).as("rk"))
      val on = q
      assert(hasRunningExec(on), physical(on).toString)
      assert(!physical(on).toString.contains(" Window ["),
        "single-partition WindowExec survived:\n" + physical(on))
      assert(on.rdd.getNumPartitions > 1)
      val got = on.orderBy($"id").collect().toSeq
      spark.conf.set(RunningWindow.EnabledKey, "false")
      val want =
        try q.orderBy($"id").collect().toSeq
        finally spark.conf.unset(RunningWindow.EnabledKey)
      assert(got == want)
    } finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("PERCENT_RANK / CUME_DIST match across partitions, ties included") {
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val wt = Window.orderBy($"k") // heavy ties
      val w = Window.orderBy($"k", $"id")
      def q = messy.select($"id", $"k",
        percent_rank().over(wt).as("pr"),
        cume_dist().over(wt).as("cd"),
        percent_rank().over(w).as("pr_total"),
        cume_dist().over(w).as("cd_total"),
        // alongside a RANGE sum (shares the tie-group machinery)
        sum($"v").over(wt).as("rsum"))
      val on = q
      assert(hasRunningExec(on), physical(on).toString)
      assert(!physical(on).toString.contains(" Window ["))
      val got = on.orderBy($"id").collect().toSeq
      spark.conf.set(RunningWindow.EnabledKey, "false")
      val want =
        try q.orderBy($"id").collect().toSeq
        finally spark.conf.unset(RunningWindow.EnabledKey)
      assert(got == want)
      // one-row edge: percent_rank of N==1 is 0.0 by definition
      val dir = java.nio.file.Files.createTempDirectory("rw_one").toString
      messy.limit(1).write.mode("overwrite").parquet(dir)
      val one = spark.read.parquet(dir)
        .select(percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
      assert(hasRunningExec(one))
      assert(one.collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
        == Seq((0.0, 1.0)))
    } finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("WHOLE-PARTITION tie chains: a group spanning entire interior " +
      "partitions merges correctly for every tie-dependent shape") {
    // 2 distinct keys over 400 rows with 4 forced partitions: each tie
    // group covers ~2 whole partitions, so the driver's chain walks must
    // traverse single-group interior members (m==1) — the path the
    // 6-key straddle test cannot reach
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val two = messy.limit(400).withColumn("k2", $"k" % 2)
      val wt = Window.orderBy($"k2")
      def q = two.select($"id", $"k2",
        sum($"v").over(wt).as("range_sum"),
        min($"v").over(wt).as("range_min"),
        max($"v").over(wt).as("range_max"),
        count($"v").over(wt).as("range_cnt"),
        rank().over(wt).as("rk"),
        dense_rank().over(wt).as("dr"),
        percent_rank().over(wt).as("pr"),
        cume_dist().over(wt).as("cd"))
      val on = q
      assert(hasRunningExec(on), physical(on).toString)
      assert(on.rdd.getNumPartitions > 1)
      val got = on.orderBy($"id").collect().toSeq
      spark.conf.set(RunningWindow.EnabledKey, "false")
      val want =
        try q.orderBy($"id").collect().toSeq
        finally spark.conf.unset(RunningWindow.EnabledKey)
      assert(got == want)
      // degenerate extreme: ONE key — a single global tie group across
      // every partition (dense_rank 1 everywhere, cume_dist 1.0, the
      // range sum equal on every row)
      def q1 = two.withColumn("k1", lit(0))
        .select($"id", sum($"v").over(Window.orderBy($"k1")).as("s"),
          dense_rank().over(Window.orderBy($"k1")).as("dr"),
          cume_dist().over(Window.orderBy($"k1")).as("cd"))
      val on1 = q1
      assert(hasRunningExec(on1))
      val got1 = on1.orderBy($"id").collect().toSeq
      spark.conf.set(RunningWindow.EnabledKey, "false")
      val want1 =
        try q1.orderBy($"id").collect().toSeq
        finally spark.conf.unset(RunningWindow.EnabledKey)
      assert(got1 == want1)
    } finally spark.conf
      .unset("spark.sql.adaptive.coalescePartitions.enabled")
  }

  test("offset + RANGE-frame aggregate in one node falls back to WindowExec") {
    val w = Window.orderBy($"k")
    val df = messy.select($"id",
      sum($"v").over(w).as("range_sum"), // RANGE default frame
      lead($"v", 1).over(w).as("nv"))
    assert(!hasRunningExec(df), physical(df).toString)
    assert(df.count() == 500) // still correct via the built-in plan
  }

  test("SQL surface: registerAll installs the strategy on a foreign session") {
    val plain = spark.newSession()
    graft.functions.GraftExtensions.registerAll(plain)
    messy.createOrReplaceGlobalTempView("messy_rw")
    val df = plain.sql(
      "SELECT id, SUM(v) OVER (ORDER BY k) AS rsum FROM global_temp.messy_rw")
    assert(df.queryExecution.executedPlan.toString
      .contains("GlobalRunningWindow"))
    // idempotent
    graft.functions.GraftExtensions.registerAll(plain)
    assert(plain.experimental.extraStrategies
      .count(_ == GlobalRunningWindowStrategy) == 1)
  }

  test("ANSI overflow semantics: a running SUM that overflows LONG fails " +
      "loudly under ANSI (like the WindowExec it replaces) and wraps " +
      "identically to WindowExec with ANSI off") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("k")
    def overflowing = Seq((1L, Long.MaxValue), (2L, 5L), (3L, 7L))
      .toDF("k", "v")
      .select(col("k"), sum(col("v")).over(w).as("rs"))
    // the sessions here run Spark 4's ANSI default
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val on = overflowing
    assert(hasRunningExec(on), "rewrite did not fire:\n" + physical(on))
    val e = intercept[Throwable] { on.collect() }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.toLowerCase.contains("overflow"), s"not an overflow: $msgs")
    // non-ANSI: silent wrap, bit-identical to WindowExec's wrap
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try differential(overflowing, Seq("k"))
    finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
