package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankPercentilesSpec extends SparkSpec {

  import spark.implicits._

  test("bit-identical to the percentile aggregate (ties, singletons, negatives)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      val g = s"g${i % 5}"
      // heavy ties (quantized values), negatives, and group g4 singleton-ish
      val v = if (i % 5 == 4 && i > 400) rnd.nextDouble() * 10
        else math.floor(rnd.nextDouble() * 40 - 20) / 2.0
      (g, v)
    } :+ (("solo", 3.25))
    val df = rows.toDF("g", "v")

    val expected = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.25)).as("p25"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.99)).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))

    val got = RankPercentiles.exact(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))

    // exact tuple equality — the interpolation must be bit-identical
    assert(got.toSeq == expected.toSeq)

    // the ABOVE-cap bucketed decomposition must land the same bits
    // (cap 0 forces it regardless of the measured compressed size)
    val gotBucketed = RankPercentiles.exact(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p99" -> 0.99),
        plainWindowCap = 0L)
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(gotBucketed.toSeq == expected.toSeq)
  }

  test("nulls are ignored like the aggregate (mixed-null and all-null groups)") {
    val rows: Seq[(String, java.lang.Double)] = Seq(
      ("a", 1.0), ("a", null), ("a", 3.0), ("a", 2.0), ("a", null),
      ("b", 5.0),
      ("allnull", null), ("allnull", null))
    val df = rows.toDF("g", "v")

    val expected = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("p50"),
        count(col("v")).as("n")) // count(col) = non-null rows, like our n
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2)))

    val got = RankPercentiles.exact(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2)))

    assert(got.toSeq == expected.toSeq)
    // the mixed-null group's median must come from the 3 non-null values
    assert(got.find(_._1 == "a").get == (("a", Some(2.0), 3L)))
    assert(got.find(_._1 == "allnull").get == (("allnull", None, 0L)))
  }

  test("plan has no ObjectHashAggregate value buffer") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val plan = RankPercentiles.exact(df, "g", "v", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"))
    assert(plan.contains("Window"))
  }

  test("composed kernels do not multiply the plan (q49 regression)") {
    // The kernel references its compressed table ~8x downstream; without
    // the lineage cut at `counts`, feeding one kernel's output into
    // another squared the references into a 264-Exchange physical plan
    // (q49_mad_outliers, r12 optimization round). Pin: the composed
    // median-of-deviations plan stays bounded AND bit-identical to the
    // aggregate form.
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map { i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 30 - 15) / 2.0)
    }.toDF("g", "v")
    val med = RankPercentiles.exact(df, "g", "v", Seq("med" -> 0.5))
      .select(col("g"), col("med"))
    val dev = df.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("d"))
    val mad = RankPercentiles.exact(dev, "g", "d", Seq("mad" -> 0.5))
    val nExch = "(?i)exchange".r
      .findAllIn(mad.queryExecution.executedPlan.toString).size
    assert(nExch <= 24, s"composed percentile kernels re-inflated the " +
      s"plan: $nExch Exchange nodes")

    val expMed = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val expDev = df.join(broadcast(expMed), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("d"))
    val expected = expDev.groupBy(col("g"))
      .agg(percentile(col("d"), lit(0.5)).as("mad"))
      .orderBy(col("g")).collect().map(r => (r.getString(0), r.getDouble(1)))
    val got = mad.select(col("g"), col("mad")).orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == expected.toSeq)
  }

  test("exactWeighted == exact on the weight-expanded rows (all modes)") {
    // the q49 shape (r13): the caller compresses once, then runs BOTH
    // kernel calls weighted with the cut skipped and a measured size
    // hint — every mode must land the aggregate's exact bits
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      (s"g${i % 4}", math.floor(rnd.nextDouble() * 24 - 12) / 4.0)
    } :+ (("solo", -7.5))
    val df = rows.toDF("g", "v")
    val counts = graft.graph.GraphOps.checkpoint(
      df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("w")))
    val n = counts.count()

    val expected = RankPercentiles.exact(df, "g", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9))
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))

    def weighted(cut: Boolean, hint: Option[Long], cap: Long) =
      RankPercentiles.exactWeighted(counts, "g", "v", "w",
          Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9),
          plainWindowCap = cap, cutInput = cut, sizeHint = hint)
        .orderBy(col("g")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4)))

    // cut + self-measured (the default), uncut + hinted (the q49 mode),
    // and the above-cap bucketed shape (cap 0 forces the decomposition)
    assert(weighted(cut = true, hint = None,
      cap = RankPercentiles.PlainWindowCap).toSeq == expected.toSeq)
    assert(weighted(cut = false, hint = Some(n),
      cap = RankPercentiles.PlainWindowCap).toSeq == expected.toSeq)
    assert(weighted(cut = false, hint = Some(n), cap = 0L).toSeq
      == expected.toSeq)
  }

  test("weighted composition from one compressed table (the q49 r13 shape)") {
    // median AND median-of-deviations both derived from ONE distinct
    // (group, value, count) table — bit-identical to the aggregate form
    // over raw rows, and the deviation re-aggregation (values symmetric
    // around the median merge) must not disturb the ranks
    val rnd = new scala.util.Random(23)
    val df = (1 to 500).map { i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 20 - 10) / 2.0)
    }.toDF("g", "v")
    val counts = graft.graph.GraphOps.checkpoint(
      df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt")))
    val n = counts.count()
    val med = graft.graph.GraphOps.checkpoint(
      RankPercentiles.exactWeighted(counts, "g", "v", "cnt",
          Seq("med" -> 0.5), cutInput = false, sizeHint = Some(n))
        .select(col("g"), col("med")))
    val devCounts = counts.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("d"), col("cnt"))
    val got = RankPercentiles.exactWeighted(devCounts, "g", "d", "cnt",
        Seq("mad" -> 0.5), cutInput = false, sizeHint = Some(n))
      .select(col("g"), col("mad")).orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))

    val expMed = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("med"))
    val expected = df.join(broadcast(expMed), Seq("g"))
      .select(col("g"), abs(col("v") - col("med")).as("d"))
      .groupBy(col("g"))
      .agg(percentile(col("d"), lit(0.5)).as("mad"))
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == expected.toSeq)
  }
}
