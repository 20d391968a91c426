package graft.pack

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PrefixSum must equal the single-window form exactly — it exists to
  * replace `SUM(x) OVER (ORDER BY k)` with a partitioned plan, so the only
  * acceptable delta is the plan, never the rows.
  */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  // deterministic, skewed, with duplicate order-key values and duplicate
  // bucket collisions — the shapes that break a naive decomposition
  private lazy val rows = (1 to 997).map { i =>
    val k = (i * 7919) % 211 // heavy duplicate order keys
    val v = ((i * 104729) % 19) - 9L // negatives included
    (i.toLong, k.toLong, v)
  }.toDF("id", "k", "v")

  test("runningSum equals the global-window running sum (total order)") {
    val expected = rows.withColumn("cum",
      sum($"v").over(Window.orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
    val got = PrefixSum.runningSum(rows, expr("k div 17"), Seq($"k", $"id"),
        $"v", "cum")
      .select($"id", $"cum")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("globalRowNumber equals ROW_NUMBER over the total order") {
    val expected = rows.withColumn("rn",
      row_number().over(Window.orderBy($"k", $"id")).cast("long"))
      .select($"id", $"rn")
    val got = PrefixSum.globalRowNumber(rows, expr("k div 17"), Seq($"k", $"id"),
        "rn")
      .select($"id", $"rn")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("single-bucket degenerate input still agrees") {
    val expected = rows.withColumn("cum",
      sum($"v").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
    val got = PrefixSum.runningSum(rows, lit(0L), Seq($"id"), $"v", "cum")
      .select($"id", $"cum")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("descending order with range-derived buckets agrees") {
    val expected = rows.withColumn("cum",
      sum($"v").over(Window.orderBy($"v".desc, $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
    // bucket monotone along v desc: (max_v - v) scaled
    val got = PrefixSum.runningSum(rows, (lit(9L) - $"v") * 4 / 19,
        Seq($"v".desc, $"id"), $"v", "cum")
      .select($"id", $"cum")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("the corpus-sized window is partitioned by the bucket") {
    val p = PrefixSum.runningSum(rows, expr("k div 17"), Seq($"k", $"id"),
      $"v", "cum").queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(__ps_bucket"),
      "within-bucket window lost its partition key")
  }

  test("runningSumsByAdaptive: both shapes, identical sums") {
    val parted = rows.withColumn("p", $"k" % 3)
    val expected = parted.withColumn("cum",
      sum($"v").over(Window.partitionBy($"p").orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
    // below the cap: the plain partitioned window (one exchange)
    val plain = PrefixSum.runningSumsByAdaptive(parted, Seq($"p"),
        expr("k div 17"), Seq($"k", $"id"), Seq($"v" -> "cum"))
    assert(plain.select($"id", $"cum").except(expected).isEmpty &&
      expected.except(plain.select($"id", $"cum")).isEmpty)
    assert(!plain.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(__ps_bucket"))
    // cap 0 forces the bucketed decomposition — same integers
    val bucketed = PrefixSum.runningSumsByAdaptive(parted, Seq($"p"),
        expr("k div 17"), Seq($"k", $"id"), Seq($"v" -> "cum"), cap = 0L)
    assert(bucketed.select($"id", $"cum").except(expected).isEmpty &&
      expected.except(bucketed.select($"id", $"cum")).isEmpty)
    assert(bucketed.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(__ps_p0"))
    // the PARTITIONED form must refuse an empty partition list — the
    // sanctioned global path is runningSumsAdaptive, whose plain branch
    // is gated on the measured count
    intercept[IllegalArgumentException] {
      PrefixSum.runningSumsByAdaptive(parted, Nil, expr("k div 17"),
        Seq($"k", $"id"), Seq($"v" -> "cum"))
    }
  }

  test("runningSumsAdaptive (global): both shapes, identical sums") {
    val expected = rows.withColumn("cum",
      sum($"v").over(Window.orderBy($"k", $"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
    // below the cap: one plain global window over the measured-bounded
    // (checkpointed) input
    val plain = PrefixSum.runningSumsAdaptive(rows,
      expr("k div 17"), Seq($"k", $"id"), Seq($"v" -> "cum"))
    assert(plain.select($"id", $"cum").except(expected).isEmpty &&
      expected.except(plain.select($"id", $"cum")).isEmpty)
    assert(!plain.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(__ps_bucket"))
    // cap 0 forces the bucketed decomposition — same integers, and the
    // corpus-sized window keeps its bucket partition key
    val bucketed = PrefixSum.runningSumsAdaptive(rows,
      expr("k div 17"), Seq($"k", $"id"), Seq($"v" -> "cum"), cap = 0L)
    assert(bucketed.select($"id", $"cum").except(expected).isEmpty &&
      expected.except(bucketed.select($"id", $"cum")).isEmpty)
    assert(bucketed.queryExecution.executedPlan.toString
      .contains("windowspecdefinition(__ps_bucket"))
  }
}
