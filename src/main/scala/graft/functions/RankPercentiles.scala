package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT a per-group value
  * buffer — the scale-safe replacement for the `percentile` aggregate
  * (whose ObjectHashAggregate buffer holds a group's entire value multiset:
  * with few groups and 100 TB of rows, that is an executor OOM, not a
  * spill).
  *
  * Shape: collapse to distinct (group, value) counts (codegen hash agg,
  * fully parallel, usually a massive reduction), one cumulative-count
  * running-sum window over the distinct values (streaming frame — sorts
  * spill, nothing accumulates), broadcast the per-group totals back, then
  * for each requested probability pick the two values whose rank ranges
  * bracket `p·(n-1)` and interpolate. The interpolation arithmetic matches
  * Spark's `Percentile.getPercentile` bit-for-bit
  * (`(hi−pos)·loVal + (pos−lo)·hiVal`, the lower value when the position
  * is integral), so results are drop-in identical to the aggregate's.
  */
object RankPercentiles {

  /** One row per group: `groupCol`, one named column per requested
    * percentile, and `n` (the group's row count).
    *
    * @param df       input rows
    * @param groupCol grouping column name
    * @param valueCol numeric column (cast to double internally)
    * @param probs    (output column name, probability in [0,1]) pairs
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            probs: Seq[(String, Double)]): DataFrame = {
    val vals = df
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    // 0-indexed sorted ranks covered by this distinct value:
    // [__cum_start, __cum_end)
    val cum = vals
      .withColumn("__cum_end", sum(col("__cnt")).over(w))
      .withColumn("__cum_start", col("__cum_end") - col("__cnt"))
    val totals = cum.groupBy(col(groupCol)).agg(max(col("__cum_end")).as("__n"))
    val joined = cum.join(broadcast(totals), groupCol)

    def pos(p: Double): Column =
      (col("__n") - lit(1L)).cast("double") * lit(p)
    def covers(rank: Column): Column =
      col("__cum_start") <= rank && rank < col("__cum_end")
    val brackets = probs.flatMap { case (name, p) => Seq(
      max(when(covers(floor(pos(p)).cast("long")), col("__v")))
        .as(s"__lo_$name"),
      max(when(covers(ceil(pos(p)).cast("long")), col("__v")))
        .as(s"__hi_$name"))
    }
    def interp(name: String, p: Double): Column = {
      val h = (col("__n") - lit(1L)).cast("double") * lit(p)
      val lo = floor(h); val hi = ceil(h)
      when(lo === hi, col(s"__lo_$name"))
        .otherwise((hi - h) * col(s"__lo_$name") + (h - lo) * col(s"__hi_$name"))
        .as(name)
    }
    joined.groupBy(col(groupCol))
      .agg(max(col("__n")).as("__n"), brackets: _*)
      .select(col(groupCol) +:
        probs.map { case (name, p) => interp(name, p) } :+
        col("__n").as("n"): _*)
  }
}
