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
  *
  * NULL semantics also match the aggregate: null values are ignored
  * (`n` counts non-null rows only), and a group whose values are ALL
  * null still yields a row — null percentiles, `n = 0` — exactly as
  * `groupBy.agg(percentile(...))` would emit it.
  */
object RankPercentiles {

  /** Compressed-table size above which the cumulative step switches from
    * the plain per-group running window to the bucketed PrefixSum
    * decomposition. Below it the worst case is one ≤4M-row window task —
    * bounded work regardless of input size, because the table this sizes
    * is the DISTINCT (group, value) aggregate, not the input.
    */
  val PlainWindowCap: Long = 1L << 22

  /** One row per group: `groupCol`, one named column per requested
    * percentile, and `n` (the group's row count).
    *
    * @param df       input rows
    * @param groupCol grouping column name
    * @param valueCol numeric column (cast to double internally)
    * @param probs    (output column name, probability in [0,1]) pairs
    */
  def exact(df: DataFrame, groupCol: String, valueCol: String,
            probs: Seq[(String, Double)],
            plainWindowCap: Long = PlainWindowCap): DataFrame = {
    // one heavy pass: distinct (group, value) counts with null kept as its
    // own row for now — both the percentile branch and the all-groups
    // branch below hang off this aggregate. The aggregate is
    // LINEAGE-CUT (r12 optimization round): the kernel references its
    // compressed table ~8× downstream (bounds join, bucket totals,
    // within-bucket window, group totals, all-groups restore), and each
    // reference re-inlines the whole INPUT plan — composing the kernel
    // with itself (q49: median, then median of deviations) squared that
    // into a 264-Exchange physical plan whose AQE orchestration cost
    // dwarfed the data (measured 8.6 s vs 2.6 s for the single kernel at
    // sf0.1/local[32]). The cut materializes exactly what the exchange
    // below it would have written anyway — one row per distinct (group,
    // value) — and every downstream reference expands a leaf instead of
    // the input subtree.
    val counts = graft.graph.GraphOps.checkpoint(df
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__cnt")))
    fromCounts(counts, groupCol, probs, counts.count() <= plainWindowCap)
  }

  /** [[exact]] over PRE-COUNTED rows: `df` carries one row per (group,
    * value) observation batch with `weightCol` occurrences — the form a
    * caller holds after its own compression pass (e.g. q49 derives the
    * deviation multiset from the value multiset without re-scanning the
    * fact table). Equivalent to `exact` on the weight-expanded rows:
    * the internal re-aggregation sums weights where `exact` counts rows,
    * and integer sums are the same longs in any order.
    *
    * The internal lineage cut is the CALLER's choice here (r13, the
    * r12-verdict q49 adjudication): a caller whose input already roots
    * on a checkpointed leaf (plus cheap derivations) skips the cut —
    * at bench scale each eager cut is a blocking job whose
    * materialization costs more than the shallow re-inlining it avoids,
    * and at any scale re-expanding a leaf-rooted subtree is one
    * runtime-reused exchange, not a recompute. `sizeHint` (an upper
    * bound on the distinct row count, e.g. the caller's own measured
    * table size) picks the cumulative shape without forcing a count
    * job when the cut is skipped; comparing an UPPER BOUND to the cap
    * is always safe — it can only choose the decomposition where the
    * plain window would also have been fine, never the reverse.
    */
  def exactWeighted(df: DataFrame, groupCol: String, valueCol: String,
                    weightCol: String, probs: Seq[(String, Double)],
                    plainWindowCap: Long = PlainWindowCap,
                    cutInput: Boolean = true,
                    sizeHint: Option[Long] = None): DataFrame = {
    val counts0 = df
      .groupBy(col(groupCol), col(valueCol).cast("double").as("__v"))
      .agg(sum(col(weightCol)).as("__cnt"))
    val counts =
      if (cutInput) graft.graph.GraphOps.checkpoint(counts0) else counts0
    val n = sizeHint.getOrElse(counts.count())
    fromCounts(counts, groupCol, probs, n <= plainWindowCap)
  }

  /** Shared kernel body over the distinct (group, __v, __cnt) table.
    * `plainWindow` picks the cumulative shape (measured by the caller —
    * below the cap the plain per-group running window is one exchange;
    * above it the bucketed PrefixSum decomposition keeps within-group
    * key-parallelism at 100 TB).
    */
  private def fromCounts(counts: DataFrame, groupCol: String,
                         probs: Seq[(String, Double)],
                         plainWindow: Boolean): DataFrame = {
    // nulls must not form their own __v group: they'd inflate __n and
    // shift every cumulative rank range (Spark's Percentile ignores them)
    val vals = counts.where(col("__v").isNotNull)
    // 0-indexed sorted ranks covered by this distinct value:
    // [__cum_start, __cum_end). r12 optimization round: the plain
    // group-partitioned running window gives the whole distinct table
    // |groups| tasks — a handful of event types would serialize a 100 TB
    // percentile pass — so ABOVE the cap the bucketed per-group prefix
    // sum restores key-parallelism (buckets from a per-group affine value
    // map: monotone in __v by construction, so the running sums are the
    // same integers in the same order; bucket skew only costs
    // parallelism, never correctness). BELOW the cap the plain window is
    // strictly better — one exchange instead of the decomposition's
    // three, and a ≤4M-row window task is sub-second. The switch is on
    // the MEASURED compressed size supplied by the caller (exact counts
    // its checkpointed table from cache; exactWeighted may substitute a
    // caller-measured upper bound — the GraphOps.BroadcastNodeCap
    // pattern: measured data decides, never a constant tuned to the
    // local core count).
    val cum = if (plainWindow) {
      val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      vals.withColumn("__cum_end", sum(col("__cnt")).over(w))
        .withColumn("__cum_start", col("__cum_end") - col("__cnt"))
    } else {
      val bounds = vals.groupBy(col(groupCol))
        .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
      val bucketed = vals.join(broadcast(bounds), groupCol)
      val bucket = when(col("__mx") > col("__mn"),
        floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
          * 1024.0).cast("long")).otherwise(lit(0L))
      graft.pack.PrefixSum.runningSumsBy(bucketed,
          Seq(col(groupCol)), bucket, Seq(col("__v")),
          Seq(col("__cnt") -> "__cum_end"))
        .drop("__mn", "__mx")
        .withColumn("__cum_start", col("__cum_end") - col("__cnt"))
    }
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
    val computed = joined.groupBy(col(groupCol))
      .agg(max(col("__n")).as("__n"), brackets: _*)
      .select(col(groupCol) +:
        probs.map { case (name, p) => interp(name, p) } :+
        col("__n").as("n"): _*)
    // groups whose values are all null vanished at the isNotNull filter;
    // restore them (null percentiles, n=0) so the output has exactly the
    // groups the aggregate form would emit. Re-aggregating `counts` (the
    // already-distinct rows) is O(distinct values), not another data pass.
    val allGroups = counts.groupBy(col(groupCol)).agg(lit(1).as("__present"))
    allGroups.join(broadcast(computed), Seq(groupCol), "left")
      .select(col(groupCol) +:
        probs.map { case (name, _) => col(name) } :+
        coalesce(col("n"), lit(0L)).as("n"): _*)
  }
}
