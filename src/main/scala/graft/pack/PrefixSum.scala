package graft.pack

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running aggregates over a GLOBAL order — the general form of
  * the [[Packing]] prefix-sum discipline, for callers whose order key is not
  * a dense monotone id.
  *
  * A `SUM(x) OVER (ORDER BY k)` with no PARTITION BY serializes the whole
  * input through one task — the single worst plan shape a fact-table query
  * can have at 100 TB (round-5 audit: q44). Any associative running
  * aggregate decomposes instead into:
  *
  *   1. tag each row with a coarse bucket that is MONOTONE in the order
  *      (order(a) <= order(b) implies bucket(a) <= bucket(b));
  *   2. hash-aggregate per-bucket totals — one partial-agg shuffle whose
  *      output is one row PER BUCKET;
  *   3. cumulative-sum the bucket totals into per-bucket offsets — the only
  *      global window, over the bucket table (bounded by construction:
  *      callers pick ~1e3–1e4 buckets regardless of input size);
  *   4. broadcast the offsets back and finish with a PARTITIONED
  *      within-bucket running aggregate — one task per bucket, fully
  *      key-parallel.
  *
  * Bit-identical to the single-window form at any partitioning for exact
  * types (long / decimal): integer addition reassociates freely.
  *
  * Bucket skew note: parallelism is bounded by the bucket histogram. A
  * bucket expression that collapses (all rows one bucket) degrades to the
  * serial plan it replaces — callers derive buckets from a value with
  * known spread (price range, key range) and keep bucket count >> core
  * count so AQE can re-balance.
  */
object PrefixSum {

  /** `out = SUM(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)` —
    * inclusive running sum over the global order, computed with the
    * four-step decomposition above.
    *
    * `bucket` must be monotone NON-DECREASING along `order` and is
    * evaluated once per row (deterministic expressions only). Rows that
    * compare equal under `order` may land in the same bucket in any order
    * — callers needing determinism pass a total order, exactly as they
    * would for the single-window form.
    */
  def runningSum(df: DataFrame, bucket: Column, order: Seq[Column],
      value: Column, out: String): DataFrame =
    runningSums(df, bucket, order, Seq(value -> out))

  /** Several running sums over the SAME order in ONE decomposition pass —
    * one bucket-totals aggregate, one bounded bucket window, one
    * broadcast-back and one partitioned within-bucket window computing
    * every requested column (r12 optimization round: chaining
    * single-column [[runningSum]] calls re-ran all four steps per
    * column; q126's two chained calls halve to one pass here).
    *
    * @param values (value expression, output column name) pairs.
    */
  def runningSums(df: DataFrame, bucket: Column, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame =
    runningSumsBy(df, Nil, bucket, order, values)

  /** [[runningSums]] with PARTITION columns — the distributed form of
    * `SUM(x) OVER (PARTITION BY p ORDER BY k)` for LOW-cardinality `p`
    * (r12 optimization round): a handful of partition values gives the
    * plain window a handful of tasks no matter how large the input, the
    * same serialization hazard as the partitionless form, just divided by
    * |p|. Buckets restore key-parallelism WITHIN each partition value;
    * the only per-partition serial step stays the bounded bucket-offset
    * window.
    */
  def runningSumsBy(df: DataFrame, partitionCols: Seq[Column],
      bucket: Column, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val vcol: Int => String = i => s"__ps_v$i"
    val pcol: Int => String = i => s"__ps_p$i"
    val tagged0 = partitionCols.zipWithIndex.foldLeft(df) {
      case (d, (p, i)) => d.withColumn(pcol(i), p)
    }
    val tagged = values.zipWithIndex.foldLeft(
      tagged0.withColumn("__ps_bucket", bucket)) { case (d, ((v, _), i)) =>
      d.withColumn(vcol(i), v)
    }
    val pkeys = partitionCols.indices.map(i => col(pcol(i)))
    val keys = pkeys :+ col("__ps_bucket")

    val totals = tagged.groupBy(keys: _*)
      .agg(sum(col(vcol(0))).as("__ps_total0"),
        values.indices.drop(1)
          .map(i => sum(col(vcol(i))).as(s"__ps_total$i")): _*)

    // BOUNDED window (one row per bucket and partition value, never the
    // input table); inclusive-minus-own avoids a typed zero literal for
    // the first bucket.
    val overBuckets = Window.partitionBy(pkeys: _*)
      .orderBy(col("__ps_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = values.indices.foldLeft(totals) { (d, i) =>
      d.withColumn(s"__ps_offset$i",
        sum(col(s"__ps_total$i")).over(overBuckets) - col(s"__ps_total$i"))
    }.select(keys ++ values.indices.map(i => col(s"__ps_offset$i")): _*)

    val within = Window.partitionBy(keys: _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = tagged.join(broadcast(offsets),
      partitionCols.indices.map(pcol) :+ "__ps_bucket")
    values.zipWithIndex.foldLeft(joined) { case (d, ((_, out), i)) =>
      d.withColumn(out,
        col(s"__ps_offset$i") + sum(col(vcol(i))).over(within))
    }.drop(Seq("__ps_bucket") ++ partitionCols.indices.map(pcol) ++
      values.indices.flatMap(i => Seq(vcol(i), s"__ps_offset$i")): _*)
  }

  /** `out = ROW_NUMBER() OVER (ORDER BY order)` for a TOTAL order —
    * running count via [[runningSum]] with value 1.
    */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      out: String): DataFrame =
    runningSum(df, bucket, order, lit(1L), out)

  /** Compressed-table size at or below which [[runningSumsByAdaptive]]
    * uses the plain partitioned window: the worst case is one ≤4M-row
    * window task per partition value — bounded work at any input scale,
    * because callers pass a COMPRESSED table (distinct values), never
    * raw facts. Mirrors RankPercentiles.PlainWindowCap.
    */
  val PlainWindowCap: Long = 1L << 22

  /** [[runningSums]] that picks its shape from the MEASURED input size —
    * the partitionless twin of [[runningSumsByAdaptive]]. At or below
    * `cap` rows the running sums compute in ONE plain global window:
    * one single-partition exchange + one ≤cap-row window task — exactly
    * the bounded-single-task worst case [[runningSumsByAdaptive]]
    * already accepts when a partition value holds the whole table. The
    * MEASUREMENT is the bound: above `cap` the four-step bucketed
    * decomposition runs unchanged (so the 100 TB shape is the
    * decomposition; the single-task plan exists only where the table
    * was measured bounded — a runtime guarantee strictly stronger than
    * the static window-over-aggregate shape PlanGuardSpec's global
    * check looks for; callers join that check's measuredCapGlobal
    * exemption). Saves the decomposition's two extra exchanges and its
    * broadcast on every bounded call — the dominant cost of the kernel
    * at bench scale, where the compressed tables are a few thousand
    * rows.
    *
    * Same guarded cheap-to-recount contract as the partitioned form:
    * non-leaf inputs are checkpointed before the sizing count.
    */
  def runningSumsAdaptive(df0: DataFrame, bucket: Column,
      order: Seq[Column], values: Seq[(Column, String)],
      cap: Long = PlainWindowCap): DataFrame = {
    val df = cutForCount(df0)
    if (df.count() <= cap) {
      val w = Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      values.foldLeft(df) { case (d, (v, out)) =>
        d.withColumn(out, sum(v).over(w))
      }
    } else runningSums(df, bucket, order, values)
  }

  /** Single-column [[runningSumsAdaptive]]. */
  def runningSumAdaptive(df: DataFrame, bucket: Column, order: Seq[Column],
      value: Column, out: String,
      cap: Long = PlainWindowCap): DataFrame =
    runningSumsAdaptive(df, bucket, order, Seq(value -> out), cap)

  private def cutForCount(df0: DataFrame): DataFrame =
    df0.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df0
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        df0
      case _ => graft.graph.GraphOps.checkpoint(df0)
    }

  /** [[runningSumsBy]] that picks its shape from the MEASURED input
    * size — the GraphOps.BroadcastNodeCap pattern (measured data
    * decides, never a constant tuned to local cores). At or below `cap`
    * rows the plain `SUM(v) OVER (PARTITION BY p ORDER BY k)` window
    * runs: one exchange instead of the decomposition's three, and a
    * ≤4M-row window task is sub-second. Above it the bucketed
    * decomposition restores within-partition key-parallelism. Both
    * shapes produce identical integers (exact types reassociate
    * freely).
    *
    * `df` must be cheap to re-count — callers pass a lineage-cut
    * (checkpointed) compressed table, so the count reads cached blocks.
    * The contract is GUARDED, not just documented (r13, advisor item):
    * a raw multi-node plan is checkpointed here before the count, so a
    * future caller passing an uncut pipeline pays one materialization
    * instead of silently executing its whole upstream twice (once for
    * the count, once for the result).
    */
  def runningSumsByAdaptive(df0: DataFrame, partitionCols: Seq[Column],
      bucket: Column, order: Seq[Column],
      values: Seq[(Column, String)],
      cap: Long = PlainWindowCap): DataFrame = {
    require(partitionCols.nonEmpty,
      "runningSumsByAdaptive needs partition columns — use runningSums " +
        "for the global form (its plain-window fallback would be the " +
        "single-task plan the decomposition exists to avoid)")
    val df = cutForCount(df0)
    if (df.count() <= cap) {
      val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      values.foldLeft(df) { case (d, (v, out)) =>
        d.withColumn(out, sum(v).over(w))
      }
    } else runningSumsBy(df, partitionCols, bucket, order, values)
  }
}
