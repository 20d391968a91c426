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
      value: Column, out: String): DataFrame = {
    val tagged = df.withColumn("__ps_bucket", bucket)
      .withColumn("__ps_v", value)

    val totals = tagged.groupBy(col("__ps_bucket"))
      .agg(sum(col("__ps_v")).as("__ps_total"))

    // BOUNDED global window (one row per bucket, never the input table);
    // inclusive-minus-own avoids a typed zero literal for the first bucket.
    val overBuckets = Window.orderBy(col("__ps_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = totals
      .withColumn("__ps_offset",
        sum(col("__ps_total")).over(overBuckets) - col("__ps_total"))
      .select(col("__ps_bucket"), col("__ps_offset"))

    val within = Window.partitionBy(col("__ps_bucket"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.join(broadcast(offsets), Seq("__ps_bucket"))
      .withColumn(out, col("__ps_offset") + sum(col("__ps_v")).over(within))
      .drop("__ps_bucket", "__ps_v", "__ps_offset")
  }

  /** `out = ROW_NUMBER() OVER (ORDER BY order)` for a TOTAL order —
    * running count via [[runningSum]] with value 1.
    */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      out: String): DataFrame =
    runningSum(df, bucket, order, lit(1L), out)
}
