package graft.pack

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign documents to fixed-token-budget packs, the step
  * that turns a curated corpus into training-ready context windows.
  *
  * Semantically this is the sequential greedy pass
  * `pack_id = (SUM(tokens) OVER (ORDER BY id) - tokens) DIV budget`: each
  * document starts at the token offset where the previous one ended, and a
  * pack is one `budget`-sized slice of that global token stream. A naive
  * unpartitioned window computes it on ONE task — a non-starter at corpus
  * scale — so this runs it as a distributed prefix sum instead.
  */
object Packing {

  /** Pack documents (ordered by the monotone `idCol`) into contiguous
    * fixed-`budget` groups of `tokensCol` tokens.
    *
    * Three-step distributed prefix sum:
    *   1. coarse-bucket each doc (`id DIV bucketWidth`) and hash-aggregate
    *      per-bucket token totals — one partial-agg shuffle whose output is
    *      `n / bucketWidth` rows;
    *   2. cumulative-sum the bucket totals into per-bucket start offsets —
    *      a window over only the tiny totals table (the single-task window
    *      touches `n / bucketWidth` rows, never the corpus; pick
    *      `bucketWidth` so that's ~1e5 rows at full scale);
    *   3. broadcast the offsets back and finish with a PARTITIONED
    *      within-bucket running sum, so the corpus-sized window runs one
    *      task per bucket.
    *
    * Output = input columns + `start_offset` (tokens before this doc) +
    * `pack_id` (`start_offset DIV budget`). Exactly equal to the
    * single-window form at any partitioning.
    */
  def packByBudget(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, bucketWidth: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")

    val bucketed = docs.withColumn("__bucket",
      expr(s"`$idCol` DIV $bucketWidth"))

    val totals = bucketed.groupBy(col("__bucket"))
      .agg(sum(col(tokensCol)).as("__bucket_tokens"))

    // BOUNDED global window (emits a "No Partition Defined" WindowExec
    // warning — provably benign): its input is `totals`, ONE ROW PER
    // BUCKET (ceil(maxId / bucketWidth) rows), never the corpus. The
    // single-partition pass is over bucket aggregates only; the per-row
    // prefix sums below are partitioned by bucket and fully parallel.
    val overBuckets = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = totals
      .withColumn("__bucket_offset",
        sum(col("__bucket_tokens")).over(overBuckets) - col("__bucket_tokens"))
      .select(col("__bucket"), col("__bucket_offset"))

    val withinBucket = Window.partitionBy(col("__bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("start_offset",
        col("__bucket_offset") + sum(col(tokensCol)).over(withinBucket) -
          col(tokensCol))
      .withColumn("pack_id", expr(s"start_offset DIV $budget"))
      .drop("__bucket", "__bucket_offset")
  }
}
