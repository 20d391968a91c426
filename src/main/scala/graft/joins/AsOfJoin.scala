package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no built-in for.
  *
  * For each left row, attach the payload of the LATEST right row of the same
  * key with `rightTs <= leftTs` (ties inclusive), or nulls if none — i.e.
  * DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`.
  *
  * Implemented by composition (SURVEY §7.3 preference (a)): tag-union both
  * sides, one window `last(payload, ignoreNulls)` over
  * `(key) ORDER BY (ts, tag) ROWS UNBOUNDED PRECEDING..CURRENT`, filter back
  * to left rows. ONE hash exchange by key — strictly better at scale than
  * the naive range-join (O(n·m) per key) or per-key collect: state is the
  * sort, the window carries one payload struct, and skewed keys are handled
  * by AQE like any other window.
  *
  * Precondition: right side unique per (key, rightTs) — pre-aggregate
  * otherwise (multiple right rows on the same timestamp make any as-of
  * semantics ambiguous).
  */
object AsOfJoin {

  /** @param left        probe side; ALL its columns are preserved
    * @param right       build side: key + rightTs + payload columns only
    * @param key         equi-join key column (same name both sides)
    * @param leftTs      left event-time column
    * @param rightTs     right event-time column name in `right`
    * @param payloadCols columns of `right` to attach (must not collide with
    *                    left column names)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String,
           payloadCols: Seq[String]): DataFrame = {
    val paySchema = org.apache.spark.sql.types.StructType(
      right.select(payloadCols.map(col): _*).schema.fields)
    val leftSchema = org.apache.spark.sql.types.StructType(left.schema.fields)

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__left"),
      lit(null).cast(paySchema).as("__pay"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(leftSchema).as("__left"),
      struct(payloadCols.map(col): _*).as("__pay"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__filled", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__left.*") +:
        payloadCols.map(c => col(s"__filled.$c").as(c)): _*)
  }

  /** FORWARD as-of join with a match tolerance — for each left row, attach
    * the payload of the EARLIEST right row of the same key with
    * `rightTs >= leftTs` (ties inclusive) AND within `tolerance` of it, or
    * nulls. The "what happened next, soon" primitive (click → next error,
    * order → next shipment); the tolerance keeps a stale far-future match
    * from masquerading as a consequence.
    *
    * Same single-exchange composition as [[asOf]], mirrored: the union is
    * windowed DESCENDING by time, so `last(payload)` at a left row is the
    * nearest following right row. The tolerance is applied AFTER the fill
    * (the filled payload carries the matched timestamp), so it costs one
    * scan-side predicate, not a second join.
    *
    * Precondition: right side unique per (key, rightTs), as in [[asOf]].
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payloadCols: Seq[String],
                  tolerance: (org.apache.spark.sql.Column,
                    org.apache.spark.sql.Column) =>
                    org.apache.spark.sql.Column): DataFrame = {
    val payWithTs =
      if (payloadCols.contains(rightTs)) payloadCols
      else rightTs +: payloadCols
    val paySchema = org.apache.spark.sql.types.StructType(
      right.select(payWithTs.map(col): _*).schema.fields)
    val leftSchema = org.apache.spark.sql.types.StructType(left.schema.fields)

    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      struct(left.columns.map(col): _*).as("__left"),
      lit(null).cast(paySchema).as("__pay"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(leftSchema).as("__left"),
      struct(payWithTs.map(col): _*).as("__pay"))

    // DESC by time: "last seen" along the window is the NEXT right row
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val inTol = tolerance(col("__ts"), col(s"__filled.$rightTs"))
    l.unionByName(r)
      .withColumn("__filled", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__left.*") +: payloadCols.map(c =>
        when(inTol, col(s"__filled.$c")).as(c)): _*)
  }
}
