package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable data-quality primitives (the Deequ/Great-Expectations shape):
  * a one-pass multi-column profile and a declarative constraint audit.
  * See ops.QualityQueries for the gated compositions and the scale notes.
  */
object DataQuality {

  /** How a column's min/max are canonically reported: exact integers for
    * numeric/temporal types (cents for 2-dp doubles, epoch-micros for
    * timestamps), lexicographic strings for text.
    */
  sealed trait ColKind
  case object LongCol extends ColKind
  case object CentsCol extends ColKind // 2-dp double → integer cents
  case object TimestampCol extends ColKind // → epoch micros
  case object StringCol extends ColKind

  def canonLong(c: Column, kind: ColKind): Column = kind match {
    case CentsCol     => round(c * 100).cast("long")
    case TimestampCol => unix_micros(c.cast("timestamp"))
    case _            => c.cast("long")
  }

  /** Profile of `cols`: per column — n_rows, n_nonnull, completeness_ppm,
    * exact n_distinct, canonical min/max.
    *
    * Two scans, each the shape that stays fast: (1) every non-distinct
    * statistic in ONE global aggregate (map-side partial, no grouping
    * keys); (2) distinct counts via a NARROW ×|cols| explode to
    * (col_name, value-as-string) → two-level hash agg → per-column
    * count. The naive alternative — |cols| COUNT(DISTINCT)s in one agg —
    * plans as Spark's multi-distinct Expand over a |cols|+1-column
    * grouping, which degrades to SortAggregate chains with two full
    * sorts of the expanded rows (measured 3.4 s on a 150k-row table vs
    * well under a second for this shape). The string cast is lossless
    * for distinctness (canonical renderings are injective per type).
    */
  def profile(df: DataFrame, cols: Seq[(String, ColKind)]): DataFrame = {
    val aggs = cols.flatMap { case (n, kind) =>
      val base = Seq(count(col(n)).as(s"nn_$n"))
      if (kind == StringCol)
        base ++ Seq(min(col(n)).as(s"mns_$n"), max(col(n)).as(s"mxs_$n"))
      else
        base ++ Seq(min(canonLong(col(n), kind)).as(s"mnn_$n"),
          max(canonLong(col(n), kind)).as(s"mxn_$n"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = cols.map { case (n, kind) =>
      struct(lit(n).as("col_name"), col("n_rows"),
        col(s"nn_$n").as("n_nonnull"),
        expr(s"nn_$n * 1000000 div n_rows").as("completeness_ppm"),
        (if (kind == StringCol) lit(null).cast("long")
         else col(s"mnn_$n")).as("min_num"),
        (if (kind == StringCol) lit(null).cast("long")
         else col(s"mxn_$n")).as("max_num"),
        (if (kind == StringCol) col(s"mns_$n")
         else lit(null).cast("string")).as("min_str"),
        (if (kind == StringCol) col(s"mxs_$n")
         else lit(null).cast("string")).as("max_str"))
    }
    val base = one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
    val tagged = df.select(explode(array(cols.map { case (n, _) =>
        struct(lit(n).as("col_name"), col(n).cast("string").as("v"))
      }: _*)).as("t"))
      .select(col("t.*"))
      .filter(col("v").isNotNull) // COUNT(DISTINCT) ignores nulls
    val nd = tagged.distinct()
      .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    base.join(broadcast(nd), Seq("col_name"), "left") // all-null col → 0
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("completeness_ppm"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy(col("col_name"))
  }

  /** A row-predicate rule: violations = rows where `violated` is true. */
  def predicateRule(name: String, checked: DataFrame,
      violated: Column): DataFrame =
    checked.agg(count(lit(1)).as("n_checked"),
        coalesce(sum(violated.cast("long")), lit(0L)).as("n_violations"))
      .select(lit(name).as("constraint_name"), col("n_checked"),
        col("n_violations"))

  /** Uniqueness rule: violations = n_rows − n_distinct keys (extra rows). */
  def uniqueRule(name: String, checked: DataFrame, key: Column): DataFrame =
    checked.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(key)).as("n_violations"))
      .select(lit(name).as("constraint_name"), col("n_checked"),
        col("n_violations"))

  /** Referential-integrity rule: violations = child rows whose key has no
    * match in the parent (one shuffle anti-join; parent scans only its key
    * column).
    */
  def fkRule(name: String, child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame = {
    val viol = child.join(parent.select(parentKey.as("__pk")),
        childKey === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(viol))
      .select(lit(name).as("constraint_name"), col("n_checked"),
        col("n_violations"))
  }

  /** Union an audit's rule rows into the report: one row per rule with an
    * exact violation count and a pass flag, totally ordered by rule name.
    */
  def audit(rules: Seq[DataFrame]): DataFrame =
    rules.reduce(_ unionByName _)
      .select(col("constraint_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0).cast("long").as("passed"))
      .orderBy(col("constraint_name"))
}
