package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character n-gram COUNTS as a native expression:
  * `char_ngram_counts(s, n)` returns `array<struct<ng: string, k: long>>`
  * with one entry per DISTINCT n-gram of `s` and its occurrence count —
  * value-identical to exploding
  * `transform(sequence(1, length(s) - n + 1), i -> substring(s, i, n))`
  * and counting per (row, n-gram), but in ONE codegen-friendly pass.
  *
  * Why it exists: the composed form walks the interpreted higher-order-
  * function path (~µs per ELEMENT — a gate-dominating cost at one element
  * per character over a corpus) and then needs a corpus-wide
  * (row, n-gram) hash aggregation just to recover counts the scan already
  * saw. This kernel deletes both: generation is a tight char loop and the
  * counts come out pre-aggregated per row, so downstream per-document
  * scoring (Naive Bayes, LM perplexity) starts from O(distinct n-grams)
  * rows instead of O(chars).
  *
  * Semantics pinned for cross-engine oracles: positions step by Unicode
  * CODE POINT (matching Spark's `substring`/`length` and DuckDB's
  * `substr`/`length` on VARCHAR, both of which count code points, not
  * UTF-16 units); strings shorter than `n` yield an empty array; no case
  * folding (lowercase upstream so Spark's `lower` stays the single
  * definition). First-occurrence order, deterministic.
  */
case class CharNgramCountsExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = CharNgrams.outType

  override def nullSafeEval(input: Any): Any =
    CharNgrams.counts(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.CharNgrams.counts($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_counts"
}

object CharNgrams {

  val outType: DataType = ArrayType(
    StructType(Seq(
      StructField("ng", StringType, nullable = false),
      StructField("k", LongType, nullable = false))),
    containsNull = false)

  /** One pass over the code points; windows shorter than `n` (string end)
    * are not emitted, matching the `sequence(1, length - n + 1)` bound
    * (and `sequence`'s descending-when-empty hazard is moot here — a
    * short string just yields zero windows).
    */
  def counts(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cp = str.codePointCount(0, str.length)
    val seen = mutable.LinkedHashMap.empty[String, Long]
    var start = 0 // UTF-16 index of window start
    var i = 0
    while (i <= cp - n) {
      val end = str.offsetByCodePoints(start, n)
      val ng = str.substring(start, end)
      seen.update(ng, seen.getOrElse(ng, 0L) + 1L)
      start = str.offsetByCodePoints(start, 1)
      i += 1
    }
    val out = new Array[Any](seen.size)
    var j = 0
    seen.foreach { case (ng, k) =>
      out(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(ng), k))
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    GraftBridge.column(CharNgramCountsExpr(GraftBridge.expression(c), n))
}
