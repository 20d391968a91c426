package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined word n-gram shingles as a native expression —
  * value-identical to the composed
  * `array_distinct(transform(sequence(...), i -> array_join(slice(tokens,
  * i, n), ' ')))` over `split(lower(trim(text)), "\s+")`, which runs on the
  * interpreted path and re-walks the token array per position. One pass,
  * first-occurrence order, per row.
  */
case class WordNGramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGrams.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.WordNGrams.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams"
}

/** Positional (non-distinct) variant of [[WordNGramsExpr]]: one shingle per
  * window POSITION, `max(tokens - n + 1, 1)` of them, duplicates kept. This
  * is the form passage-level dedup and decontamination count against — a
  * document's duplicated-window fraction needs every position, not the
  * distinct set.
  */
case class WordNGramsAllExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordNGrams.shingleAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.WordNGrams.shingleAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "word_ngrams_all"
}

object WordNGrams {

  /** Tokens = whitespace-split of lowercased trimmed text (same result as
    * Spark's `split(lower(trim(s)), "\s+")` — trim removes the edges that
    * make the two split semantics differ). Short texts (< n tokens) yield
    * one shingle of all tokens, matching `slice`'s clamping.
    */
  def shingle(s: UTF8String, n: Int): ArrayData = {
    // .trim() (space-only), matching Spark's `trim` function semantics
    val toks = s.trim().toLowerCase.toString.split("\\s+")
    val last = math.max(toks.length - n, 0)
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Positional shingles: same tokenization and window walk as [[shingle]]
    * but emitting every position (duplicates kept) — value-identical to
    * `transform(sequence(1, greatest(size(t) - n + 1, 1)), i ->
    * array_join(slice(t, i, n), ' '))`, which would run interpreted.
    */
  def shingleAll(s: UTF8String, n: Int): ArrayData = {
    val toks = s.trim().toLowerCase.toString.split("\\s+")
    val last = math.max(toks.length - n, 0)
    val out = new Array[Any](last + 1)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var j = i
      val end = math.min(i + n, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    GraftBridge.column(WordNGramsExpr(GraftBridge.expression(c), n))

  def all(c: Column, n: Int): Column =
    GraftBridge.column(WordNGramsAllExpr(GraftBridge.expression(c), n))
}
