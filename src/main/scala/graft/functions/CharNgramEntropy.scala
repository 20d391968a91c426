package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-n-gram Shannon entropy as ONE scan-side struct —
  * `(n_grams, n_distinct, entropy)` — the zero-shuffle form of the tx17
  * quality signal.
  *
  * Why an expression and not explode+groupBy: entropy is a PER-DOCUMENT
  * function, but the relational formulation shuffles every (doc, gram)
  * position pair — ~n_chars rows per document — only to re-collapse them to
  * one row per doc. At 100 TB that shuffle IS the job. Counting grams in a
  * per-row hash map inside whole-stage codegen keeps the work where the
  * data already sits; the operator output is one narrow row per document.
  *
  * Cross-engine contract (the DuckDB oracle recomputes relationally):
  * n-grams are CODE-POINT windows (matching `substring`/`substr`
  * semantics), p = c/n is one correctly-rounded IEEE division, ln is
  * java.lang.Math.log exactly as Spark's own `log` function, and each
  * p·ln(p) addend is quantized to the 2^-20 grid with the same HALF_UP
  * rule as Spark's `round(x, 0)` — so the per-doc sum is exact under any
  * accumulation order, and both engines land on identical doubles.
  */
case class CharNgramEntropyExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngram_entropy needs a string, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    CharNgramEntropy.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow) " +
        s"graft.functions.CharNgramEntropy.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "char_ngram_entropy"
}

object CharNgramEntropy {

  /** 2^20 — must stay equal to the SQL oracle's quantization grid. */
  private val Grid = 1048576L

  def apply(c: Column, n: Int = 3): Column =
    GraftBridge.column(CharNgramEntropyExpr(GraftBridge.expression(c), n))

  /** Spark's `round(x, 0)` semantics for doubles: decimal HALF_UP (away
    * from zero), NOT Math.rint's half-to-even — the addends are negative,
    * so the distinction is real at exact halves.
    */
  private def roundHalfUp(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(s: UTF8String, n: Int): InternalRow = {
    // code-point windows, matching substring()/substr() indexing in both
    // engines (UTF-16 char windows would split surrogate pairs apart)
    val cps = s.toString.codePoints().toArray
    val total = cps.length - n + 1
    val out = new GenericInternalRow(3)
    if (total <= 0) {
      out.update(0, 0L); out.update(1, 0L); out.update(2, 0.0)
      return out
    }
    val counts = new java.util.HashMap[String, Array[Int]]()
    var i = 0
    while (i < total) {
      val g = new String(cps, i, n)
      val slot = counts.get(g)
      if (slot == null) counts.put(g, Array(1)) else slot(0) += 1
      i += 1
    }
    var sum = 0.0
    val it = counts.values().iterator()
    val nd = total.toDouble
    while (it.hasNext) {
      val p = it.next()(0).toDouble / nd
      sum += roundHalfUp(p * Math.log(p) * Grid) / Grid
    }
    out.update(0, total.toLong)
    out.update(1, counts.size.toLong)
    out.update(2, -sum)
    out
  }
}
