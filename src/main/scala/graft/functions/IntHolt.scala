package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Holt's linear-trend double exponential smoothing with α = β = 1/2 on
  * the 2^-20 grid — the level+trend upgrade of [[IntEwma]] (which tracks
  * level only and lags any trending series by construction):
  *
  *   l₀ = x₀·2²⁰, b₀ = 0
  *   l_k = truncDiv(x_k·2²⁰ + (l_{k-1} + b_{k-1}), 2)
  *   b_k = truncDiv((l_k − l_{k-1}) + b_{k-1}, 2)
  *
  * Every state is an exact integer, so the doubly-coupled recurrence is
  * deterministic under any engine. TRUNCATING division (round toward
  * zero): the trend b_k goes negative on declining series, where the
  * rounding convention becomes observable — DuckDB's integer `//`
  * truncates (`-5 // 2 = -2`, measured), as do Scala's `/` and Spark's
  * `div`, so all three replay the recurrence bit-for-bit.
  *
  * Returns the interleaved state array [l₀, b₀, l₁, b₁, …] (2n longs) —
  * one flat primitive array keeps the kernel's eval/codegen shared helper
  * trivial; callers slice with element_at. Sequential-fold-in-a-kernel
  * rationale and the BOUNDED-input contract (one element per series
  * bucket, never raw events) as in [[IntEwma]].
  */
case class IntHoltExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_holt needs array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    IntHolt.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IntHolt.fold($v);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "int_holt"
}

object IntHolt {

  val Grid = 1048576L // 2^20

  def apply(xs: Column): Column =
    GraftBridge.column(IntHoltExpr(GraftBridge.expression(xs)))

  /** Shared eval/codegen kernel: interleaved [level, trend] per step. */
  def fold(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Long](2 * n)
    var l = 0L
    var b = 0L
    var i = 0
    while (i < n) {
      val scaled = xs.getLong(i) * Grid
      if (i == 0) { l = scaled; b = 0L }
      else {
        val lPrev = l
        l = (scaled + (l + b)) / 2
        b = ((l - lPrev) + b) / 2
      }
      out(2 * i) = l
      out(2 * i + 1) = b
      i += 1
    }
    new GenericArrayData(out)
  }
}
