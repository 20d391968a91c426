package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer EWMA prefix fold with α = 1/2 on the 2^-20 grid:
  * E₀ = x₀·2²⁰, E_k = (x_k·2²⁰ + E_{k-1}) div 2 — every state an exact
  * integer, so the recurrence is deterministic under any engine (the
  * DuckDB oracle replays it as a recursive CTE and matches bit-for-bit;
  * a float recurrence would drift in the last bits after enough steps).
  *
  * A kernel because the fold is inherently sequential over the series:
  * the HOF `aggregate`-with-array-append form copies the accumulator
  * array per element (O(n²) work interpreted); this is one O(n) primitive
  * loop, shared by eval and codegen. Input is expected BOUNDED (one
  * element per series bucket — e.g. per day — never raw events).
  */
case class IntEwmaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int_ewma needs array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    IntEwma.fold(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.IntEwma.fold($v);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "int_ewma"
}

object IntEwma {

  val Grid = 1048576L // 2^20

  def apply(xs: Column): Column =
    GraftBridge.column(IntEwmaExpr(GraftBridge.expression(xs)))

  /** Shared eval/codegen kernel. */
  def fold(xs: ArrayData): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      val scaled = xs.getLong(i) * Grid
      prev = if (i == 0) scaled else (scaled + prev) / 2
      out(i) = prev
      i += 1
    }
    new GenericArrayData(out)
  }
}
