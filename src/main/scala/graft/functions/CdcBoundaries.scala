package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk-boundary counter (the LBFS/FastCDC primitive):
  * a boundary falls after every code-point position whose trailing
  * `w`-code-point window hashes to `0 mod divisor` under the Horner
  * polynomial `h = Σ cp_j · B^(w−1−j) mod M` (B = 131, M = 2^31 − 1).
  *
  * The kernel keeps the hash ROLLING — O(1) per position, O(n) per
  * document — which is the whole point of content-defined chunking at
  * 100 TB; the SQL oracle recomputes each window's polynomial directly
  * (O(n·w), fine at oracle scale) and must land on identical values:
  * rolling update and direct Horner are the same number by algebra, and
  * all arithmetic is exact 64-bit modular.
  */
case class CdcBoundariesExpr(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    CdcBoundaries.count(input.asInstanceOf[UTF8String], w, divisor)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundaries.count($c, $w, " +
        s"$divisor);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "cdc_boundaries"
}

object CdcBoundaries {

  val B = 131L
  val M = 2147483647L // 2^31 - 1

  def apply(text: Column, w: Int, divisor: Int): Column =
    GraftBridge.column(CdcBoundariesExpr(GraftBridge.expression(text), w,
      divisor))

  /** Number of positions i in [w, n] (1-based, code points) whose window
    * hash is 0 mod `divisor`; 0 when the text is shorter than one window.
    */
  def count(t: UTF8String, w: Int, divisor: Int): Int = {
    val cps = t.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return 0
    // B^(w-1) mod M: the outgoing code point's Horner weight
    var bw = 1L
    var k = 0
    while (k < w - 1) { bw = bw * B % M; k += 1 }
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    var cnt = if (h % divisor == 0) 1 else 0
    while (i < n) {
      h = ((h - cps(i - w) * bw % M + M) % M * B + cps(i)) % M
      if (h % divisor == 0) cnt += 1
      i += 1
    }
    cnt
  }
}
