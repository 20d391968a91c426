package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two numeric arrays
  * (`array<float>`/`array<double>`, mixed allowed): a primitive
  * multiply-accumulate loop in generated Java.
  *
  * This is the hot inner kernel of every similarity operator — evaluated
  * once per candidate PAIR, i.e. O(n·k) to O(n²/buckets) times. The
  * `aggregate(zip_with(...))` formulation it replaces runs on the
  * interpreted expression path (higher-order functions don't codegen) and
  * allocates an intermediate array per pair.
  *
  * Numeric contract: strict sequential left-to-right accumulation in
  * double — bit-identical to the lambda fold AND to the DuckDB oracle's
  * `list_reduce(list_transform(...), (a,b) -> a+b)` on WELL-FORMED input
  * (equal lengths, no null elements — which is what every caller in this
  * library feeds it). On ragged input the semantics intentionally differ
  * from the lambda fold and are defined, not an accident: length mismatch
  * truncates to the shorter array, and null elements contribute 0.0 —
  * whereas `aggregate(zip_with(...))` would return NULL for both. Documented
  * divergence; both paths (interpreted + codegen) implement it identically.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs two float/double arrays, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0.0 on BOTH eval paths (GenericArrayData
      // would otherwise NPE here while UnsafeArrayData reads 0 — this check
      // makes the interpreted path match the generated code exactly).
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, left)} * ${get(b, right)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Grid-quantized dot product: every per-term product is floored to the
  * `1/grid` lattice BEFORE accumulating, so the sum is a sum of exact
  * dyadic rationals — ORDER-INDEPENDENT (exact in double while
  * `|sum| < 2^53/grid`), unlike [[DotProductExpr]]'s sequential fold. This
  * is the form to use when the mirrored engine computes the same dot as a
  * per-dimension SQL `SUM(floor(x*y*G)/G)` group (arbitrary order) rather
  * than a list fold: both engines land on the identical bit pattern.
  * Same null/ragged contract as vec_dot.
  */
case class DotProductGridExpr(left: Expression, right: Expression, grid: Long)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    DotProductExpr(left, right).checkInputDataTypes()

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    val g = grid.toDouble
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        acc += Math.floor(x * y * g) / g
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += java.lang.Math.floor(
         |      ${get(a, left)} * ${get(b, right)} * ${grid}.0d) / ${grid}.0d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_grid"
}

object DotProduct {
  /** `vec_dot(a, b)` as a Column. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProductExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `vec_dot_grid(a, b)`: order-independent grid-quantized dot. */
  def grid(a: Column, b: Column, grid: Long): Column =
    GraftBridge.column(DotProductGridExpr(
      GraftBridge.expression(a), GraftBridge.expression(b), grid))
}
