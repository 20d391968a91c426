package graft.text

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FastSS single-deletion neighborhood as a native expression:
  * `deletion_variants(s)` = `[s, del(s,1), …, del(s,len)]` — the string
  * itself followed by every single-character deletion, value-identical to
  * the composed
  * `concat(array(s), transform(sequence(1, length(s)), i ->
  * concat(substring(s, 1, i-1), substring(s, i+1, length(s)))))`,
  * which walks the interpreted higher-order-function path (one lambda
  * frame per CHARACTER per row — the dominant cost of blocked fuzzy
  * joins over any real vocabulary). One pass, code points stepped like
  * Spark's `substring` so supplementary characters delete whole.
  */
case class DeletionVariantsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    DeletionVariants.variants(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.DeletionVariants.variants($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "deletion_variants"
}

object DeletionVariants {

  def variants(s: UTF8String): ArrayData = {
    val str = s.toString
    val cp = str.codePointCount(0, str.length)
    val out = new Array[Any](cp + 1)
    out(0) = s
    var start = 0 // UTF-16 index of code point i
    var i = 0
    while (i < cp) {
      val end = str.offsetByCodePoints(start, 1)
      out(i + 1) = UTF8String.fromString(
        str.substring(0, start) + str.substring(end))
      start = end
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftBridge.column(DeletionVariantsExpr(GraftBridge.expression(c)))
}
