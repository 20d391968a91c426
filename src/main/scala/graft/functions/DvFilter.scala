package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector anti-filter: TRUE when the row at `rowIndex` of data
  * file `fileName` is NOT marked deleted. The per-file deleted row
  * indices (decoded from the Delta protocol's roaring-bitmap DV sidecars
  * at PLANNING time — bounded per-file metadata, the same volume every
  * merge-on-read Delta reader materializes) ride along as one plan
  * reference object; each row pays a hash lookup plus a binary search,
  * inside whole-stage codegen. This keeps the scan shuffle-free — the
  * alternative, an anti-join against the exploded deleted-row list,
  * would shuffle the corpus by (file, index) at 100 TB.
  */
case class DvSurvivesExpr(file: Expression, idx: Expression,
    dvs: Map[UTF8String, Array[Long]]) extends BinaryExpression {

  override def left: Expression = file
  override def right: Expression = idx
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (file.dataType, idx.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (f, i) => TypeCheckResult.TypeCheckFailure(
        s"dv_survives needs (string, bigint), got (${f.sql}, ${i.sql})")
    }

  override def nullSafeEval(f: Any, i: Any): Any =
    DvFilter.survives(dvs, f.asInstanceOf[UTF8String],
      i.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvs", dvs,
      "scala.collection.immutable.Map")
    nullSafeCodeGen(ctx, ev, (f, i) =>
      s"${ev.value} = graft.functions.DvFilter.survives($ref, $f, $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(file = newLeft, idx = newRight)

  override def prettyName: String = "dv_survives"
}

object DvFilter {

  def apply(file: Column, idx: Column,
      dvs: Map[UTF8String, Array[Long]]): Column =
    GraftBridge.column(DvSurvivesExpr(GraftBridge.expression(file),
      GraftBridge.expression(idx), dvs))

  /** Shared eval/codegen helper. `dvs` values are SORTED row indices. */
  def survives(dvs: Map[UTF8String, Array[Long]], file: UTF8String,
      idx: Long): Boolean =
    dvs.get(file) match {
      case None => true
      case Some(sorted) => java.util.Arrays.binarySearch(sorted, idx) < 0
    }
}
