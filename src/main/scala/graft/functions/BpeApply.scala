package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered fold of literal string replaces — the BPE merge application:
  * `((w replace s1→t1) replace s2→t2) …` for the learned merge list.
  *
  * The merge list is O(rounds) strings (bounded metadata), so it rides in
  * the expression as reference objects and each token is encoded by a
  * tight loop of `UTF8String.replace` calls — the SAME literal
  * non-overlapping left-to-right replace the SQL `replace` performs, so
  * the fold is bit-identical to the chained-`replace` form (and to the
  * DuckDB oracle's), minus the per-element higher-order-function dispatch
  * and per-step Column allocation the `aggregate(...)` formulation paid.
  */
case class BpeApplyExpr(child: Expression,
    searches: Array[String], targets: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  private lazy val s8 = searches.map(UTF8String.fromString)
  private lazy val t8 = targets.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any =
    BpeApply.fold(input.asInstanceOf[UTF8String], s8, t8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("bpeSearches",
      searches.map(UTF8String.fromString),
      "org.apache.spark.unsafe.types.UTF8String[]")
    val tRef = ctx.addReferenceObj("bpeTargets",
      targets.map(UTF8String.fromString),
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeApply.fold($c, $sRef, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_apply"
}

object BpeApply {

  /** merges: (search, target) pairs in application (round) order. */
  def apply(word: Column, merges: Array[(String, String)]): Column =
    GraftBridge.column(BpeApplyExpr(GraftBridge.expression(word),
      merges.map(_._1), merges.map(_._2)))

  def fold(w: UTF8String, searches: Array[UTF8String],
      targets: Array[UTF8String]): UTF8String = {
    var cur = w
    var i = 0
    while (i < searches.length) {
      cur = cur.replace(searches(i), targets(i))
      i += 1
    }
    cur
  }
}
