package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native greedy MMR (maximal-marginal-relevance) selection over a BOUNDED
  * per-query candidate array: from `array<struct<cid, cos, vec, cn>>` pick
  * `k` candidates maximizing λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s) with
  * λ = 1/2, ties on lower cid; returns `array<struct<pick, cid, score>>`
  * in pick order.
  *
  * Why a kernel: the greedy recursion is inherently sequential in k, and
  * its higher-order-function formulation re-inlines the whole prior-step
  * expression tree at every reference — Catalyst's collapsed projection
  * made evaluation exponential in k (measured: one 20-candidate row burned
  * minutes). Here it is the textbook O(k·m) incremental loop — each pick
  * updates every remaining candidate's running max-similarity with ONE
  * sequential-fold dot — inside whole-stage codegen via a static helper
  * (the NearestCells pattern).
  *
  * Numeric contract: dots are strict sequential left folds over the stored
  * float vectors; sims divide by the PRECOMPUTED norms carried in the
  * struct (`cn` — itself a fold + sqrt); λ = 1/2 makes each score two
  * exact IEEE operations; the incremental Math.max equals any-order MAX
  * exactly. The DuckDB oracle replays the same k steps relationally and
  * lands on identical bits.
  */
case class MmrSelectExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pick", IntegerType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 4 &&
          s(0).dataType == LongType && s(1).dataType == DoubleType &&
          s(3).dataType == DoubleType &&
          s(2).dataType.isInstanceOf[ArrayType] =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mmr_select needs array<struct<cid:long, cos:double, " +
            s"vec:array<float>, cn:double>>, got ${t.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    MmrSelect.select(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.MmrSelect.select($v, $k);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "mmr_select"
}

object MmrSelect {

  /** Build the Column over `cands`: array<struct<cid, cos, vec, cn>>. */
  def apply(cands: Column, k: Int): Column =
    GraftBridge.column(MmrSelectExpr(GraftBridge.expression(cands), k))

  /** score-desc-then-cid-asc strict ordering. */
  private def beats(s: Double, id: Long, s2: Double, id2: Long): Boolean =
    s > s2 || (s == s2 && id < id2)

  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  /** Shared eval/codegen kernel: the ≤k MMR picks in pick order. */
  def select(cands: ArrayData, k: Int): ArrayData = {
    val m = cands.numElements()
    val cid = new Array[Long](m)
    val cos = new Array[Double](m)
    val vec = new Array[ArrayData](m)
    val cn = new Array[Double](m)
    var i = 0
    while (i < m) {
      val r = cands.getStruct(i, 4)
      cid(i) = r.getLong(0); cos(i) = r.getDouble(1)
      vec(i) = r.getArray(2); cn(i) = r.getDouble(3)
      i += 1
    }
    val taken = new Array[Boolean](m)
    val maxSim = new Array[Double](m)
    val nPicks = math.min(k, m)
    val out = new Array[Any](nPicks)
    var step = 0
    while (step < nPicks) {
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < m) {
        if (!taken(j)) {
          val score =
            if (step == 0) 0.5 * cos(j) // penalty-free seed pick
            else 0.5 * cos(j) - 0.5 * maxSim(j)
          if (best < 0 || beats(score, cid(j), bestScore, cid(best))) {
            best = j; bestScore = score
          }
        }
        j += 1
      }
      taken(best) = true
      out(step) = new GenericInternalRow(
        Array[Any](step + 1, cid(best), bestScore))
      // fold the new pick into every remaining candidate's max-similarity
      j = 0
      while (j < m) {
        if (!taken(j)) {
          val s = dot(vec(j), vec(best)) / (cn(j) * cn(best))
          if (step == 0 || s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }
}
