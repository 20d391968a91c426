package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native top-`probes` nearest-cell assignment against a PLAN-RESIDENT
  * quantizer: for an input vector, the ids of the `probes` highest-cosine
  * centroids, ordered by (score desc with NaN greatest, id asc) — exactly
  * the total order a `row_number() OVER (ORDER BY score DESC, id)` window
  * ranks by.
  *
  * This is the scan-side replacement for the broadcast-join + per-vector
  * window argmax: the quantizer (O(cells·dim) doubles, bounded metadata)
  * rides in the expression as reference objects, so cell assignment is a
  * pure projection — the corpus is never joined or shuffled to find its
  * cells. The interpreted higher-order-function formulation of the same
  * thing costs ~µs per (row, centroid) in lambda/boxing overhead — at 256
  * cells it dominated the whole gate; this kernel is a primitive
  * multiply-accumulate loop (~dim flops per cell) on both eval paths.
  *
  * Numeric contract: per-cell score = seqdot(vec, cell) / (|vec| · cn)
  * (or / cn alone with `divideByRowNorm = false`, the PQ-encode shape),
  * every reduction a strict sequential left fold — bit-identical to the
  * `DotProductExpr`/`zip_with` forms and to the DuckDB oracles.
  */
case class NearestCellsExpr(child: Expression, probes: Int,
    ids: Array[Long], cells: Array[Array[Double]], norms: Array[Double],
    divideByRowNorm: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells needs a float/double array, got ${t.sql}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    NearestCells.top(input.asInstanceOf[ArrayData], isFloat, probes,
      ids, cells, norms, divideByRowNorm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    val cellsRef = ctx.addReferenceObj("cellVecs", cells, "double[][]")
    val normsRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCells.top($v, $isFloat, " +
        s"$probes, $idsRef, $cellsRef, $normsRef, $divideByRowNorm);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_cells"
}

object NearestCells {

  /** Build the Column; `local` rows are (id, centroid, norm-denominator),
    * id-ascending.
    */
  def apply(vec: Column, local: Array[(Long, Seq[Double], Double)],
      probes: Int, divideByRowNorm: Boolean = true): Column =
    GraftBridge.column(NearestCellsExpr(GraftBridge.expression(vec),
      probes, local.map(_._1), local.map(_._2.toArray), local.map(_._3),
      divideByRowNorm))

  /** a beats b in the ranking order (score desc, NaN greatest, id asc). */
  private def beats(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    val aNaN = java.lang.Double.isNaN(s)
    val bNaN = java.lang.Double.isNaN(s2)
    if (aNaN || bNaN) aNaN && (!bNaN || id < id2)
    else s > s2 || (s == s2 && id < id2)
  }

  /** Shared eval/codegen kernel: ordered top-`probes` cell ids. */
  def top(vec: ArrayData, isFloat: Boolean, probes: Int,
      ids: Array[Long], cells: Array[Array[Double]], norms: Array[Double],
      divideByRowNorm: Boolean): ArrayData = {
    val n = vec.numElements()
    def elem(i: Int): Double =
      if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
    var nrm = 1.0
    if (divideByRowNorm) {
      var nn = 0.0; var i = 0
      while (i < n) { val x = elem(i); nn += x * x; i += 1 }
      nrm = Math.sqrt(nn)
    }
    val p = math.min(probes, ids.length)
    val bestS = new Array[Double](p)
    val bestI = new Array[Long](p)
    var cnt = 0
    var c = 0
    while (c < ids.length) {
      val cw = cells(c)
      val m = math.min(n, cw.length)
      var acc = 0.0; var j = 0
      while (j < m) { acc += elem(j) * cw(j); j += 1 }
      val s = if (divideByRowNorm) acc / (nrm * norms(c)) else acc / norms(c)
      // insertion into the sorted shortlist
      if (cnt < p || beats(s, ids(c), bestS(cnt - 1), bestI(cnt - 1))) {
        var pos = if (cnt < p) cnt else p - 1
        while (pos > 0 && beats(s, ids(c), bestS(pos - 1), bestI(pos - 1))) {
          bestS(pos) = bestS(pos - 1); bestI(pos) = bestI(pos - 1); pos -= 1
        }
        bestS(pos) = s; bestI(pos) = ids(c)
        if (cnt < p) cnt += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestI, cnt))
  }
}
