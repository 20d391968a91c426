package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearestCellsSpec extends SparkSpec {

  import spark.implicits._

  private val one = Seq((0L, Array(1.0f, 0.0f))).toDF("id", "vec")

  private def cells(local: Array[(Long, Seq[Double], Double)], probes: Int,
      rowNorm: Boolean = true): Seq[Long] =
    one.select(NearestCells(col("vec"), local, probes, rowNorm).as("c"))
      .as[Seq[Long]].collect().head

  private def withNorm(id: Long, v: Seq[Double]) =
    (id, v, Math.sqrt(v.map(x => x * x).sum))

  test("orders by score desc then id asc; truncates at the cell count") {
    val local = Array(
      withNorm(7L, Seq(1.0, 0.0)),   // cos 1
      withNorm(3L, Seq(0.0, 1.0)),   // cos 0
      withNorm(5L, Seq(1.0, 1.0)))   // cos ~0.707
    assert(cells(local, 1) == Seq(7L))
    assert(cells(local, 3) == Seq(7L, 5L, 3L))
    assert(cells(local, 10) == Seq(7L, 5L, 3L)) // p > cells: all, no pad
  }

  test("exact score ties break on the smaller cell id") {
    // two identical cells under different ids — identical scores
    val local = Array(withNorm(9L, Seq(2.0, 0.0)), withNorm(4L, Seq(2.0, 0.0)))
    assert(cells(local, 2) == Seq(4L, 9L))
  }

  test("NaN scores rank greatest (the window's total order)") {
    // zero-norm cell → 0/0 = NaN score; must outrank every real score
    val local = Array(withNorm(1L, Seq(1.0, 0.0)), withNorm(2L, Seq(0.0, 0.0)))
    assert(cells(local, 2) == Seq(2L, 1L))
  }

  test("divideByRowNorm=false matches the PQ-encode score shape") {
    // denominators chosen so ranking flips vs the cosine ranking:
    // dot/(denom) — cell 1: 1.0/10 = 0.1, cell 2: 0.5/0.25 = 2.0
    val local = Array((1L, Seq(1.0, 0.0), 10.0), (2L, Seq(0.5, 0.0), 0.25))
    assert(cells(local, 2, rowNorm = false) == Seq(2L, 1L))
    assert(cells(local, 2, rowNorm = true).nonEmpty) // sanity: both paths run
  }
}
