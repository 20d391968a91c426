package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The kernel's fold vs an independent BigInt reference recurrence —
  * pins TRUNCATING-division semantics (the trend goes negative on
  * declining series, where the rounding convention is observable; DuckDB's
  * integer `//` truncates toward zero, so floorDiv would silently diverge
  * from the oracle by one grid unit per negative odd step).
  */
class IntHoltSpec extends SparkSpec {

  private val G = BigInt(IntHolt.Grid)

  private def reference(xs: Seq[Long]): Seq[(Long, Long)] = {
    // BigInt `/` truncates toward zero — the shared convention
    var l = BigInt(0); var b = BigInt(0)
    xs.zipWithIndex.map { case (x, i) =>
      val scaled = BigInt(x) * G
      if (i == 0) { l = scaled; b = BigInt(0) }
      else {
        val lPrev = l
        l = (scaled + (l + b)) / 2
        b = ((l - lPrev) + b) / 2
      }
      (l.toLong, b.toLong)
    }
  }

  private def kernel(xs: Seq[Long]): Seq[(Long, Long)] = {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      xs.toArray)
    val out = IntHolt.fold(arr)
    (0 until xs.length).map(i => (out.getLong(2 * i), out.getLong(2 * i + 1)))
  }

  test("fold matches the BigInt reference on rising, falling, noisy series") {
    val cases = Seq(
      Seq(5L, 8L, 11L, 14L, 20L),                       // rising
      Seq(100L, 80L, 60L, 30L, 10L, 0L),                // falling → b < 0
      Seq(7L),                                          // singleton
      Seq.empty[Long],                                  // empty
      Seq.tabulate(200)(i => ((i * 37 + 11) % 97).toLong), // noisy
      Seq.tabulate(50)(i => (50 - i).toLong))           // strict decline
    cases.foreach { xs =>
      assert(kernel(xs) == reference(xs), s"diverged on $xs")
    }
  }

  test("trend goes negative on a declining series (truncating division)") {
    val st = kernel(Seq(100L, 50L, 25L))
    assert(st.last._2 < 0)
    // hand-check step 1: l1 = (50G + 100G)/2 = 75G, b1 = (75G - 100G)/2
    assert(st(1) == (75L * IntHolt.Grid, -25L * IntHolt.Grid / 2))
  }

  test("odd negative numerator rounds toward zero, not -inf") {
    // x = [0, -1]: l1 = trunc(-G/2) with an odd numerator after the
    // coupled step — build one directly: (-3)/2 must be -1 (trunc), -2
    // would be floor. The kernel inherits Scala Long `/`; pin it anyway.
    val st = kernel(Seq(0L, -1L))
    // l1 = trunc((-G + 0)/2) = -G/2 (exact), b1 = trunc((l1 - 0)/2) = -G/4
    assert(st(1) == (-IntHolt.Grid / 2, -IntHolt.Grid / 4))
    assert(-3L / 2L == -1L) // the convention the oracle's // shares
  }

  test("int_holt is SQL-callable and codegen agrees with eval") {
    graft.functions.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT int_holt(array(CAST(10 AS BIGINT), 20, 15)) AS lb")
      .collect().head.getSeq[Long](0)
    assert(r == kernel(Seq(10L, 20L, 15L)).flatMap(t => Seq(t._1, t._2)))
  }
}
