package graft.ops

import graft.SparkSpec

/** Estimator-sanity checks for the KMV overlap gate. The gate output is
  * exact-matched against the DuckDB mirror by Verify; these assert the
  * SKETCH MATH itself behaves — monotone set algebra and honest accuracy —
  * so a future refactor can't silently break the estimator while still
  * agreeing with a mirrored (equally broken) oracle.
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  private lazy val rows =
    AdvancedQueries.queries("q45_kmv_overlap")(spark, sfDir)
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq

  test("one row per event type, estimates all positive") {
    assert(rows.size == 5)
    assert(rows.forall(r => r._2 > 0 && r._3 > 0 && r._4 > 0))
  }

  test("set algebra: union dominates both sides, intersection below either") {
    rows.foreach { case (t, a, b, u, i, _) =>
      assert(u >= math.max(a, b) * (1 - 1e-9), s"$t: union $u < max($a, $b)")
      assert(i <= math.min(a, b) * (1 + 1e-9), s"$t: intersect $i > min($a, $b)")
    }
  }

  test("intersection estimate lands within 50% of the exact overlap") {
    // K=16 bottom-k sketches: the theta-intersection estimator's relative
    // error is ~1/sqrt(K) per side; 50% is a loose, deterministic-data
    // regression floor, not a statistical claim.
    rows.foreach { case (t, _, _, _, est, exact) =>
      assert(exact > 0, s"$t: fixture windows no longer overlap")
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.5, s"$t: est $est vs exact $exact (rel err $rel)")
    }
  }

  test("deterministic across runs") {
    val again = AdvancedQueries.queries("q45_kmv_overlap")(spark, sfDir)
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq
    assert(again == rows)
  }
}
