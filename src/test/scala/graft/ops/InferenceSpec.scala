package graft.ops

import graft.SparkSpec

/** Semantic invariants for the statistical-inference family (q110–q115) —
  * properties that must hold for ANY input, beyond the driver's oracle
  * hash-compare: bounds of the normalized measures, symmetry/ordering of
  * the link-prediction scores, and the exact-arithmetic identities the
  * grid/ppm encodings promise.
  */
class InferenceSpec extends SparkSpec {

  private def one(name: String): org.apache.spark.sql.Row =
    InferenceQueries.queries(name)(spark, sfDir).collect().head

  test("q110: RA scores are positive, bounded by n_common * 1e12/2, sorted") {
    val rows = InferenceQueries.queries("q110_resource_alloc")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_common"); val s = r.getAs[Long]("ra_score")
      assert(s > 0 && s <= n * 500000000000L) // deg >= 2 on every wedge
      assert(s >= n * (1000000000000L / 64))  // deg <= 64 on every wedge
    }
    val scores = rows.map(_.getAs[Long]("ra_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q111: gini is in [0, 1e6) and customers are counted") {
    val r = one("q111_gini")
    val g = r.getAs[Long]("gini_ppm")
    assert(g >= 0L && g < 1000000L)
    assert(r.getAs[Long]("n_customers") > 0L)
  }

  test("q112: PSI is non-negative (up to one grid step) and halves cover") {
    val r = one("q112_psi")
    assert(r.getAs[Long]("psi_grid") >= -1L)
    assert(r.getAs[Long]("n_expected") > 0L)
    assert(r.getAs[Long]("n_actual") > 0L)
  }

  test("q113: Welch df is positive and at most n_a + n_b - 2") {
    val r = one("q113_welch_t")
    val df = r.getAs[Double]("df_grid")
    val bound = (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - 2).toDouble
    assert(df > 0.0 && df <= bound)
  }

  test("q114: kappa is in [-1e6, 1e6] and agreement is consistent") {
    val r = one("q114_kappa")
    val k = r.getAs[Long]("kappa_ppm")
    assert(k >= -1000000L && k <= 1000000L)
    assert(r.getAs[Long]("n_agree") <= r.getAs[Long]("n_events"))
  }

  test("q115: JSD is within [0, ln 2] up to one grid step") {
    val r = one("q115_jsd")
    val j = r.getAs[Long]("jsd_grid")
    assert(j >= -1L && j <= math.ceil(math.log(2) * 1048576).toLong + 1)
    assert(r.getAs[Long]("vocab") > 0L)
  }
}
