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

  test("q122: decomposition identity 24*rev = trend + seasonal + remainder " +
      "holds exactly on every interior month") {
    val rows = InferenceQueries.queries("q122_stl_decompose")(spark, sfDir)
      .collect()
    assert(rows.length >= 24) // at least two full cycles in the fixture
    val interior = rows.filter(r => !r.isNullAt(r.fieldIndex("trend_c24")))
    assert(interior.nonEmpty)
    interior.foreach { r =>
      val rev = r.getAs[Long]("rev_cents")
      assert(24L * rev == r.getAs[Long]("trend_c24") +
        r.getAs[Long]("seasonal_c24") + r.getAs[Long]("remainder_c24"))
    }
    // seasonal is a full 12-month profile: defined on EVERY row (edges too)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("seasonal_c24"))))
    // the 2x12 MA needs 6 before + 6 after: at least 11 edge months lack a
    // trend (exactly 11 on a contiguous series; calendar gaps add more)
    assert(rows.length - interior.length >= 11)
  }

  test("q123: segments tile the series and splits stay in bounds") {
    val rows = InferenceQueries.queries("q123_binseg_changepoint")(
      spark, sfDir).collect()
    assert(rows.length == 3)
    val lvl0 = rows.filter(_.getAs[Int]("level") == 0)
    val lvl1 = rows.filter(_.getAs[Int]("level") == 1)
    assert(lvl0.length == 1 && lvl1.length == 2)
    assert(lvl0.head.getAs[Long]("n_days") ==
      lvl1.map(_.getAs[Long]("n_days")).sum)
    rows.foreach { r =>
      val lo = r.getAs[java.time.LocalDateTime]("seg_lo")
      val hi = r.getAs[java.time.LocalDateTime]("seg_hi")
      val sp = r.getAs[java.time.LocalDateTime]("split_day")
      assert(!sp.isBefore(lo) && sp.isBefore(hi)) // k < n: never the end
      assert(r.getAs[Long]("d_stat") > 0L)
    }
  }

  test("q125: tau-b is in [-1, 1] and S is bounded by the pair count") {
    val r = one("q125_kendall_tau")
    val n0 = r.getAs[Long]("n_days") * (r.getAs[Long]("n_days") - 1) / 2
    assert(math.abs(r.getAs[Long]("s_stat")) <= n0)
    if (!r.isNullAt(r.fieldIndex("tau_b_grid"))) {
      val t = r.getAs[Double]("tau_b_grid")
      assert(t >= -1.0 && t <= 1.0)
    }
  }

  test("q133: the Lorenz curve is monotone, under the diagonal, and " +
      "reaches exactly one") {
    val rows = InferenceQueries.queries("q133_lorenz_deciles")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val shares = rows.map(_.getAs[Long]("cum_revenue_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    rows.foreach { r => // ascending-revenue prefix can't beat the diagonal
      assert(r.getAs[Long]("cum_revenue_ppm") <=
        r.getAs[Int]("decile") * 100000L)
    }
    assert(shares.last == 1000000L)
  }

  test("q134: Chapman estimate is at least the overlap and the captures " +
      "cover it") {
    val r = one("q134_capture_recapture")
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"))
    assert(m <= n1 && m <= n2)
    assert(r.getAs[Long]("n_observed") == n1 + n2 - m)
    assert(r.getAs[Long]("n_hat_ppm") >= m * 1000000L)
  }

  test("aj3: the nearest pick's direction always matches the gap sign") {
    val rows = AdvancedQueries.queries("aj3_asof_nearest")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(r.fieldIndex("direction"))).foreach { r =>
      val gap = r.getAs[Long]("gap_us")
      if (r.getAs[String]("direction") == "before") assert(gap <= 0L)
      else assert(gap > 0L)
    }
    // both directions genuinely occur on the fixture
    val dirs = rows.filter(r => !r.isNullAt(r.fieldIndex("direction")))
      .map(_.getAs[String]("direction")).toSet
    assert(dirs == Set("before", "after"))
  }

  test("q132: the four McNemar cells tile the customer universe") {
    val r = one("q132_mcnemar")
    val total = r.getAs[Long]("n_both") + r.getAs[Long]("n_lost") +
      r.getAs[Long]("n_gained") + r.getAs[Long]("n_neither")
    val nCust = Tables(spark, sfDir, "customer").count()
    assert(total == nCust)
    if (!r.isNullAt(r.fieldIndex("chi2_ppm")))
      assert(r.getAs[Long]("chi2_ppm") >= 0L)
  }

  test("cur18: card counts are internally consistent") {
    val r = CorpusQueries.queries("cur18_dataset_card")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("n_docs") > 0L)
    assert(r.getAs[Long]("top_lang_docs") <= r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_langs") >= 1L)
    val dup = r.getAs[Long]("dup_ratio_ppm")
    assert(dup >= 0L && dup <= 1000000L)
    assert(r.getAs[Long]("p50_chars") > 0L)
  }

  test("q131: strengths are ppm fractions; the fixture's strong " +
      "seasonality registers") {
    val r = one("q131_stl_strength")
    val fs = r.getAs[Long]("seasonal_strength_ppm")
    val ft = r.getAs[Long]("trend_strength_ppm")
    assert(fs >= 0L && fs <= 1000000L && ft >= 0L && ft <= 1000000L)
    assert(r.getAs[Long]("n_interior") >= 12L)
  }

  test("q130: the additive identity rev = row + col + residual holds on " +
      "every cell, and each polished row/column has lower-median zero") {
    val rows = InferenceQueries.queries("q130_median_polish")(spark, sfDir)
      .collect()
    assert(rows.length == 60) // 5 regions x 12 months
    rows.foreach { r =>
      assert(r.getAs[Long]("rev") == r.getAs[Long]("row_eff") +
        r.getAs[Long]("col_eff") + r.getAs[Long]("residual"))
    }
    // after the final column sweep, every column's residual lower median
    // is exactly zero (that's what the sweep just subtracted)
    rows.groupBy(_.getAs[Int]("moy")).foreach { case (_, cs) =>
      val res = cs.map(_.getAs[Long]("residual")).sorted
      assert(res((res.length + 1) / 2 - 1) == 0L)
    }
  }

  test("q128: runs count is within [1, n1+n2] and sides partition the " +
      "off-median days") {
    val r = one("q128_runs_test")
    val (na, nb) = (r.getAs[Long]("n_above"), r.getAs[Long]("n_below"))
    val runs = r.getAs[Long]("n_runs")
    assert(runs >= 1L && runs <= na + nb)
    assert(na + nb > 0L)
    // a side can be empty (tiny-SF median sits at the minimum) — then z
    // must be the documented NULL, never a division blowup
    if (na == 0L || nb == 0L) assert(r.isNullAt(r.fieldIndex("z_grid")))
    else assert(!r.isNullAt(r.fieldIndex("z_grid")))
  }

  test("q129: turning points are at most the interior count") {
    val r = one("q129_turning_points")
    val t = r.getAs[Long]("n_turning")
    assert(t >= 0L && t <= r.getAs[Long]("n_interior"))
  }

  test("q127: HL pseudo-median x2 lies inside the doubled value range " +
      "and the Walsh pair count is n(n+1)/2") {
    val r = one("q127_hodges_lehmann")
    val n = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_walsh_pairs") == n * (n + 1) / 2)
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")))
      .count().agg(
        org.apache.spark.sql.functions.min("count"),
        org.apache.spark.sql.functions.max("count"))
      .collect().head
    val hl2 = r.getAs[Long]("hl_center_x2")
    assert(hl2 >= 2 * daily.getLong(0) && hl2 <= 2 * daily.getLong(1))
  }

  test("q126: CvM statistic is non-negative and both halves are populated") {
    val r = one("q126_cvm_drift")
    assert(r.getAs[Long]("cvm_ppm") >= 0L)
    assert(r.getAs[Long]("n_expected") > 0L)
    assert(r.getAs[Long]("n_actual") > 0L)
  }

  test("q124: one slope per region, pair count matches the series length") {
    val rows = InferenceQueries.queries("q124_theil_sen")(spark, sfDir)
      .collect()
    assert(rows.length == 5) // one per TPC-H region
    rows.foreach { r =>
      val m = r.getAs[Int]("n_months").toLong
      assert(r.getAs[Long]("n_pairs") == m * (m - 1) / 2)
    }
  }
}
