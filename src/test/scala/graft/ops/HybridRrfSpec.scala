package graft.ops

import graft.SparkSpec

/** Semantic invariants for sm22 hybrid RRF fusion — the score must be a
  * pure function of the two ranks, lists must be dense, and fusion must
  * actually draw from BOTH retrievers (else it silently degrades to one).
  */
class HybridRrfSpec extends SparkSpec {

  test("sm22: fused scores recompute from the ranks, lists are dense, " +
      "and both retrievers contribute") {
    val rows = SimQueries.queries("sm22_hybrid_rrf")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rs) =>
      // dense fused ranks 1..k, scores non-increasing along them
      val sorted = rs.sortBy(_.getAs[Long]("fused_rank"))
      assert(sorted.map(_.getAs[Long]("fused_rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("rrf_ppm"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      def contrib(field: String): Long =
        if (r.isNullAt(r.fieldIndex(field))) 0L
        else 1000000L / (60L + r.getAs[Long](field))
      assert(r.getAs[Long]("rrf_ppm") ==
        contrib("lex_rank") + contrib("vec_rank"))
      // at least one list produced this candidate
      assert(!r.isNullAt(r.fieldIndex("lex_rank")) ||
        !r.isNullAt(r.fieldIndex("vec_rank")))
    }
    // fusion is genuinely hybrid on the fixture: some fused row exists
    // that only one of the two retrievers surfaced, in both directions
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("lex_rank"))))
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("vec_rank"))))
  }

  test("dq5: anonymity counters are internally consistent") {
    val r = QualityQueries.queries("dq5_k_anonymity")(spark, sfDir)
      .collect().head
    assert(r.getAs[Long]("k_min") >= 1L)
    val l = r.getAs[Long]("l_min")
    assert(l >= 1L && l <= 5L) // five order priorities exist
    assert(r.getAs[Long]("n_classes_small") <= r.getAs[Long]("n_classes"))
    assert(r.getAs[Long]("n_records_at_risk") <= r.getAs[Long]("n_records"))
    assert(r.getAs[Long]("at_risk_ppm") ==
      r.getAs[Long]("n_records_at_risk") * 1000000L /
        r.getAs[Long]("n_records"))
  }
}
