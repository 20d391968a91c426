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

  test("sm23: IVF recall is non-decreasing in the probe budget and " +
      "bounded by the truth size") {
    val rows = SimQueries.queries("sm23_ivf_probe_curve")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4, 8))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b })
    assert(hits.forall(h => h >= 0L && h <= 50L)) // NQueries * K
    rows.foreach(r => assert(r.getAs[Long]("recall_ppm") ==
      r.getAs[Long]("n_hits") * 1000000L / 50L))
  }

  test("tx33: WordPiece counts agree with tx20's token universe and are " +
      "bounded by character counts") {
    val wp = SearchQueries.queries("tx33_wordpiece_encode")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_alpha_tokens"), r.getAs[Long]("n_pieces_wp")))
      .toMap
    val bpe = SearchQueries.queries("tx20_bpe_encode")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_alpha_tokens"), r.getAs[Long]("n_pieces")))
      .toMap
    assert(wp.keySet == bpe.keySet)
    wp.foreach { case (id, (nt, np)) =>
      assert(nt == bpe(id)._1) // same alphabetic-token universe
      // every token yields at least one piece, at most chars+sentinel
      assert(np >= nt)
      // greedy longest-match can never use MORE pieces than BPE's
      // final segmentation... is not a theorem — but both must agree
      // on zero-token docs
      if (nt == 0L) assert(np == 0L && bpe(id)._2 == 0L)
    }
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
