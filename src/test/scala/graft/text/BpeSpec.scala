package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {

  import spark.implicits._

  // Corpus engineered so the merge sequence is hand-computable:
  // "low low low lower newest newest" → freqs: low×3, lower×1, newest×2.
  private def docs = Seq(
    (1L, "low low low lower"),
    (2L, "newest newest")
  ).toDF("doc_id", "text")

  test("BpeApply kernel == chained SQL replaces on fuzzed inputs") {
    // the kernel claims bit-identity with a fold of the SQL `replace` —
    // pin it on 200 random wrapped words × 6 random merges, including
    // overlapping/repeated-symbol cases the real trainer can produce
    val rnd = new scala.util.Random(7)
    val syms = Seq("a", "b", "c", "ab", "bc", "_")
    val merges = Array.fill(6) {
      val x = syms(rnd.nextInt(syms.size)); val y = syms(rnd.nextInt(syms.size))
      (s"($x)($y)", s"($x$y)")
    }
    val words = Seq.fill(200)(
      Seq.fill(rnd.nextInt(8) + 1)(syms(rnd.nextInt(syms.size)))
        .map(s => s"($s)").mkString).toDF("w")
    val chained = merges.foldLeft(col("w")) { case (acc, (s, t)) =>
      replace(acc, lit(s), lit(t)) }
    val diff = words.select(
        graft.functions.BpeApply(col("w"), merges).as("k"),
        chained.as("c"))
      .filter(col("k") =!= col("c")).count()
    assert(diff == 0L)
  }

  test("learns hand-computable merges with frequency-weighted counts") {
    val (merges, _) = Bpe.train(docs, 3)
    val rows = merges.orderBy(col("round"))
      .as[(Int, String, String, Long)].collect().toSeq
    // Round 1: pairs (l,o) cnt 4, (o,w) cnt 4, (w,_) cnt 3, (w,e) 1,
    // (e,r) 1, (r,_) 1, (n,e) 2, (e,w) 2, (e,s) 2, (s,t) 2, (t,_) 2 —
    // tie between (l,o) and (o,w) at 4 → lexicographic picks (l,o).
    assert(rows.head == ((1, "l", "o", 4L)))
    // Round 2: symbol "lo" exists; (lo,w) now counts 4 → wins.
    assert(rows(1) == ((2, "lo", "w", 4L)))
    // Round 3: (low,_) cnt 3 vs the newest-side pairs at 2 → (low,_).
    assert(rows(2) == ((3, "low", "_", 3L)))
  }

  test("merged symbols never straddle the (sym) wrappers") {
    // Words "ab" and "xab": after merging (a,b), "xab" must stay
    // (x)(ab)(_) — the search "(a)(b)" must not fire inside "(xa)(b)".
    val d = Seq((1L, "ab ab xa xab")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(d, 1)
    val m = merges.as[(Int, String, String, Long)].collect().head
    assert((m._2, m._3) == (("a", "b")) || (m._2, m._3) == (("a", "_")))
    val strs = vocab.as[(String, Long)].collect().map(_._1).toSet
    if ((m._2, m._3) == (("a", "b")))
      assert(strs.contains("(x)(ab)(_)") && strs.contains("(ab)(_)"))
  }

  test("encode applies merges in round order and counts pieces per doc") {
    val (merges, _) = Bpe.train(docs, 3)
    val enc = Bpe.encode(docs, merges).orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    // After (l,o), (lo,w), (low,_): "low" → (low_) = 1 piece;
    // "lower" → (low)(e)(r)(_) = 4; "newest" → untouched 7 symbols.
    assert(enc == Seq((1L, 4L, 3 * 1 + 4L), (2L, 2L, 2 * 7L)))
  }

  test("docs with no alphabetic tokens encode to zero rows, not dropped") {
    val d = Seq((1L, "abc abc"), (2L, "123 456 !!")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(d, 1)
    val enc = Bpe.encode(d, merges).orderBy(col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(enc.map(_._1) == Seq(1L, 2L) && enc(1)._2 == 0L && enc(1)._3 == 0L)
  }

  test("training is frequency-weighted, not type-weighted") {
    // "zz" appears 5 times, "qx" once: the zz-side pairs count 5 vs 1 —
    // and the 5-way tie between (z,z) and (z,_) breaks lexicographically
    // on the second symbol ("_" 0x5F < "z").
    val d = Seq((1L, "zz zz zz zz zz qx")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(d, 1)
    val m = merges.as[(Int, String, String, Long)].collect().head
    assert((m._2, m._3, m._4) == (("z", "_", 5L)))
  }
}
