package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR diversified top-k semantics (Similarity.mmrTopK + the MmrSelect
  * kernel): relevance seeding, redundancy suppression, and bounds.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  // Corpus: two near-identical highly-relevant vectors (1, 2 — vector 2
  // tilts slightly toward the query, so it is the cosine argmax), one
  // diverse mid-relevance vector (3), one irrelevant orthogonal (4). The
  // query (id 100) points at the duplicate pair's direction.
  private lazy val corpus = vecs(
    1L -> Seq(1f, 0f, 0f, 0f),
    2L -> Seq(0.999f, 0.01f, 0f, 0f),
    3L -> Seq(0.5f, 0.8f, 0f, 0f),
    4L -> Seq(0f, 0f, 1f, 0f))
  private lazy val query = vecs(100L -> Seq(1f, 0.05f, 0f, 0f))

  test("seed pick is the plain cosine argmax") {
    val picks = Similarity.mmrTopK(query, corpus, m = 4, k = 3)
      .orderBy(col("pick_rank")).collect()
    assert(picks.head.getLong(1) === 2L)
  }

  test("redundant near-duplicate is deferred below the diverse picks") {
    val picks = Similarity.mmrTopK(query, corpus, m = 4, k = 3)
      .orderBy(col("pick_rank")).collect()
      .map(_.getLong(1)).toSeq
    // plain top-3 by cosine is 2, 1, 3; MMR pushes 1 (≈dup of the seed 2)
    // below the diverse 3 and 4 — out of the top 3 entirely
    assert(picks === Seq(2L, 3L, 4L), s"unexpected pick order $picks")
  }

  test("pick ranks are 1..k and corpus ids are distinct") {
    val picks = Similarity.mmrTopK(query, corpus, m = 4, k = 4)
      .orderBy(col("pick_rank")).collect()
    assert(picks.map(_.getInt(3)).toSeq === Seq(1, 2, 3, 4))
    assert(picks.map(_.getLong(1)).distinct.length === 4)
  }

  test("a shortlist smaller than k yields exactly the shortlist") {
    // only 3 non-self corpus vectors clear an m=3 shortlist; k=3 = all
    val picks = Similarity.mmrTopK(query, corpus, m = 3, k = 3).collect()
    assert(picks.length === 3)
  }

  test("mmr scores are non-increasing in pick order per query") {
    val picks = Similarity.mmrTopK(query, corpus, m = 4, k = 4)
      .orderBy(col("pick_rank")).collect().map(_.getDouble(2))
    // greedy with a fixed picked-set penalty is monotone for steps ≥ 2;
    // the seed score (λ·cos, no penalty) upper-bounds them all
    assert(picks.sliding(2).forall(p => p(0) >= p(1) || p(0).isNaN))
  }
}
