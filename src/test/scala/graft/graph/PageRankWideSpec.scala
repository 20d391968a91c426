package graft.graph

import graft.SparkSpec

/** The r12 scale-adaptive round shape: above [[GraphOps.BroadcastNodeCap]]
  * PageRank carries the static per-node constants (outdeg, teleport mass)
  * on the EDGE list so no round re-shuffles the node table. The two shapes
  * must be BIT-identical — the grid-quantized arithmetic is the same, only
  * the join placement differs — which this spec pins by forcing each shape
  * on the same small graph.
  */
class PageRankWideSpec extends SparkSpec {

  import spark.implicits._

  private val edges = (1L to 80L)
    .flatMap(i => Seq((i, i % 9 + 1), (i, (i * 5) % 13 + 1)))
    .toDF("src", "dst")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Double)].collect().toMap

  test("pageRank: forced-wide shape is bit-identical to the broadcast shape") {
    val narrow = collect(
      PageRank.pageRankImpl(edges, iters = 3, damping = 0.85,
        forceWide = Some(false)))
    val wide = collect(
      PageRank.pageRankImpl(edges, iters = 3, damping = 0.85,
        forceWide = Some(true)))
    assert(narrow.keySet == wide.keySet)
    narrow.foreach { case (id, pr) =>
      // == on doubles intentionally: both shapes sum the same grid
      // multiples, so the bits must agree, not just be close
      assert(pr == wide(id), s"node $id: narrow $pr vs wide ${wide(id)}")
    }
    // and the default (auto) path picks the narrow shape on a graph this
    // small and agrees too
    assert(collect(PageRank.pageRank(edges, iters = 3)) == narrow)
  }

  test("personalized: forced-wide shape is bit-identical to the broadcast shape") {
    val seeds = Seq(1L, 4L, 9L).toDF("id")
    val narrow = collect(
      PageRank.personalizedImpl(edges, seeds, iters = 3, damping = 0.85,
        forceWide = Some(false)))
    val wide = collect(
      PageRank.personalizedImpl(edges, seeds, iters = 3, damping = 0.85,
        forceWide = Some(true)))
    assert(narrow.keySet == wide.keySet)
    narrow.foreach { case (id, pr) =>
      assert(pr == wide(id), s"node $id: narrow $pr vs wide ${wide(id)}")
    }
    assert(collect(PageRank.personalized(edges, seeds, iters = 3)) == narrow)
  }
}
