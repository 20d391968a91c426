package graft.graph

import graft.SparkSpec

class ShortestPathsSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long], hops: Int) =
    ShortestPaths.distances(
      edges.toDF("src", "dst"), sources.toDF("id"), hops)
      .as[(Long, Long)].collect().toMap

  test("path graph: distances are exact hop counts, capped at maxHops") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val d = run(path, Seq(1L), hops = 3)
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // nodes 5 and 6 are beyond the cap and absent — not present-with-cap
    assert(!d.contains(5L) && !d.contains(6L))
  }

  test("multi-source takes the min over sources; edges are undirected") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val d = run(path, Seq(1L, 5L), hops = 2)
    // 3 is two hops from both ends; 2 and 4 one hop; direction reversed
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("an isolated source still appears at distance 0") {
    val d = run(Seq((1L, 2L)), Seq(9L), hops = 2)
    assert(d == Map(9L -> 0L))
  }

  test("a shorter path found in a later round overwrites the longer one") {
    // 1→2→3→4 and a shortcut 1→4: dist(4) must be 1, not 3
    val d = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), Seq(1L), hops = 3)
    assert(d(4L) == 1L && d(3L) == 2L)
  }

  test("deterministic across runs") {
    val edges = (1L to 80L).map(i => (i, (i * 13) % 17))
    assert(run(edges, Seq(0L, 1L), 3) == run(edges, Seq(0L, 1L), 3))
  }
}
