package graft.graph

import scala.util.Random

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.minLabel(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  /** Brute-force union-find oracle. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("a long chain collapses to one component (multi-round convergence)") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.size == 64)
    assert(got.values.toSet == Set(0L))
  }

  test("disjoint cliques, a bridge pair, and reversed/duplicate edges") {
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 10L),   // triangle → 10
      (20L, 21L),                           // pair → 20
      (31L, 30L), (30L, 31L),               // dup + reversed pair → 30
      (5L, 5L)                              // self-loop only → singleton
    )
    val got = components(edges)
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L && got(31L) == 30L)
    // self-loop-only node still appears, labeled with itself
    assert(got(5L) == 5L)
  }

  test("degenerate inputs: empty edge list, single edge") {
    assert(components(Nil).isEmpty)
    assert(components(Seq((2L, 1L))) == Map(1L -> 1L, 2L -> 1L))
  }

  test("matches union-find on seeded random graphs") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(80)(
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter { case (a, b) => a != b }
      assert(components(edges) == unionFind(edges))
    }
  }

  test("driver-local under-cap path equals the distributed contraction") {
    val rnd = new Random(7)
    for (_ <- 1 to 3) {
      val edges = Seq.fill(120)(
        (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
      val df = edges.toDF("s", "d")
      val local = ConnectedComponents.minLabel(df, "s", "d")
        .as[(Long, Long)].collect().toMap
      val dist = ConnectedComponents
        .minLabel(df, "s", "d", localEdgeCap = 0) // force the star loop
        .as[(Long, Long)].collect().toMap
      assert(local == dist)
    }
  }
}
