package graft.graph

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int = 2) =
    LabelPropagation.propagate(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("two cliques joined by one bridge keep distinct communities") {
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (4L -> 10L)
    val labels = run(edges)
    // every clique converges on one label, and the two differ
    assert(Set(1L, 2L, 3L).map(labels).size == 1)
    assert(Set(11L, 12L, 13L).map(labels).size == 1)
    assert(labels(2L) != labels(12L))
  }

  test("tie-break is (count desc, label asc): a path picks min neighbor") {
    // node 2's neighbors {1, 3} each appear once → min label 1 wins
    val labels = run(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(labels(2L) == 1L)
    // ends see exactly one neighbor; they adopt it
    assert(labels(1L) == 2L && labels(3L) == 2L)
  }

  test("deterministic across runs") {
    val edges = (1L to 60L).flatMap(i => Seq((i, i % 7), (i, (i * 3) % 11)))
    assert(run(edges) == run(edges))
  }

  test("packed argmax == struct argmax (ids above IdCap force the fallback)") {
    // same graph, ids shifted by IdCap: the shifted run fails the
    // measured-range gate and takes the struct path; labels must match
    // modulo the shift on every node, for several round counts
    val edges = (1L to 80L).flatMap(i =>
      Seq((i, i % 9), (i, (i * 5) % 13), (i % 9, (i * 2) % 17)))
    for (r <- Seq(1, 2, 3, 5)) {
      val packedRun = run(edges, rounds = r)
      val shifted = edges.map { case (a, b) =>
        (a + PackedPairs.IdCap, b + PackedPairs.IdCap) }
      val structRun = LabelPropagation
        .propagate(shifted.toDF("src", "dst"), r)
        .as[(Long, Long)].collect().toMap
      assert(packedRun.map { case (k, v) =>
        (k + PackedPairs.IdCap, v + PackedPairs.IdCap) } == structRun,
        s"rounds=$r")
    }
  }
}
