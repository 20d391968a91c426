package graft.graph

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("star graph: the one hub outranks leaves; leaves split authority") {
    // 1 → {10, 11, 12}; 2 → {10}: node 1 is the stronger hub, node 10 the
    // stronger authority (two in-links)
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L)).toDF("src", "dst")
    val r = Hits.hits(e, iters = 2).collect()
      .map(x => x.getLong(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r(1L)._1 > r(2L)._1, s"hub(1)=${r(1L)._1} !> hub(2)=${r(2L)._1}")
    assert(r(10L)._2 > r(11L)._2)
    assert(r(11L)._2 == r(12L)._2) // symmetric leaves tie exactly
    assert(r(1L)._2 == 0.0 && r(10L)._1 == 0.0) // pure-role nodes
  }

  test("deterministic across runs and duplicate edges collapse") {
    val e = Seq((1L, 2L), (1L, 2L), (3L, 2L), (1L, 4L)).toDF("src", "dst")
    def run() = Hits.hits(e, iters = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).sortBy(_._1).toSeq
    assert(run() == run())
    // duplicate (1,2) must not double node 2's authority mass vs (3,2)
    val r = run().map(t => t._1 -> t).toMap
    val single = Hits.hits(Seq((1L, 2L), (3L, 2L), (1L, 4L)).toDF("src", "dst"),
      iters = 3).collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).sortBy(_._1).toSeq
    assert(run() == single)
  }
}
