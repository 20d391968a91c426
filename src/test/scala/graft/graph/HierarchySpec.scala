package graft.graph

import graft.SparkSpec

class HierarchySpec extends SparkSpec {

  import spark.implicits._

  private def roll(nodes: Seq[(Long, Option[Long], Long)], rounds: Int = 5)
      : Map[Long, (Long, Long)] =
    Hierarchy.chainAgg(nodes.toDF("id", "parent", "weight"), rounds)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  /** Driver oracle: walk parents one at a time. */
  private def walk(nodes: Seq[(Long, Option[Long], Long)])
      : Map[Long, (Long, Long)] = {
    val byId = nodes.map(n => n._1 -> n).toMap
    nodes.map { case (id, _, _) =>
      var cur = Option(id); var len = 0L; var s = 0L
      while (cur.exists(byId.contains)) {
        val (_, p, w) = byId(cur.get); len += 1; s += w; cur = p
      }
      id -> (len, s)
    }.toMap
  }

  test("chain rollup equals the walk oracle on a deep chain") {
    // depth 30 needs all 5 doubling rounds (2^5 = 32 >= 30)
    val chain = (1L to 30L).map(i =>
      (i, if (i == 1) None else Some(i - 1), i * 10))
    assert(roll(chain) == walk(chain))
  }

  test("id-halving forest: every node rolls up to the root") {
    val nodes = (1L to 200L).map(i =>
      (i, if (i >= 2) Some(i / 2) else None, i))
    val got = roll(nodes)
    assert(got == walk(nodes))
    // spot-check: 200 -> 100 -> 50 -> 25 -> 12 -> 6 -> 3 -> 1
    assert(got(200L) == (8L, 200L + 100 + 50 + 25 + 12 + 6 + 3 + 1))
  }

  test("dangling parents end the chain without dropping the node") {
    val nodes = Seq((5L, Some(99L), 7L), (6L, Some(5L), 1L))
    assert(roll(nodes) == Map(5L -> (1L, 7L), 6L -> (2L, 8L)))
  }

  test("deterministic across runs") {
    val nodes = (1L to 150L).map(i =>
      (i, if (i >= 2) Some(i / 2) else None, i * 3))
    assert(roll(nodes) == roll(nodes))
  }
}
