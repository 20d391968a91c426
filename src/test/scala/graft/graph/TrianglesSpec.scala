package graft.graph

import scala.util.Random

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.vertexTriangles(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long)].collect()
      .map { case (id, deg, tri) => id -> (deg, tri) }.toMap

  /** Brute-force oracle: enumerate all vertex triples. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val deg = nodes.map(n => n -> e.count(p => p._1 == n || p._2 == n).toLong).toMap
    val tri = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if e((a, b)) && e((b, c)) && e((a, c))
    } { tri(a) += 1; tri(b) += 1; tri(c) += 1 }
    nodes.map(n => n -> (deg(n), tri(n))).toMap
  }

  test("K4: every vertex has degree 3 and 3 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val got = counts(k4)
    assert(got.size == 4)
    assert(got.values.toSet == Set((3L, 3L)))
  }

  test("a path has zero triangles; dup/reversed/self-loop edges are ignored") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (2L, 1L), (1L, 2L), (7L, 7L))
    val got = counts(edges)
    assert(!got.contains(7L))
    assert(got.values.forall(_._2 == 0L))
    assert(got(2L)._1 == 2L && got(1L)._1 == 1L)
  }

  test("random graph matches the brute-force triple enumeration") {
    val rnd = new Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(counts(edges) == brute(edges))
  }

  test("a skewed hub (star + one closing rim edge) stays exact") {
    // hub 0 connected to 1..50, plus the single rim edge (1,2): exactly one
    // triangle, at the orientation's worst-case degree skew.
    val edges = (1L to 50L).map(i => (0L, i)) :+ (1L, 2L)
    val got = counts(edges)
    assert(got(0L) == (50L, 1L))
    assert(got(1L) == (2L, 1L) && got(2L) == (2L, 1L))
    assert(got(3L) == (1L, 0L))
  }

  test("clustering coefficients are the exact 2T/d(d-1) ratio") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val cc = Triangles.clusteringCoefficients(k4.toDF("s", "d"), "s", "d")
      .select("id", "clustering_coeff").as[(Long, Double)].collect().toMap
    assert(cc.values.forall(_ == 1.0))
    val wedge = Seq((1L, 2L), (1L, 3L))   // open wedge at 1
    val cc2 = Triangles.clusteringCoefficients(wedge.toDF("s", "d"), "s", "d")
      .select("id", "clustering_coeff").as[(Long, Double)].collect().toMap
    assert(cc2 == Map(1L -> 0.0))
  }
}
