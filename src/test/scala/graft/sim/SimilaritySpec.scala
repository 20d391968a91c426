package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("id", "vec")

  test("cosine on known vectors") {
    val df = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(df((0L, 0L)) == 1.0)
    assert(df((0L, 1L)) == 0.0)
    assert(df((0L, 3L)) == -1.0)
    assert(math.abs(df((0L, 2L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine desc with id tie-break") {
    val out = Similarity.bruteForceTopK(vecs.filter(col("id") === 0), vecs, 3)
      .select("corpus_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(out.map(_._1) == Seq(2L, 1L, 3L))
  }

  test("lshTopK only returns same-bucket candidates and never the query itself") {
    val out = Similarity.lshTopK(vecs, vecs, 4, nPlanes = 2, dim = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect()
    assert(out.forall(p => p._1 != p._2))
  }

  test("hyperplanes are deterministic ±1") {
    val p1 = Similarity.hyperplanes(4, 8)
    val p2 = Similarity.hyperplanes(4, 8)
    assert(p1.map(_.toSeq) == p2.map(_.toSeq))
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
  }
}
