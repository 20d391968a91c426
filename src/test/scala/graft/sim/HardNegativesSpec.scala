package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Tables

/** sm12: hard-negative mining semantics. */
class HardNegativesSpec extends SparkSpec {

  private def emb = Tables(spark, sfDir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))

  test("every mined negative carries a different label, ranks are 1..k") {
    val out = Similarity
      .hardNegativeTopK(emb.filter(col("id") < 10), emb, k = 5)
    assert(out.filter(col("query_label") === col("neg_label")).count() == 0)
    val perQuery = out.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), min(col("rank")).as("lo"),
        max(col("rank")).as("hi"))
      .collect()
    assert(perQuery.length == 10)
    perQuery.foreach { r =>
      assert(r.getLong(1) == 5 && r.getInt(2) == 1 && r.getInt(3) == 5)
    }
  }

  test("rank-1 negative is the true cross-label cosine argmax") {
    val q0 = emb.filter(col("id") === 0)
    val lbl = q0.select(col("label")).head.getInt(0)
    val best = Similarity.hardNegativeTopK(q0, emb, k = 1)
      .select(col("corpus_id")).head.getLong(0)
    // Direct recomputation without the window machinery.
    val direct = emb.filter(col("label") =!= lbl && col("id") =!= 0)
      .crossJoin(broadcast(q0.select(col("vec").as("qv"))))
      .select(col("id"),
        (Similarity.dot(col("qv"), col("vec"))
          / (Similarity.norm(col("qv")) * Similarity.norm(col("vec"))))
          .as("cos"))
      .orderBy(col("cos").desc, col("id"))
      .select(col("id")).head.getLong(0)
    assert(best == direct)
  }
}
