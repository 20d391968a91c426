package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {

  import spark.implicits._

  // triangle {1,2,3} with a 3-node tail 3–4–5–6: the tail peels off one
  // node per round under k=2 (degree-1 ends cascade), the triangle stays.
  private lazy val g = Seq((1L, 2L), (2L, 3L), (3L, 1L),
    (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")

  test("peel cascades down the tail and keeps the triangle") {
    val core = KCore.kCore(g, k = 2, maxRounds = 3)
      .orderBy(col("id")).collect()
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("an insufficient round budget fails loudly, never half-peeled") {
    val e = intercept[IllegalStateException] {
      KCore.kCore(g, k = 2, maxRounds = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("a too-high k returns an empty core, not an error") {
    assert(KCore.kCore(g, k = 5, maxRounds = 2).count() === 0)
  }

  test("duplicate and reversed input edges do not inflate degrees") {
    val noisy = g.unionAll(g.select(col("dst").as("src"),
      col("src").as("dst")))
    val core = KCore.kCore(noisy, k = 2, maxRounds = 3)
      .orderBy(col("id")).collect()
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }
}
