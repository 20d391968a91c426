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

  test("the peel early-exits at the fixpoint instead of burning the budget") {
    // pre-early-exit this ran 10_000 checkpoint materializations (minutes);
    // a generous budget must now cost peel-depth + 1 rounds
    val core = KCore.kCore(g, k = 2, maxRounds = 10000)
      .orderBy(col("id")).collect()
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("reliable checkpointing under spark.graft.checkpointDir agrees " +
    "and writes durable round state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    try {
      spark.conf.set(GraphOps.CheckpointDirConf, dir.toString)
      val core = KCore.kCore(g, k = 2, maxRounds = 5)
        .orderBy(col("id")).collect()
      assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
        Seq((1L, 2L), (2L, 2L), (3L, 2L)))
      // the rounds must actually have hit the durable path
      val ckptRoot = spark.sparkContext.getCheckpointDir.get
      val files = java.nio.file.Files.walk(
          java.nio.file.Paths.get(new java.net.URI(ckptRoot).getPath))
        .toArray.length
      assert(files > 1, s"no checkpoint state written under $ckptRoot")
    } finally spark.conf.unset(GraphOps.CheckpointDirConf)
  }
}
