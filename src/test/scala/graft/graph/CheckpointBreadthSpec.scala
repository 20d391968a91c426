package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every iterative family must route its per-round lineage cut through
  * [[GraphOps.checkpoint]] so `spark.graft.checkpointDir` upgrades ALL of
  * them to reliable (durable) checkpoints at once — on a preemptible
  * cluster a truncated-lineage `localCheckpoint` round is unrecoverable.
  * KCoreSpec proves the conf writes durable state; this spec proves
  * BREADTH: each remaining family runs once with the conf set and
  * produces its conf-unset answer. (A family calling `localCheckpoint`
  * directly would still pass functionally — the companion guard is the
  * source grep in the build notes: no bare `localCheckpoint` outside
  * `GraphOps.checkpoint` itself.)
  */
class CheckpointBreadthSpec extends SparkSpec {

  import spark.implicits._

  private def withConf[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_breadth")
    spark.conf.set(GraphOps.CheckpointDirConf, dir.toString)
    try body finally spark.conf.unset(GraphOps.CheckpointDirConf)
  }

  test("connected components converge under a reliable checkpoint dir") {
    val edges = ((0L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L))).toDF("s", "d")
    // localEdgeCap = 0 forces the star-loop (checkpointed) path
    val got = withConf {
      ConnectedComponents.minLabel(edges, "s", "d", localEdgeCap = 0)
        .as[(Long, Long)].collect().toMap
    }
    assert((0L to 20L).forall(got(_) == 0L) && got(101L) == 100L)
  }

  test("hierarchy pointer-doubling rolls up under a reliable checkpoint " +
      "dir") {
    val nodes = (1L to 30L).map(i =>
      (i, if (i == 1) None else Some(i - 1), 1L))
    val got = withConf {
      Hierarchy.chainAgg(nodes.toDF("id", "parent", "weight"), rounds = 5)
        .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    }
    assert(got(30L) == 30L && got(1L) == 1L)
  }

  test("BPE training folds merges under a reliable checkpoint dir") {
    val docs = Seq("aa ab aa", "aa ab", "aa").toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val (merges, _) = withConf { graft.text.Bpe.train(docs, rounds = 2) }
    val ms = merges.as[(Int, String, String, Long)].collect()
    assert(ms.length == 2 && ms.head._1 == 1)
  }

  test("k-means Lloyd rounds converge under a reliable checkpoint dir") {
    val emb = (0L until 40L).map { i =>
      val c = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(c, c * 2, c * 3, c))
    }.toDF("id", "vec")
    val q = emb.filter(col("id") < 2)
    val got = withConf {
      graft.sim.Similarity.kmeansIvfTopK(q, emb, k = 3)
        .select("query_id", "corpus_id").as[(Long, Long)].collect()
    }
    // each query's neighbors share its parity (the two true clusters)
    assert(got.nonEmpty && got.forall { case (qi, ci) => qi % 2 == ci % 2 })
  }

  test("covariance-store quantization pass runs under a reliable " +
      "checkpoint dir") {
    val root = java.nio.file.Files.createTempDirectory("covckpt").toString
    val batch = (0L until 8L).map(i =>
      (i, Array(i.toFloat, (i * 2).toFloat))).toDF("id", "vec")
    withConf {
      graft.streaming.CovarianceStore.merge(spark, root, batch,
        txnId = Some(1L))
    }
    val n = graft.streaming.CovarianceStore.cells(spark, root).count()
    assert(n > 0)
  }
}
