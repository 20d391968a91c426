package graft.sim

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.ManifestStore

/** Standing-index invariants: incremental builds equal one-shot builds
  * (the frozen quantizer makes batch order irrelevant), appends never touch
  * existing segments, and queries prune to the probed cell directories.
  */
class IvfStoreSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic little vectors: id plus a two-hot float pattern. */
  private def vecs(ids: Range): DataFrame =
    ids.map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (if (d == i % 8) 1.0f else 0.0f) + (if (d == (i / 8) % 8) 0.5f else 0.0f)))
    }.toDF("id", "vec")

  private def freshRoot() =
    Files.createTempDirectory("graft-ivfstore").toString + "/idx"

  test("two-batch incremental build equals the one-shot index") {
    // same bootstrap batch trains the same frozen quantizer on both roots;
    // the remainder arrives as two appends on one and a single append on
    // the other — batch splits must not be observable
    val incr = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 64), incr, numCentroids = 8)
    IvfStore.append(spark, vecs(64 until 80), incr)
    IvfStore.append(spark, vecs(80 until 100), incr)

    val all = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 64), all, numCentroids = 8)
    IvfStore.append(spark, vecs(64 until 100), all)

    val q = vecs(0 until 3)
    def res(root: String) =
      IvfStore.topK(spark, root, q, k = 4, nProbe = 2)
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(res(incr) == res(all))
    assert(res(incr).nonEmpty)
  }

  test("append stages a new segment and carries old entries forward") {
    val root = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 32), root, numCentroids = 4)
    val v1 = ManifestStore.latest(spark, root).get
    IvfStore.append(spark, vecs(32 until 48), root)
    val v2 = ManifestStore.latest(spark, root).get
    assert(v2.version == v1.version + 1)
    // every v1 entry survives verbatim; exactly one new DATA slot appears
    // (__fs: stats slots mirror data entries — commit maintains them)
    v1.entries.foreach { case (k, v) => assert(v2.entries.get(k).contains(v)) }
    assert((v2.entries.keySet -- v1.entries.keySet)
      .filterNot(_.startsWith(ManifestStore.FileStatsPrefix))
      == Set(s"seg-${v2.version}"))
  }

  test("bootstrap refuses a second call; append refuses a missing index") {
    val root = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 16), root, numCentroids = 4)
    intercept[IllegalArgumentException] {
      IvfStore.bootstrap(spark, vecs(0 until 16), root, numCentroids = 4)
    }
    intercept[IllegalStateException] {
      IvfStore.append(spark, vecs(0 until 4), freshRoot())
    }
  }

  test("txn-id appends are idempotent (at-least-once retry is a no-op) " +
       "and a memory-stream ingest equals the batch build") {
    val root = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 32), root, numCentroids = 4)
    IvfStore.append(spark, vecs(32 until 40), root, txnId = Some(0L))
    val v = graft.streaming.ManifestStore.latest(spark, root).get.version
    // foreachBatch retry: same batch id arrives again — must not commit
    IvfStore.append(spark, vecs(32 until 40), root, txnId = Some(0L))
    assert(graft.streaming.ManifestStore.latest(spark, root).get.version == v)
    assert(IvfStore.topK(spark, root, vecs(0 until 1), k = 40, nProbe = 4)
      .count() <= 39) // no duplicate corpus rows possible

    // real micro-batch ingest through the streaming writer
    val streamed = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 32), streamed, numCentroids = 4)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Array[Float])]
    val q = IvfStore.appendStream(spark,
      ms.toDF().toDF("id", "vec"), streamed,
      Files.createTempDirectory("graft-ivfstream-ckpt").toString)
    val data = vecs(32 until 40).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    ms.addData(data.take(4).toSeq)
    q.processAllAvailable()
    ms.addData(data.drop(4).toSeq)
    q.processAllAvailable()
    q.stop()
    def res(r: String) = IvfStore.topK(spark, r, vecs(0 until 2), 5, 2)
      .orderBy("query_id", "rank")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(3))).toSeq
    assert(res(streamed) == res(root))
  }

  test("standing-index recall vs brute force clears the floor on the " +
       "worst-case unclustered fixture embeddings") {
    import spark.implicits._
    val emb = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 10)
    val root = IvfStore.materializedEmbeddingsDir(spark, sfDir, 64)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val bf = pairs(Similarity.bruteForceTopK(q, emb, 5))
    val recall = (pairs(IvfStore.topK(spark, root, q, 5, nProbe = 8))
      & bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF-store recall regressed: $recall")
  }

  test("query plan prunes to the probed cell partitions") {
    val root = freshRoot()
    IvfStore.bootstrap(spark, vecs(0 until 64), root, numCentroids = 8)
    IvfStore.append(spark, vecs(64 until 96), root)
    val plan = IvfStore.topK(spark, root, vecs(0 until 1), k = 3, nProbe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__cell"),
      s"expected a __cell partition filter in the scan:\n$plan")
  }
}
