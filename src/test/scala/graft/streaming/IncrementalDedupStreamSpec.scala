package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

class IncrementalDedupStreamSpec extends SparkSpec {

  import spark.implicits._

  private val Tau = 0.8

  test("streamed store accumulates survivors; no near-dup pair survives; " +
      "equals the sequential batch application") {
    val corpus = graft.ops.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // three deterministic "arrival" batches
    val parts = (0 until 3).map(i =>
      corpus.filter(pmod(col("doc_id"), lit(3)) === i))

    // streaming path
    implicit val sqlCtx = spark.sqlContext
    val storeDir = Files.createTempDirectory("graft_incdedup").toString + "/store"
    val input = MemoryStream[(Long, String)]
    val q = IncrementalDedupStream.writer(
        input.toDF().toDF("doc_id", "text"), storeDir, "text", "doc_id", Tau)
      .start()
    parts.foreach { p =>
      input.addData(p.as[(Long, String)].collect().toSeq)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = ManifestStore.read(spark, storeDir)

    // sequential batch application of the same splits
    var expect = corpus.filter(lit(false))
    parts.foreach { p =>
      expect = expect.unionByName(
        IncrementalDedupStream.dedupBatch(expect, p, "text", "doc_id", Tau))
    }
    assert(streamed.select("doc_id").as[Long].collect().sorted.toSeq ==
      expect.select("doc_id").as[Long].collect().sorted.toSeq)

    // at least one duplicate was actually rejected, and no verified
    // near-dup pair survives in the store
    assert(streamed.count() < corpus.count())
    assert(Dedup.nearDuplicatePairs(streamed, "text", "doc_id", Tau)
      .count() == 0)
  }

  test("segment compaction preserves rows and collapses to one segment") {
    import java.nio.file.Files
    val storeDir = Files.createTempDirectory("graft_compact").toString + "/store"
    // three appends of disjoint docs -> three committed segments
    (0 until 3).foreach { b =>
      IncrementalDedupStream.appendBatch(
        (0 until 5).map(i => (b * 100L + i, s"batch $b unique doc $i with enough tokens to shingle properly " + i))
          .toDF("doc_id", "text"),
        storeDir, "text", "doc_id", Tau, 5, 8, 2)
    }
    val before = ManifestStore.read(spark, storeDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // count DATA segments only (__fs: stats slots mirror them 1:1)
    def segs(): Int = ManifestStore.latest(spark, storeDir).get.entries
      .keys.count(!ManifestStore.isMetaSlot(_))
    assert(segs() == 3)

    IncrementalDedupStream.compactSegments(spark, storeDir)
    val after = ManifestStore.read(spark, storeDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == before)
    assert(segs() == 1)
    // idempotent: a second compaction is a no-op (single segment already)
    val v = ManifestStore.latest(spark, storeDir).get.version
    IncrementalDedupStream.compactSegments(spark, storeDir)
    assert(ManifestStore.latest(spark, storeDir).get.version == v)
  }
}
