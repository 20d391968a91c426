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
}
