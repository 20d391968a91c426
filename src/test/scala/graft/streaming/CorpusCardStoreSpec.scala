package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

class CorpusCardStoreSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-card").resolve("store").toString

  private def docs(rows: (Long, String, String, String)*) =
    rows.toDF("doc_id", "text", "lang", "source")
      .selectExpr("doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  private val fixture = Seq.tabulate(12)(i =>
    (i.toLong, s"doc number $i with some words",
      if (i % 3 == 0) "en" else "de", s"src${i % 2}"))

  private def rep(r: String) = CorpusCardStore.report(spark, r)
    .as[(String, String, Long)].collect().toSet

  test("card merge is additive: incremental == one-shot, any split") {
    val oneShot = freshRoot()
    CorpusCardStore.merge(spark, oneShot,
      CorpusCardStore.cardOf(docs(fixture: _*)))
    for (splitAt <- Seq(1, 6, 11)) {
      val inc = freshRoot()
      CorpusCardStore.merge(spark, inc,
        CorpusCardStore.cardOf(docs(fixture.take(splitAt): _*)))
      CorpusCardStore.merge(spark, inc,
        CorpusCardStore.cardOf(docs(fixture.drop(splitAt): _*)))
      assert(rep(inc) == rep(oneShot), s"split at $splitAt")
    }
    // the cells say what they should
    val m = rep(oneShot).map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("total", "docs")) == 12L)
    assert(m(("lang", "en")) == 4L && m(("lang", "de")) == 8L)
    assert(m(("source", "src0")) == 6L && m(("source", "src1")) == 6L)
  }

  test("replayed txn is a no-op; a txn-less merge keeps the guard") {
    val root = freshRoot()
    CorpusCardStore.merge(spark, root,
      CorpusCardStore.cardOf(docs(fixture.take(6): _*)), txnId = Some(1L))
    val v1 = ManifestStore.latest(spark, root).get.version
    CorpusCardStore.merge(spark, root,
      CorpusCardStore.cardOf(docs(fixture.take(6): _*)), txnId = Some(1L))
    assert(ManifestStore.latest(spark, root).get.version == v1)
    // out-of-band correction without a txn…
    CorpusCardStore.merge(spark, root,
      CorpusCardStore.cardOf(docs(fixture.drop(6): _*)))
    // …must still refuse the replay of txn 1
    val v2 = ManifestStore.latest(spark, root).get.version
    CorpusCardStore.merge(spark, root,
      CorpusCardStore.cardOf(docs(fixture.take(6): _*)), txnId = Some(1L))
    assert(ManifestStore.latest(spark, root).get.version == v2)
    assert(rep(root).contains(("total", "docs", 12L)))
  }

  test("MemoryStream ingest lands the same card as direct merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val direct = freshRoot()
    CorpusCardStore.merge(spark, direct,
      CorpusCardStore.cardOf(docs(fixture: _*)))

    val streamed = freshRoot()
    val ms = MemoryStream[(Long, String, String, String)]
    val q = CorpusCardStore.mergeStream(spark,
      ms.toDF().toDF("doc_id", "text", "lang", "source")
        .selectExpr("doc_id", "text", "lang", "source",
          "CAST(length(text) AS BIGINT) AS n_chars"),
      streamed, Files.createTempDirectory("graft-card-ckpt").toString)
    ms.addData(fixture.take(5))
    q.processAllAvailable()
    ms.addData(fixture.drop(5))
    q.processAllAvailable()
    q.stop()
    assert(rep(streamed) == rep(direct))
  }
}
