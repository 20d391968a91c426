package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrigramIndexSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "quick quick brown"),
    (3L, "a slow red fox"),
    (4L, "qu"), // shorter than a trigram: contributes no postings
    (5L, "brown fox brown fox")).toDF("doc_id", "text")

  private lazy val index = TrigramIndex.build(docs, "doc_id", "text")

  private def got(pattern: String): Seq[Long] =
    TrigramIndex.search(index, docs, "doc_id", "text", pattern)
      .as[Long].collect().sorted.toSeq

  private def naive(pattern: String): Seq[Long] =
    docs.filter(col("text").contains(pattern))
      .select("doc_id").as[Long].collect().sorted.toSeq

  test("index search equals the naive contains scan") {
    Seq("quick", "brown fox", "fox", "slow red", "zebra", "ck b")
      .foreach { p => assert(got(p) == naive(p), s"pattern '$p'") }
  }

  test("candidate superset is actually verified (shared trigrams, " +
    "absent pattern)") {
    // doc 1 and 2 share all trigrams of "quick brown" except the join
    // region — a doc containing all query trigrams in the wrong ORDER
    // must be filtered by the verify step
    assert(got("brown quick") == naive("brown quick"))
  }

  test("sub-trigram patterns are rejected (they would need a scan)") {
    val e = intercept[IllegalArgumentException] { got("qu") }
    assert(e.getMessage.contains("shorter than a trigram"))
  }

  test("posting table holds one row per distinct trigram per doc") {
    val dup = index.groupBy("ng", "doc_id").count().filter($"count" > 1)
    assert(dup.isEmpty)
    // doc 5 repeats "brown fox": postings still distinct
    val d5 = index.filter($"doc_id" === 5L).count()
    val distinct5 = "brown fox brown fox".sliding(3).toSeq.distinct.size
    assert(d5 == distinct5)
  }
}
