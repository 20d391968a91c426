package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHitterStoreSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-hh").resolve("store").toString

  private def occurrences(counts: (String, Int)*) =
    counts.flatMap { case (t, n) => Seq.fill(n)(t) }.toDF("tok")

  test("store never exceeds capacity and keeps every above-bound token") {
    val root = freshRoot()
    val cap = 3
    // n = 60; bound n/(cap+1) = 15: 'big' (30) and 'mid' (16) must survive
    // any MG reduction; the 14 singletons may not.
    val batch = occurrences(
      ("big", 30) +: ("mid", 16) +: Seq.tabulate(14)(i => (s"t$i", 1)): _*)
    HeavyHitterStore.merge(spark, root, batch, cap)
    val counters = ManifestStore.read(spark, root)
      .as[(String, Long)].collect().toMap
    assert(counters.size <= cap)
    assert(counters.contains("big") && counters.contains("mid"))
    // MG undercount bound: counter >= count - n/(cap+1)
    assert(counters("big") >= 30L - 15L)
  }

  test("incremental merges keep the superset guarantee across any split") {
    val all = ("hot", 40) +: ("warm", 25) +:
      Seq.tabulate(30)(i => (s"cold$i", 1))
    val n = all.map(_._2).sum // 95; bound at cap=4 is 19
    for (splitAt <- Seq(1, 10, 31)) {
      val root = freshRoot()
      HeavyHitterStore.merge(spark, root,
        occurrences(all.take(splitAt): _*), capacity = 4)
      HeavyHitterStore.merge(spark, root,
        occurrences(all.drop(splitAt): _*), capacity = 4)
      val toks = ManifestStore.read(spark, root)
        .as[(String, Long)].collect().toMap
      assert(toks.contains("hot") && toks.contains("warm"),
        s"split at $splitAt lost an above-bound token (n=$n)")
    }
  }

  test("verified readout equals the naive exact GROUP BY") {
    val root = freshRoot()
    val corpus = occurrences(("a", 12) +: ("b", 7) +: ("c", 5) +:
      Seq.tabulate(20)(i => (s"x$i", 1)): _*)
    HeavyHitterStore.merge(spark, root, corpus, capacity = 16)
    val got = HeavyHitterStore
      .verifiedHitters(spark, root, corpus, capacity = 16, threshold = 6L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 12L, "b" -> 7L))
  }

  test("threshold below the MG bound is rejected loudly") {
    val root = freshRoot()
    val corpus = occurrences(Seq.tabulate(50)(i => (s"t$i", 2)): _*)
    HeavyHitterStore.merge(spark, root, corpus, capacity = 4)
    val e = intercept[IllegalArgumentException] {
      HeavyHitterStore.verifiedHitters(spark, root, corpus,
        capacity = 4, threshold = 10L) // n=100, bound 20 — 10 is unsafe
    }
    assert(e.getMessage.contains("raise capacity"))
  }

  test("replayed txn is a no-op; fresh txn commits") {
    val root = freshRoot()
    HeavyHitterStore.merge(spark, root, occurrences(("g", 5)),
      capacity = 8, txnId = Some(1L))
    val v1 = ManifestStore.latest(spark, root).get.version
    HeavyHitterStore.merge(spark, root, occurrences(("h", 3)),
      capacity = 8, txnId = Some(1L))
    assert(ManifestStore.latest(spark, root).get.version == v1)
    assert(ManifestStore.read(spark, root).count() == 1)
    HeavyHitterStore.merge(spark, root, occurrences(("h", 3)),
      capacity = 8, txnId = Some(2L))
    assert(ManifestStore.read(spark, root).count() == 2)
  }

  test("streaming merge: per-micro-batch commits, exactly-once replay") {
    val dir = Files.createTempDirectory("graft-hh-stream")
    val src = dir.resolve("src"); Files.createDirectories(src)
    val root = dir.resolve("store").toString
    val checkpoint = dir.resolve("chk").toString
    Files.writeString(src.resolve("b0.txt"), Seq.fill(9)("alpha")
      .mkString("\n") + "\nbeta\n")
    val rows = spark.readStream.schema("value STRING")
      .text(src.toString).select(col("value").as("tok"))
    val q = HeavyHitterStore.mergeStream(spark, rows, root,
      capacity = 8, checkpoint)
    try q.processAllAvailable() finally q.stop()
    val counters = ManifestStore.read(spark, root)
      .as[(String, Long)].collect().toMap
    assert(counters("alpha") == 9L && counters("beta") == 1L)
  }
}
