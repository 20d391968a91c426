package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming statistics store: every kept statistic must be
  * MERGEABLE — incremental folds over any split equal the one-shot
  * build, sketch saturation included; stream ingest ≡ direct merges;
  * replays are no-ops.
  */
class StatStoreSpec extends SparkSpec {

  import spark.implicits._

  private val Num = Seq("user_id", "value")
  private val Str = Seq("event_type")

  private def freshRoot() =
    Files.createTempDirectory("graft-stats").resolve("store").toString

  private def batch(rows: (Long, Double, String)*) =
    rows.toDF("user_id", "value", "event_type")

  private def report(root: String) =
    StatStore.report(spark, root)
      .as[(String, Long, Long, Double, Option[Double], Option[Double],
        Option[String], Option[String])].collect().toSeq

  test("incremental == one-shot at any split, INCLUDING sketch " +
      "saturation (k smaller than ndv)") {
    val rows = Seq.tabulate(40)(i =>
      (i.toLong % 23, i * 1.5 - 7, "t" + (i % 5)))
    val oneShot = freshRoot()
    StatStore.merge(spark, oneShot,
      StatStore.cellsOf(batch(rows: _*), Num, Str, k = 8), k = 8)
    for (splitAt <- Seq(1, 13, 39)) {
      val inc = freshRoot()
      StatStore.merge(spark, inc,
        StatStore.cellsOf(batch(rows.take(splitAt): _*), Num, Str, 8), 8)
      StatStore.merge(spark, inc,
        StatStore.cellsOf(batch(rows.drop(splitAt): _*), Num, Str, 8), 8)
      assert(report(inc) == report(oneShot), s"split at $splitAt diverged")
    }
  }

  test("min/max/null semantics; a mismatched k is refused") {
    val root = freshRoot()
    val rows = Seq((1L, Some(-3.5), Some("b")), (2L, None, Some("a")),
      (3L, Some(9.25), None))
      .toDF("user_id", "value", "event_type")
    StatStore.merge(spark, root,
      StatStore.cellsOf(rows, Num, Str, 8), 8)
    val rep = report(root).map(r => r._1 -> r).toMap
    assert(rep("value")._3 == 1 && rep("value")._5.contains(-3.5) &&
      rep("value")._6.contains(9.25))
    assert(rep("event_type")._3 == 1 &&
      rep("event_type")._7.contains("a") && rep("event_type")._8.contains("b"))
    assert(rep("user_id")._4 == 3.0) // undersized sketch: est exact
    intercept[IllegalArgumentException] {
      StatStore.merge(spark, root, StatStore.cellsOf(rows, Num, Str, 16), 16)
    }
  }

  test("stream ingest ≡ direct merges; replayed batch is a no-op") {
    val root = freshRoot()
    val ck = Files.createTempDirectory("graft-stats-ck").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Double, String)]
    val q = StatStore.mergeStream(spark,
      mem.toDF().toDF("user_id", "value", "event_type"), root, ck,
      Num, Str, k = 8)
    mem.addData((1L, 1.0, "a"), (2L, 2.0, "b"))
    q.processAllAvailable()
    mem.addData((3L, 3.0, "a"))
    q.processAllAvailable()
    q.stop()
    val direct = freshRoot()
    StatStore.merge(spark, direct, StatStore.cellsOf(
      batch((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "a")), Num, Str, 8), 8)
    assert(report(root) == report(direct))
    // direct replay of an applied txn id: no new version, same report
    val v = ManifestStore.latest(spark, root).get.version
    StatStore.merge(spark, root, StatStore.cellsOf(
      batch((9L, 9.0, "z")), Num, Str, 8), 8, txnId = Some(0L))
    assert(ManifestStore.latest(spark, root).get.version == v)
  }
}
