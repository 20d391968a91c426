package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE's WHEN-NOT-MATCHED-BY-SOURCE-DELETE mode (MergeInto.syncSnapshot). */
class SyncSnapshotSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-sync").resolve("table").toString

  private def table(rows: (Long, String, Double)*) =
    rows.toDF("id", "status", "price")

  test("partial sync: absent deleted, matched keep unlisted cols, new insert") {
    val root = freshRoot()
    MergeInto.mergeBatch(spark, table(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), root, "id")
    // snapshot: drops 2, updates 1+3's status with a poisoned price,
    // adds 9 whole
    MergeInto.syncSnapshot(spark, table(
      (1L, "a2", 0.0), (3L, "c2", 0.0), (9L, "z", 90.0)), root, "id",
      updateCols = Seq("status"))
    val got = MergeInto.readTable(spark, root)
      .orderBy(col("id")).as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((1L, "a2", 10.0), (3L, "c2", 30.0), (9L, "z", 90.0)))
  }

  test("whole-row sync makes the table exactly the snapshot") {
    val root = freshRoot()
    MergeInto.mergeBatch(spark, table((1L, "a", 10.0), (2L, "b", 20.0)),
      root, "id")
    MergeInto.syncSnapshot(spark, table((2L, "B", 22.0), (5L, "e", 50.0)),
      root, "id")
    val got = MergeInto.readTable(spark, root)
      .orderBy(col("id")).as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((2L, "B", 22.0), (5L, "e", 50.0)))
  }

  test("sync is a normal commit: time travel still sees the pre-sync table") {
    val root = freshRoot()
    MergeInto.mergeBatch(spark, table((1L, "a", 10.0)), root, "id")
    MergeInto.syncSnapshot(spark, table((5L, "e", 50.0)), root, "id")
    assert(MergeInto.readTableAt(spark, root, 1L)
      .select(col("id")).as[Long].collect().toSeq === Seq(1L))
    // and a later point lookup on the synced table resolves the new key
    assert(MergeInto.lookupKey(spark, root, "id", 5L).count() === 1L)
  }

  test("an ambiguous snapshot (duplicate key) is rejected") {
    val root = freshRoot()
    MergeInto.mergeBatch(spark, table((1L, "a", 10.0)), root, "id")
    val e = intercept[IllegalArgumentException] {
      MergeInto.syncSnapshot(spark, table((5L, "x", 1.0), (5L, "y", 2.0)),
        root, "id")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("bucket-count mismatch is rejected") {
    val root = freshRoot()
    MergeInto.mergeBatch(spark, table((1L, "a", 10.0)), root, "id")
    intercept[IllegalArgumentException] {
      MergeInto.syncSnapshot(spark, table((1L, "a", 10.0)), root, "id",
        numBuckets = 8)
    }
  }
}
