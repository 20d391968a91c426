package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping (rename-without-rewrite) on the merge table. */
class ColumnMapSpec extends SparkSpec {

  import spark.implicits._

  private def fresh() =
    java.nio.file.Files.createTempDirectory("colmap").toString

  private def seed(root: String): Unit =
    MergeInto.mergeBatch(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v"),
      root, "k", numBuckets = 4)

  test("rename is metadata-only: bucket entries identical, read renamed") {
    val root = fresh(); seed(root)
    val before = ManifestStore.latest(spark, root).get
    MergeInto.renameColumn(spark, root, "s", "status")
    val after = ManifestStore.latest(spark, root).get
    assert(after.version == before.version + 1)
    // every data entry carried forward verbatim — nothing was rewritten
    assert(after.entries.filterNot(_._1 == MergeInto.ColMapSlot) ==
      before.entries)
    assert(MergeInto.readTable(spark, root).columns.toSet ==
      Set("k", "status", "v"))
  }

  test("time travel to a pre-rename version shows the old name") {
    val root = fresh(); seed(root)
    val v1 = ManifestStore.latest(spark, root).get.version
    MergeInto.renameColumn(spark, root, "s", "status")
    assert(MergeInto.readTableAt(spark, root, v1).columns.contains("s"))
    assert(MergeInto.readTable(spark, root).columns.contains("status"))
  }

  test("merge after rename speaks the logical name; physical is refused") {
    val root = fresh(); seed(root)
    MergeInto.renameColumn(spark, root, "s", "status")
    MergeInto.mergeBatch(spark,
      Seq((2L, "B", 21), (4L, "d", 40)).toDF("k", "status", "v"),
      root, "k", numBuckets = 4)
    val got = MergeInto.readTable(spark, root)
      .select("k", "status", "v")
      .as[(Long, String, Int)].collect().sorted.toSeq
    assert(got == Seq((1L, "a", 10), (2L, "B", 21), (3L, "c", 30),
      (4L, "d", 40)))
    val e = intercept[IllegalArgumentException] {
      MergeInto.mergeBatch(spark,
        Seq((5L, "e", 50)).toDF("k", "s", "v"), root, "k", numBuckets = 4)
    }
    assert(e.getMessage.contains("PHYSICAL"))
  }

  test("renaming back to the physical name drops the map slot") {
    val root = fresh(); seed(root)
    MergeInto.renameColumn(spark, root, "s", "status")
    assert(ManifestStore.latest(spark, root).get.entries
      .contains(MergeInto.ColMapSlot))
    MergeInto.renameColumn(spark, root, "status", "s")
    assert(!ManifestStore.latest(spark, root).get.entries
      .contains(MergeInto.ColMapSlot))
    assert(MergeInto.readTable(spark, root).columns.contains("s"))
  }

  test("rename refuses collisions, unknown and bookkeeping columns") {
    val root = fresh(); seed(root)
    intercept[IllegalArgumentException] {
      MergeInto.renameColumn(spark, root, "s", "v") // collision
    }
    intercept[IllegalArgumentException] {
      MergeInto.renameColumn(spark, root, "nope", "x") // unknown
    }
    intercept[IllegalArgumentException] {
      MergeInto.renameColumn(spark, root, "s", "__bucket") // reserved
    }
    intercept[IllegalArgumentException] {
      MergeInto.renameColumn(spark, root, "s", "a=b") // manifest-hostile
    }
  }

  test("rename of a CHECK-referenced column is refused") {
    val root = fresh(); seed(root)
    MergeInto.addCheckConstraint(spark, root, "pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      MergeInto.renameColumn(spark, root, "v", "value")
    }
    assert(e.getMessage.contains("CHECK"))
    MergeInto.renameColumn(spark, root, "s", "status") // unreferenced: fine
  }

  test("DV, lookup, deleteWhere and sync all speak logical names") {
    val root = fresh(); seed(root)
    MergeInto.renameColumn(spark, root, "s", "status")
    // point lookup by logical key name, logical output schema
    val hit = MergeInto.lookupKey(spark, root, "k", 2L)
    assert(hit.columns.contains("status"))
    assert(hit.count() == 1)
    // merge-on-read delete keyed logically
    MergeInto.deleteVector(spark, root, "k", Seq(1L).toDF("k"))
    assert(MergeInto.readTable(spark, root).count() == 2)
    MergeInto.materializeDeletes(spark, root, "k")
    assert(MergeInto.readTable(spark, root).count() == 2)
    // predicate delete against the logical name
    val n = MergeInto.deleteWhere(spark, root, col("status") === "c")
    assert(n == 1 && MergeInto.readTable(spark, root).count() == 1)
    // full-snapshot sync through the logical name; map survives the sync
    MergeInto.syncSnapshot(spark,
      Seq((7L, "z", 70)).toDF("k", "status", "v"), root, "k",
      numBuckets = 4)
    assert(MergeInto.readTable(spark, root)
      .select("k", "status", "v").as[(Long, String, Int)]
      .collect().toSeq == Seq((7L, "z", 70)))
    assert(ManifestStore.latest(spark, root).get.entries
      .contains(MergeInto.ColMapSlot))
  }

  test("export refuses while a column map is active") {
    val root = fresh(); seed(root)
    MergeInto.renameColumn(spark, root, "s", "status")
    val e = intercept[IllegalArgumentException] {
      MergeInto.exportFileManifest(spark, root)
    }
    assert(e.getMessage.contains("column map"))
  }
}
