package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-table transactional catalog semantics (TxnCatalog): atomicity of
  * the multi-table commit, carry-forward, and invisibility of table
  * versions that committed but were never cataloged (the mid-transaction
  * crash state).
  */
class TxnCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def fresh() = {
    val r = Files.createTempDirectory("graft-txn")
    (r.resolve("catalog").toString,
      Map("a" -> r.resolve("a").toString, "b" -> r.resolve("b").toString))
  }

  private def t(rows: (Long, String)*) = rows.toDF("id", "v")

  test("readers through the catalog see consistent pinned pairs") {
    val (cat, tabs) = fresh()
    MergeInto.mergeBatch(spark, t(1L -> "a1"), tabs("a"), "id")
    MergeInto.mergeBatch(spark, t(1L -> "b1"), tabs("b"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 1L, "b" -> 1L))
    MergeInto.mergeBatch(spark, t(1L -> "a2"), tabs("a"), "id")
    MergeInto.mergeBatch(spark, t(1L -> "b2"), tabs("b"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 2L, "b" -> 2L))
    def pair(v: Long) = (
      TxnCatalog.readTable(spark, cat, tabs, "a", Some(v))
        .select("v").as[String].head,
      TxnCatalog.readTable(spark, cat, tabs, "b", Some(v))
        .select("v").as[String].head)
    assert(pair(1L) === ("a1", "b1"))
    assert(pair(2L) === ("a2", "b2"))
  }

  test("a table commit WITHOUT a catalog commit stays invisible") {
    val (cat, tabs) = fresh()
    MergeInto.mergeBatch(spark, t(1L -> "a1"), tabs("a"), "id")
    MergeInto.mergeBatch(spark, t(1L -> "b1"), tabs("b"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 1L, "b" -> 1L))
    // the crash state: table a advanced, catalog never flipped
    MergeInto.mergeBatch(spark, t(1L -> "a2"), tabs("a"), "id")
    assert(MergeInto.readTable(spark, tabs("a"))
      .select("v").as[String].head === "a2") // direct read sees it...
    assert(TxnCatalog.readTable(spark, cat, tabs, "a", None)
      .select("v").as[String].head === "a1") // ...the catalog does not
  }

  test("tables not named in a txn carry forward their pinned version") {
    val (cat, tabs) = fresh()
    MergeInto.mergeBatch(spark, t(1L -> "a1"), tabs("a"), "id")
    MergeInto.mergeBatch(spark, t(1L -> "b1"), tabs("b"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 1L, "b" -> 1L))
    MergeInto.mergeBatch(spark, t(1L -> "a2"), tabs("a"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 2L)) // b unmentioned
    assert(TxnCatalog.tableVersionsAt(spark, cat) ===
      Map("a" -> 2L, "b" -> 1L))
  }

  test("an unknown table through the catalog fails loudly") {
    val (cat, tabs) = fresh()
    MergeInto.mergeBatch(spark, t(1L -> "a1"), tabs("a"), "id")
    TxnCatalog.commitTxn(spark, cat, Map("a" -> 1L))
    val e = intercept[IllegalStateException] {
      TxnCatalog.readTable(spark, cat, tabs, "b", None)
    }
    assert(e.getMessage.contains("not in catalog"))
  }
}
