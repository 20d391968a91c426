package graft.quality

import graft.SparkSpec
import graft.quality.DataQuality.{CentsCol, LongCol, StringCol}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Dirty-data semantics of the DataQuality primitives: the clean-fixture
  * gates (dq1/dq2) prove the all-pass path; this spec proves violations are
  * actually counted.
  */
class DataQualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, Some(10L), "OK", 1.25),
    (1L, Some(11L), "OK", -0.50), // dup key + negative amount
    (2L, None, "BAD", 2.00), //        null ref + bad status
    (3L, Some(99L), "OK", 3.75) //     dangling ref
  ).toDF("id", "ref", "status", "amount")

  private lazy val parent = Seq(10L, 11L).toDF("pid")

  test("uniqueRule counts extra rows per duplicated key") {
    val r = DataQuality.uniqueRule("u", dirty, col("id")).collect().head
    assert(r === Row("u", 4L, 1L))
  }

  test("fkRule counts dangling and null child keys") {
    // null ref never equi-joins → both the None and the 99 row violate
    val r = DataQuality.fkRule("fk", dirty, col("ref"), parent, col("pid"))
      .collect().head
    assert(r === Row("fk", 4L, 2L))
  }

  test("predicateRule counts matching rows and audit flags failures") {
    val report = DataQuality.audit(Seq(
      DataQuality.predicateRule("neg", dirty, col("amount") < 0),
      DataQuality.predicateRule("status", dirty, col("status") =!= "OK"),
      DataQuality.predicateRule("clean", dirty, col("amount") > 100)))
      .collect()
    assert(report.map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .toSeq === Seq(("clean", 0L, 1L), ("neg", 1L, 0L), ("status", 1L, 0L)))
  }

  test("predicateRule on an empty frame reports zero violations, passing") {
    val r = DataQuality.predicateRule("e", dirty.filter(col("id") < 0),
      col("amount") < 0).collect().head
    assert(r === Row("e", 0L, 0L))
  }

  test("profile reports nulls, distincts and canonical cents min/max") {
    val p = DataQuality.profile(dirty, Seq("id" -> LongCol,
        "ref" -> LongCol, "status" -> StringCol, "amount" -> CentsCol))
      .collect().map(r => r.getString(0) -> r).toMap
    val ref = p("ref")
    assert(ref.getLong(2) === 3L) //  n_nonnull
    assert(ref.getLong(3) === 750000L) // completeness_ppm
    assert(ref.getLong(4) === 3L) //  n_distinct
    val amt = p("amount")
    assert(amt.getLong(5) === -50L && amt.getLong(6) === 375L)
    val st = p("status")
    assert(st.isNullAt(5) && st.getString(7) === "BAD" &&
      st.getString(8) === "OK")
  }
}
