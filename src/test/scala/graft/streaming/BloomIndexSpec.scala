package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-index invariants: lookups equal the full-scan filter, open an
  * fpp-bounded fraction of segments, never lose a row to a missing or
  * stale bloom, and the index commit is a normal atomic manifest version.
  */
class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-bloom").toString + "/t"

  /** 8 range segments on k; secondary column u is a scattered permutation
    * so each u value lives in exactly one segment the zone maps know
    * nothing about.
    */
  private def build(): String = {
    val root = freshRoot()
    val df = spark.range(0, 4000).toDF("k")
      .withColumn("u", (col("k") * 7919) % 4000)
    ClusteredTable.write(spark, df, root, "k", numSegments = 8)
    BloomIndex.build(spark, root, "u", expectedItems = 1000)
    root
  }

  test("lookup equals the full filter and opens few segments") {
    val root = build()
    var totalCandidates = 0
    for (u <- Seq(0L, 7919L % 4000, 123L, 3999L)) {
      val got = BloomIndex.lookup(spark, root, u)
        .select("k", "u").as[(Long, Long)].collect().toSet
      val want = ClusteredTable.readTable(spark, root)
        .filter(col("u") === u).select("k", "u")
        .as[(Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty, s"u=$u: $got vs $want")
      totalCandidates += BloomIndex.candidateSlots(spark, root, u).size
    }
    // each value lives in ONE segment; fpp 3% over 8 segments leaves
    // little room — 4 lookups should open well under half of 32
    assert(totalCandidates <= 8, s"bloom barely pruned: $totalCandidates")
  }

  test("absent values usually resolve to zero segments; result is empty " +
       "but correctly typed") {
    val root = build()
    val empties = (10000L to 10019L).map(v =>
      BloomIndex.candidateSlots(spark, root, v).size)
    assert(empties.sum <= 5, s"absent-value candidates: $empties")
    val miss = BloomIndex.lookup(spark, root, 10000L)
    assert(miss.count() == 0 && miss.columns.toSeq == Seq("k", "u"))
  }

  test("segments appended after indexing are always read (no lost rows); " +
       "re-indexing covers them") {
    val root = build()
    ClusteredTable.append(spark,
      Seq((9000L, 42L)).toDF("k", "u"), root, segmentsPerBatch = 1)
    // 42 = u of some base row too; the fresh (unbloomy) segment must also
    // be a candidate, so BOTH rows surface
    val got = BloomIndex.lookup(spark, root, 42L)
      .select("k").as[Long].collect().toSet
    val want = ClusteredTable.readTable(spark, root)
      .filter(col("u") === 42L).select("k").as[Long].collect().toSet
    assert(got == want && got.contains(9000L))

    val before = BloomIndex.candidateSlots(spark, root, 10000L)
    assert(before.nonEmpty, "unbloomy segment should be a candidate")
    BloomIndex.build(spark, root, "u", expectedItems = 1000)
    assert(BloomIndex.candidateSlots(spark, root, 10000L).size <= 1)
    assert(BloomIndex.lookup(spark, root, 42L)
      .select("k").as[Long].collect().toSet == want)
  }

  test("lookup without an index fails loudly; indexing bumps the version " +
       "and keeps data entries intact") {
    val root = freshRoot()
    ClusteredTable.write(spark,
      spark.range(0, 100).toDF("k").withColumn("u", col("k")),
      root, "k", numSegments = 4)
    val err = intercept[IllegalStateException] {
      BloomIndex.lookup(spark, root, 1L)
    }
    assert(err.getMessage.contains("no bloom index"))
    val v1 = ManifestStore.latest(spark, root).get
    BloomIndex.build(spark, root, "u")
    val v2 = ManifestStore.latest(spark, root).get
    assert(v2.version == v1.version + 1)
    v1.entries.foreach { case (k, v) => assert(v2.entries.get(k).contains(v)) }
  }
}
