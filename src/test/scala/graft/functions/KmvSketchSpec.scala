package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._

/** The KMV bottom-k-distinct aggregate: semilattice laws (any
  * partitioning gives the same sketch), dedup under eviction, SQL
  * surface, and the ObjectHashAggregate plan with partial aggregation.
  */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  private def sketchCol(k: Int) = GraftBridge.column(
    KmvSketchAgg(GraftBridge.expression(col("h")), k)
      .toAggregateExpression())

  test("sketch equals the k smallest distinct values, any partitioning") {
    val vals = Seq(9L, 3L, 3L, 7L, 1L, 1L, 1L, 8L, 5L, 5L, 2L, 11L, 2L)
    val want = vals.distinct.sorted.take(4)
    for (parts <- Seq(1, 3, 7)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(sketchCol(4).as("sk")).head.getSeq[Long](0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("dedup under eviction: a re-seen max must not evict") {
    // buffer [1,2,3] full (k=3); seeing 3 again must keep [1,2,3]
    val got = Seq(1L, 2L, 3L, 3L, 3L).toDF("h")
      .agg(sketchCol(3).as("sk")).head.getSeq[Long](0)
    assert(got == Seq(1L, 2L, 3L))
  }

  test("undersized and empty groups; nulls are skipped") {
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("g", "h")
    val rows = df.groupBy($"g").agg(sketchCol(8).as("sk"))
      .orderBy($"g").collect()
    assert(rows(0).getSeq[Long](1) == Seq(5L))
    assert(rows(1).getSeq[Long](1) == Seq.empty)
  }

  test("SQL surface + ObjectHashAggregate plan with partial aggregation") {
    spark.range(0, 10000).select(($"id" % 997).as("g"),
        GraftBridge.column(Hash60Expr(GraftBridge.expression(
          $"id".cast("string")))).as("h"))
      .createOrReplaceTempView("kmv_probe")
    val df = spark.sql(
      "SELECT g, kmv_sketch(h, 8) AS sk FROM kmv_probe GROUP BY g")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_kmv_sketch"),
      "partial aggregation lost:\n" + plan)
    val row = df.filter($"g" === 0).head
    // group 0: ids 0, 997, ..., hashes of 11 values — sketch is their
    // 8 smallest Hash60 values
    val ids = (0L until 10000L by 997L)
      .map(i => Hash60.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)))
      .sorted.take(8)
    assert(row.getSeq[Long](1) == ids)
  }
}
