package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Every registered query runs on sf0.001 and returns rows; every query with
  * an oracle has matching column names (the driver hash-compare sorts columns
  * by name, so a name drift breaks the gate even with identical values).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs non-empty on sf0.001") {
      assert(fn(spark, sfDir).count() > 0)
    }
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no gate query plans a cartesian product") {
    // The scale guard: an accidental unconditioned join anywhere in the
    // catalog would pass a row-count gate at sf0.001 and melt at corpus
    // scale. (BroadcastNestedLoopJoin is NOT banned — the scalar-count
    // crossJoin(broadcast(1-row)) pattern legitimately plans one.)
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
