package graft.joins

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltedJoinSpec extends SparkSpec {

  import spark.implicits._

  test("salted join returns exactly the plain join's rows (inner and left)") {
    val rnd = new scala.util.Random(11)
    // 80% of left rows hit one hot key
    val left = Seq.tabulate(500)(i =>
      (if (rnd.nextInt(5) < 4) 1L else rnd.nextInt(20).toLong, i.toLong))
      .toDF("k", "lv")
    val right = Seq.tabulate(15)(i => (i.toLong, s"r$i")).toDF("k", "rv")

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "lv", "rv").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2))))
        .sortBy(t => (t._1, t._2, t._3)).toSeq

    assert(key(SaltedJoin.saltedJoin(left, right, Seq("k"), 8)) ==
      key(left.join(right, Seq("k"), "inner")))
    assert(key(SaltedJoin.saltedJoin(left, right, Seq("k"), 8, "left")) ==
      key(left.join(right, Seq("k"), "left")))
  }

  test("join keys include the salt (skew scatter is real)") {
    val left = Seq((1L, 1L)).toDF("k", "lv")
    val right = Seq((1L, "r")).toDF("k", "rv")
    val plan = SaltedJoin.saltedJoin(left, right, Seq("k"), 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"))
  }
}
