package graft.joins

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asOf equals the naive per-row max(right.ts <= left.ts) semantics") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    // right unique per (k, ts)
    val right = Seq.tabulate(150)(i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "ts", "rid")
      .groupBy("k", "ts").agg(max("rid").as("rid"))
      .select(col("k"), col("ts"), col("ts").as("rts"), col("rid"))

    val got = AsOfJoin.asOf(left, right, "k", "ts", "ts", Seq("rts", "rid"))
      .select("lid", "rts", "rid").as[(Long, Option[Long], Option[Long])]
      .collect().toMap2

    val rightRows = right.select("k", "rts", "rid")
      .as[(Long, Long, Long)].collect()
    val naive = left.select("k", "ts", "lid").as[(Long, Long, Long)].collect()
      .map { case (k, ts, lid) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 <= ts)
        if (cands.isEmpty) lid -> (None, None)
        else {
          val best = cands.maxBy(_._2)
          lid -> (Some(best._2), Some(best._3))
        }
      }.toMap

    assert(got == naive)
  }

  test("asOfForward equals the naive per-row min(right.ts >= left.ts) " +
      "semantics, nulled beyond the tolerance") {
    val rnd = new scala.util.Random(11)
    val tol = 15L
    val left = Seq.tabulate(200)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(150)(i =>
        (rnd.nextInt(10).toLong, rnd.nextInt(100).toLong, i.toLong))
      .toDF("k", "ts", "rid")
      .groupBy("k", "ts").agg(max("rid").as("rid"))
      .select(col("k"), col("ts"), col("ts").as("rts"), col("rid"))

    val got = AsOfJoin.asOfForward(left, right, "k", "ts", "ts",
        Seq("rts", "rid"), (lts, rts) => rts <= lts + tol)
      .select("lid", "rts", "rid").as[(Long, Option[Long], Option[Long])]
      .collect().toMap2

    val rightRows = right.select("k", "rts", "rid")
      .as[(Long, Long, Long)].collect()
    val naive = left.select("k", "ts", "lid").as[(Long, Long, Long)].collect()
      .map { case (k, ts, lid) =>
        val cands = rightRows.filter(r => r._1 == k && r._2 >= ts)
        if (cands.isEmpty) lid -> (None, None)
        else {
          val best = cands.minBy(_._2)
          if (best._2 > ts + tol) lid -> (None, None)
          else lid -> (Some(best._2), Some(best._3))
        }
      }.toMap

    assert(got == naive)
  }

  private implicit class ArrToMap(
      arr: Array[(Long, Option[Long], Option[Long])]) {
    def toMap2: Map[Long, (Option[Long], Option[Long])] =
      arr.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
