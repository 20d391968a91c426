package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q58 (rolling distinct actives) and cur14 (canonical pick) semantics. */
class RollingCanonicalSpec extends SparkSpec {

  test("q58 matches a direct per-day distinct count (no explosion path)") {
    val out = AdvancedQueries.queries("q58_rolling_active_users")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables(spark, sfDir, "events")
      .select(to_date(col("ts")).as("d"), col("user_id"))
    val days = ev.select(col("d")).distinct()
      .orderBy(col("d")).collect().map(_.getDate(0))
    assert(out.size == days.length)
    // Spot-check first, middle, last day with a plain range filter.
    Seq(0, days.length / 2, days.length - 1).map(days).foreach { day =>
      val expect = ev
        .filter(col("d") <= lit(day) &&
          col("d") >= date_sub(lit(day), 6))
        .select(col("user_id")).distinct().count()
      assert(out(day.toString) == expect, s"day $day")
    }
  }

  test("cur14 keeps exactly one doc per cluster, and the best one") {
    val out = DedupQueries.queries("cur14_canonical_pick")(spark, sfDir)
    val picks = out.collect()
    val docs = Tables(spark, sfDir, "documents")
    // One pick per cluster; sizes total the corpus.
    assert(picks.map(_.getLong(0)).distinct.length == picks.length)
    assert(picks.map(_.getLong(3)).sum == docs.count())
    // The kept doc's quality must dominate its whole cluster: recompute
    // membership from the dd5 gate (independent composition) and join.
    val clusters = DedupQueries.queries("dd5_dup_clusters")(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    val withQ = clusters.join(
      docs.select(col("doc_id"),
        graft.text.TextFunctions.qualityScore(col("text")).as("q")),
      "doc_id")
    val maxQ = withQ.groupBy(col("cluster_id")).agg(max(col("q")).as("mx"))
    val joined = out.join(maxQ, "cluster_id")
    assert(joined.filter(col("keep_quality") < col("mx")).count() == 0)
    // And in multi-doc clusters the pick is strictly a member.
    val member = out.join(withQ,
      out("cluster_id") === withQ("cluster_id") &&
        out("keep_doc_id") === withQ("doc_id"), "left_anti")
    assert(member.count() == 0, "every pick must be a cluster member")
  }
}
