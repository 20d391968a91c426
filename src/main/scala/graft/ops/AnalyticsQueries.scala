package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: graph distance, time-series gap-fill, exact model
  * evaluation — analytics shapes not yet covered by the other ops files.
  * Same contract as every gate: a DataFrame query ending in a total
  * ORDER BY, plus a DuckDB oracle computing the identical result.
  */
object AnalyticsQueries {

  /** The q43/q57 purchase graph: customer —(order line)— supplier,
    * supplier node ids offset into their own range.
    */
  private def purchaseEdges(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bounded multi-source BFS over the purchase graph: hop distance from
    // the 5 lowest-keyed suppliers, capped at 3 hops. Each round is one
    // keyed join + one min-agg (graph/ShortestPaths); the oracle unrolls
    // the same three relaxation rounds as CTEs. Integer distances —
    // bit-exact cross-engine, no quantization needed.
    "q59_shortest_paths" -> ((s, dir) => {
      val sources = Tables(s, dir, "supplier")
        .filter(col("s_suppkey") <= 5)
        .select((col("s_suppkey") + 1000000L).as("id"))
      graft.graph.ShortestPaths.distances(purchaseEdges(s, dir), sources, maxHops = 3)
        .select(col("id").cast("long").as("id"),
          col("dist").cast("long").as("dist"))
        .orderBy(col("id"))
    }),

    // Time-series resample + forward fill: each user's event stream becomes
    // a dense daily series from their first active day to the corpus' last
    // day, carrying the day's closing value forward across gaps. The fill
    // uses the engine-portable grouped-fill identity (running COUNT of
    // non-nulls → group id → MAX within group) instead of
    // last_value IGNORE NULLS, so both engines run the same algebra. The
    // closing value is picked by max(struct(ts, event_id, value)) — a
    // map-side-combinable argmax with a total tie-break, no window over
    // the raw events. Scale shape: one groupBy on (user, day), the spine
    // is O(users × days) — dense output is the operator's contract — and
    // the windows partition by user: key-parallel, never global.
    "q60_gapfill" -> ((s, dir) => {
      val ev = Tables(s, dir, "events").filter(col("user_id") < 100)
        .select(col("user_id"), to_date(col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"))
      val daily = ev.groupBy(col("user_id"), col("day"))
        .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
        .select(col("user_id"), col("day"), col("m.value").as("day_value"))
      val bounds = daily.groupBy(col("user_id"))
        .agg(min(col("day")).as("min_day"))
      val gmax = daily.agg(max(col("day")).as("max_day"))
      val spine = bounds.crossJoin(broadcast(gmax))
        .select(col("user_id"),
          explode(expr("sequence(min_day, max_day, interval 1 day)")).as("day"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("grp", count(col("day_value")).over(byUser))
        .withColumn("value_filled",
          max(col("day_value")).over(Window.partitionBy(col("user_id"), col("grp"))))
        .select(col("user_id"),
          col("day").cast("timestamp_ntz").as("day"), col("value_filled"))
        .orderBy(col("user_id"), col("day"))
    }),

    // Exact ROC-AUC (Mann-Whitney U with average-rank tie handling) of an
    // integer feature (n_chars) predicting a binary label (lang = 'en') —
    // the model-eval primitive next to cur13's trained classifier. All
    // arithmetic is integral: for each DISTINCT score, doubled average
    // rank = 2·cum − cnt + 1, U2 = Σ_pos 2·avgrank − n_pos(n_pos+1), and
    // AUC is reported as floor(U2·10⁶ / (2·n_pos·n_neg)) ppm — bit-exact
    // cross-engine with no float anywhere. Scale shape: one hash agg
    // compresses the corpus to its distinct scores; the running-sum
    // window orders those compressed rows only (the Packing bucket-totals
    // pattern), never the corpus.
    "q61_auc" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(
        col("n_chars").cast("long").as("score"),
        (col("lang") === "en").cast("long").as("pos"))
      val byScore = d.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
      val cum = Window.orderBy(col("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byScore.withColumn("cum", sum(col("cnt")).over(cum))
        .agg(sum(col("p") * (col("cum") * 2 - col("cnt") + 1)).as("sum2r"),
          sum(col("p")).as("n_pos"), sum(col("cnt") - col("p")).as("n_neg"))
        .select(col("n_pos"), col("n_neg"),
          expr("(sum2r - n_pos * (n_pos + 1)) * 1000000 div (2 * n_pos * n_neg)")
            .as("auc_ppm"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q59_shortest_paths" -> """
      WITH e0 AS (
        SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
          CAST(l_suppkey + 1000000 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      ), und AS (
        SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
      ), d0 AS (
        SELECT DISTINCT CAST(s_suppkey + 1000000 AS BIGINT) AS id,
          CAST(0 AS BIGINT) AS dist
        FROM supplier WHERE s_suppkey <= 5
      ), d1 AS (
        SELECT id, MIN(dist) AS dist FROM (
          SELECT id, dist FROM d0
          UNION ALL
          SELECT u.dst AS id, d.dist + 1 AS dist
          FROM und u JOIN d0 d ON u.src = d.id
        ) GROUP BY id
      ), d2 AS (
        SELECT id, MIN(dist) AS dist FROM (
          SELECT id, dist FROM d1
          UNION ALL
          SELECT u.dst AS id, d.dist + 1 AS dist
          FROM und u JOIN d1 d ON u.src = d.id
        ) GROUP BY id
      ), d3 AS (
        SELECT id, MIN(dist) AS dist FROM (
          SELECT id, dist FROM d2
          UNION ALL
          SELECT u.dst AS id, d.dist + 1 AS dist
          FROM und u JOIN d2 d ON u.src = d.id
        ) GROUP BY id
      )
      SELECT CAST(id AS BIGINT) AS id, CAST(dist AS BIGINT) AS dist
      FROM d3 ORDER BY id""",

    "q60_gapfill" -> """
      WITH ev AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
          ts, event_id, value
        FROM events WHERE user_id < 100
      ), daily AS (
        SELECT user_id, day, value AS day_value FROM (
          SELECT user_id, day, value,
            ROW_NUMBER() OVER (PARTITION BY user_id, day
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev
        ) WHERE rn = 1
      ), bounds AS (
        SELECT user_id, MIN(day) AS min_day FROM daily GROUP BY 1
      ), gmax AS (
        SELECT MAX(day) AS max_day FROM daily
      ), spine AS (
        SELECT user_id, CAST(day_ts AS DATE) AS day FROM (
          SELECT b.user_id,
            UNNEST(generate_series(CAST(b.min_day AS TIMESTAMP),
              CAST(g.max_day AS TIMESTAMP), INTERVAL 1 DAY)) AS day_ts
          FROM bounds b, gmax g
        )
      ), j AS (
        SELECT s.user_id, s.day, d.day_value
        FROM spine s LEFT JOIN daily d USING (user_id, day)
      ), f AS (
        SELECT user_id, day, day_value,
          COUNT(day_value) OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM j
      )
      SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        MAX(day_value) OVER (PARTITION BY user_id, grp) AS value_filled
      FROM f ORDER BY user_id, day""",

    "q61_auc" -> """
      WITH d AS (
        SELECT CAST(n_chars AS BIGINT) AS score,
          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
      ), g AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(pos) AS BIGINT) AS p
        FROM d GROUP BY 1
      ), c AS (
        SELECT score, cnt, p,
          CAST(SUM(cnt) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum
        FROM g
      ), a AS (
        SELECT CAST(SUM(p * (2 * cum - cnt + 1)) AS BIGINT) AS sum2r,
          CAST(SUM(p) AS BIGINT) AS n_pos,
          CAST(SUM(cnt - p) AS BIGINT) AS n_neg
        FROM c
      )
      SELECT n_pos, n_neg,
        CAST((sum2r - n_pos * (n_pos + 1)) * 1000000
          // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
      FROM a"""
  )
}
