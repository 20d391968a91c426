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
      FROM f ORDER BY user_id, day"""
  )
}
