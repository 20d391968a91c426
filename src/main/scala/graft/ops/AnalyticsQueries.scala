package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      FROM d3 ORDER BY id"""
  )
}
