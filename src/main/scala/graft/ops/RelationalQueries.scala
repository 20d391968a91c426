package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational coverage of SURVEY §2 over the driver's TPC-H-ish tables:
  * grouped aggregation + HAVING (A1/A2), semi/anti joins incl. the
  * `IN`-subquery rewrite (J1), LEAD / ROW_NUMBER with a shared window spec
  * (W1/W2/W3), CASE / COALESCE / casts (O3/O5/O6), JSON path extraction
  * (O1/O2), epoch-millis round-trips (O8), sentinel timestamps (O10/O11),
  * multi-key sorts and top-k (T1/T2/T3), and CTE reuse (C1).
  *
  * Determinism discipline for the DuckDB oracle hash-compare: money/double
  * aggregates are cast to DECIMAL *before* SUM (exact, order-independent),
  * averages are derived from exact sums via double division, and every query
  * ends in a total ORDER BY. Per-row double arithmetic (same IEEE ops on the
  * same inputs) is bit-identical across engines and needs no casting.
  *
  * Final OUTPUT columns must additionally be driver-hash-stable types: the
  * round driver hashes serialized (type, value) cells, so a Spark DECIMAL
  * result vs DuckDB's DECIMAL/HUGEINT widening hash-mismatches even when
  * every value compares equal. Hence every exact decimal aggregate here is
  * cast to DOUBLE in the final select, and integer SUMs are
  * `CAST(... AS BIGINT)` in the oracle SQL to match Spark's non-widening
  * LongType.
  *
  * The oracle's decimal→double casts route through VARCHAR
  * (`CAST(CAST(sum AS VARCHAR) AS DOUBLE)`): DuckDB's direct cast
  * double-rounds (int128→double, then ÷10^scale) and drifts 1 ulp from the
  * correctly-rounded value once the unscaled sum exceeds 2^53, while the
  * decimal→string→double route and Spark's `BigDecimal.doubleValue` are
  * both correctly rounded at any magnitude. Found by an sf0.1 soak on
  * `q25_stats_moments` (scale-4 sums of squares cross 2^53 first); the
  * sf0.01 gate alone cannot see it.
  *
  * Scale notes: joins keep the big fact table (lineitem/orders) unhinted so
  * AQE picks broadcast vs shuffled-hash by runtime stats; only the
  * guaranteed-tiny dimensions (region, nation) carry explicit `broadcast`
  * hints. Aggregations are partial+final hash-agg (map-side combine) by
  * construction — no `collect`, no driver-side loops.
  */
object RelationalQueries {

  private def dec2 = DecimalType(18, 2)
  private def dec4 = DecimalType(18, 4)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1 grouped agg with multiple aggregates; filter pushed to parquet scan.
    "q1_pricing_summary" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec2)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec2)).cast("double")
            .as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4)).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Fact-dim equi-join + agg + top-k (T3 TakeOrderedAndProject).
    "q2_brand_revenue" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val part = Tables(s, dir, "part")
      li.join(part, li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(dec4)).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("p_brand"))
        .limit(10)
    }),

    // J1: IN-subquery with HAVING → left-semi join.
    "q3_repeat_customers" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      val repeat = orders.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 5)
        .select(col("o_custkey").as("c_custkey"))
      cust.join(repeat, Seq("c_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // O5/O6: multi-branch CASE + COALESCE(NULLIF) + string cast (O3).
    "q4_order_labels" -> ((s, dir) =>
      Tables(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "O", "OPEN")
            .when(col("o_orderstatus") === "F", "FULFILLED")
            .when(col("o_orderstatus") === "P", "PENDING")
            .otherwise("INVALID").as("status_label"),
          coalesce(
            when(col("o_orderpriority") === "4-NOT SPECIFIED", lit(null))
              .otherwise(col("o_orderpriority")),
            lit("NONE")).as("priority"),
          col("o_orderkey").cast("string").as("okey_str"))
        .orderBy(col("o_orderkey"))),

    // Star join: tiny dims broadcast-hinted, customer side left to AQE.
    "q5_region_revenue" -> ((s, dir) => {
      val region = Tables(s, dir, "region")
      val nation = Tables(s, dir, "nation")
      val cust = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(dec2)).cast("double")
            .as("total_revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // W1/W2/W3: one WindowSpec shared by LEAD and ROW_NUMBER (named WINDOW
    // clause semantics), sentinel close-out (O10/O11).
    "q6_event_windows" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables(s, dir, "events").select(
          col("user_id"), col("event_id"), col("ts"),
          coalesce(lead(col("ts"), 1).over(w),
            lit("9999-01-01").cast("timestamp_ntz")).as("next_ts"),
          row_number().over(w).as("event_seq"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // O1/O2: JSON path extraction + cast from a JSON string column.
    "q7_json_props" -> ((s, dir) =>
      Tables(s, dir, "events")
        .filter(col("props").isNotNull)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"),
          col("event_type"))
        .orderBy(col("event_id"))),

    // O3/O8: cast family + epoch-millis truncation round-trip.
    "q8_time_casts" -> ((s, dir) =>
      Tables(s, dir, "events").select(
          col("event_id"),
          col("value").cast(DecimalType(12, 2)).cast("double").as("value_dec"),
          year(col("ts")).as("y"),
          month(col("ts")).as("mo"),
          hour(col("ts")).as("h"),
          timestamp_millis(unix_millis(col("ts").cast("timestamp")))
            .cast("timestamp_ntz").as("ts_ms_trunc"))
        .orderBy(col("event_id"))),

    // Left-anti join (NOT EXISTS) — against a filtered right side so the
    // result is non-empty on the driver data (every customer has orders).
    "q9_inactive_customers" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val open = Tables(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      cust.join(open, Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // T3: global top-k → TakeOrderedAndProject, no full sort at scale.
    "q10_topk_orders" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)),

    // C1: CTE referenced twice (once aggregated to a scalar, once joined).
    "q11_max_order_customers" -> ((s, dir) => {
      val perCust = Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val mx = perCust.agg(max(col("n_orders")).as("mx"))
      perCust.join(broadcast(mx), perCust("n_orders") === mx("mx"))
        .select(col("o_custkey"), col("n_orders"))
        .orderBy(col("o_custkey"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
        COUNT(*) AS count_order,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q2_brand_revenue" -> """
      SELECT p_brand,
        CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY revenue DESC, p_brand LIMIT 10""",

    "q3_repeat_customers" -> """
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          GROUP BY o_custkey HAVING COUNT(*) > 5)
      ORDER BY c_custkey""",

    "q4_order_labels" -> """
      SELECT o_orderkey,
        CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
             WHEN o_orderstatus = 'F' THEN 'FULFILLED'
             WHEN o_orderstatus = 'P' THEN 'PENDING'
             ELSE 'INVALID' END AS status_label,
        COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'NONE') AS priority,
        CAST(o_orderkey AS VARCHAR) AS okey_str
      FROM orders ORDER BY o_orderkey""",

    "q5_region_revenue" -> """
      SELECT r_name, n_name, COUNT(*) AS n_orders,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",

    "q6_event_windows" -> """
      SELECT user_id, event_id, ts,
        COALESCE(LEAD(ts) OVER w, TIMESTAMP '9999-01-01') AS next_ts,
        ROW_NUMBER() OVER w AS event_seq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, event_id""",

    "q7_json_props" -> """
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        event_type
      FROM events WHERE props IS NOT NULL
      ORDER BY event_id""",

    "q8_time_casts" -> """
      SELECT event_id,
        CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS value_dec,
        year(ts) AS y, month(ts) AS mo, hour(ts) AS h,
        make_timestamp(epoch_ms(ts) * 1000) AS ts_ms_trunc
      FROM events ORDER BY event_id""",

    "q9_inactive_customers" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey""",

    "q10_topk_orders" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""",

    "q11_max_order_customers" -> """
      WITH per_cust AS (
        SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
      )
      SELECT o_custkey, n_orders FROM per_cust
      WHERE n_orders = (SELECT MAX(n_orders) FROM per_cust)
      ORDER BY o_custkey"""
  )
}
