package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.DataQuality
import graft.quality.DataQuality.{CentsCol, LongCol, StringCol, TimestampCol}

/** Data-quality operators — the Deequ/Great-Expectations pillar of a
  * production lake: one-pass column profiling and a declarative constraint
  * audit. The reference pipeline lands CDC rows into a lake with no quality
  * gate at all (`/root/reference/connectors/s3-sink.json` writes whatever
  * Debezium emits); at 100 TB a profile/audit pass is what stands between
  * an upstream schema drift and a silently-poisoned training corpus.
  *
  * Exactness discipline: every reported number is an exact integer (counts,
  * ppm floor-divisions, canonical integer encodings of min/max — cents for
  * doubles, epoch-micros for timestamps) so both engines agree bit-for-bit.
  */
object QualityQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // One-pass column PROFILE of the orders table: per column — row count,
    // non-null count, completeness in ppm, exact distinct count, and
    // canonical min/max (integer encoding for numerics/timestamps,
    // lexicographic strings otherwise). ALL columns profile in ONE
    // aggregate: Spark plans the 6 COUNT(DISTINCT)s as a single Expand
    // (×|columns| row duplication — a constant factor, not a join or an
    // extra scan), then one hash agg; the per-column rows come from an
    // explode of the single result row. At 100 TB this is exactly the
    // shape you want: one scan, one shuffle keyed by the expand tag.
    "dq1_table_profile" -> ((s, dir) =>
      DataQuality.profile(Tables(s, dir, "orders"), Seq(
        "o_orderkey" -> LongCol, "o_custkey" -> LongCol,
        "o_orderstatus" -> StringCol, "o_totalprice" -> CentsCol,
        "o_orderdate" -> TimestampCol, "o_orderpriority" -> StringCol))),

    // Declarative CONSTRAINT AUDIT across the star schema — one row per
    // rule: primary-key uniqueness, referential integrity (null-safe
    // anti-join), value ranges, an accepted-value domain, not-null, and
    // event freshness. Each rule is a single scan-side filter + count
    // (the FK rule is one shuffle anti-join); the union is of scalar
    // rows. violations is exact; passed = violations == 0. At 100 TB
    // each rule reads only the columns it checks (pruned scans) and the
    // rules over the same table could share a scan — kept separate here
    // so each rule's plan stays independently prunable and the audit set
    // is compositional.
    "dq2_constraint_audit" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      val ev = Tables(s, dir, "events")
      DataQuality.audit(Seq(
        DataQuality.uniqueRule("pk_unique:orders.o_orderkey", orders,
          col("o_orderkey")),
        DataQuality.fkRule("fk:orders.o_custkey->customer.c_custkey",
          orders, col("o_custkey"),
          Tables(s, dir, "customer"), col("c_custkey")),
        DataQuality.predicateRule("range:lineitem.l_discount in [0,0.1]",
          li, col("l_discount") < 0 || col("l_discount") > 0.1),
        DataQuality.predicateRule("range:lineitem.l_quantity in [1,50]",
          li, col("l_quantity") < 1 || col("l_quantity") > 50),
        DataQuality.predicateRule("domain:orders.o_orderstatus in {O,F,P}",
          orders, !col("o_orderstatus").isin("O", "F", "P")),
        DataQuality.predicateRule("not_null:events.user_id", ev,
          col("user_id").isNull),
        DataQuality.predicateRule("freshness:events.ts >= 2024-01-01", ev,
          col("ts") < lit("2024-01-01").cast("timestamp_ntz"))))
    }),

    // CATALOG-CONSISTENT FK AUDIT — the dq × TxnCatalog composition that
    // PROVES the cross-table catalog earns its keep: lines.order_id ⊆
    // orders.id holds at every cataloged snapshot (v1 and v2), but
    // reading the tables at MIXED versions (orders v1 + lines v2 — what
    // independent per-table readers can observe without a catalog)
    // violates it with exactly the new order's lines dangling. The
    // violation row is the measured cost of not having transaction
    // boundaries; the two zero rows are the catalog's guarantee.
    "dq3_catalog_fk" -> ((s, dir) => {
      val (catalog, tables) = CdcQueries.txnCatalogDirs(s, dir)
      def t(name: String, v: Long) =
        graft.streaming.TxnCatalog.readTable(s, catalog, tables, name,
          Some(v))
      def fk(tag: String, ov: Long, lv: Long) =
        DataQuality.fkRule(tag, t("lines", lv), col("order_id"),
          t("orders", ov), col("id"))
      DataQuality.audit(Seq(
        fk("fk_at_v1", 1L, 1L),
        fk("fk_at_v2", 2L, 2L),
        fk("fk_mixed_orders_v1_lines_v2", 1L, 2L)))
    }),

    // CROSS-TABLE TEMPORAL consistency rule: a line must not ship before
    // its order was placed — the rule class that needs a JOIN to
    // evaluate (dq2's rules are all single-table). The synthetic data
    // violates it massively (no temporal invariant was generated), so
    // the gate proves violations are COUNTED across a join, not just
    // detected: one equi-join keyed on the order, one agg.
    "dq4_cross_table_rule" -> ((s, dir) => {
      val joined = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      DataQuality.audit(Seq(
        DataQuality.predicateRule(
          "temporal:lineitem.l_shipdate >= orders.o_orderdate",
          joined, col("l_shipdate") < col("o_orderdate")),
        DataQuality.predicateRule(
          "temporal:lineitem.l_shipdate <= orders.o_orderdate + 1y",
          joined, col("l_shipdate") >
            col("o_orderdate") + expr("INTERVAL 365 DAYS"))))
    }),

    // K-ANONYMITY / L-DIVERSITY audit of the order records under the
    // quasi-identifier (nation, market segment, $2000 account-balance
    // band) with order priority as the sensitive attribute — the
    // re-identification risk check a privacy-aware training-data release
    // runs before shipping: k_min is the smallest equivalence class (an
    // attacker knowing the QIs narrows a victim to k rows), l_min the
    // least-diverse class's distinct sensitive values (l = 1 means the
    // QIs REVEAL the sensitive value even without row identification).
    // One join + two hash aggs, everything exact integers; the band uses
    // truncating integer division identically on both engines.
    "dq5_k_anonymity" -> ((s, dir) => {
      val rec = Tables(s, dir, "orders")
        .join(Tables(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT) div 200000")
            .as("band"),
          col("o_orderpriority").as("sensitive"))
      val classes = rec.groupBy(col("nat"), col("seg"), col("band"))
        .agg(count(lit(1)).as("k"),
          countDistinct(col("sensitive")).as("l"))
      classes.agg(
          sum(col("k")).as("n_records"),
          count(lit(1)).as("n_classes"),
          min(col("k")).as("k_min"),
          min(col("l")).as("l_min"),
          sum(when(col("k") < 10, 1L).otherwise(0L)).as("n_classes_small"),
          sum(when(col("k") < 10, col("k")).otherwise(0L))
            .as("n_records_at_risk"))
        .select(col("n_records"), col("n_classes"), col("k_min"),
          col("l_min"), col("n_classes_small"), col("n_records_at_risk"),
          expr("n_records_at_risk * 1000000 div n_records")
            .as("at_risk_ppm"))
    }),

    // STREAMING data-quality counters driver-gated: the events audit
    // folded as two manifest-committed merges into a standing
    // O(|constraints|) counter table (additive merge = lossless), read
    // back as the report — which must equal the one-shot audit the
    // oracle recomputes over all events. The range rule carries real
    // violation mass, so the counters provably count. See
    // streaming.DqStore (replay no-op + stream-ingest twin spec'd).
    "ev11_stream_dq_store" -> ((s, dir) => {
      val root = graft.streaming.DqStore.materializedEventsDqDir(s, dir)
      graft.streaming.DqStore.report(s, root)
    }),

    // STREAMING column statistics driver-gated: per-column row/null
    // counters, min/max, and the KMV NDV sketch folded as two
    // manifest-committed merges — ANALYZE without rescans. Every
    // statistic kept is MERGEABLE (counts add, min/max fold, bottom-k-
    // distinct is a semilattice), so the standing report must equal the
    // oracle's one-shot recompute over all events, including the
    // estimator replay. See streaming.StatStore.
    "ev16_stream_stats" -> ((s, dir) => {
      val root = graft.streaming.StatStore.materializedEventsStatsDir(s, dir)
      graft.streaming.StatStore.report(s, root)
    })
  )

  def oracleSql: Map[String, String] = Map(
    "dq1_table_profile" -> {
      def prof(n: String, kind: String) = {
        val (mnn, mxn, mns, mxs) = kind match {
          case "string" =>
            ("CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)",
              s"MIN($n)", s"MAX($n)")
          case "double" =>
            (s"CAST(MIN(CAST(round($n * 100) AS BIGINT)) AS BIGINT)",
              s"CAST(MAX(CAST(round($n * 100) AS BIGINT)) AS BIGINT)",
              "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          case "timestamp" =>
            (s"CAST(MIN(epoch_us($n)) AS BIGINT)",
              s"CAST(MAX(epoch_us($n)) AS BIGINT)",
              "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
          case _ =>
            (s"CAST(MIN($n) AS BIGINT)", s"CAST(MAX($n) AS BIGINT)",
              "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        }
        s"""SELECT '$n' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(COUNT($n) AS BIGINT) AS n_nonnull,
          CAST(COUNT($n) * 1000000 // COUNT(*) AS BIGINT)
            AS completeness_ppm,
          CAST(COUNT(DISTINCT $n) AS BIGINT) AS n_distinct,
          $mnn AS min_num, $mxn AS max_num,
          $mns AS min_str, $mxs AS max_str
        FROM orders"""
      }
      Seq("o_orderkey" -> "long", "o_custkey" -> "long",
        "o_orderstatus" -> "string", "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp", "o_orderpriority" -> "string")
        .map { case (n, k) => prof(n, k) }
        .mkString("", "\n      UNION ALL ", "\n      ORDER BY col_name")
    },

    "dq2_constraint_audit" -> """
      WITH audit AS (
        SELECT 'pk_unique:orders.o_orderkey' AS constraint_name,
          CAST(COUNT(*) AS BIGINT) AS n_checked,
          CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
            AS n_violations
        FROM orders
        UNION ALL
        SELECT 'fk:orders.o_custkey->customer.c_custkey',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
          CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_custkey NOT IN
          (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'range:lineitem.l_discount in [0,0.1]',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'range:lineitem.l_quantity in [1,50]',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'domain:orders.o_orderstatus in {O,F,P}',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'not_null:events.user_id', CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'freshness:events.ts >= 2024-01-01',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
      )
      SELECT constraint_name, n_checked, n_violations,
        CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS passed
      FROM audit ORDER BY constraint_name""",

    "dq3_catalog_fk" -> """
      WITH o1 AS (
        SELECT o_orderkey AS id FROM orders WHERE o_orderkey % 10 = 3
      ), l1 AS (
        SELECT l_orderkey * 10 + l_linenumber AS line_id,
          l_orderkey AS order_id
        FROM lineitem JOIN o1 ON l_orderkey = o1.id
        GROUP BY 1, 2
      ), o2 AS (
        SELECT id FROM o1 UNION ALL SELECT 999999931
      ), l2 AS (
        SELECT line_id, order_id FROM l1
        UNION ALL SELECT 9999999311, 999999931
        UNION ALL SELECT 9999999312, 999999931
      ), audit AS (
        SELECT 'fk_at_v1' AS constraint_name,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l1) AS n_checked,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l1
           WHERE order_id NOT IN (SELECT id FROM o1)) AS n_violations
        UNION ALL
        SELECT 'fk_at_v2',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l2),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l2
           WHERE order_id NOT IN (SELECT id FROM o2))
        UNION ALL
        SELECT 'fk_mixed_orders_v1_lines_v2',
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l2),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM l2
           WHERE order_id NOT IN (SELECT id FROM o1))
      )
      SELECT constraint_name, n_checked, n_violations,
        CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS passed
      FROM audit ORDER BY constraint_name""",

    "dq4_cross_table_rule" -> """
      WITH joined AS (
        SELECT l_shipdate, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      ), audit AS (
        SELECT 'temporal:lineitem.l_shipdate >= orders.o_orderdate'
            AS constraint_name,
          CAST(COUNT(*) AS BIGINT) AS n_checked,
          CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations
        FROM joined
        UNION ALL
        SELECT 'temporal:lineitem.l_shipdate <= orders.o_orderdate + 1y',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN l_shipdate > o_orderdate
            + INTERVAL 365 DAY THEN 1 ELSE 0 END) AS BIGINT)
        FROM joined
      )
      SELECT constraint_name, n_checked, n_violations,
        CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS passed
      FROM audit ORDER BY constraint_name""",

    "dq5_k_anonymity" -> """
      WITH rec AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
          CAST(round(c_acctbal * 100) AS BIGINT) // 200000 AS band,
          o_orderpriority AS sensitive
        FROM orders JOIN customer ON o_custkey = c_custkey
      ), classes AS (
        SELECT nat, seg, band, CAST(COUNT(*) AS BIGINT) AS k,
          CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
        FROM rec GROUP BY 1, 2, 3
      ), agg AS (
        SELECT CAST(SUM(k) AS BIGINT) AS n_records,
          CAST(COUNT(*) AS BIGINT) AS n_classes,
          CAST(MIN(k) AS BIGINT) AS k_min, CAST(MIN(l) AS BIGINT) AS l_min,
          CAST(SUM(CASE WHEN k < 10 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_classes_small,
          CAST(SUM(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT)
            AS n_records_at_risk
        FROM classes
      )
      SELECT n_records, n_classes, k_min, l_min, n_classes_small,
        n_records_at_risk,
        CAST(n_records_at_risk * 1000000 // n_records AS BIGINT)
          AS at_risk_ppm
      FROM agg""",

    "ev11_stream_dq_store" -> """
      WITH audit AS (
        SELECT 'range:events.value in [0,100]' AS constraint_name,
          CAST(COUNT(*) AS BIGINT) AS n_checked,
          CAST(SUM(CASE WHEN value < 0 OR value > 100 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations
        FROM events
        UNION ALL
        SELECT 'domain:events.event_type in {view,click,purchase,signup,error}',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN event_type NOT IN
            ('view', 'click', 'purchase', 'signup', 'error')
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'not_null:events.user_id', CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'freshness:events.ts >= 2024-01-01',
          CAST(COUNT(*) AS BIGINT),
          CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
            THEN 1 ELSE 0 END) AS BIGINT)
        FROM events
      )
      SELECT constraint_name, n_checked, n_violations,
        CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
          AS passed
      FROM audit ORDER BY constraint_name""",

    // every standing statistic recomputed one-shot over all events,
    // including the bottom-64 KMV estimator replay (q137 conventions)
    "ev16_stream_stats" -> """
      WITH nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM events),
      h_uid AS (
        SELECT DISTINCT ('0x' || substr(md5(
          CAST(CAST(user_id AS DECIMAL(18,2)) AS VARCHAR)), 1, 15))
          ::BIGINT AS h
        FROM events WHERE user_id IS NOT NULL
      ), sk_uid AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
          MAX(CASE WHEN rn = 64 THEN h END) AS hk
        FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM h_uid)
        WHERE rn <= 64
      ),
      h_val AS (
        SELECT DISTINCT ('0x' || substr(md5(
          CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)), 1, 15))
          ::BIGINT AS h
        FROM events WHERE value IS NOT NULL
      ), sk_val AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
          MAX(CASE WHEN rn = 64 THEN h END) AS hk
        FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM h_val)
        WHERE rn <= 64
      ),
      h_et AS (
        SELECT DISTINCT
          ('0x' || substr(md5(event_type), 1, 15))::BIGINT AS h
        FROM events WHERE event_type IS NOT NULL
      ), sk_et AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
          MAX(CASE WHEN rn = 64 THEN h END) AS hk
        FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM h_et)
        WHERE rn <= 64
      )
      SELECT 'event_type' AS "column", n_rows,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM events
         WHERE event_type IS NULL) AS n_nulls,
        (SELECT CASE WHEN cnt < 64 THEN cnt::DOUBLE
          ELSE 63.0 * 1152921504606846976::DOUBLE / hk::DOUBLE END
          FROM sk_et) AS ndv_est,
        CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
        (SELECT MIN(event_type) FROM events) AS min_str,
        (SELECT MAX(event_type) FROM events) AS max_str
      FROM nr
      UNION ALL
      SELECT 'user_id', n_rows,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM events
         WHERE user_id IS NULL),
        (SELECT CASE WHEN cnt < 64 THEN cnt::DOUBLE
          ELSE 63.0 * 1152921504606846976::DOUBLE / hk::DOUBLE END
          FROM sk_uid),
        (SELECT CAST(MIN(CAST(user_id AS DECIMAL(18,2))) AS DOUBLE)
         FROM events),
        (SELECT CAST(MAX(CAST(user_id AS DECIMAL(18,2))) AS DOUBLE)
         FROM events),
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM nr
      UNION ALL
      SELECT 'value', n_rows,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM events WHERE value IS NULL),
        (SELECT CASE WHEN cnt < 64 THEN cnt::DOUBLE
          ELSE 63.0 * 1152921504606846976::DOUBLE / hk::DOUBLE END
          FROM sk_val),
        (SELECT CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events),
        (SELECT CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
         FROM events),
        CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM nr
      ORDER BY "column""""
  )
}
