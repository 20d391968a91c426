package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY §2 (plus the
  * LLM-pipeline extensions); `oracleSql` carries the DuckDB-equivalent SQL
  * for every query whose semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship: the reference's SCD2 derivation over a Debezium change stream
    * (round-tripped through real NDJSON), on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_scd2_orders")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CdcQueries.queries ++ ops.RelationalQueries.queries ++
      ops.TextQueries.queries ++ ops.DedupQueries.queries ++
      ops.SimQueries.queries ++ ops.MediaQueries.queries ++
      ops.AdvancedQueries.queries ++ ops.CorpusQueries.queries ++
      ops.DecontamQueries.queries ++ ops.SearchQueries.queries ++
      ops.LearnedQueries.queries ++ ops.AnalyticsQueries.queries ++
      ops.QualityQueries.queries ++ ops.InferenceQueries.queries

  def oracleSql: Map[String, String] =
    ops.CdcQueries.oracleSql ++ ops.RelationalQueries.oracleSql ++
      ops.TextQueries.oracleSql ++ ops.DedupQueries.oracleSql ++
      ops.SimQueries.oracleSql ++ ops.MediaQueries.oracleSql ++
      ops.AdvancedQueries.oracleSql ++ ops.CorpusQueries.oracleSql ++
      ops.DecontamQueries.oracleSql ++ ops.SearchQueries.oracleSql ++
      ops.LearnedQueries.oracleSql ++ ops.AnalyticsQueries.oracleSql ++
      ops.QualityQueries.oracleSql ++ ops.InferenceQueries.oracleSql
}
