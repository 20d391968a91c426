package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Debezium envelope decode — the engine's core source transform (SURVEY §2
  * O4, composing O1/O2/O3/O5/O6/O7/O8).
  *
  * Reference semantics (DuckDB CTE `products_create_update_delete`, reference
  * `example/duckdb_minio_product_scd2.sql:12-30`, `README.md:89-107`):
  * key = COALESCE(after.id, before.id); op code classified CREATE / UPDATE /
  * DELETE / SNAPSHOT / INVALID; `lsn` kept as the event-order column (never
  * Kafka offsets — reference orders strictly by LSN, `README.md:101,120`);
  * `ts_ms` epoch-millis → timestamp; tombstones/heartbeats dropped via
  * `log_seq_num IS NOT NULL` (reference `example…sql:28-29`).
  *
  * Everything here is built-in, codegen'd `functions._` — one narrow
  * projection + filter over the parsed envelope, so Catalyst pushes the
  * null-filter to the scan and prunes unread envelope fields. No shuffle.
  */
object Decode {

  /** Op-code classification (reference `README.md:94-100`). The reference
    * compares against *quoted* JSON literals (`'"c"'`) — a DuckDB `->`
    * artifact; struct access yields unquoted codes, same classification
    * (SURVEY §7.4).
    */
  def opType(op: Column): Column =
    when(op === "c", "CREATE")
      .when(op === "d", "DELETE")
      .when(op === "u", "UPDATE")
      .when(op === "r", "SNAPSHOT")
      .otherwise("INVALID")

  /** Parse raw NDJSON lines (`{"value": {...}}`) with an explicit envelope
    * schema — schema-on-read like the reference's `read_ndjson_objects`
    * (reference `README.md:104`), but validated and prunable. Output has the
    * single `value` struct column [[decodeEnvelope]] expects.
    */
  def parseLines(lines: Dataset[String], lineSchema: StructType): DataFrame =
    parseLineColumn(lines.toDF("line"), lineSchema)

  /** Columnar variant: parse an existing string column named `line` without
    * the `Dataset[String]` object round-trip (Serialize/DeserializeToObject
    * copies every line to a JVM String and back, breaking codegen between
    * the producer and the JSON parser).
    *
    * The parse goes through `explode(array(...))` — semantically the
    * identity (a 1-element array per row) but physically a `Generate` node,
    * which predicate pushdown does not cross for predicates on generator
    * OUTPUT. Without it, the downstream `log_seq_num IS NOT NULL` filter is
    * pushed below the projection and rewritten onto its own
    * `from_json(line).value.source.lsn`, so every line is Jackson-parsed
    * TWICE (once in the Filter, once in the Project — both interpreted,
    * `from_json` is CodegenFallback). The barrier keeps the parse
    * single-evaluation: measured ~1.2× locally on the envelope-decode path
    * (0.85 s → 0.71 s steady-state at sf0.1); the factor grows with line
    * width since it removes a whole Jackson pass.
    */
  def parseLineColumn(lines: DataFrame, lineSchema: StructType): DataFrame =
    lines
      .select(explode(array(from_json(col("line"), lineSchema))).as("parsed"))
      .select(col("parsed.*"))

  /** [[parseLineColumn]] through the native single-pass
    * [[graft.functions.EnvelopeParseExpr]] instead of `from_json` —
    * identical rows (spec-enforced), measured 1.35× on the whole envelope
    * decode query at sf0.1 (0.76 s → 0.55 s; the parse runs inside
    * whole-stage codegen with a precompiled schema plan rather than on the
    * interpreted CodegenFallback path). Same explode barrier, for the same
    * reason: a pushed-down filter re-parsing every line costs double no
    * matter how fast one parse is.
    */
  def parseLineColumnNative(lines: DataFrame, lineSchema: StructType): DataFrame =
    lines
      .select(explode(array(
        graft.functions.EnvelopeParse(col("line"), lineSchema))).as("parsed"))
      .select(col("parsed.*"))

  /** raw envelope rows (one `value` struct column) → flat change log:
    * `(id, <payload after.*>, before, after, operation_type, log_seq_num,
    * source_timestamp)`.
    *
    * @param keyField    name of the primary-key field inside the payload structs
    * @param passthrough extra input columns to carry through unchanged
    *                    (e.g. path-derived partition columns from
    *                    [[graft.streaming.ForeignLake]])
    */
  def decodeEnvelope(raw: DataFrame, keyField: String = "id",
                     passthrough: Seq[String] = Nil): DataFrame =
    raw.select(Seq(
        coalesce(col(s"value.after.$keyField"), col(s"value.before.$keyField"))
          .as(keyField),
        col("value.before").as("before"),
        col("value.after").as("after"),
        opType(col("value.op")).as("operation_type"),
        col("value.source.lsn").as("log_seq_num"),
        timestamp_millis(col("value.source.ts_ms")).cast("timestamp_ntz")
          .as("source_timestamp")) ++ passthrough.map(col): _*)
      .filter(col("log_seq_num").isNotNull)
}
