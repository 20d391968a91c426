package graft.model

import org.apache.spark.sql.types._

/** Debezium change-event envelope schemas.
  *
  * The reference never declares this schema — its DuckDB queries impose it at
  * read time via JSON paths (reference `README.md:91-102`); the full sample
  * envelope is captured at reference `README.md:214`. Each NDJSON lake line is
  * `{"value": <envelope>}` (reference `connectors/s3-sink.json:10-14`).
  *
  * We declare it explicitly as a [[StructType]] so Spark can (a) parse with a
  * vectorized JSON reader instead of schema inference, and (b) prune unused
  * envelope fields at the parse stage (Catalyst `OptimizeJsonExprs` / schema
  * pruning) — essential when scanning a 100 TB lake for 6 of ~15 fields.
  */
object Envelope {

  /** `value.source` — Debezium provenance block (sample: README.md:214).
    * `lsn` is the Postgres log sequence number, the per-key total order used
    * by every reference query (reference `README.md:101,120`).
    */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("name", StringType),
    StructField("ts_ms", LongType),
    StructField("snapshot", StringType),
    StructField("db", StringType),
    StructField("sequence", StringType),
    StructField("schema", StringType),
    StructField("table", StringType),
    StructField("txId", LongType),
    StructField("lsn", LongType),
    StructField("xmin", LongType)
  ))

  /** Full NDJSON-line schema for a table whose row payload is `payload`.
    * `before` is null on create/read, `after` is null on delete; the whole
    * `value` is null for Kafka tombstones (filtered downstream, reference
    * `example/duckdb_minio_product_scd2.sql:28-29`).
    */
  def lineSchema(payload: StructType): StructType = StructType(Seq(
    StructField("value", StructType(Seq(
      StructField("before", payload),
      StructField("after", payload),
      StructField("source", sourceSchema),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("transaction", StringType)
    )))
  ))

  /** `commerce.products` payload (reference `postgres/init.sql:9-14`).
    * `price` is declared REAL in Postgres but arrives in envelopes as the
    * Kafka-Connect `Decimal` logical type: base64 of a big-endian
    * two's-complement unscaled int (sample `"DOQ="` = 33.00, reference
    * `README.md:214`) — decoded by [[graft.functions.debezium_decimal]].
    */
  val productsPayload: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("price", StringType)
  ))

  /** `commerce.users` payload (reference `postgres/init.sql:17-21`). */
  val usersPayload: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("username", StringType),
    StructField("password", StringType)
  ))

  /** Payload used by the deterministic CDC fixtures derived from the
    * driver-provided `orders` table (see [[graft.cdc.Fixtures]]).
    */
  val ordersPayload: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("totalprice", DoubleType)
  ))

  /** Decode-path pruned line schema: exactly the fields
    * [[graft.cdc.Decode.decodeEnvelope]] reads — `before.<key>` (delete
    * rows key from the before-image), the full `after` payload,
    * `source.{ts_ms, lsn}`, `op`. Spark's JacksonParser skips JSON fields
    * absent from the schema without materializing them, so parsing with
    * this schema does at the source what Catalyst's `OptimizeJsonExprs`
    * schema pruning cannot see through a full-struct projection: ~10 source
    * fields, `transaction`, and the non-key before-image are never built.
    * At local bench SF the win is within noise (Jackson tokenization
    * dominates); at lake scale the saved per-field materialization and the
    * narrower rows feeding the exchange are the point.
    */
  def prunedLineSchema(payload: StructType,
                       keyField: String = "id"): StructType = StructType(Seq(
    StructField("value", StructType(Seq(
      StructField("before",
        StructType(payload.fields.filter(_.name == keyField).toSeq)),
      StructField("after", payload),
      StructField("source", StructType(Seq(
        StructField("ts_ms", LongType),
        StructField("lsn", LongType)))),
      StructField("op", StringType)
    )))
  ))

  val products: StructType = lineSchema(productsPayload)
  val users: StructType = lineSchema(usersPayload)
  val orders: StructType = lineSchema(ordersPayload)
}
