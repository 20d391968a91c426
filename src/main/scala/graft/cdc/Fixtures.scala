package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.model.Envelope

/** Deterministic CDC fixture generator — the Spark-side equivalent of the
  * reference's workload datagen (reference
  * `datagen/gen_user_payment_data.py:59-98`: every id gets a CREATE, ~10% an
  * UPDATE, ~5% a DELETE), re-keyed off the driver-provided `orders` table so
  * the fixture volume scales with the test scale factor and both engines
  * (Spark and the DuckDB oracle) can derive the *same* change stream
  * independently.
  *
  * Op mix (deterministic in `o_orderkey`, mirroring the datagen's RNG
  * thresholds with modular arithmetic):
  *   - CREATE  every key                 lsn = k*10     ts = o_orderdate
  *   - UPDATE  k % 10 == 3  (10%)        lsn = k*10+1   ts = +1h
  *   - DELETE  k % 20 == 7  (5%)         lsn = k*10+2   ts = +2h   after=null
  *   - invalid op 'z'  k % 40 == 21      lsn = k*10+3   ts = +4h   (exercises
  *     the reference's CASE ELSE INVALID branch, `README.md:99`)
  *   - SNAPSHOT 'r'    k % 50 == 13      lsn = k*10+5   ts = +3h
  *   - tombstone       k % 25 == 9       value = null   (exercises the
  *     `lsn IS NOT NULL` filter, reference `example…sql:28-29`)
  *
  * The generated lines are real Debezium NDJSON (`{"value": {...}}`) built
  * with `to_json`, so consuming them exercises the full parse → decode path.
  */
object Fixtures {

  private val payload = Envelope.ordersPayload
  private val valueType = Envelope.orders.fields.head.dataType

  private def k: Column = col("o_orderkey")

  private def afterCreate: Column = struct(
    k.as("id"), col("o_orderstatus").as("status"),
    col("o_totalprice").as("totalprice"))

  private def nullPayload: Column = lit(null).cast(payload)

  /** Event time = o_orderdate + hourOff hours, as epoch millis — matches the
    * oracle's `o_orderdate + INTERVAL n HOUR` exactly (midnight dates).
    */
  private def tsMs(hourOff: Int): Column =
    unix_millis(col("o_orderdate").cast("timestamp")) + lit(hourOff * 3600000L)

  private def sourceStruct(lsnOff: Int, hourOff: Int): Column = struct(
    lit("2.5.0.Final").as("version"),
    lit("postgresql").as("connector"),
    lit("debezium").as("name"),
    tsMs(hourOff).as("ts_ms"),
    lit("false").as("snapshot"),
    lit("postgres").as("db"),
    lit(null).cast(StringType).as("sequence"),
    lit("commerce").as("schema"),
    lit("orders").as("table"),
    (k * 10 + lsnOff).as("txId"),
    (k * 10 + lsnOff).as("lsn"),
    lit(null).cast("long").as("xmin"))

  private def envelope(op: String, lsnOff: Int, hourOff: Int,
                       before: Column, after: Column): Column =
    struct(
      before.as("before"),
      after.as("after"),
      sourceStruct(lsnOff, hourOff).as("source"),
      lit(op).as("op"),
      tsMs(hourOff).as("ts_ms"),
      lit(null).cast(StringType).as("transaction")
    ).as("value")

  /** The change stream as raw NDJSON lines (one string column `line`). */
  def ordersChangeLines(orders: DataFrame): Dataset[String] = {
    val afterUpdate = struct(
      k.as("id"), lit("F").as("status"),
      (col("o_totalprice") + 100.0).as("totalprice"))
    val afterInvalid = struct(
      k.as("id"), lit("X").as("status"), col("o_totalprice").as("totalprice"))

    val creates = orders.select(envelope("c", 0, 0, nullPayload, afterCreate))
    val updates = orders.filter(k % 10 === 3)
      .select(envelope("u", 1, 1, afterCreate, afterUpdate))
    val deletes = orders.filter(k % 20 === 7)
      .select(envelope("d", 2, 2, afterCreate, nullPayload))
    val invalids = orders.filter(k % 40 === 21)
      .select(envelope("z", 3, 4, afterCreate, afterInvalid))
    val snapshots = orders.filter(k % 50 === 13)
      .select(envelope("r", 5, 3, nullPayload, afterCreate))
    val tombstones = orders.filter(k % 25 === 9)
      .select(lit(null).cast(valueType).as("value"))

    val all = creates.unionByName(updates).unionByName(deletes)
      .unionByName(invalids).unionByName(snapshots)
      .unionByName(tombstones, allowMissingColumns = false)

    import orders.sparkSession.implicits._
    all.select(to_json(struct(col("value")),
        Map("ignoreNullFields" -> "false")).as("line"))
      .as[String]
  }

  /** Parsed + decoded change log derived from `$sfDir/orders.parquet`,
    * round-tripped through real NDJSON text (generate → `from_json` with the
    * declared envelope schema → decode) so every query over it exercises the
    * reference's full S4+O4 path.
    */
  def ordersChangeLog(orders: DataFrame): DataFrame = {
    val parsed = Decode.parseLines(ordersChangeLines(orders), Envelope.orders)
    Decode.decodeEnvelope(parsed, "id")
  }

  /** `commerce.products`-shaped change stream derived from the `part` table —
    * the reference's actual flagship table (`postgres/init.sql:9-14`), with
    * `price` carried the way Debezium really ships it: base64 of the
    * big-endian two's-complement unscaled int at scale 2 (the Kafka-Connect
    * `Decimal` logical type, sample reference `README.md:214`).
    *
    * Op mix mirrors [[ordersChangeLines]] keyed on `p_partkey`:
    * CREATE all; UPDATE (price+100.00) k%10==3; DELETE k%20==7;
    * tombstone k%25==9.
    */
  def productsChangeLines(part: DataFrame): Dataset[String] = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val pk = col("p_partkey")
    val b64 = udf((u: Long) => java.util.Base64.getEncoder.encodeToString(
      java.math.BigInteger.valueOf(u).toByteArray))
    def priceB64(priceDec: Column): Column =
      b64((priceDec * 100).cast(LongType))

    val basePrice = col("p_retailprice").cast(DecimalType(20, 2))
    def payload(price: Column): Column = struct(
      pk.cast("int").as("id"), col("p_name").as("name"),
      col("p_type").as("description"), priceB64(price).as("price"))

    val pPayload = Envelope.productsPayload
    val pValueType = Envelope.products.fields.head.dataType
    def nullP: Column = lit(null).cast(pPayload)

    def tsMsP(hourOff: Int): Column = lit(1700000000000L) + pk * 1000 +
      lit(hourOff * 3600000L)
    def sourceP(lsnOff: Int, hourOff: Int): Column = struct(
      lit("2.5.0.Final").as("version"), lit("postgresql").as("connector"),
      lit("debezium").as("name"), tsMsP(hourOff).as("ts_ms"),
      lit("false").as("snapshot"), lit("postgres").as("db"),
      lit(null).cast(StringType).as("sequence"),
      lit("commerce").as("schema"), lit("products").as("table"),
      (pk * 10 + lsnOff).as("txId"), (pk * 10 + lsnOff).as("lsn"),
      lit(null).cast("long").as("xmin"))
    def env(op: String, lsnOff: Int, hourOff: Int,
            before: Column, after: Column): Column = struct(
      before.as("before"), after.as("after"),
      sourceP(lsnOff, hourOff).as("source"), lit(op).as("op"),
      tsMsP(hourOff).as("ts_ms"),
      lit(null).cast(StringType).as("transaction")).as("value")

    val creates = part.select(env("c", 0, 0, nullP, payload(basePrice)))
    val updates = part.filter(pk % 10 === 3)
      .select(env("u", 1, 1, payload(basePrice), payload(basePrice + 100)))
    val deletes = part.filter(pk % 20 === 7)
      .select(env("d", 2, 2, payload(basePrice), nullP))
    val tombstones = part.filter(pk % 25 === 9)
      .select(lit(null).cast(pValueType).as("value"))

    val all = creates.unionByName(updates).unionByName(deletes)
      .unionByName(tombstones)
    import part.sparkSession.implicits._
    all.select(to_json(struct(col("value")),
        Map("ignoreNullFields" -> "false")).as("line"))
      .as[String]
  }

  /** Decoded products change log: NDJSON round-trip + envelope decode + the
    * native [[graft.functions.DebeziumDecimal]] price decode.
    */
  def productsChangeLog(part: DataFrame): DataFrame = {
    val parsed = Decode.parseLines(productsChangeLines(part), Envelope.products)
    Decode.decodeEnvelope(parsed, "id")
  }
}
