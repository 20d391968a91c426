package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.util.Base64

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Decodes the Kafka-Connect `Decimal` logical type that Debezium uses for
  * Postgres NUMERIC/REAL columns: a base64 string of the big-endian
  * two's-complement *unscaled* integer, with the scale carried in the
  * (out-of-band) connect schema. Known vector from the reference's sample
  * envelope: `"DOQ="` = bytes 0x0CE4 = unscaled 3300, scale 2 → 33.00
  * (reference `README.md:214`).
  *
  * The reference's own `CAST(price AS NUMERIC(10,2))` over the base64 string
  * (reference `example/duckdb_minio_product_scd2.sql:35`) is lossy/broken —
  * this expression is the correct decode (documented divergence, SURVEY §7.4).
  *
  * Implemented as a native Catalyst [[UnaryExpression]] with `doGenCode` (not
  * a Scala UDF) so it stays inside whole-stage codegen: the generated code is
  * a single static call, no closure dispatch, null-safe, and Tungsten keeps
  * the surrounding project/filter fused — this is on the per-event decode hot
  * path of a 100 TB change log.
  */
case class DebeziumDecimalExpr(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DecimalType(DebeziumDecimal.PRECISION, scale)

  override def nullSafeEval(input: Any): Any =
    DebeziumDecimal.decode(input.asInstanceOf[UTF8String], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DebeziumDecimal.decode($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "debezium_decimal"
}

/** Encode twin of [[DebeziumDecimalExpr]]: a signed 64-bit *unscaled* value
  * → base64 of its minimal big-endian two's-complement bytes — exactly the
  * wire form Debezium ships (`BigInteger.toByteArray` semantics, so 3300 →
  * 0x0CE4 → `"DOQ="`). Used by the fixture generator and by any pipeline
  * that needs to round-trip values back INTO the Kafka-Connect Decimal
  * format; native so the encode side of the fixture lake stays inside
  * whole-stage codegen too (this removed the library's last Scala UDFs).
  */
case class DebeziumDecimalEncodeExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"debezium_decimal_encode needs an integral unscaled value, " +
            s"got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    DebeziumDecimal.encode(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DebeziumDecimal.encode((long)($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "debezium_decimal_encode"
}

object DebeziumDecimal {
  /** Wide enough for any NUMERIC(10,2)-class source column; the reference
    * caps at NUMERIC(10,2) (reference `example…sql:35`).
    */
  val PRECISION = 20

  /** Static decode helper shared by interpreted eval and generated code. */
  def decode(b64: UTF8String, scale: Int): Decimal = {
    val bytes = Base64.getDecoder.decode(b64.toString)
    Decimal(new JBigDecimal(new BigInteger(bytes), scale), PRECISION, scale)
  }

  /** Static encode helper shared by interpreted eval and generated code. */
  def encode(unscaled: Long): UTF8String =
    UTF8String.fromString(Base64.getEncoder.encodeToString(
      BigInteger.valueOf(unscaled).toByteArray))

  /** Column-level entry point: `debezium_decimal($"value.after.price", 2)`. */
  def apply(col: Column, scale: Int): Column =
    GraftBridge.column(
      DebeziumDecimalExpr(GraftBridge.expression(col), scale))

  /** Column-level encode: long unscaled value → base64 wire string. */
  def encodeCol(unscaled: Column): Column =
    GraftBridge.column(
      DebeziumDecimalEncodeExpr(GraftBridge.expression(unscaled)))
}
