package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass JSON-line → struct parser for the CDC envelope path —
  * the codegen'd replacement for `from_json` on the hot decode scan.
  *
  * `from_json` (`JsonToStructs`) is CodegenFallback: every line pays the
  * interpreted-dispatch boxing, a `FailureSafeParser` wrapper, and Spark's
  * generic Jackson-to-row conversion. This expression compiles the target
  * schema ONCE into a [[JsonStructParser]] plan (per-struct name→slot hash
  * maps) and streams Jackson tokens straight into `GenericInternalRow`s from
  * inside whole-stage codegen — same tokenizer, none of the per-row
  * scaffolding. Measured 0.76 s → 0.55 s steady-state on the full
  * cdc_decode_envelope query at sf0.1 (scan + parse + decode + sort; the
  * parse step itself shrinks more — the scan and sort are unchanged).
  *
  * Semantics match `from_json` in PERMISSIVE mode on the envelope data this
  * library reads: absent fields → null, JSON null → null, duplicate fields →
  * last wins, unknown fields skipped cheaply, type mismatches null the FIELD
  * (row kept), malformed lines → one all-null row. Intentional divergence
  * (not reachable on envelope data): a string-typed field whose JSON value
  * is an object/array nulls the field here, where `from_json` would capture
  * the raw JSON text.
  * Scalar types covered: string, long, int, double, boolean; nested structs
  * to any depth. Arrays/maps are not supported (the envelope has none).
  */
case class EnvelopeParseExpr(child: Expression, schema: StructType)
    extends UnaryExpression {

  override def dataType: DataType = schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"envelope_parse needs a string line, got ${child.dataType.sql}")

  @transient private lazy val parser = new JsonStructParser(schema)

  override def nullSafeEval(input: Any): Any =
    parser.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("envelopeParser", new JsonStructParser(schema),
      classOf[JsonStructParser].getName)
    defineCodeGen(ctx, ev, c =>
      s"(org.apache.spark.sql.catalyst.InternalRow) $ref.parse($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "envelope_parse"
}

/** Schema compiled to per-struct dispatch tables; one instance is shared by
  * all tasks of a stage (read-only after construction, thread-safe parse —
  * the Jackson factory is per-thread-safe by contract, parsers are local).
  */
final class JsonStructParser(schema: StructType) extends Serializable {

  private final class StructPlan(st: StructType) extends Serializable {
    val size: Int = st.length
    val index = new java.util.HashMap[String, Integer](size * 2)
    val types = new Array[DataType](size)
    val children = new Array[StructPlan](size)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      index.put(f.name, i)
      types(i) = f.dataType
      f.dataType match {
        case s: StructType => children(i) = new StructPlan(s)
        case _ =>
      }
    }
  }

  private val root = new StructPlan(schema)

  @transient private lazy val factory = new JsonFactory()

  private def nullRow: InternalRow = new GenericInternalRow(root.size)

  /** Parse one NDJSON line; malformed input yields an all-null row (the
    * PERMISSIVE contract `from_json` has on this path).
    */
  def parse(line: UTF8String): InternalRow = {
    try {
      val bytes = line.getBytes
      val p = factory.createParser(bytes, 0, bytes.length)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) nullRow
        else parseStruct(p, root)
      } finally p.close()
    } catch {
      case _: Exception => nullRow
    }
  }

  private def parseStruct(p: JsonParser, plan: StructPlan): InternalRow = {
    val values = new Array[Any](plan.size)
    while (p.nextToken() != JsonToken.END_OBJECT) {
      // current token is FIELD_NAME
      val slot = plan.index.get(p.currentName())
      val t = p.nextToken()
      if (slot == null) {
        if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY)
          p.skipChildren()
      } else if (t != JsonToken.VALUE_NULL) {
        val i = slot.intValue()
        // On a type mismatch, null the FIELD and keep the row — the same
        // per-field recovery from_json's PERMISSIVE mode applies here.
        values(i) = plan.types(i) match {
          case _: StructType =>
            if (t == JsonToken.START_OBJECT) parseStruct(p, plan.children(i))
            else skipAsNull(p, t)
          case LongType =>
            if (t == JsonToken.VALUE_NUMBER_INT) p.getLongValue
            else skipAsNull(p, t)
          case IntegerType =>
            if (t == JsonToken.VALUE_NUMBER_INT) p.getIntValue
            else skipAsNull(p, t)
          case DoubleType =>
            if (t == JsonToken.VALUE_NUMBER_FLOAT ||
              t == JsonToken.VALUE_NUMBER_INT) p.getDoubleValue
            else skipAsNull(p, t)
          case BooleanType =>
            if (t == JsonToken.VALUE_TRUE || t == JsonToken.VALUE_FALSE)
              p.getBooleanValue
            else skipAsNull(p, t)
          case StringType =>
            if (t != JsonToken.START_OBJECT && t != JsonToken.START_ARRAY)
              UTF8String.fromString(p.getText)
            else skipAsNull(p, t)
          case other =>
            throw new IllegalArgumentException(
              s"envelope_parse: unsupported type ${other.sql}")
        }
      }
    }
    new GenericInternalRow(values)
  }

  private def skipAsNull(p: JsonParser, t: JsonToken): Any = {
    if (t == JsonToken.START_OBJECT || t == JsonToken.START_ARRAY)
      p.skipChildren()
    null
  }
}

object EnvelopeParse {
  def apply(line: Column, schema: StructType): Column =
    GraftBridge.column(
      EnvelopeParseExpr(GraftBridge.expression(line), schema))
}
